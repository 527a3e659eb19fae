"""Round-5 task 1 step 1: decompose the CLASSICAL deployment pipeline
(observation -> solve -> (tau, f, height) peak list) with the round-4
production solver, device-resident protocol.

The RESULTS 1 row (0.166 ms/scene) is a round-2 measurement: the solve has
since moved 0.115 -> 0.089 ms/scene, so peak search + glue is now ~half the
classical pipeline and the LEARNED pipeline (0.102 ms/scene) beats the
classical one outright (VERDICT r4 missing-1).  This script measures, in
one session (all timings best-of-REPEATS host fetches of one compiled
program each, device-resident inputs):

  A. solve only                     (the 0.089 baseline, same session)
  B. solve + coarse spectrum grid   (separable NUDFT, 100x100)
  C. solve + spectrum + localmax/top-K
  D. full pipeline (D = C + 3-round refine)  -- the deployment number
  E. D with the coarse spectrum at one-pass DEFAULT precision
  F. D with the refine einsum at DEFAULT precision too

plus detection gates (64 anchor instances vs truth) for any variant that
changes math (E, F).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/e2e_r05.py
"""
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions, PeakSearchConfig
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.peaks import find_peaks, match_peaks
from admmnet_tpu.peaks.search import _local_max_mask
from admmnet_tpu.peaks.spectrum import spectrum_grid
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

B = 2048
ITERS = 100
REPEATS = 3
OUT = {}
opts = ADMMOptions(g_update="fused_fast")
pcfg = PeakSearchConfig(max_peaks=8)

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
_stage = cjit(lambda yy, bb, ss: (yy * 1.0, bb * 1.0, ss * 1.0))
y, b, s = _stage(y, b, s)

taus_ax = np.arange(0.0, 1.0, 0.01, dtype=np.float32)[:-1]  # _coarse_axes
fs_ax = np.arange(-0.5, 0.5, 0.01, dtype=np.float32)


def timed(name, fn):
    fetch = device_retry(lambda: float(fn(y, b, s)), attempts=2, cooldown_s=60)
    t0 = time.time()
    fetch()
    comp = time.time() - t0
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    OUT[name] = {
        "s_per_batch": round(best, 4),
        "ms_per_scene": round(best / B * 1e3, 4),
        "scenes_per_s": round(B / best, 1),
        "compile_s": round(comp, 1),
    }
    print(f"[{name}] {OUT[name]}", flush=True)


# A. solve only
timed("A_solve", cjit(lambda yy, bb, ss: jnp.sum(jnp.abs(
    admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts)))))

# B. + coarse spectrum
timed("B_solve_spectrum", cjit(lambda yy, bb, ss: jnp.sum(spectrum_grid(
    admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts), taus_ax, fs_ax, 10, 10))))


# C. + localmax/top-K (no refine)
def _coarse_peaks(yy, bb, ss):
    phi = admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts)
    Z = spectrum_grid(phi, taus_ax, fs_ax, 10, 10)
    mask = _local_max_mask(Z)
    scores = jnp.where(mask, Z, -jnp.inf).reshape(B, -1)
    vals, idx = jax.lax.top_k(scores, 8)
    return jnp.sum(jnp.where(jnp.isfinite(vals), vals, 0.0)) + jnp.sum(idx)


timed("C_solve_coarse_topk", cjit(_coarse_peaks))


# D. full pipeline
def _full(yy, bb, ss, cfg=pcfg):
    pk = find_peaks(admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts), 10, 10, cfg)
    return (jnp.sum(pk.tau) + jnp.sum(pk.f)
            + jnp.sum(jnp.where(pk.valid, pk.height, 0.0)))


timed("D_full_pipeline", cjit(_full))

# E/F: precision variants via monkeypatched einsum precision
import admmnet_tpu.peaks.spectrum as spec_mod
import admmnet_tpu.peaks.search as search_mod


def _spectrum_grid_default(phi, taus, fs, Nb, Nd):
    Phi = jnp.conj(phi).reshape(*phi.shape[:-1], Nb, Nd)
    S = spec_mod.doppler_steering(jnp.asarray(fs), Nb)
    Dc = jnp.conj(spec_mod.delay_steering(jnp.asarray(taus), Nd))
    inner = jnp.einsum("ym,...mk,xk->...yx", S, Phi, Dc,
                       precision=jax.lax.Precision.DEFAULT)
    return jnp.abs(inner) ** 2


orig_grid = search_mod.spectrum_grid
search_mod.spectrum_grid = _spectrum_grid_default
timed("E_full_coarse_default", cjit(functools.partial(_full)))
search_mod.spectrum_grid = orig_grid

# gate E: anchor F1 on 64 scenes with the DEFAULT coarse spectrum
search_mod.spectrum_grid = _spectrum_grid_default
gate_fn = cjit(lambda yy, bb, ss: find_peaks(
    admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts), 10, 10, pcfg))
pk = device_retry(lambda: to_host(gate_fn(y[:64], b[:64], s[:64])))()
st = match_peaks(pk.tau[:, :3], pk.f[:, :3],
                 np.broadcast_to(ANCHOR_TAU, (64, 3)),
                 np.broadcast_to(ANCHOR_F, (64, 3)), tol_tau=0.05, tol_f=0.05)
OUT["E_gate_anchor"] = {"f1": round(st["f1"], 4),
                        "tau_rmse": round(st["tau_rmse"], 5)}
print(f"[E_gate_anchor] {OUT['E_gate_anchor']}", flush=True)
search_mod.spectrum_grid = orig_grid

print(json.dumps(OUT))
with open("results/r05/e2e_decompose_r05.json", "w") as f:
    json.dump(OUT, f, indent=2)
