"""Round-5 task 1 step 2: refine-stage variants of the classical pipeline.

Step 1 (runs/e2e_r05.py) pinned the decomposition: coarse NUDFT + top-K are
free; the 3-round HIGHEST refine is the whole non-solve cost (~0.017
ms/scene).  This sweeps the two legal refine knobs (the P>=1/reduce+1 zoom
invariant forbids shrinking refine_points below 11 at reduce=0.1):

  - refine at DEFAULT matmul precision (one-pass bf16: the spectrum values
    only have to preserve an 11x11 argmax; per-round quantization then
    re-centers)
  - 2 refine rounds instead of 3 (final quantization ~6e-5 << the 0.003
    tau RMSE the solver itself produces)

with a SAME-SESSION learned-pipeline control (spec50k, pallas Clenshaw
engine -- the 0.102 ms/scene round-4 row) so the classical-vs-learned
comparison is day-variance-free.  Gates: 64 anchor scenes (F1 + tau RMSE)
per variant; 512 random-SNR scenes for the winner vs the same-scenes
current-default control.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/e2e_r05b.py
"""
import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import (
    ADMMOptions,
    DataConfig,
    ModelConfig,
    PeakSearchConfig,
    ProblemSpec,
)
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.peaks import find_peaks, match_peaks
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

B = 2048
ITERS = 100
REPEATS = 3
OUT = {}
opts = ADMMOptions(g_update="fused_fast")

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
_stage = cjit(lambda yy, bb, ss: (yy * 1.0, bb * 1.0, ss * 1.0))
y, b, s = _stage(y, b, s)

VARIANTS = {
    "r3_hi_(default)": PeakSearchConfig(max_peaks=8),
    "r3_def": PeakSearchConfig(max_peaks=8, refine_precision="default"),
    "r2_hi": PeakSearchConfig(max_peaks=8, refine_iters=2),
    "r2_def": PeakSearchConfig(max_peaks=8, refine_iters=2,
                               refine_precision="default"),
}


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


for name, cfg in VARIANTS.items():
    def _full(yy, bb, ss, cfg=cfg):
        pk = find_peaks(
            admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts), 10, 10, cfg)
        return (jnp.sum(pk.tau) + jnp.sum(pk.f)
                + jnp.sum(jnp.where(pk.valid, pk.height, 0.0)))

    timed(name, cjit(_full))
    if name != "r3_hi_(default)":
        gate_fn = cjit(lambda yy, bb, ss, cfg=cfg: find_peaks(
            admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts), 10, 10, cfg))
        pk = device_retry(lambda gate_fn=gate_fn: to_host(
            gate_fn(y[:64], b[:64], s[:64])))()
        st = match_peaks(pk.tau[:, :3], pk.f[:, :3],
                         np.broadcast_to(ANCHOR_TAU, (64, 3)),
                         np.broadcast_to(ANCHOR_F, (64, 3)),
                         tol_tau=0.05, tol_f=0.05)
        OUT[f"{name}_anchor"] = {"f1": round(st["f1"], 4),
                                 "tau_rmse": round(st["tau_rmse"], 5),
                                 "f_rmse": round(st["f_rmse"], 5)}
        print(f"[{name}_anchor] {OUT[f'{name}_anchor']}", flush=True)

# Same-session learned-pipeline control (round-4 row: 0.102 ms/scene)
from admmnet_tpu.models import ADMMNet
from admmnet_tpu.train.checkpoint import restore_checkpoint

mcfg = ModelConfig(spec=ProblemSpec(), num_layers=10, g_mode="chebyshev",
                   head="spectrum", cheb_impl="pallas")
model = ADMMNet(cfg=mcfg)
p0 = cjit(lambda k, yy, bb, ss: model.init(k, yy, bb, ss))(
    jax.random.PRNGKey(0), y[:2], b[:2], s[:2])
params = restore_checkpoint("runs/spec50k", {"params": p0,
                                             "opt_state": None})[0]["params"]
timed("learned_pallas_control", cjit(
    lambda yy, bb, ss: (lambda o: jnp.sum(o[0]) + jnp.sum(o[1])
                        + jnp.sum(o[2]))(model.apply(params, yy, bb, ss))))

# 512-scene random-SNR gate: winner-config vs current-default, same scenes
raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), 512)
for name, cfg in (("winner_r2_def", VARIANTS["r2_def"]),
                  ("control_r3_hi", VARIANTS["r3_hi_(default)"])):
    fn = cjit(lambda yy, bb, ss, cfg=cfg: find_peaks(
        admm_solve_fixed(yy, bb, ss, ITERS, 1.0, opts), 10, 10, cfg))
    pk = device_retry(lambda fn=fn: to_host(
        fn(raw["y"], raw["b"], raw["sigma"])))()
    st = match_peaks(pk.tau[:, :3], pk.f[:, :3], raw["tau"], raw["f"],
                     tol_tau=0.05, tol_f=0.05)
    OUT[f"random512_{name}"] = {"f1": round(st["f1"], 4),
                                "tau_rmse": round(st["tau_rmse"], 5),
                                "f_rmse": round(st["f_rmse"], 5)}
    print(f"[random512_{name}] {OUT[f'random512_{name}']}", flush=True)

print(json.dumps(OUT))
with open("results/r05/e2e_refine_r05.json", "w") as f:
    json.dump(OUT, f, indent=2)
