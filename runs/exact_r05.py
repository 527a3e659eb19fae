"""Round-5 task 2: the fast phi-exact mode (VERDICT r4 missing-2).

Candidates: the whole-solve fused kernel running all-HIGHEST minimax
quintic schedules (g_update="fused_exact") at two schedule lengths
(quintic7 = polar parity, quintic5 = l0=1e-2 refit at 1.9x fewer matmuls)
and two root-finder styles (cold deep bisection vs warm carried bracket).
Baseline: the per-step polar mode (the round-4 exact_iter_s = 64.8k).

Protocol (the RESULTS 1 / BENCH exact pin): B=2048 anchor x 100
iterations, device-resident timing (best of 3 host fetches); accuracy =
scale-invariant phi NMSE vs the exact-eigh solve on the SAME 2048
instances (float64 metric).  The eigh reference solve is computed once and
cached to results/r05/phi_eigh_2048.npz (it is the expensive program: the
TPU worker has crashed on it before; device_retry + long cooldown).

Target: >=300k inst-iter/s at NMSE <= 1e-5, or the measured decomposition
of why not (the MXU roofline at all-HIGHEST is itself ~119k at 100%
utilization: 66 f32 matmuls/instance-iteration x 6 passes each -- see
RESULTS 3.5 -- so 300k REQUIRES the shortened schedule).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/exact_r05.py
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.peaks import scale_invariant_nmse
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

B = 2048
ITERS = 100
OUT = {}
REF_PATH = "results/r05/phi_eigh_2048.npz"

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
_stage = cjit(lambda yy, bb, ss: (yy * 1.0, bb * 1.0, ss * 1.0))
y_d, b_d, s_d = _stage(y, b, s)

if os.path.exists(REF_PATH):
    with np.load(REF_PATH) as z:
        phi_ref = z["phi"]
    print("eigh reference loaded from cache", flush=True)
else:
    # 512-instance chunks (the post_r04a protocol): the single B=2048
    # eigh-x-100 program is the one that has crashed the TPU worker before
    # and ran past 9 minutes in this round's first attempt.
    CHUNK = 512
    fe = cjit(lambda yy, bb, ss: admm_solve_fixed(
        yy, bb, ss, ITERS, 1.0, ADMMOptions(g_update="eigh")))
    t0 = time.time()
    chunks = []
    for i in range(0, B, CHUNK):
        sl = slice(i, i + CHUNK)
        chunks.append(device_retry(
            lambda sl=sl: to_host(fe(y[sl], b[sl], s[sl])),
            attempts=3, cooldown_s=300)())
        print(f"  eigh chunk {i // CHUNK + 1}/{B // CHUNK} done "
              f"({time.time()-t0:.0f}s)", flush=True)
    phi_ref = np.concatenate(chunks)
    np.savez_compressed(REF_PATH, phi=np.asarray(phi_ref))
    print("eigh reference computed + cached", flush=True)

CANDS = {
    "polar_per_step": ADMMOptions(g_update="polar"),
    # NOTE: these three are the HIGHEST-matmul rungs -- three_pass is
    # pinned False explicitly (the ADMMOptions default flipped to True
    # after the 3-pass rung won; a re-run must not silently re-measure
    # the wrong tier under the same labels).
    "fx_q7_cold16_8": ADMMOptions(
        g_update="fused_exact", fused_exact_schedule="quintic7",
        fused_exact_proj_iters=16, fused_exact_inner_iters=8,
        fused_exact_warm_root=False, fused_exact_three_pass=False),
    "fx_q7_warm10_8": ADMMOptions(
        g_update="fused_exact", fused_exact_schedule="quintic7",
        fused_exact_proj_iters=10, fused_exact_inner_iters=8,
        fused_exact_warm_root=True, fused_exact_three_pass=False),
    "fx_q5_cold16_8": ADMMOptions(
        g_update="fused_exact", fused_exact_schedule="quintic5",
        fused_exact_proj_iters=16, fused_exact_inner_iters=8,
        fused_exact_warm_root=False, fused_exact_three_pass=False),
    # fx_q5_warm10_8 / fx_q5_cold12_6 were dropped after fx_q5_cold16_8
    # measured NMSE 1.9e-3: the 5-step schedule fails the phi contract by
    # 200x regardless of root-finder, so its faster rungs are moot.
}

PARTIAL = "results/r05/exact_r05_partial.json"
if os.path.exists(PARTIAL):
    with open(PARTIAL) as f:
        OUT.update(json.load(f))

for name, opts in CANDS.items():
    if name in OUT:
        print(f"[{name}] cached: {OUT[name]}", flush=True)
        continue
    # accuracy program (returns phi) + timing program (scalar) share the
    # compiled solve; fetch phi once for NMSE, then time the scalar fetch
    fs_ = cjit(lambda yy, bb, ss, o=opts: admm_solve_fixed(
        yy, bb, ss, ITERS, 1.0, o))
    phi = device_retry(lambda fs_=fs_: to_host(fs_(y_d, b_d, s_d)),
                       attempts=2, cooldown_s=120)()
    nmse = float(scale_invariant_nmse(np.asarray(phi), phi_ref))

    ft = cjit(lambda yy, bb, ss, o=opts: jnp.sum(jnp.abs(
        admm_solve_fixed(yy, bb, ss, ITERS, 1.0, o))))
    fetch = device_retry(lambda ft=ft: float(ft(y_d, b_d, s_d)),
                         attempts=2, cooldown_s=120)
    t0 = time.time()
    fetch()
    comp = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    OUT[name] = {
        "iter_s": round(B * ITERS / best, 1),
        "phi_nmse_vs_eigh": float(f"{nmse:.3e}"),
        "best_run_s": round(best, 3),
        "compile_s": round(comp, 1),
    }
    print(f"[{name}] {OUT[name]}", flush=True)
    with open("results/r05/exact_r05_partial.json", "w") as f:
        json.dump(OUT, f, indent=2)

print(json.dumps(OUT))
with open("results/r05/exact_r05.json", "w") as f:
    json.dump(OUT, f, indent=2)
