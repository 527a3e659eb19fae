"""Subtraction profile of the LEAN fused-solve kernel on the real TPU.

Names the lean layout's residual wall over its 21-matmul bound (~1.5 ms per
2048-instance iteration vs the measured 2.48 ms): runs the kernel with one
component ablated per variant (``admm_solve_fused_fast(..., ablate=...)``,
output mathematically wrong, timing valid -- a debug output keeps the plane
chain live) and reports each component's marginal per-iteration cost.

Method (the list kernel's slope-calibrated subtraction, RESULTS.md 3.5):
the full kernel is timed at two iteration counts to split the fixed
per-call dispatch/tunnel cost from the per-iteration slope; each variant is
then timed once at the high count and its slope read off against the same
fixed cost.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/profile_lean.py
"""
import json
import time

import numpy as np

import jax.numpy as jnp

from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.ops.projections import POLAR_BF16_SCHED2
from admmnet_tpu.utils import cjit

B = 2048
REP = 5
HI_ITERS, LO_ITERS = 100, 25
VARIANTS = ("none", "corner", "diag", "h", "norm", "assemble", "zupd",
            "finals")

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)


def run(iters: int, ablate: str, kblk: int = 16) -> float:
    fn = cjit(
        lambda y, b, s: jnp.sum(jnp.abs(admm_solve_fused_fast(
            y, b, s, iters, kblk=kblk, outer_iters=4, inner_iters=3,
            schedule=POLAR_BF16_SCHED2, final_hi=False, ablate=ablate,
        )))
    )
    t0 = time.time()
    float(fn(y, b, s))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(REP):
        t0 = time.time()
        float(fn(y, b, s))
        best = min(best, time.time() - t0)
    print(f"  {ablate:9s} iters={iters:3d} kblk={kblk:2d}: best {best:.4f}s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return best


print(f"[profile_lean] B={B}, sched2, 4/3 root-finder, K=16", flush=True)
t_hi = run(HI_ITERS, "none")
t_lo = run(LO_ITERS, "none")
slope_full = (t_hi - t_lo) / (HI_ITERS - LO_ITERS)
fixed = t_hi - HI_ITERS * slope_full
print(f"full: {slope_full * 1e3:.3f} ms/iter, fixed per-call "
      f"{fixed * 1e3:.1f} ms", flush=True)

rows = {"full_ms_per_iter": slope_full * 1e3, "fixed_call_ms": fixed * 1e3,
        "iter_per_s": B * HI_ITERS / t_hi}
for v in VARIANTS[1:]:
    t_v = run(HI_ITERS, v)
    slope_v = (t_v - fixed) / HI_ITERS
    rows[f"marginal_ms_{v}"] = (slope_full - slope_v) * 1e3
    print(f"  -> {v}: marginal {(slope_full - slope_v) * 1e3:.3f} ms/iter",
          flush=True)

# kblk sweep at full math (lean layout may have a different knee than lists)
for kb in (8, 24, 32):
    t_k = run(HI_ITERS, "none", kblk=kb)
    rows[f"kblk{kb}_iter_per_s"] = B * HI_ITERS / t_k

print(json.dumps({k: round(float(vv), 4) for k, vv in rows.items()}))
