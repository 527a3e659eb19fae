"""Round-5 precision-ladder experiment (RESULTS 3.9, VERDICT r4 weak-4):
3-pass split-bf16 matmuls in the fused exact solve.

The exact mode is MXU-roofline-bound at ~119k inst-iter/s because Mosaic
emulates each f32 HIGHEST matmul as ~6 one-pass bf16 passes (RESULTS 3.8).
The 3-pass split (a = bf16(a) + bf16(a - bf16(a)); drop the lo@lo term)
halves the pass count at ~1e-5 relative error per product -- XLA's BF16_3X
tier, which Mosaic does not expose but the kernel can hand-roll.  If the
composed solve stays at phi NMSE <= 1e-5 this raises the exact roofline to
~238k; if not, it is the measured precision cliff between the 1-pass
detection mode (7e-2) and the 6-pass exact mode (1.8e-6).

Protocol: identical to runs/exact_r05.py (B=2048 x 100 device-resident,
NMSE vs the cached eigh reference).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/exact3p_r05.py
"""
import json
import time

import numpy as np

import jax.numpy as jnp

from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.ops.projections import POLAR_QUINTIC_SCHEDULE
from admmnet_tpu.peaks import scale_invariant_nmse
from admmnet_tpu.utils import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

B = 2048
ITERS = 100
OUT = {}

with np.load("results/r05/phi_eigh_2048.npz") as z:
    phi_ref = z["phi"]

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
_stage = cjit(lambda yy, bb, ss: (yy * 1.0, bb * 1.0, ss * 1.0))
y_d, b_d, s_d = _stage(y, b, s)


def solve(yy, bb, ss):
    return admm_solve_fused_fast(
        yy, bb, ss, ITERS, 1.0, 1.0, kblk=32, hi_steps=0,
        outer_iters=16, inner_iters=8, schedule=POLAR_QUINTIC_SCHEDULE,
        final_hi=True, layout="lean", fold_diag=True, warm_root=False,
        all_hi=True, three_pass=True)


fs_ = cjit(solve)
phi = device_retry(lambda: to_host(fs_(y_d, b_d, s_d)),
                   attempts=2, cooldown_s=120)()
nmse = float(scale_invariant_nmse(np.asarray(phi), phi_ref))

ft = cjit(lambda yy, bb, ss: jnp.sum(jnp.abs(solve(yy, bb, ss))))
fetch = device_retry(lambda: float(ft(y_d, b_d, s_d)), attempts=2,
                     cooldown_s=120)
t0 = time.time()
fetch()
comp = time.time() - t0
best = np.inf
for _ in range(3):
    t0 = time.time()
    fetch()
    best = min(best, time.time() - t0)
OUT["fx_q7_3pass_cold16_8"] = {
    "iter_s": round(B * ITERS / best, 1),
    "phi_nmse_vs_eigh": float(f"{nmse:.3e}"),
    "best_run_s": round(best, 3),
    "compile_s": round(comp, 1),
}
print(json.dumps(OUT))
with open("results/r05/exact3p_r05.json", "w") as f:
    json.dump(OUT, f, indent=2)
