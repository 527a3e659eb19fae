"""Same-day K=16 baseline at B=8192: completes the {16,32}x{4/3,3/2} grid.

runs/sweep_gate_r03.py measured K=32 4/3 at 657.0k and K=32 3/2 at 768.7k
iter/s (B=8192) -- but BENCH_r02's K=16 4/3 point was 824.5k on an earlier
day, so the K axis needs a same-day control at the production batch before
any default flips (per-iteration slope at B=2048 matched across days to 2%,
the B=8192 K=32 slope did not).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/sweep_k16_r03.py
"""
import json
import time

import numpy as np

import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils.host import cjit
from admmnet_tpu.utils.retry import device_retry

B = 8192
ITERS = 100
REP = 3

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
out = {}
CANDS = {
    "k16_4_3": ADMMOptions(g_update="fused_fast"),
    "k16_3_2": ADMMOptions(g_update="fused_fast", fused_proj_iters=3,
                           fused_inner_iters=2),
    "k24_3_2": ADMMOptions(g_update="fused_fast", fused_kblk=24,
                           fused_proj_iters=3, fused_inner_iters=2),
}
for name, opts in CANDS.items():
    fn = cjit(lambda y, b, s, o=opts: jnp.sum(jnp.abs(
        admm_solve_fixed(y, b, s, ITERS, 1.0, o))))
    fetch = device_retry(lambda fn=fn: float(fn(y, b, s)))
    t0 = time.time()
    fetch()
    comp = time.time() - t0
    best = np.inf
    for _ in range(REP):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    ips = B * ITERS / best
    out[name] = {"best_s": round(best, 4), "iter_per_s": round(ips, 1),
                 "compile_s": round(comp, 1)}
    print(f"[sweep] {name}: {ips:,.0f} iter/s (best {best:.4f}s, "
          f"compile {comp:.0f}s)", flush=True)
print(json.dumps(out))
