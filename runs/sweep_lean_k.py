"""B=8192 kblk x root-finder-depth sweep of the LEAN fused solve.

Follow-up to runs/profile_lean.py, which found (a) the lean layout's kblk
knee moved past 16 (B=2048: K=16 580.8k, K=24 684.7k, K=32 689.0k iter/s)
and (b) the root-finder is now the dominant non-matmul cost (0.75 ms of the
2.52 ms/iteration at K=16) -- the serial per-program latency halves when the
program count halves, so wider interleaves pay twice.  The 3/2 depth was
already gate-checked flat vs 4/3 in the list layout (RESULTS.md 3.5 "the
cliff"); in the lean layout it finally buys wall time.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/sweep_lean_k.py
"""
import json
import time

import numpy as np

import jax.numpy as jnp

from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.ops.projections import POLAR_BF16_SCHED2
from admmnet_tpu.utils import cjit
from admmnet_tpu.utils.retry import device_retry

B = 8192
ITERS = 100
REP = 4

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)

rows = []
for kblk in (16, 24, 32):
    for outer, inner in ((4, 3), (3, 2)):
        fn = cjit(
            lambda y, b, s, kblk=kblk, outer=outer, inner=inner: jnp.sum(
                jnp.abs(admm_solve_fused_fast(
                    y, b, s, ITERS, kblk=kblk, outer_iters=outer,
                    inner_iters=inner, schedule=POLAR_BF16_SCHED2,
                    final_hi=False,
                ))
            )
        )
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
        rows.append({"kblk": kblk, "outer": outer, "inner": inner,
                     "best_s": round(best, 4), "iter_per_s": round(ips, 1)})
        print(f"kblk={kblk:2d} {outer}/{inner}: best {best:.4f}s "
              f"= {ips:,.0f} iter/s (compile {comp:.0f}s)", flush=True)

print(json.dumps(rows))
