"""On-hardware lean-vs-lists fused-kernel parity (ADVICE r2 item 2).

The lean layout's resym_out=False optimization relies on a
bitwise-Hermitian assembly invariant that the CPU interpret-mode test
(tests/test_fused_fast.py) cannot exercise on the real Mosaic compilation
path.  This check runs BOTH layouts compiled on the TPU over anchor +
random-SNR instances and pins the relative phi error.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/check_lean_parity.py
"""
import json

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.ops.projections import POLAR_BF16_SCHED2
from admmnet_tpu.utils.host import cjit, to_host

y, b, s = make_anchor_batch(64, mode="redemod", seed=0)


def run(layout):
    fn = cjit(lambda y, b, s: admm_solve_fused_fast(
        y, b, s, 100, kblk=16, outer_iters=4, inner_iters=3,
        schedule=POLAR_BF16_SCHED2, final_hi=False, layout=layout,
    ))
    return to_host(fn(y, b, s))


lean = run("lean")
lists = run("lists")
num = np.linalg.norm(lean - lists, axis=-1)
den = np.linalg.norm(lists, axis=-1)
rel = num / np.maximum(den, 1e-30)
out = {"batch": 64, "iters": 100, "schedule": "sched2",
       "rel_err_max": float(rel.max()), "rel_err_mean": float(rel.mean())}
print(json.dumps(out))
assert rel.max() < 5e-4, out
print("lean-vs-lists ON-TPU parity OK")
