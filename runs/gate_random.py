"""Random-SNR detection gate for fused-kernel option changes.

512 random-SNR scenes (5-25 dB, the SURVEY distribution), solved side by
side with each candidate fused configuration AND the exact-eigh control;
top-3 peaks scored against ground truth.  This is the gate protocol behind
RESULTS.md section 1's random-SNR row; any ADMMOptions default change must
hold F1 >= the eigh control's on the same scenes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/gate_random.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions, DataConfig, PeakSearchConfig
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.peaks import find_peaks, match_peaks
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils.host import cjit, to_host

B = 512
ITERS = 100

raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), B)
y, b, sigma = raw["y"], raw["b"], raw["sigma"]
true_tau, true_f = raw["tau"], raw["f"]

CANDS = {
    "eigh_control": ADMMOptions(g_update="eigh"),
    "lean_k16_4_3": ADMMOptions(g_update="fused_fast"),
    "lean_k32_3_2": ADMMOptions(
        g_update="fused_fast", fused_kblk=32, fused_proj_iters=3,
        fused_inner_iters=2,
    ),
}

out = {"batch": B, "iters": ITERS}
for name, opts in CANDS.items():
    fn = cjit(
        lambda y, b, s, o=opts: find_peaks(
            admm_solve_fixed(y, b, s, ITERS, 1.0, o), 10, 10,
            PeakSearchConfig(max_peaks=8),
        )
    )
    t0 = time.time()
    peaks = to_host(fn(y, b, sigma))
    wall = time.time() - t0
    st = match_peaks(peaks.tau[:, :3], peaks.f[:, :3], true_tau, true_f,
                     tol_tau=0.05, tol_f=0.05)
    out[name] = {"f1": round(st["f1"], 4),
                 "tau_rmse": round(st["tau_rmse"], 5),
                 "f_rmse": round(st["f_rmse"], 5),
                 "wall_s_incl_compile": round(wall, 1)}
    print(name, out[name], flush=True)

print(json.dumps(out))
