"""Gate the round-4 sweep's fastest candidates (sweep_r04 gated only its
throughput argmax, which failed: k32_1_2_wf anchor F1 0.958, random
0.8522 < the 0.8646 eigh control -- the amortized 1-bisection bracket's
transient infeasibility measurably harms detection, the 2026-08-21 cliff).

Candidates: k32_2_2_wf (1,128,088 iter/s, +4.1% same-session) and
k32_3_2_fold (1,109,281, +2.4%; fold only -- the conservative fallback).
Gates: 8-instance anchor F1 + phi NMSE vs eigh; 512 random-SNR scenes vs
the exact-eigh control (0.8646 on PRNGKey(42) scenes).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/gate_r04.py
"""
import json

import numpy as np

import jax

from admmnet_tpu.core.config import ADMMOptions, DataConfig, PeakSearchConfig
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.peaks import find_peaks, match_peaks, scale_invariant_nmse
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

ITERS = 100
out = {}
y, b, s = make_anchor_batch(64, mode="redemod", seed=0)
raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), 512)

CANDS = {
    "k32_2_2_wf": ADMMOptions(g_update="fused_fast", fused_proj_iters=2,
                              fused_warm_root=True, fused_fold_diag=True),
    "k32_3_2_fold": ADMMOptions(g_update="fused_fast", fused_fold_diag=True),
}
qB = 8
for name, opts in CANDS.items():
    gate_fn = cjit(lambda yy, bb, ss, o=opts: (
        find_peaks(admm_solve_fixed(yy, bb, ss, ITERS, 1.0, o), 10, 10,
                   PeakSearchConfig(max_peaks=8)),
        admm_solve_fixed(yy, bb, ss, ITERS, 1.0, o),
        admm_solve_fixed(yy, bb, ss, ITERS, 1.0,
                         ADMMOptions(g_update="eigh")),
    ))
    peaks, phi_w, phi_e = device_retry(
        lambda gate_fn=gate_fn: to_host(gate_fn(y[:qB], b[:qB], s[:qB])))()
    st = match_peaks(peaks.tau[:, :3], peaks.f[:, :3],
                     np.broadcast_to(ANCHOR_TAU, (qB, 3)),
                     np.broadcast_to(ANCHOR_F, (qB, 3)),
                     tol_tau=0.05, tol_f=0.05)
    out[f"{name}_anchor"] = {
        "f1": round(st["f1"], 4), "tau_rmse": round(st["tau_rmse"], 5),
        "phi_nmse_vs_eigh": float(
            f"{float(scale_invariant_nmse(phi_w, phi_e)):.3e}"),
    }
    print(f"[{name}] anchor: {out[f'{name}_anchor']}", flush=True)

    fn = cjit(lambda yy, bb, ss, o=opts: find_peaks(
        admm_solve_fixed(yy, bb, ss, ITERS, 1.0, o), 10, 10,
        PeakSearchConfig(max_peaks=8)))
    pk = device_retry(lambda fn=fn: to_host(
        fn(raw["y"], raw["b"], raw["sigma"])))()
    st = match_peaks(pk.tau[:, :3], pk.f[:, :3], raw["tau"], raw["f"],
                     tol_tau=0.05, tol_f=0.05)
    out[f"{name}_random"] = {"f1": round(st["f1"], 4),
                             "tau_rmse": round(st["tau_rmse"], 5)}
    print(f"[{name}] random: {out[f'{name}_random']} "
          f"(eigh control 0.8646)", flush=True)

print(json.dumps(out))
with open("results/r04/gate_r04.json", "w") as f:
    json.dump(out, f, indent=2)
