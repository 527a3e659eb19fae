"""Round-3 consolidated kernel measurement: sweep + gates in ONE process.

One long-lived TPU process (remote-compile latency is erratic and the
service wedges under many short-lived clients -- CLAUDE.md rule 5), doing:

1. B=8192 timing of the lean kernel at kblk=32 with 4/3 and 3/2 root-finder
   depths (the candidates runs/profile_lean.py motivated: the root-finder's
   serial per-program latency is 30% of the iteration at K=16);
2. anchor detection gate (8 instances, F1 vs the 3 true targets) + phi NMSE
   vs the exact-eigh solve at the winning config;
3. 512-scene random-SNR gate (SNR 5-25 dB) at the winning config vs the
   exact-eigh control on the same scenes.

Every stage prints as it lands so a timeout still leaves partial data.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/sweep_gate_r03.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions, DataConfig, PeakSearchConfig
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.peaks import find_peaks, match_peaks, scale_invariant_nmse
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

B = 8192
ITERS = 100
REP = 3

y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
out = {}

# --- 1. timing sweep ------------------------------------------------------
CANDS = {
    "k32_4_3": ADMMOptions(g_update="fused_fast", fused_kblk=32),
    "k32_3_2": ADMMOptions(g_update="fused_fast", fused_kblk=32,
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

winner = max(CANDS, key=lambda n: out[n]["iter_per_s"])
w_opts = CANDS[winner]
out["winner"] = winner
print(f"[sweep] winner: {winner}", flush=True)

# --- 2. anchor gate (F1 + NMSE vs eigh on the same 8 instances) -----------
qB = 8
gate_fn = cjit(lambda y, b, s: (
    find_peaks(admm_solve_fixed(y, b, s, ITERS, 1.0, w_opts), 10, 10,
               PeakSearchConfig(max_peaks=8)),
    admm_solve_fixed(y, b, s, ITERS, 1.0, w_opts),
    admm_solve_fixed(y, b, s, ITERS, 1.0, ADMMOptions(g_update="eigh")),
))
peaks, phi_w, phi_e = device_retry(
    lambda: to_host(gate_fn(y[:qB], b[:qB], s[:qB])))()
st = match_peaks(peaks.tau[:, :3], peaks.f[:, :3],
                 np.broadcast_to(ANCHOR_TAU, (qB, 3)),
                 np.broadcast_to(ANCHOR_F, (qB, 3)),
                 tol_tau=0.05, tol_f=0.05)
out["anchor_gate"] = {
    "f1": round(st["f1"], 4), "tau_rmse": round(st["tau_rmse"], 5),
    "f_rmse": round(st["f_rmse"], 5),
    "phi_nmse_vs_eigh": float(f"{float(scale_invariant_nmse(phi_w, phi_e)):.3e}"),
}
print(f"[anchor] {out['anchor_gate']}", flush=True)

# --- 3. random-SNR gate (512 scenes, winner vs exact-eigh control) --------
RB = 512
raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), RB)
ry, rb, rs = raw["y"], raw["b"], raw["sigma"]
for name, opts in (("winner", w_opts),
                   ("eigh_control", ADMMOptions(g_update="eigh"))):
    fn = cjit(lambda y, b, s, o=opts: find_peaks(
        admm_solve_fixed(y, b, s, ITERS, 1.0, o), 10, 10,
        PeakSearchConfig(max_peaks=8)))
    pk = device_retry(lambda fn=fn: to_host(fn(ry, rb, rs)))()
    st = match_peaks(pk.tau[:, :3], pk.f[:, :3], raw["tau"], raw["f"],
                     tol_tau=0.05, tol_f=0.05)
    out[f"random_{name}"] = {"f1": round(st["f1"], 4),
                             "tau_rmse": round(st["tau_rmse"], 5),
                             "f_rmse": round(st["f_rmse"], 5)}
    print(f"[random] {name}: {out[f'random_{name}']}", flush=True)

print(json.dumps(out))
