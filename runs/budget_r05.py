"""Round-5 task 3: gated reduced-iteration budget for the production solve.

Round 3 measured eta=5e-2 converging the ANCHOR distribution in 10
iterations at flat detection (RESULTS 1.5) -- but only on the while_loop
path at polar speeds, and RESULTS 1.5 itself records the caveat that the
crossing is distribution-dependent.  This sweeps the FIXED iteration budget
of the production fused kernel (the deployable form: one compiled program,
no convergence plumbing) on the discriminating gate: 512 random-SNR scenes
(SNR 5-25 dB, PRNGKey 42 -- the r03/r04 gate scenes) scored against ground
truth, alongside the full-budget production point and the exact-eigh
control; plus the 64-anchor gate per budget.

Deliverables: F1(iters) curve -> smallest budget inside the control-0.005
band on BOTH gates; e2e classical pipeline (solve + r2_def peak search)
timed at that budget; solver-only throughput at that budget.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/budget_r05.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions, DataConfig, PeakSearchConfig
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.peaks import find_peaks, match_peaks
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {}
opts = ADMMOptions(g_update="fused_fast")
pcfg = PeakSearchConfig(max_peaks=8, refine_iters=2,
                        refine_precision="default")

raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), 512)
ya, ba, sa = make_anchor_batch(64, mode="redemod", seed=0)

BUDGETS = (10, 15, 20, 30, 50, 75, 100)

for iters in BUDGETS:
    fn = cjit(lambda yy, bb, ss, it=iters: find_peaks(
        admm_solve_fixed(yy, bb, ss, it, 1.0, opts), 10, 10, pcfg))
    pk = device_retry(lambda fn=fn: to_host(
        fn(raw["y"], raw["b"], raw["sigma"])))()
    st = match_peaks(pk.tau[:, :3], pk.f[:, :3], raw["tau"], raw["f"],
                     tol_tau=0.05, tol_f=0.05)
    pka = device_retry(lambda fn=fn: to_host(fn(ya, ba, sa)))()
    sta = match_peaks(pka.tau[:, :3], pka.f[:, :3],
                      np.broadcast_to(ANCHOR_TAU, (64, 3)),
                      np.broadcast_to(ANCHOR_F, (64, 3)),
                      tol_tau=0.05, tol_f=0.05)
    OUT[f"iters{iters}"] = {
        "random_f1": round(st["f1"], 4),
        "random_tau_rmse": round(st["tau_rmse"], 5),
        "anchor_f1": round(sta["f1"], 4),
        "anchor_tau_rmse": round(sta["tau_rmse"], 5),
    }
    print(f"[iters{iters}] {OUT[f'iters{iters}']}", flush=True)

# exact-eigh control at full budget on the same scenes (absolute ceiling)
fe = cjit(lambda yy, bb, ss: find_peaks(
    admm_solve_fixed(yy, bb, ss, 100, 1.0, ADMMOptions(g_update="eigh")),
    10, 10, pcfg))
pke = device_retry(lambda: to_host(fe(raw["y"], raw["b"], raw["sigma"])))()
ste = match_peaks(pke.tau[:, :3], pke.f[:, :3], raw["tau"], raw["f"],
                  tol_tau=0.05, tol_f=0.05)
OUT["eigh_control_100"] = {"random_f1": round(ste["f1"], 4),
                           "random_tau_rmse": round(ste["tau_rmse"], 5)}
print(f"[eigh_control_100] {OUT['eigh_control_100']}", flush=True)

# pick: smallest budget with random_f1 >= control - 0.005 AND anchor_f1 == 1
ctrl = OUT["eigh_control_100"]["random_f1"]
chosen = None
for iters in BUDGETS:
    r = OUT[f"iters{iters}"]
    if r["random_f1"] >= ctrl - 0.005 and r["anchor_f1"] == 1.0:
        chosen = iters
        break
OUT["chosen_budget"] = chosen
print(f"chosen budget: {chosen} (control {ctrl})", flush=True)

# time the e2e classical pipeline + solver-only at the chosen budget, B=2048
if chosen is not None:
    B = 2048
    y, b, s = make_anchor_batch(B, mode="redemod", seed=0)
    _stage = cjit(lambda yy, bb, ss: (yy * 1.0, bb * 1.0, ss * 1.0))
    y, b, s = _stage(y, b, s)

    def timed(name, fn, scale=1.0):
        fetch = device_retry(lambda: float(fn(y, b, s)), attempts=2,
                             cooldown_s=60)
        fetch()
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            fetch()
            best = min(best, time.time() - t0)
        OUT[name] = {
            "s_per_batch": round(best, 4),
            "ms_per_scene": round(best / B * 1e3, 4),
            "scenes_per_s": round(B / best, 1),
        }
        print(f"[{name}] {OUT[name]}", flush=True)

    def _full(yy, bb, ss):
        pk = find_peaks(
            admm_solve_fixed(yy, bb, ss, chosen, 1.0, opts), 10, 10, pcfg)
        return (jnp.sum(pk.tau) + jnp.sum(pk.f)
                + jnp.sum(jnp.where(pk.valid, pk.height, 0.0)))

    timed(f"e2e_budget{chosen}", cjit(_full))
    timed(f"solve_budget{chosen}", cjit(
        lambda yy, bb, ss: jnp.sum(jnp.abs(
            admm_solve_fixed(yy, bb, ss, chosen, 1.0, opts)))))

print(json.dumps(OUT))
with open("results/r05/budget_r05.json", "w") as f:
    json.dump(OUT, f, indent=2)
