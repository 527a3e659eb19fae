"""Adaptive early-exit at a REACHABLE eta (VERDICT r2 #9).

RESULTS.md 1.5 showed eta=1e-7 is degenerate (the primal residual decays
O(1/k); nothing ever converges).  The builder's own crossing estimate was
eta ~ 2e-2 at ~100 iterations.  This script records the constructive half:
at eta where early exit actually fires, what does it buy (throughput) and
what does it cost (detection gates vs the fixed-100 protocol on the SAME
scenes)?

Protocol: B anchor instances (fresh noise per instance), adaptive solve
(g_update per-step mode; the fused whole-solve kernel has no masked path)
vs admm_solve_fixed at 100 iterations; peaks of the first 64 instances
scored against the anchor truth both ways.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/adaptive_eta.py
"""
import argparse
import json
import time

p = argparse.ArgumentParser()
p.add_argument("--eta", type=float, nargs="+", default=[2e-2, 5e-2])
p.add_argument("--batch", type=int, default=1000)
p.add_argument("--max-iter", type=int, default=100)
p.add_argument("--g-update", default="polar")
p.add_argument("--repeats", type=int, default=3)
args = p.parse_args()

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions, PeakSearchConfig
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.peaks import find_peaks, match_peaks
from admmnet_tpu.solver import admm_solve, admm_solve_fixed
from admmnet_tpu.utils.host import cjit, to_host

B = args.batch
qB = 64
y, b, sigma = make_anchor_batch(B, mode="redemod", seed=0)
results = {"batch": B, "max_iter": args.max_iter, "g_update": args.g_update}


def score(phi_fn):
    peaks = to_host(cjit(
        lambda y, b, s: find_peaks(phi_fn(y, b, s), 10, 10,
                                   PeakSearchConfig(max_peaks=8))
    )(y[:qB], b[:qB], sigma[:qB]))
    return match_peaks(
        peaks.tau[:, :3], peaks.f[:, :3],
        np.broadcast_to(ANCHOR_TAU, (qB, 3)),
        np.broadcast_to(ANCHOR_F, (qB, 3)),
        tol_tau=0.05, tol_f=0.05,
    )


def throughput(fn, iters_done):
    float(fn(y, b, sigma))  # compile
    best = np.inf
    for _ in range(args.repeats):
        t0 = time.time()
        float(fn(y, b, sigma))
        best = min(best, time.time() - t0)
    return iters_done / best, best


# fixed-100 control
opts_fixed = ADMMOptions(g_update=args.g_update)
fix_fn = cjit(lambda y, b, s: jnp.sum(jnp.abs(
    admm_solve_fixed(y, b, s, args.max_iter, 1.0, opts_fixed))))
ips, t = throughput(fix_fn, B * args.max_iter)
st = score(lambda y, b, s: admm_solve_fixed(y, b, s, args.max_iter, 1.0,
                                            opts_fixed))
results["fixed"] = {"iter_per_s": round(ips, 1), "wall_s": round(t, 3),
                    "f1": st["f1"], "tau_rmse": round(st["tau_rmse"], 5)}
print("fixed-100:", results["fixed"], flush=True)

for eta in args.eta:
    opts = ADMMOptions(g_update=args.g_update, max_iter=args.max_iter,
                       eta_abs=eta, eta_rel=eta)
    res_holder = {}

    def run(y, b, s):
        r = admm_solve(y, b, s, 1.0, opts)
        return jnp.sum(jnp.abs(r.phi)), r.iterations, r.converged

    inner = cjit(run)

    def fn(y, b, s):
        tot, it, cv = inner(y, b, s)
        res_holder["it"] = np.asarray(it)
        res_holder["cv"] = np.asarray(cv)
        return tot

    # first call (compile) populates holder; throughput re-times
    _, wall = throughput(fn, 1)
    it = res_holder["it"].ravel()
    cv = res_holder["cv"].ravel()
    ips = float(it.sum()) / wall
    scenes_per_s = B / wall
    st = score(lambda y, b, s: admm_solve(y, b, s, 1.0, opts).phi)
    q = np.percentile(it, [50, 90, 99])
    results[f"eta_{eta:g}"] = {
        "converged_frac": round(float(cv.mean()), 4),
        "iters_mean": round(float(it.mean()), 2),
        "iters_p50": int(q[0]), "iters_p90": int(q[1]), "iters_p99": int(q[2]),
        "wall_s": round(wall, 3),
        "instance_iter_per_s": round(ips, 1),
        "scenes_per_s": round(scenes_per_s, 1),
        "f1": st["f1"], "tau_rmse": round(st["tau_rmse"], 5),
    }
    print(f"eta={eta:g}:", results[f"eta_{eta:g}"], flush=True)

print(json.dumps(results))
