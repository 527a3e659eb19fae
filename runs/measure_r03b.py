"""Round-3 measurement pass 2, ONE process (wedge discipline, CLAUDE.md r5):

A. tunnel floor + tiny-call sharding overhead on the real chip (1-device
   mesh; completes SCALING_r03's bound with the real-chip dispatch delta);
B. net-10 batch-1 forward latency, chebyshev trunk at HIGHEST vs one-pass
   DEFAULT Clenshaw (VERDICT r2 #5): host-observed + chained device latency;
C. net-10 batched B=2048 throughput, both precisions (the layers/s row);
D. e2e quality gate for the one-pass trunk: runs/spec50k checkpoint on 512
   random-SNR scenes (same PRNGKey(42) scenes as the kernel gate), HIGHEST
   vs DEFAULT precision — position-matched F1 must hold for the one-pass
   row to ship as a default;
E. adaptive early-exit at reachable eta (VERDICT r2 #9): eta in {2e-2,5e-2}
   vs the fixed-100 protocol, polar mode, B=1000 — convergence histogram,
   throughput, detection gates on 64 anchor scenes.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/measure_r03b.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from admmnet_tpu.core.config import (
    ADMMOptions, DataConfig, ModelConfig, PeakSearchConfig, ProblemSpec,
)
from admmnet_tpu.data.anchor import ANCHOR_F, ANCHOR_TAU, make_anchor_batch
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.models import ADMMNet, PhiEstADMMNet
from admmnet_tpu.parallel import data_mesh
from admmnet_tpu.peaks import find_peaks, match_peaks
from admmnet_tpu.solver import admm_solve, admm_solve_fixed
from admmnet_tpu.train.checkpoint import restore_checkpoint
from admmnet_tpu.utils.host import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {}


def med_ms(ts):
    return round(float(np.median(ts) * 1e3), 3)


def timed_fetch(fn, *args, runs=30):
    """Median host-observed latency of float(fn(*args)); first call compiles."""
    fetch = device_retry(lambda: float(fn(*args)))
    t0 = time.time()
    fetch()
    comp = time.time() - t0
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fetch()
        ts.append(time.time() - t0)
    return med_ms(ts), comp


# ---------- A. tunnel floor + tiny-call sharding overhead -----------------
x8 = np.zeros(8, np.float32)
floor_ms, comp = timed_fetch(cjit(lambda x: jnp.sum(x + 1.0)), x8)
OUT["tunnel_floor_ms"] = floor_ms
print(f"[A] tunnel floor {floor_ms} ms (first compile {comp:.0f}s)",
      flush=True)

ty, tb, ts_ = make_anchor_batch(1, mode="redemod", seed=1)
tiny_opts = ADMMOptions(g_update="ref_identity")
mesh = data_mesh(1)
for tag, kw in (("unsharded", {}),
                ("sharded", {"in_shardings": NamedSharding(mesh, P("data"))})):
    fn = cjit(lambda y, b, s: jnp.sum(jnp.abs(
        admm_solve_fixed(y, b, s, 5, 1.0, tiny_opts))), **kw)
    ms, _ = timed_fetch(fn, ty, tb, ts_, runs=30)
    OUT[f"tiny_call_{tag}_ms"] = ms
    print(f"[A] tiny solve {tag}: {ms} ms", flush=True)
OUT["tiny_sharding_overhead_ms"] = round(
    OUT["tiny_call_sharded_ms"] - OUT["tiny_call_unsharded_ms"], 3)

# ---------- B/C. net forward latency + throughput -------------------------
spec = ProblemSpec()
y1, b1, s1 = make_anchor_batch(1, mode="redemod", seed=0)
yB, bB, sB = make_anchor_batch(2048, mode="redemod", seed=0)
for precision in ("highest", "default"):
    mcfg = ModelConfig(spec=spec, num_layers=10, g_mode="chebyshev",
                       cheb_degree=48, cheb_precision=precision)
    net = PhiEstADMMNet(cfg=mcfg)
    params = cjit(lambda k, y, b, s: net.init(k, y, b, s))(
        jax.random.PRNGKey(0), y1, b1, s1)

    def chained(n):
        def fn(p, y, b, s):
            phi = y
            for _ in range(n):
                phi = net.apply(p, phi, b, s)
            return jnp.sum(jnp.abs(phi))
        ms, _ = timed_fetch(cjit(fn), params, y1, b1, s1, runs=25)
        return ms

    t1, t8 = chained(1), chained(8)
    dev_ms = round((t8 - t1) / 7.0, 3)
    msB, _ = timed_fetch(
        cjit(lambda p, y, b, s: jnp.sum(jnp.abs(net.apply(p, y, b, s)))),
        params, yB, bB, sB, runs=8)
    OUT[f"net10_{precision}"] = {
        "host_batch1_ms": t1, "device_batch1_ms": dev_ms,
        "batched2048_ms_per_forward": round(msB / 2048.0, 4),
        "layers_per_s_batched": round(2048 * 10 / (msB / 1e3), 0),
    }
    print(f"[B/C] net10 {precision}: host b1 {t1} ms, device b1 {dev_ms} ms, "
          f"batched {msB / 2048.0:.4f} ms/forward", flush=True)

# ---------- D. spec50k e2e quality, HIGHEST vs DEFAULT Clenshaw -----------
raw = generate_batch(jax.random.PRNGKey(42), DataConfig(), 512)
for precision in ("highest", "default"):
    mcfg = ModelConfig(spec=spec, num_layers=10, g_mode="chebyshev",
                       cheb_degree=48, cheb_precision=precision,
                       head="spectrum", with_peak_head=True)
    model = ADMMNet(cfg=mcfg)
    p0 = cjit(lambda k, y, b, s: model.init(k, y, b, s))(
        jax.random.PRNGKey(0), raw["y"][:2], raw["b"][:2], raw["sigma"][:2])
    restored = restore_checkpoint("runs/spec50k", {"params": p0,
                                                  "opt_state": None})
    params = restored[0]["params"]
    tau, f, conf = device_retry(lambda m=model, p=params: to_host(cjit(
        lambda p_, y, b, s: m.apply(p_, y, b, s)[:3]
    )(p, raw["y"], raw["b"], raw["sigma"])))()
    order = np.argsort(-conf, axis=-1)
    rows = np.arange(512)[:, None]
    tau, f, conf = tau[rows, order], f[rows, order], conf[rows, order]
    st = match_peaks(tau, f, raw["tau"], raw["f"], 0.05, 0.05,
                     pred_valid=conf > 0.5)
    OUT[f"spec50k_{precision}"] = {
        "f1": round(st["f1"], 4), "tau_rmse": round(st["tau_rmse"], 5),
        "f_rmse": round(st["f_rmse"], 5)}
    print(f"[D] spec50k {precision}: {OUT[f'spec50k_{precision}']}",
          flush=True)

# ---------- E. adaptive early-exit at reachable eta -----------------------
B = 1000
ya, ba, sa = make_anchor_batch(B, mode="redemod", seed=0)
qB = 64
t_true = np.broadcast_to(ANCHOR_TAU, (qB, 3))
f_true = np.broadcast_to(ANCHOR_F, (qB, 3))


def score(opts, adaptive):
    fn = cjit(lambda y, b, s: find_peaks(
        (admm_solve(y, b, s, 1.0, opts).phi if adaptive
         else admm_solve_fixed(y, b, s, 100, 1.0, opts)),
        10, 10, PeakSearchConfig(max_peaks=8)))
    pk = device_retry(lambda: to_host(fn(ya[:qB], ba[:qB], sa[:qB])))()
    return match_peaks(pk.tau[:, :3], pk.f[:, :3], t_true, f_true,
                       tol_tau=0.05, tol_f=0.05)


fixed_opts = ADMMOptions(g_update="polar")
ms, _ = timed_fetch(cjit(lambda y, b, s: jnp.sum(jnp.abs(
    admm_solve_fixed(y, b, s, 100, 1.0, fixed_opts)))), ya, ba, sa, runs=3)
st = score(fixed_opts, adaptive=False)
OUT["adaptive_fixed100"] = {
    "iter_per_s": round(B * 100 / (ms / 1e3), 1), "f1": round(st["f1"], 4),
    "tau_rmse": round(st["tau_rmse"], 5)}
print(f"[E] fixed-100: {OUT['adaptive_fixed100']}", flush=True)

for eta in (2e-2, 5e-2):
    opts = ADMMOptions(g_update="polar", max_iter=100, eta_abs=eta,
                       eta_rel=eta)
    inner = cjit(lambda y, b, s, o=opts: (
        (lambda r: (jnp.sum(jnp.abs(r.phi)), r.iterations, r.converged))(
            admm_solve(y, b, s, 1.0, o))))
    holder = {}

    def run_once():
        tot, it, cv = inner(ya, ba, sa)
        holder["it"] = np.asarray(it)
        holder["cv"] = np.asarray(cv)
        return float(tot)

    fetch = device_retry(run_once)
    fetch()  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    it = holder["it"].ravel()
    cv = holder["cv"].ravel()
    st = score(opts, adaptive=True)
    q = np.percentile(it, [50, 90, 99])
    OUT[f"adaptive_eta_{eta:g}"] = {
        "converged_frac": round(float(cv.mean()), 4),
        "iters_mean": round(float(it.mean()), 2),
        "iters_p50": int(q[0]), "iters_p90": int(q[1]),
        "iters_p99": int(q[2]),
        "scenes_per_s": round(B / best, 1),
        "effective_iter_per_s": round(float(it.sum()) / best, 1),
        "f1": round(st["f1"], 4), "tau_rmse": round(st["tau_rmse"], 5)}
    print(f"[E] eta={eta:g}: {OUT[f'adaptive_eta_{eta:g}']}", flush=True)

print(json.dumps(OUT))
