"""Sharded-vs-unsharded program overhead bound (SCALING task, VERDICT r2 #8).

The >=95% per-chip scaling claim for the embarrassingly-parallel solve rests
on "the sharded program adds no measurable work".  This script turns that
into a measurement this environment CAN produce: for the same solve program,
wall time is fit as ``t = fixed + slope * iters`` at two iteration counts,
unsharded vs sharded over a device mesh.  The sharding-attributable per-call
overhead is ``fixed_sharded - fixed_unsharded`` (partitioning + sharded
dispatch + infeed layout); the implied per-chip efficiency floor at the
production point (100 iterations) is ``compute / (compute + overhead)``.

Run:
  CPU 8-virtual-device mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python runs/scaling_overhead.py --backend cpu
  real TPU chip (1-device mesh; measures the partitioner/dispatch delta):
    PYTHONPATH=/root/.axon_site:/root/repo \
      python runs/scaling_overhead.py --backend tpu
"""
import argparse
import json
import time

p = argparse.ArgumentParser()
p.add_argument("--backend", choices=["cpu", "tpu"], required=True)
p.add_argument("--batch", type=int, default=2048)
p.add_argument("--iters", type=int, nargs=2, default=(5, 55))
p.add_argument("--repeats", type=int, default=5)
p.add_argument("--g-update", default=None,
               help="default: polar on tpu, eigh on cpu (XLA path)")
args = p.parse_args()

import jax

if args.backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.parallel import data_mesh
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils.host import cjit

n_dev = len(jax.devices())
g_update = args.g_update or ("polar" if args.backend == "tpu" else "eigh")
opts = ADMMOptions(g_update=g_update)
B = args.batch - args.batch % n_dev
y, b, sigma = make_anchor_batch(B, mode="redemod", seed=0)
mesh = data_mesh(n_dev)
print(f"[overhead] backend={jax.default_backend()} devices={n_dev} "
      f"B={B} g_update={g_update}", flush=True)


def timed(iters: int, sharded: bool) -> float:
    kw = {}
    if sharded:
        kw["in_shardings"] = NamedSharding(mesh, P("data"))
    fn = cjit(
        lambda y, b, s: jnp.sum(
            jnp.abs(admm_solve_fixed(y, b, s, iters, 1.0, opts))
        ),
        **kw,
    )
    t0 = time.time()
    float(fn(y, b, sigma))
    comp = time.time() - t0
    best = np.inf
    for _ in range(args.repeats):
        t0 = time.time()
        float(fn(y, b, sigma))
        best = min(best, time.time() - t0)
    print(f"  iters={iters:3d} sharded={sharded}: best {best:.4f}s "
          f"(compile {comp:.0f}s)", flush=True)
    return best


out = {"backend": args.backend, "devices": n_dev, "batch": B,
       "g_update": g_update}

# --- tiny-program call cost: compute ~ 0, so the per-call wall time IS the
# dispatch + partitioning cost.  Valid on the oversubscribed CPU mesh too
# (the intercept-fit below is NOT: 8 virtual devices on 2 cores turn the
# sharded slope into a core-contention measurement).
ty, tb, ts = make_anchor_batch(n_dev, mode="redemod", seed=1)
tiny_opts = ADMMOptions(g_update="ref_identity")


def tiny_call(sharded: bool) -> float:
    kw = {}
    if sharded:
        kw["in_shardings"] = NamedSharding(mesh, P("data"))
    fn = cjit(
        lambda y, b, s: jnp.sum(
            jnp.abs(admm_solve_fixed(y, b, s, 5, 1.0, tiny_opts))
        ),
        **kw,
    )
    float(fn(ty, tb, ts))
    best = np.inf
    for _ in range(max(args.repeats, 10)):
        t0 = time.time()
        float(fn(ty, tb, ts))
        best = min(best, time.time() - t0)
    return best


out["tiny_call_unsharded_ms"] = tiny_call(False) * 1e3
out["tiny_call_sharded_ms"] = tiny_call(True) * 1e3
out["tiny_sharding_overhead_ms"] = (
    out["tiny_call_sharded_ms"] - out["tiny_call_unsharded_ms"]
)
print(f"  tiny call: unsharded {out['tiny_call_unsharded_ms']:.2f} ms, "
      f"sharded {out['tiny_call_sharded_ms']:.2f} ms", flush=True)

# --- intercept fit on the real program (meaningful on real hardware where
# sharded and unsharded compute run on the same silicon; skip on the
# oversubscribed CPU mesh)
if args.backend == "tpu":
    lo, hi = args.iters
    for sharded in (False, True):
        t_lo, t_hi = timed(lo, sharded), timed(hi, sharded)
        slope = (t_hi - t_lo) / (hi - lo)
        fixed = t_lo - lo * slope
        tag = "sharded" if sharded else "unsharded"
        out[f"{tag}_fixed_ms"] = fixed * 1e3
        out[f"{tag}_slope_ms_per_iter"] = slope * 1e3
    delta = out["sharded_fixed_ms"] - out["unsharded_fixed_ms"]
    compute_100 = out["sharded_slope_ms_per_iter"] * 100
    out["sharding_overhead_ms_per_call"] = delta
    out["efficiency_floor_at_100_iters"] = compute_100 / (
        compute_100 + max(delta, 0.0)
    )
else:
    compute_100 = None

# efficiency floor from the tiny-call overhead against the production call
# (fused solve, ~1.0 s per 8192x100 call, BENCH_r02)
out["tiny_efficiency_floor_vs_1s_call"] = 1000.0 / (
    1000.0 + max(out["tiny_sharding_overhead_ms"], 0.0)
)
print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in out.items()}))
