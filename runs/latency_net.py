"""Batch-1 net-forward latency decomposition on the real TPU.

The reference protocol (test_time_net.py:94-101) times single-sample net
forwards.  On the tunnel backend every host-observed call pays a fixed
relay round-trip, so this script separates:

1. the tunnel floor: median host-observed latency of a trivial jitted
   program (one add on 8 floats);
2. the host-observed net-10 batch-1 forward (the deployment latency a
   tunnel client sees -- comparable to RESULTS.md 3's 39.4 ms row);
3. the DEVICE latency per forward: N forwards chained inside one jit call
   (output phi re-enters as the next observation -- same shape/dtype), so
   (t_N - t_1)/(N - 1) cancels the round trip.  This is the batch-1 latency
   a non-tunnel deployment would see.

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/latency_net.py \
       [--g-mode chebyshev] [--cheb-degree 48] [--cheb-precision highest]
"""
import argparse
import json
import time

p = argparse.ArgumentParser()
p.add_argument("--g-mode", default="chebyshev")
p.add_argument("--cheb-degree", type=int, default=48)
p.add_argument("--cheb-precision", default="highest")
p.add_argument("--layers", type=int, default=10)
p.add_argument("--runs", type=int, default=50)
p.add_argument("--chain", type=int, default=8)
args = p.parse_args()

import numpy as np
import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import ModelConfig, ProblemSpec
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.models import PhiEstADMMNet
from admmnet_tpu.utils.host import cjit

mcfg = ModelConfig(
    spec=ProblemSpec(), num_layers=args.layers, g_mode=args.g_mode,
    cheb_degree=args.cheb_degree, cheb_precision=args.cheb_precision,
)
model = PhiEstADMMNet(cfg=mcfg)
y, b, sigma = make_anchor_batch(1, mode="redemod", seed=0)
params = cjit(lambda k, y, b, s: model.init(k, y, b, s))(
    jax.random.PRNGKey(0), y, b, sigma
)


def med(times):
    return float(np.median(times) * 1e3)


# 1. tunnel floor
floor_fn = cjit(lambda x: jnp.sum(x + 1.0))
x8 = np.zeros(8, np.float32)
float(floor_fn(x8))
ts = []
for _ in range(args.runs):
    t0 = time.time()
    float(floor_fn(x8))
    ts.append(time.time() - t0)
floor_ms = med(ts)
print(f"tunnel floor: median {floor_ms:.2f} ms", flush=True)


def chained(n):
    def fn(p, y, b, s):
        phi = y
        for _ in range(n):
            phi = model.apply(p, phi, b, s)
        return jnp.sum(jnp.abs(phi))

    f = cjit(fn)
    float(f(params, y, b, sigma))  # compile
    ts = []
    for _ in range(max(10, args.runs // 2)):
        t0 = time.time()
        float(f(params, y, b, sigma))
        ts.append(time.time() - t0)
    return med(ts)


t1 = chained(1)
tN = chained(args.chain)
dev_ms = (tN - t1) / (args.chain - 1)
print(json.dumps({
    "g_mode": args.g_mode,
    "cheb_degree": args.cheb_degree,
    "cheb_precision": args.cheb_precision,
    "layers": args.layers,
    "tunnel_floor_ms": round(floor_ms, 3),
    "host_observed_forward_ms": round(t1, 3),
    "device_forward_ms": round(dev_ms, 3),
    "chain": args.chain,
}))
