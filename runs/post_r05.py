"""Round-5 depth follow-ups (one consolidated session):

A. fused_exact batch stability: the exact-mode pin is B=2048; measure
   B=8192 to confirm per-instance throughput is batch-stable (the fused
   kernel's grid just grows).
B. Batch-1 DEVICE latency of the classical deploy pipeline (budget-10
   solve + PRODUCTION_PEAKS): the tunnel floor (~27.7 ms) hides batch-1
   latency, so chain 8 pipeline evaluations inside one jit (output peaks
   re-seed the next observation's noise scale) and report (t_8 - t_1)/7 --
   the round-3 chained-latency protocol (RESULTS 3, measure_r03b B).
C. Training FORWARD-only loss eval at B=256 (both Clenshaw engines); the
   full-step numbers live in results/r05/train_kernel_r05.json -- together
   they decompose the step into forward vs backward+optimizer
   (RESULTS 3.10).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/post_r05.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import (
    ADMMOptions,
    DataConfig,
    DETECTION_BUDGET_ITERS,
    ModelConfig,
    PRODUCTION_PEAKS,
    ProblemSpec,
    TrainConfig,
)
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.peaks import find_peaks
from admmnet_tpu.solver import admm_solve_fixed
from admmnet_tpu.utils import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {}

# --- A. fused_exact at B=8192 ---
y8, b8, s8 = make_anchor_batch(8192, mode="redemod", seed=0)
_st = cjit(lambda yy, bb, ss: (yy * 1.0, bb * 1.0, ss * 1.0))
y8d, b8d, s8d = _st(y8, b8, s8)
fx = cjit(lambda yy, bb, ss: jnp.sum(jnp.abs(admm_solve_fixed(
    yy, bb, ss, 100, 1.0, ADMMOptions(g_update="fused_exact")))))
fetch = device_retry(lambda: float(fx(y8d, b8d, s8d)), attempts=2,
                     cooldown_s=120)
t0 = time.time()
fetch()
comp = time.time() - t0
best = np.inf
for _ in range(3):
    t0 = time.time()
    fetch()
    best = min(best, time.time() - t0)
OUT["fused_exact_b8192"] = {"iter_s": round(8192 * 100 / best, 1),
                            "best_run_s": round(best, 3),
                            "compile_s": round(comp, 1)}
print(f"[fused_exact_b8192] {OUT['fused_exact_b8192']}", flush=True)

# --- B. batch-1 device latency of the deploy pipeline ---
y1, b1_, s1 = make_anchor_batch(1, mode="redemod", seed=0)
y1d, b1d, s1d = _st(y1, b1_, s1)
opts = ADMMOptions(g_update="fused_fast")


def _pipe_once(yy, bb, ss):
    pk = find_peaks(admm_solve_fixed(yy, bb, ss, DETECTION_BUDGET_ITERS,
                                     1.0, opts), 10, 10, PRODUCTION_PEAKS)
    return pk


def chain(n):
    def run(yy, bb, ss):
        acc = 0.0
        for i in range(n):
            pk = _pipe_once(yy, bb, ss)
            acc = acc + jnp.sum(jnp.where(pk.valid, pk.height, 0.0))
            # feed a peak-dependent perturbation back so the chain is
            # serial on device (no overlap) without changing the solve
            yy = yy + (1e-12 * acc).astype(yy.dtype)
        return acc
    return cjit(run)


f1_ = chain(1)
f8_ = chain(8)
for f in (f1_, f8_):
    device_retry(lambda f=f: float(f(y1d, b1d, s1d)), attempts=2,
                 cooldown_s=120)()
best1 = np.inf
best8 = np.inf
for _ in range(5):
    t0 = time.time()
    float(f1_(y1d, b1d, s1d))
    best1 = min(best1, time.time() - t0)
    t0 = time.time()
    float(f8_(y1d, b1d, s1d))
    best8 = min(best8, time.time() - t0)
dev_ms = (best8 - best1) / 7 * 1e3
OUT["deploy_batch1_latency"] = {
    "host_observed_1x_ms": round(best1 * 1e3, 2),
    "host_observed_8x_ms": round(best8 * 1e3, 2),
    "device_ms_per_pipeline": round(dev_ms, 3),
}
print(f"[deploy_batch1_latency] {OUT['deploy_batch1_latency']}", flush=True)

# --- C. training-step decomposition ---
from admmnet_tpu.models import ADMMNet
from admmnet_tpu.train.trainer import build_steps, make_optimizer

raw = generate_batch(jax.random.PRNGKey(7), DataConfig(), 256)
for impl in ("xla", "pallas"):
    mcfg = ModelConfig(spec=ProblemSpec(), num_layers=10, g_mode="chebyshev",
                       head="spectrum", cheb_impl=impl)
    model = ADMMNet(cfg=mcfg)
    p0 = cjit(lambda k, yy, bb, ss: model.init(k, yy, bb, ss))(
        jax.random.PRNGKey(0), raw["y"][:2], raw["b"][:2], raw["sigma"][:2])
    tx = make_optimizer(TrainConfig(), steps_per_epoch=27)
    _, eval_step = build_steps(model, tx, "e2e", assignment="perm",
                               spectral_weight=0.5)
    fwd = cjit(lambda p, b=raw: eval_step(p, b)[0])
    fetchf = device_retry(lambda: float(fwd(p0)), attempts=2, cooldown_s=120)
    fetchf()
    bestf = np.inf
    for _ in range(3):
        t0 = time.time()
        fetchf()
        bestf = min(bestf, time.time() - t0)
    OUT[f"decomp_{impl}"] = {"fwd_loss_s": round(bestf, 4)}
    print(f"[decomp_{impl}] {OUT[f'decomp_{impl}']}", flush=True)

print(json.dumps(OUT))
with open("results/r05/post_r05.json", "w") as f:
    json.dump(OUT, f, indent=2)
