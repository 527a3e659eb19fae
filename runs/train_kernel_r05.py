"""Round-5 task: training through the fused Clenshaw kernel (VERDICT r4
missing-3).

kernels/cheb_filter.py got a custom VJP (reversible checkpoint-free Pallas
backward, 3-pass split-bf16 matmuls) in round 5, so cheb_impl="pallas" now
trains.  This measures, on hardware:

  A. filter-level fwd+bwd: value_and_grad of a scalar loss through the
     spectral filter at B=2048, degree 48 -- XLA-HIGHEST engine (the
     rounds-1-4 training path) vs the pallas custom-VJP engine.
  B. trainer-level step time at B=256 (reference train.py:158-219 scope):
     full ADMMNet-10 chebyshev e2e train_step (value_and_grad + AdamW
     update), both engines.
  C. loss trajectory: 10 identical steps from the same init/batches, both
     engines, recorded side by side (expect tracking within the one-pass/
     3-pass noise band, not bitwise -- the engines' matmul tiers differ
     by construction, the same chaotic-divergence regime as RESULTS 3.4).

Run: PYTHONPATH=/root/.axon_site:/root/repo python runs/train_kernel_r05.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.core.config import (
    DataConfig,
    ModelConfig,
    ProblemSpec,
    TrainConfig,
)
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.models import ADMMNet
from admmnet_tpu.train.trainer import build_steps, make_optimizer
from admmnet_tpu.utils import cjit, to_host
from admmnet_tpu.utils.retry import device_retry

OUT = {}

# --- A. filter-level fwd+bwd, B=2048 ---
from admmnet_tpu.kernels.cheb_filter import apply_spectral_filter_pallas
from admmnet_tpu.ops.chebyshev import apply_spectral_filter

rng = np.random.default_rng(0)
B, m = 2048, 101
X = rng.normal(size=(B, m, m)) + 1j * rng.normal(size=(B, m, m))
M_np = ((X + np.conj(np.swapaxes(X, -1, -2))) / 2).astype(np.complex64)

_stageM = cjit(lambda mr, mi: (mr * 1.0, mi * 1.0))
Mr_d, Mi_d = _stageM(M_np.real.copy(), M_np.imag.copy())


def _loss_filter(mr, mi, use_pallas):
    M = (mr + 1j * mi).astype(jnp.complex64)

    def f(w):
        return jax.nn.softplus(w - 0.3) * jax.nn.sigmoid(w)

    if use_pallas:
        out = apply_spectral_filter_pallas(M, f, degree=48, kblk=8)
    else:
        out = apply_spectral_filter(M, f, degree=48)
    return jnp.sum(jnp.abs(out) ** 2)


for name, up in (("filter_xla_highest", False), ("filter_pallas_vjp", True)):
    g = cjit(lambda mr, mi, up=up: jax.value_and_grad(
        lambda mr: _loss_filter(mr, mi, up))(mr)[1].sum())
    fetch = device_retry(lambda g=g: float(g(Mr_d, Mi_d)), attempts=2,
                         cooldown_s=120)
    t0 = time.time()
    fetch()
    comp = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    OUT[name] = {"fwd_bwd_s_per_2048": round(best, 4),
                 "compile_s": round(comp, 1)}
    print(f"[{name}] {OUT[name]}", flush=True)

# --- B/C. trainer-level step at B=256 ---
raw = generate_batch(jax.random.PRNGKey(7), DataConfig(), 512)
batch1 = {k: v[:256] for k, v in raw.items()}
batch2 = {k: v[256:] for k, v in raw.items()}

for impl in ("xla", "pallas"):
    mcfg = ModelConfig(spec=ProblemSpec(), num_layers=10, g_mode="chebyshev",
                       head="spectrum", cheb_impl=impl)
    model = ADMMNet(cfg=mcfg)
    p0 = cjit(lambda k, yy, bb, ss: model.init(k, yy, bb, ss))(
        jax.random.PRNGKey(0), batch1["y"][:2], batch1["b"][:2],
        batch1["sigma"][:2])
    tx = make_optimizer(TrainConfig(), steps_per_epoch=27)
    o0 = tx.init(p0)
    train_step, _ = build_steps(model, tx, "e2e", assignment="perm",
                                spectral_weight=0.5)

    def one_step(p, o, b1=batch1):
        p2, o2, t = train_step(p, o, b1, jax.random.PRNGKey(1))
        # touch updated params so the optimizer update is not DCE'd
        pn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(p2))
        return t, pn

    fs_ = cjit(one_step)
    fetch = device_retry(
        lambda: tuple(float(x) for x in fs_(p0, o0)), attempts=2,
        cooldown_s=120)
    t0 = time.time()
    fetch()
    comp = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    OUT[f"step_{impl}"] = {"step_s_b256": round(best, 4),
                           "compile_s": round(comp, 1)}
    print(f"[step_{impl}] {OUT[f'step_{impl}']}", flush=True)

    def traj(p, o):
        losses = []
        for i in range(10):
            b = batch1 if i % 2 == 0 else batch2
            p, o, t = train_step(p, o, b, jax.random.PRNGKey(i))
            losses.append(t)
        return jnp.stack(losses)

    ft = cjit(traj)
    tr = device_retry(lambda: to_host(ft(p0, o0)), attempts=2,
                      cooldown_s=120)()
    OUT[f"traj_{impl}"] = [float(f"{v:.6f}") for v in np.asarray(tr)]
    print(f"[traj_{impl}] {OUT[f'traj_{impl}']}", flush=True)

x, p = np.array(OUT["traj_xla"]), np.array(OUT["traj_pallas"])
OUT["traj_max_rel_diff"] = float(f"{np.max(np.abs(x - p) / np.abs(x)):.4e}")
OUT["step_speedup"] = round(
    OUT["step_xla"]["step_s_b256"] / OUT["step_pallas"]["step_s_b256"], 3)
print(json.dumps(OUT))
with open("results/r05/train_kernel_r05.json", "w") as f:
    json.dump(OUT, f, indent=2)
