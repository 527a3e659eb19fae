"""TPU timing ablation of the fast polar kernel (scratch; timing only).

Variants delete parts of the per-step work (math intentionally wrong where
noted) to locate the non-MXU bottleneck.  Stable protocol: lax.scan chain of
ITERS projections over B matrices, barrier = scalar host fetch, best of
REPEATS.

Variants:
  full        -- the shipped fast schedule (baseline)
  noproj      -- skip the per-step Hermitian re-projection (2 transposes,
                 2 adds, 2 muls per step)  [wrong math]
  nopoly      -- Y = X2 instead of aI + bX2 + cX4 (removes ~6 combine ops
                 per step, keeps all 9 matmuls)  [wrong math]
  nokaradd    -- Karatsuba t3 operand adds removed (t3 = Xr@Yr)  [wrong math]
  mmonly      -- matmuls only: no combines at all beyond what feeds the
                 next matmul  [wrong math, lower bound]
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from admmnet_tpu.ops.projections import POLAR_BF16_SCHEDULE
from admmnet_tpu.utils.host import cjit
from admmnet_tpu.utils.retry import device_retry

TILE = 128
B = int(os.environ.get("B", 2048))
ITERS = int(os.environ.get("ITERS", 100))
REPEATS = int(os.environ.get("REPEATS", 3))
VARIANTS = os.environ.get("VARIANTS", "full,noproj,nopoly,mmonly").split(",")
KBLK = int(os.environ.get("KBLK", 4))


def _mm(a, b):
    return jax.lax.dot(a, b, precision=jax.lax.Precision.DEFAULT,
                       preferred_element_type=jnp.float32)


def _mmhi(a, b):
    return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _kernel(mr_ref, mi_ref, pr_ref, pi_ref, *, variant, kblk):
    K = kblk
    Mr = [mr_ref[k] for k in range(K)]
    Mi = [mi_ref[k] for k in range(K)]
    inv = [
        1.0 / jnp.maximum(jnp.sqrt(jnp.sum(Mr[k] * Mr[k]) + jnp.sum(Mi[k] * Mi[k])), 1e-30)
        for k in range(K)
    ]
    Xr = [Mr[k] * inv[k] for k in range(K)]
    Xi = [Mi[k] * inv[k] for k in range(K)]
    eye = jnp.eye(TILE, dtype=jnp.float32)

    for a, b, c in POLAR_BF16_SCHEDULE:
        XrXi = [_mm(Xr[k], Xi[k]) for k in range(K)]
        X2r = [_mm(Xr[k], Xr[k]) - _mm(Xi[k], Xi[k]) for k in range(K)]
        X2i = [XrXi[k] - XrXi[k].T for k in range(K)]
        X2rX2i = [_mm(X2r[k], X2i[k]) for k in range(K)]
        X4r = [_mm(X2r[k], X2r[k]) - _mm(X2i[k], X2i[k]) for k in range(K)]
        X4i = [X2rX2i[k] - X2rX2i[k].T for k in range(K)]
        if variant in ("nopoly", "mmonly"):
            Yr, Yi = X4r, X4i
        else:
            Yr = [a * eye + b * X2r[k] + c * X4r[k] for k in range(K)]
            Yi = [b * X2i[k] + c * X4i[k] for k in range(K)]
        t1 = [_mm(Xr[k], Yr[k]) for k in range(K)]
        t2 = [_mm(Xi[k], Yi[k]) for k in range(K)]
        if variant in ("nokaradd", "mmonly"):
            t3 = [_mm(Xr[k], Yr[k]) for k in range(K)]
        else:
            t3 = [_mm(Xr[k] + Xi[k], Yr[k] + Yi[k]) for k in range(K)]
        if variant == "mmonly":
            Xr, Xi = t1, t2
        else:
            Xr = [t1[k] - t2[k] for k in range(K)]
            Xi = [t3[k] - t1[k] - t2[k] for k in range(K)]
        if variant not in ("noproj", "mmonly"):
            Xr = [0.5 * (Xr[k] + Xr[k].T) for k in range(K)]
            Xi = [0.5 * (Xi[k] - Xi[k].T) for k in range(K)]
    t1 = [_mmhi(Xr[k], Mr[k]) for k in range(K)]
    t2 = [_mmhi(Xi[k], Mi[k]) for k in range(K)]
    t3 = [_mmhi(Xr[k] + Xi[k], Mr[k] + Mi[k]) for k in range(K)]
    for k in range(K):
        Ar = t1[k] - t2[k]
        Ai = t3[k] - t1[k] - t2[k]
        Ar = 0.5 * (Ar + Ar.T)
        Ai = 0.5 * (Ai - Ai.T)
        Pr = 0.5 * (Mr[k] + Ar)
        Pi = 0.5 * (Mi[k] + Ai)
        pr_ref[k] = 0.5 * (Pr + Pr.T)
        pi_ref[k] = 0.5 * (Pi - Pi.T)


@functools.partial(jax.jit, static_argnames=("variant", "kblk"))
def project(Mr, Mi, variant="full", kblk=4):
    Bn = Mr.shape[0]
    kernel = functools.partial(_kernel, variant=variant, kblk=kblk)
    spec = pl.BlockSpec((kblk, TILE, TILE), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(Bn // kblk,), in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((Bn, TILE, TILE), jnp.float32)] * 2,
    )(Mr, Mi)


@jax.jit
def _gen(key):
    a = jax.random.normal(key, (B, TILE, TILE), jnp.float32)
    b_ = jax.random.normal(jax.random.fold_in(key, 1), (B, TILE, TILE), jnp.float32)
    return (a + a.transpose(0, 2, 1)) / 2, (b_ - b_.transpose(0, 2, 1)) / 2


# device-resident inputs: the tunnel transfer of host matrices costs ~6 s
# per call and swamps the kernel timing otherwise
Mr0, Mi0 = _gen(jax.random.PRNGKey(0))


def chain(Mr, Mi, variant, kblk=None):
    def body(carry, _):
        r, i = carry
        Pr, Pi = project(r, i, variant=variant, kblk=kblk or KBLK)
        if os.environ.get("NOEYE") == "1":
            return (Pr, Pi), None
        return (Pr - 0.01 * jnp.eye(TILE), Pi), None

    (r, i), _ = jax.lax.scan(body, (Mr, Mi), None, length=ITERS)
    return jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(i))


KBLKS = [int(k) for k in os.environ.get("KBLKS", str(KBLK)).split(",")]
for v in VARIANTS:
  for KBLK in KBLKS:
    fn = jax.jit(functools.partial(chain, variant=v, kblk=KBLK))
    s = device_retry(lambda: float(fn(Mr0, Mi0)))()
    best = np.inf
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        s = device_retry(lambda: float(fn(Mr0, Mi0)))()
        best = min(best, time.perf_counter() - t0)
    print(f"{v:10s} K={KBLK:3d}: best {best:.3f}s = {B*ITERS/best:.0f} proj/s "
          f"({best/ITERS*1000:.2f} ms/iter)", flush=True)
