"""TPU microbench: fast polar PSD kernel, bf16 iterate storage on/off.

Protocol matches RESULTS.md section 3.5: B matrices 101x101 Hermitian
complex64, timed loop of `iters` sequential projections (each feeding the
next so nothing is dead-code-eliminated), completion barrier = host fetch of
a real scalar (block_until_ready does not block on this backend).
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from admmnet_tpu.kernels.polar import psd_project_polar_pallas
from admmnet_tpu.utils.host import cjit
from admmnet_tpu.utils.retry import device_retry

B = int(os.environ.get("B", 2048))
ITERS = int(os.environ.get("ITERS", 20))
REPEATS = int(os.environ.get("REPEATS", 3))
M_DIM = 101

rng = np.random.default_rng(0)
A = rng.normal(size=(B, M_DIM, M_DIM)) + 1j * rng.normal(size=(B, M_DIM, M_DIM))
Mh = ((A + A.conj().transpose(0, 2, 1)) / 2).astype(np.complex64)


def chain(M, bf16_store):
    def body(X, _):
        P = psd_project_polar_pallas(
            X, mode="fast", hi_steps=0, bf16_store=bf16_store
        )
        # tiny perturbation so the next projection is not a fixed point
        X = P - 0.01 * jnp.eye(M_DIM, dtype=P.dtype)
        return X, None

    X, _ = jax.lax.scan(body, M, None, length=ITERS)
    return jnp.sum(jnp.abs(X)).astype(jnp.float32)


for bf16_store in (False, True):
    fn = cjit(functools.partial(chain, bf16_store=bf16_store))
    # warm-up / compile
    s = device_retry(lambda: float(fn(Mh)))()
    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        s = device_retry(lambda: float(fn(Mh)))()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(
            f"bf16_store={bf16_store} rep{r}: {dt:.3f}s "
            f"({B*ITERS/dt:.0f} proj/s)  checksum={s:.4e}",
            flush=True,
        )
    print(
        f"bf16_store={bf16_store} BEST: {B*ITERS/best:.0f} projections/s",
        flush=True,
    )
