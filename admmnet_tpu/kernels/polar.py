"""Pallas TPU kernel: fused minimax-quintic polar PSD projection.

The PSD step is ~94% of classical-solve time (profiled; see solver/admm.py).
The XLA path streams every intermediate of every polynomial step through HBM;
this kernel keeps the whole 7-step schedule resident in VMEM per matrix:

- grid over the instance batch, one (padded) matrix per program;
- complex arrives as separate real/imag f32 planes (the MXU has no complex
  type, and the host boundary cannot carry complex on this backend anyway);
- Hermitian structure cuts matmuls: for Hermitian X (Xr symmetric, Xi
  antisymmetric), X^2 costs 3 real matmuls with one transpose reuse
  (X2i = XrXi - (XrXi)^T), and a general product of commuting Hermitians
  uses the 3-matmul Karatsuba form;
- matrices are zero-padded 101 -> 128 (MXU tile); zero eigenvalues are fixed
  points of the sign schedule so padding is exact.

Cost per matrix per call: ~66 real 128^3 matmuls (~0.28 GFLOP), fully
MXU-resident; HBM traffic is one load + one store of the matrix planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from admmnet_tpu.ops.projections import (
    POLAR_BF16_POLISH,
    POLAR_BF16_SCHEDULE,
    POLAR_QUINTIC_SCHEDULE,
)

TILE = 128

# MXU matmul precision: DEFAULT is one-pass bf16 (relative error ~4e-3 --
# measured as ~0.13 absolute on unit-normal 128x128 products, which breaks
# the sign iteration's tail).  HIGHEST is the 6-pass f32-equivalent.  The
# sign iteration is self-correcting, so early steps run in fast bf16 and
# only the last ``hi_steps`` plus the final |M| product pay for HIGHEST.


def _mm(a, b, hi, out_dtype=jnp.float32):
    # Mosaic requires a 32-bit matmul accumulator; bf16 results are produced
    # by a post-cast (one VPU op) rather than a narrow accumulator.
    out = jax.lax.dot(
        a, b,
        precision=jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    return out if out_dtype == jnp.float32 else out.astype(out_dtype)


def _polar_kernel(
    mr_ref, mi_ref, pr_ref, pi_ref, *, schedule, hi_steps, kblk, bf16_store
):
    """``kblk`` independent chains per program, interleaved op-by-op.

    A single 128^3 matmul chain is dependency-bound on the MXU; issuing the
    same op for kblk independent matrices back-to-back fills the pipeline
    (measured on v5e: K=4 is ~1.19x K=1 on the pure projection)."""
    K = kblk
    Mr = [mr_ref[k] for k in range(K)]
    Mi = [mi_ref[k] for k in range(K)]

    # Frobenius norm >= spectral norm: scale spectrum into [-1, 1]
    inv = [
        1.0
        / jnp.maximum(
            jnp.sqrt(jnp.sum(Mr[k] * Mr[k]) + jnp.sum(Mi[k] * Mi[k])), 1e-30
        )
        for k in range(K)
    ]
    # bf16 iterate storage: the low-precision steps already read operands
    # through a one-pass-bf16 MXU multiply, so keeping X itself in bf16 loses
    # nothing the matmul had not already rounded away -- while the VPU work
    # that dominates the fast schedule (polynomial combines, Hermitian
    # re-projection transposes) runs at 2x lanes and half the vreg traffic.
    lo = jnp.bfloat16 if bf16_store else jnp.float32
    Xr = [(Mr[k] * inv[k]).astype(lo) for k in range(K)]
    Xi = [(Mi[k] * inv[k]).astype(lo) for k in range(K)]

    nsteps = len(schedule)
    for s, (a, b, c) in enumerate(schedule):
        hi = s >= nsteps - hi_steps
        dt = jnp.float32 if hi else lo
        if Xr[0].dtype != dt:  # low->high transition: promote the iterate
            Xr = [x.astype(dt) for x in Xr]
            Xi = [x.astype(dt) for x in Xi]
        eye = jnp.eye(TILE, dtype=dt)
        a, b, c = dt(a), dt(b), dt(c)
        # X2 = X @ X for Hermitian X: X2r = XrXr - XiXi (symmetric),
        # X2i = XrXi + XiXr = XrXi - (XrXi)^T (antisymmetric)  [3 matmuls]
        XrXi = [_mm(Xr[k], Xi[k], hi, dt) for k in range(K)]
        X2r = [
            _mm(Xr[k], Xr[k], hi, dt) - _mm(Xi[k], Xi[k], hi, dt)
            for k in range(K)
        ]
        X2i = [XrXi[k] - XrXi[k].T for k in range(K)]
        # X4 = X2 @ X2 likewise  [3 matmuls]
        X2rX2i = [_mm(X2r[k], X2i[k], hi, dt) for k in range(K)]
        X4r = [
            _mm(X2r[k], X2r[k], hi, dt) - _mm(X2i[k], X2i[k], hi, dt)
            for k in range(K)
        ]
        X4i = [X2rX2i[k] - X2rX2i[k].T for k in range(K)]
        # Y = a I + b X2 + c X4 (Hermitian, commutes with X)
        Yr = [a * eye + b * X2r[k] + c * X4r[k] for k in range(K)]
        Yi = [b * X2i[k] + c * X4i[k] for k in range(K)]
        # X <- X @ Y, Karatsuba: 3 matmuls
        t1 = [_mm(Xr[k], Yr[k], hi, dt) for k in range(K)]
        t2 = [_mm(Xi[k], Yi[k], hi, dt) for k in range(K)]
        t3 = [
            _mm(Xr[k] + Xi[k], Yr[k] + Yi[k], hi, dt) for k in range(K)
        ]
        Xr = [t1[k] - t2[k] for k in range(K)]
        Xi = [t3[k] - t1[k] - t2[k] for k in range(K)]
        if not hi:
            # One-pass-bf16 noise breaks Hermitian symmetry; left unchecked
            # the iterate drifts non-normal and the polynomial recursion has
            # unbounded transient growth (measured: NaN within ~8 steps).
            # Re-projecting onto the Hermitian subspace each low-precision
            # step keeps the spectral box argument valid.  Costs transposes
            # and adds, no extra matmuls.
            half = dt(0.5)
            Xr = [half * (Xr[k] + Xr[k].T) for k in range(K)]
            Xi = [half * (Xi[k] - Xi[k].T) for k in range(K)]
    if Xr[0].dtype != jnp.float32:
        Xr = [x.astype(jnp.float32) for x in Xr]
        Xi = [x.astype(jnp.float32) for x in Xi]
    # S = sign(M)/norm-domain; |M| = (S M + M S)/2 in original scale.
    # S commutes with M so S@M is Hermitian: compute once, symmetrize.
    t1 = [_mm(Xr[k], Mr[k], True) for k in range(K)]
    t2 = [_mm(Xi[k], Mi[k], True) for k in range(K)]
    t3 = [_mm(Xr[k] + Xi[k], Mr[k] + Mi[k], True) for k in range(K)]
    for k in range(K):
        Ar = t1[k] - t2[k]
        Ai = t3[k] - t1[k] - t2[k]
        Ar = 0.5 * (Ar + Ar.T)
        Ai = 0.5 * (Ai - Ai.T)
        # P = (M + |M|)/2, Hermitian-symmetrized
        Pr = 0.5 * (Mr[k] + Ar)
        Pi = 0.5 * (Mi[k] + Ai)
        pr_ref[k] = 0.5 * (Pr + Pr.T)
        pi_ref[k] = 0.5 * (Pi - Pi.T)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "hi_steps", "kblk", "mode", "bf16_store"),
)
def psd_project_polar_pallas(
    M: jnp.ndarray, interpret: bool = False, hi_steps: int | None = None,
    kblk: int = 4, mode: str = "accurate", bf16_store: bool = False,
) -> jnp.ndarray:
    """PSD projection of batched Hermitian complex64 (..., m, m), m <= 128.

    Drop-in replacement for ops.projections.psd_project_polar on TPU.

    ``mode="accurate"``: the 7-step minimax schedule, all steps HIGHEST
    (6-pass f32-equivalent matmuls).  NOTE running THIS schedule with
    hi_steps < 7 diverges: its polynomials explode outside the fitted band,
    amplifying one-pass-bf16 noise out of the sign basin (measured rel err
    ~2e2).
    ``mode="fast"``: POLAR_BF16_SCHEDULE -- box-constrained two-phase fit
    that is bf16-stable: all 6 steps run at one-pass Mosaic DEFAULT with
    per-step Hermitian re-projection (the final |M| products stay HIGHEST).
    5.5x fewer MXU passes; |M| relative error ~3.1e-3 (eigenvalues under
    ~3e-3*||M||_F are written off at the noise floor).  ``hi_steps=1``
    appends the POLAR_BF16_POLISH step at HIGHEST (~2.7e-3, 3.1x).  See
    ops/fit_polar_schedule.fit_bf16_schedule for the derivation.

    ``kblk``: independent matrices per grid program (MXU pipeline filling);
    the batch is zero-padded up to a multiple (zero is a fixed point).
    """
    if mode == "fast":
        hi_steps = 0 if hi_steps is None else hi_steps
        schedule = POLAR_BF16_SCHEDULE + (
            (POLAR_BF16_POLISH,) if hi_steps >= 1 else ()
        )
    else:
        schedule = POLAR_QUINTIC_SCHEDULE
        hi_steps = len(schedule) if hi_steps is None else hi_steps
    batch_shape = M.shape[:-2]
    m = M.shape[-1]
    M = M.reshape(-1, m, m)
    B0 = M.shape[0]
    kblk = min(kblk, max(1, B0))
    B = (B0 + kblk - 1) // kblk * kblk
    Mr = jnp.real(M)
    Mi = jnp.imag(M)
    pad = ((0, B - B0), (0, TILE - m), (0, TILE - m))
    Mr = jnp.pad(Mr, pad)
    Mi = jnp.pad(Mi, pad)

    kernel = functools.partial(
        _polar_kernel, schedule=schedule, hi_steps=hi_steps, kblk=kblk,
        bf16_store=bf16_store and mode == "fast",
    )
    spec = pl.BlockSpec(
        (kblk, TILE, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    Pr, Pi = pl.pallas_call(
        kernel,
        grid=(B // kblk,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, TILE, TILE), jnp.float32),
            jax.ShapeDtypeStruct((B, TILE, TILE), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * (9 * len(schedule) + 3) * 2 * TILE**3,
            bytes_accessed=B * 4 * TILE * TILE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Mr, Mi)
    out = (Pr[:B0, :m, :m] + 1j * Pi[:B0, :m, :m]).astype(jnp.complex64)
    return out.reshape(*batch_shape, m, m)
