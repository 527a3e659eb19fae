"""Pallas TPU kernel: fused one-pass Clenshaw evaluation of a learned
spectral filter (the chebyshev GLayer's matrix function, ops/chebyshev.py).

Why (round-3 verdict task: "fused net forward materially above 13k
layers/s, or a roofline argument that XLA saturates").  The roofline
argument goes the OTHER way: the XLA chebyshev trunk at HIGHEST runs a
2048-batch net-10 forward in ~1.58 s = 8.1 f32-TFLOP of Clenshaw matmuls
against a ~0.25 s all-HIGHEST MXU bound -- ~16% utilization, with ~6x more
headroom at one-pass bf16 (the polar-kernel trade the XLA path measured
NEGATIVE because its per-step Hermitian re-projection transposes stream
(B, 101, 101) arrays through HBM; RESULTS.md 3).  This kernel makes the
trade pay the way kernels/polar.py does: K-interleaved instances per
program, b1/b2 Clenshaw carries resident in VMEM, one-pass DEFAULT
matmuls in the 3-matmul Karatsuba form, and the re-projection done on
register-resident tiles.

Scope: the matrix-function evaluation only.  The filter SAMPLING (learned
threshold + value-net MLP at the Chebyshev nodes) and the coefficient
projection stay in XLA -- they are (B, degree) scalar work that carries
the learned parameters, and keeping them outside means this kernel needs
no parameter plumbing and the learned math stays bitwise identical to the
XLA path.  Inference path only (pallas_call has no reverse AD here);
training keeps the XLA evaluation.

Numerics: identical polynomial to apply_spectral_filter(precision=
DEFAULT) -- one-pass bf16 matmul noise with per-step Hermitian
re-projection; measured equivalent on detection gates (the
cheb_precision="default" experiment held F1 bit-for-bit; RESULTS.md 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _mm(a, b, hi=False):
    return jax.lax.dot(
        a, b,
        precision=jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _cheb_kernel(mr_ref, mi_ref, c_ref, rinv_ref, gr_ref, gi_ref,
                 *, kblk, degree, final_hi):
    """K interleaved Clenshaw chains: b0 = c_k I + 2 Mh b1 - b2, k = D-1..1,
    then out = c_0 I + Mh b1 - b2 (c_0 pre-halved by coefficient_matrix).

    All iterates are polynomials in the Hermitian Mh, so they are Hermitian
    in exact math; the per-step re-projection removes the one-pass noise's
    non-Hermitian component before it compounds through the 2 Mh b1
    doubling (the same stabilization as the bf16 sign schedule).
    """
    K = kblk
    eye = jnp.eye(TILE, dtype=jnp.float32)
    rinv = [rinv_ref[k, 0, 0] for k in range(K)]
    Ar = [mr_ref[k] * rinv[k] for k in range(K)]
    Ai = [mi_ref[k] * rinv[k] for k in range(K)]
    crow = [c_ref[k] for k in range(K)]  # (1, TILE) coefficient rows

    def cval(k, j):
        # (1, 1) static lane slice; broadcasts over (TILE, TILE) as a splat
        # (scalar extraction from VMEM is the shakier Mosaic path)
        return jax.lax.slice(crow[k], (0, j), (1, j + 1))

    def cmul(Br, Bi, hi=False):
        """Karatsuba complex product (Ar + i Ai) @ (Br + i Bi), K-blocked."""
        t1 = [_mm(Ar[k], Br[k], hi) for k in range(K)]
        t2 = [_mm(Ai[k], Bi[k], hi) for k in range(K)]
        t3 = [_mm(Ar[k] + Ai[k], Br[k] + Bi[k], hi) for k in range(K)]
        Pr = [t1[k] - t2[k] for k in range(K)]
        Pi = [t3[k] - t1[k] - t2[k] for k in range(K)]
        return Pr, Pi

    zero = jnp.zeros((TILE, TILE), jnp.float32)
    b1r = [zero] * K
    b1i = [zero] * K
    b2r = [zero] * K
    b2i = [zero] * K
    for step, j in enumerate(range(degree - 1, 0, -1)):
        Pr, Pi = cmul(b1r, b1i)
        b0r = [cval(k, j) * eye + 2.0 * Pr[k] - b2r[k] for k in range(K)]
        b0i = [2.0 * Pi[k] - b2i[k] for k in range(K)]
        # Hermitian re-projection (exact-math no-op; kills one-pass noise)
        b0r = [0.5 * (b0r[k] + b0r[k].T) for k in range(K)]
        b0i = [0.5 * (b0i[k] - b0i[k].T) for k in range(K)]
        b2r, b2i = b1r, b1i
        b1r, b1i = b0r, b0i
    Pr, Pi = cmul(b1r, b1i, final_hi)
    outr = [cval(k, 0) * eye + Pr[k] - b2r[k] for k in range(K)]
    outi = [Pi[k] - b2i[k] for k in range(K)]
    outr = [0.5 * (outr[k] + outr[k].T) for k in range(K)]
    outi = [0.5 * (outi[k] - outi[k].T) for k in range(K)]
    for k in range(K):
        gr_ref[k] = outr[k]
        gi_ref[k] = outi[k]


@functools.partial(
    jax.jit,
    static_argnames=("degree", "kblk", "interpret", "final_hi"),
)
def cheb_filter_matrices(
    M: jnp.ndarray,
    coeffs: jnp.ndarray,
    degree: int,
    kblk: int = 8,
    interpret: bool = False,
    final_hi: bool = False,
) -> jnp.ndarray:
    """sum_k c_k T_k(Mh) for batched Hermitian complex64 M (..., m, m).

    ``M`` is normalized INSIDE the kernel by its Frobenius norm (spectral
    bound); ``coeffs`` (..., degree) are the Chebyshev coefficients of the
    normalized-domain filter (c_0 pre-halved), computed by the caller --
    see apply_spectral_filter_pallas for the full learned-filter pipeline.
    Output is the normalized-domain result; the caller scales by r.
    """
    batch_shape = M.shape[:-2]
    m = M.shape[-1]
    M = M.reshape(-1, m, m)
    c = coeffs.reshape(-1, coeffs.shape[-1]).astype(jnp.float32)
    B0 = M.shape[0]
    kblk = min(kblk, max(1, B0))
    B = (B0 + kblk - 1) // kblk * kblk
    r = jnp.sqrt(jnp.sum(jnp.real(M) ** 2 + jnp.imag(M) ** 2, axis=(-1, -2)))
    rinv = (1.0 / jnp.maximum(r, 1e-20)).astype(jnp.float32)
    pad2 = ((0, B - B0), (0, TILE - m), (0, TILE - m))
    Mr = jnp.pad(jnp.real(M).astype(jnp.float32), pad2)
    Mi = jnp.pad(jnp.imag(M).astype(jnp.float32), pad2)
    cpad = jnp.pad(c, ((0, B - B0), (0, TILE - c.shape[-1])))[:, None, :]
    rinv = jnp.pad(rinv, ((0, B - B0),)).reshape(B, 1, 1)

    kernel = functools.partial(
        _cheb_kernel, kblk=kblk, degree=degree, final_hi=final_hi
    )
    plane = pl.BlockSpec(
        (kblk, TILE, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec(
        (kblk, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec(
        (kblk, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    # ~0.85 MB of scoped VMEM per interleaved instance (Mh/b1/b2/b0 plane
    # pairs + Karatsuba temps); the default 16 MB limit already fails at
    # kblk=16 (measured: remote compile HTTP 500), so scale it explicitly.
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=kblk * ((1 << 20) + (1 << 19)) + (16 << 20)
    )
    Gr, Gi = pl.pallas_call(
        kernel,
        grid=(B // kblk,),
        in_specs=[plane, plane, row, scal],
        out_specs=[plane, plane],
        out_shape=[jax.ShapeDtypeStruct((B, TILE, TILE), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=B * degree * 3 * 2 * TILE**3,
            bytes_accessed=B * 4 * TILE * TILE * 4,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(Mr, Mi, cpad, rinv)
    out = (Gr[:B0, :m, :m] + 1j * Gi[:B0, :m, :m]).astype(jnp.complex64)
    return out.reshape(*batch_shape, m, m)


def apply_spectral_filter_pallas(M, f, degree: int = 48, kblk: int = 8,
                                 interpret: bool = False):
    """Drop-in for ops.chebyshev.apply_spectral_filter on TPU (inference).

    Identical sampling/coefficient math (bitwise the XLA path's -- it
    carries the learned parameters); only the Clenshaw matrix recurrence
    moves into the fused kernel.  Off-TPU (and not interpreting) falls back
    to the XLA evaluation at one-pass DEFAULT precision, the numerics this
    kernel implements.
    """
    from admmnet_tpu.ops.chebyshev import (
        apply_spectral_filter,
        chebyshev_nodes,
        coefficient_matrix,
    )

    if jax.default_backend() != "tpu" and not interpret:
        return apply_spectral_filter(
            M, f, degree, precision=jax.lax.Precision.DEFAULT
        )
    r = jnp.sqrt(jnp.sum(jnp.abs(M) ** 2, axis=(-1, -2), keepdims=True))
    r = jnp.maximum(jnp.real(r), 1e-20)
    x = jnp.asarray(chebyshev_nodes(degree))
    rr = r[..., 0, 0][..., None]
    g = f(rr * x) / rr
    c = jnp.einsum("kj,...j->...k", jnp.asarray(coefficient_matrix(degree)), g)
    out = cheb_filter_matrices(M, c, degree, kblk=kblk, interpret=interpret)
    return (out * r.astype(M.dtype)).astype(M.dtype)
