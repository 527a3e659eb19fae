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
XLA path.

Training (round 5, VERDICT r4 missing-3): the kernel is differentiable
via jax.custom_vjp with a SECOND Pallas kernel for the backward pass.
The trick that makes the backward O(1) in memory: the Chebyshev
three-term recurrence is REVERSIBLE -- b_{j+2} = c_j I + 2 A b_{j+1} -
b_j -- so the forward pass only saves its final (b_1, b_2) carries (two
extra plane pairs) and the backward kernel reconstructs every forward
intermediate on the fly, walking j upward, while running the cotangent
chain (itself the same three-term recurrence on the adjoints:
bbar_{j+1} += 2 A bbar_j, bbar_{j+2} = -bbar_j) in lockstep.  Both
directions are spectrally stable (the recurrence's growth on a
normalized Hermitian A is polynomial in degree).  Backward matmuls run
at the 3-pass split-bf16 tier by default (the fused_admm_fast _mm3
trick: ~1e-5 relative per product at half the HIGHEST pass count).
Realized gradient accuracy on hardware is bounded by the FORWARD's
one-pass bf16 trajectory, not the backward tier: the backward
reconstructs the exact-arithmetic trajectory from the saved carries,
which differs from the bf16 forward's by ~1e-3-tier noise -- the same
inexactness class as training with a bf16 forward anywhere, and far
inside SGD's own noise (gate: the hardware loss-trajectory comparison,
runs/train_kernel_r05.py).

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


# 3-pass split-bf16 f32 matmul: ~1e-5 relative error per product at half
# the HIGHEST pass count -- ONE implementation, shared with the fused
# exact solve so a change to the split construction applies everywhere.
from admmnet_tpu.kernels.fused_admm_fast import _mm3  # noqa: E402


def _cheb_kernel(mr_ref, mi_ref, c_ref, rinv_ref, gr_ref, gi_ref,
                 *res_refs, kblk, degree, final_hi):
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
    if res_refs:
        # training forward: emit the final Clenshaw carries (b_1, b_2) --
        # the only residuals the reversible backward kernel needs
        b1r_ref, b1i_ref, b2r_ref, b2i_ref = res_refs
        for k in range(K):
            b1r_ref[k] = b1r[k]
            b1i_ref[k] = b1i[k]
            b2r_ref[k] = b2r[k]
            b2i_ref[k] = b2i[k]


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
    # shared padding/normalization prep: MUST stay bitwise-identical
    # between this (the custom_vjp primal), _cheb_fwd_with_residuals (the
    # vjp forward), and _cheb_bwd -- hence one helper
    Mr, Mi, cpad, rinv, B0, B, m, kblk = _pad_planes(M, coeffs, kblk)

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


def _cheb_bwd_kernel(mr_ref, mi_ref, c_ref, rinv_ref, yr_ref, yi_ref,
                     b1r_ref, b1i_ref, b2r_ref, b2i_ref,
                     ar_ref, ai_ref, cb_ref,
                     *, kblk, degree, three_pass):
    """Adjoint of the Clenshaw evaluation, checkpoint-free.

    Reverse of b_j = c_j I + 2 A b_{j+1} - b_{j+2} (j = degree-1 .. 1) and
    out = c_0 I + A b_1 - b_2, using the recurrence's reversibility to
    reconstruct forward states upward from the saved (b_1, b_2):

      forward reconstruction:  b_{j+2} = c_j I + 2 A b_{j+1} - b_j
      cotangent chain:         bbar_{j+1} += 2 A^T bbar_j ; bbar_{j+2} = -bbar_j
      accumulators:            Abar += 2 bbar_j b_{j+1}^T ; cbar_j = Re tr(bbar_j)

    JAX's complex-cotangent convention is the PLAIN transpose (probed:
    vjp of A@B gives Abar = Ybar @ B^T, Bbar = A^T @ Ybar -- no
    conjugation), so the chain multiplies by A^T = conj(A) (A Hermitian)
    and the Abar products transpose without conjugating.  Outputs: Abar
    plane pair (cotangent wrt the NORMALIZED A; the M/r chain is XLA work
    outside) and the cbar coefficient row.
    """
    K = kblk
    eye = jnp.eye(TILE, dtype=jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    rinv = [rinv_ref[k, 0, 0] for k in range(K)]
    Ar = [mr_ref[k] * rinv[k] for k in range(K)]
    Ai = [mi_ref[k] * rinv[k] for k in range(K)]
    crow = [c_ref[k] for k in range(K)]

    def mm(a, b):
        return _mm3(a, b) if three_pass else _mm(a, b, True)

    def cmul(Pr, Pi, Qr, Qi):
        """Complex product (P)(Q) on K-blocked plane lists, Karatsuba."""
        t1 = [mm(Pr[k], Qr[k]) for k in range(K)]
        t2 = [mm(Pi[k], Qi[k]) for k in range(K)]
        t3 = [mm(Pr[k] + Pi[k], Qr[k] + Qi[k]) for k in range(K)]
        return ([t1[k] - t2[k] for k in range(K)],
                [t3[k] - t1[k] - t2[k] for k in range(K)])

    # cotangent of out, Hermitian-symmetrized (adjoint of the forward's
    # closing re-projection; exact-math no-op on the primal value)
    Yr = [0.5 * (yr_ref[k] + yr_ref[k].T) for k in range(K)]
    Yi = [0.5 * (yi_ref[k] - yi_ref[k].T) for k in range(K)]
    b1r = [b1r_ref[k] for k in range(K)]
    b1i = [b1i_ref[k] for k in range(K)]
    b2r = [b2r_ref[k] for k in range(K)]
    b2i = [b2i_ref[k] for k in range(K)]

    negAi = [-Ai[k] for k in range(K)]  # A^T = conj(A) for Hermitian A

    # --- init from out = c0 I + A b1 - b2 ---
    cb0 = [jnp.sum(Yr[k] * eye, axis=0, keepdims=True).sum(
        axis=1, keepdims=True) * (lane == 0).astype(jnp.float32)
        for k in range(K)]                         # (1, TILE) rows
    ABr0, ABi0 = cmul(Yr, Yi, [b1r[k].T for k in range(K)],
                      [b1i[k].T for k in range(K)])   # Y @ b1^T
    ur0, ui0 = cmul(Ar, negAi, Yr, Yi)             # bbar_1 = A^T @ Y
    vr0 = [-Yr[k] for k in range(K)]               # bbar_2 (partial)
    vi0 = [-Yi[k] for k in range(K)]

    # The sweep runs as a rolled fori_loop: Python-unrolling 47 steps of
    # 9 Karatsuba products made Mosaic's scoped-VMEM allocator keep every
    # step's temporaries live (measured 216-261 MB > the chip's 128 MB at
    # any kblk); a rolled body is bounded like the fused solve kernel's.
    def body(j, carry):
        cb, ABr, ABi, ur, ui, vr, vi, sr, si, tr, ti = carry
        is_j = (lane == j).astype(jnp.float32)     # (1, TILE)
        # cbar_j = Re tr(bbar_j), accumulated into lane j
        trv = [jnp.sum(ur[k] * eye, axis=0, keepdims=True).sum(
            axis=1, keepdims=True) for k in range(K)]  # (1, 1)
        cb = [cb[k] + trv[k] * is_j for k in range(K)]
        # Abar += 2 u @ b_{j+1}^T   (t = b_{j+1})
        Pr, Pi = cmul(ur, ui, [tr[k].T for k in range(K)],
                      [ti[k].T for k in range(K)])
        ABr = [ABr[k] + 2.0 * Pr[k] for k in range(K)]
        ABi = [ABi[k] + 2.0 * Pi[k] for k in range(K)]
        # cotangent shift: (u, v) <- (v + 2 A^T u, -u)
        Qr, Qi = cmul(Ar, negAi, ur, ui)
        ur2 = [vr[k] + 2.0 * Qr[k] for k in range(K)]
        ui2 = [vi[k] + 2.0 * Qi[k] for k in range(K)]
        vr2 = [-ur[k] for k in range(K)]
        vi2 = [-ui[k] for k in range(K)]
        # forward reconstruction: (s, t) <- (t, c_j I + 2 A t - s),
        # re-projected like the forward (exact-math Hermitian states);
        # c_j extracted by lane mask (dynamic j)
        cj = [jnp.sum(crow[k] * is_j, axis=1, keepdims=True)
              for k in range(K)]                   # (1, 1)
        Rr, Ri = cmul(Ar, Ai, tr, ti)
        tr2 = [cj[k] * eye + 2.0 * Rr[k] - sr[k] for k in range(K)]
        ti2 = [2.0 * Ri[k] - si[k] for k in range(K)]
        tr2 = [0.5 * (x + x.T) for x in tr2]
        ti2 = [0.5 * (x - x.T) for x in ti2]
        return (cb, ABr, ABi, ur2, ui2, vr2, vi2, tr, ti, tr2, ti2)

    carry = (cb0, ABr0, ABi0, ur0, ui0, vr0, vi0,
             list(b1r), list(b1i), list(b2r), list(b2i))
    # roll j = 1 .. degree-2; the final step (j = degree-1) is peeled below
    # because its cotangent/reconstruction shifts (6 of the 9 matmuls) feed
    # nothing -- only the cbar/Abar accumulators survive the loop
    carry = jax.lax.fori_loop(1, degree - 1, body, carry)
    cb, ABr, ABi, ur, ui = carry[0], carry[1], carry[2], carry[3], carry[4]
    tr, ti = carry[9], carry[10]
    if degree > 1:
        is_last = (lane == degree - 1).astype(jnp.float32)
        trv = [jnp.sum(ur[k] * eye, axis=0, keepdims=True).sum(
            axis=1, keepdims=True) for k in range(K)]
        cb = [cb[k] + trv[k] * is_last for k in range(K)]
        Pr, Pi = cmul(ur, ui, [tr[k].T for k in range(K)],
                      [ti[k].T for k in range(K)])
        ABr = [ABr[k] + 2.0 * Pr[k] for k in range(K)]
        ABi = [ABi[k] + 2.0 * Pi[k] for k in range(K)]

    for k in range(K):
        ar_ref[k] = ABr[k]
        ai_ref[k] = ABi[k]
        cb_ref[k] = cb[k]


def _pad_planes(M, coeffs, kblk):
    """Shared padding/normalization prep (forward + backward wrappers)."""
    m = M.shape[-1]
    M2 = M.reshape(-1, m, m)
    c = coeffs.reshape(-1, coeffs.shape[-1]).astype(jnp.float32)
    B0 = M2.shape[0]
    kblk = min(kblk, max(1, B0))
    B = (B0 + kblk - 1) // kblk * kblk
    r = jnp.sqrt(jnp.sum(jnp.real(M2) ** 2 + jnp.imag(M2) ** 2, axis=(-1, -2)))
    rinv = (1.0 / jnp.maximum(r, 1e-20)).astype(jnp.float32)
    pad2 = ((0, B - B0), (0, TILE - m), (0, TILE - m))
    Mr = jnp.pad(jnp.real(M2).astype(jnp.float32), pad2)
    Mi = jnp.pad(jnp.imag(M2).astype(jnp.float32), pad2)
    cpad = jnp.pad(c, ((0, B - B0), (0, TILE - c.shape[-1])))[:, None, :]
    rinv_p = jnp.pad(rinv, ((0, B - B0),)).reshape(B, 1, 1)
    return Mr, Mi, cpad, rinv_p, B0, B, m, kblk


@functools.partial(
    jax.jit, static_argnames=("degree", "kblk", "interpret", "final_hi"),
)
def _cheb_fwd_with_residuals(M, coeffs, degree, kblk=8, interpret=False,
                             final_hi=False):
    """Forward Clenshaw + the (b_1, b_2) carries as padded residual planes."""
    batch_shape = M.shape[:-2]
    Mr, Mi, cpad, rinv, B0, B, m, kblk = _pad_planes(M, coeffs, kblk)
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
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=kblk * ((1 << 20) + (1 << 19)) + (16 << 20)
    )
    Gr, Gi, b1r, b1i, b2r, b2i = pl.pallas_call(
        kernel,
        grid=(B // kblk,),
        in_specs=[plane, plane, row, scal],
        out_specs=[plane] * 6,
        out_shape=[jax.ShapeDtypeStruct((B, TILE, TILE), jnp.float32)] * 6,
        compiler_params=compiler_params,
        interpret=interpret,
    )(Mr, Mi, cpad, rinv)
    out = (Gr[:B0, :m, :m] + 1j * Gi[:B0, :m, :m]).astype(jnp.complex64)
    return out.reshape(*batch_shape, m, m), (b1r, b1i, b2r, b2i)


@functools.partial(
    jax.jit, static_argnames=("degree", "kblk", "interpret", "three_pass"),
)
def _cheb_bwd(M, coeffs, res, gbar, degree, kblk=8, interpret=False,
              three_pass=True):
    """VJP wrt (M, coeffs) of the normalized-domain Clenshaw output."""
    batch_shape = M.shape[:-2]
    Mr, Mi, cpad, rinv, B0, B, m, kblk = _pad_planes(M, coeffs, kblk)
    b1r, b1i, b2r, b2i = res
    g2 = gbar.reshape(-1, m, m)
    pad2 = ((0, B - B0), (0, TILE - m), (0, TILE - m))
    Yr = jnp.pad(jnp.real(g2).astype(jnp.float32), pad2)
    Yi = jnp.pad(jnp.imag(g2).astype(jnp.float32), pad2)
    kernel = functools.partial(
        _cheb_bwd_kernel, kblk=kblk, degree=degree, three_pass=three_pass
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
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=kblk * (2 << 20) + (16 << 20)
    )
    ABr, ABi, cb = pl.pallas_call(
        kernel,
        grid=(B // kblk,),
        in_specs=[plane, plane, row, scal, plane, plane,
                  plane, plane, plane, plane],
        out_specs=[plane, plane, row],
        out_shape=[jax.ShapeDtypeStruct((B, TILE, TILE), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((B, 1, TILE), jnp.float32)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(Mr, Mi, cpad, rinv, Yr, Yi, b1r, b1i, b2r, b2i)
    Abar = (ABr[:B0, :m, :m] + 1j * ABi[:B0, :m, :m]).astype(jnp.complex64)
    Abar = Abar.reshape(*batch_shape, m, m)
    # chain through the normalization A = M / max(||M||_F, eps) (XLA), in
    # JAX's plain-transpose complex convention (probed against jax.vjp of
    # the same function): Mbar = rinv (Abar - Re(sum Abar*A) conj(A))
    r = jnp.sqrt(jnp.sum(jnp.abs(M) ** 2, axis=(-1, -2), keepdims=True))
    rinv0 = (1.0 / jnp.maximum(jnp.real(r), 1e-20)).astype(M.dtype)
    A = M * rinv0
    inner = jnp.sum(
        jnp.real(Abar * A), axis=(-1, -2), keepdims=True
    ).astype(M.dtype)
    Mbar = (Abar - inner * jnp.conj(A)) * rinv0
    cbar = cb[:B0, 0, :coeffs.shape[-1]].reshape(coeffs.shape)
    return Mbar, cbar.astype(coeffs.dtype)


@functools.lru_cache(maxsize=None)
def _cheb_ad(degree, kblk, interpret, three_pass):
    """custom_vjp wrapper around the fused Clenshaw for a static config."""

    @jax.custom_vjp
    def f(M, coeffs):
        return cheb_filter_matrices(M, coeffs, degree, kblk=kblk,
                                    interpret=interpret)

    def fwd(M, coeffs):
        out, res = _cheb_fwd_with_residuals(M, coeffs, degree, kblk=kblk,
                                            interpret=interpret)
        return out, (M, coeffs, res)

    def bwd(saved, gbar):
        M, coeffs, res = saved
        return _cheb_bwd(M, coeffs, res, gbar, degree, kblk=kblk,
                         interpret=interpret, three_pass=three_pass)

    f.defvjp(fwd, bwd)
    return f


def cheb_filter_matrices_ad(M, coeffs, degree: int, kblk: int = 8,
                            interpret: bool = False,
                            bwd_three_pass: bool = True):
    """Differentiable fused Clenshaw (round 5): identical primal to
    cheb_filter_matrices, with the checkpoint-free Pallas backward
    (_cheb_bwd_kernel) providing gradients wrt M and coeffs."""
    return _cheb_ad(degree, kblk, interpret, bwd_three_pass)(M, coeffs)


def apply_spectral_filter_pallas(M, f, degree: int = 48, kblk: int = 8,
                                 interpret: bool = False):
    """Drop-in for ops.chebyshev.apply_spectral_filter on TPU.

    Identical sampling/coefficient math (bitwise the XLA path's -- it
    carries the learned parameters); only the Clenshaw matrix recurrence
    moves into the fused kernel.  Off-TPU (and not interpreting) falls back
    to the XLA evaluation at one-pass DEFAULT precision, the numerics this
    kernel implements.

    Differentiable end-to-end (round 5): the Clenshaw call is the
    custom_vjp cheb_filter_matrices_ad (checkpoint-free Pallas backward),
    and the sampling/normalization chain is plain XLA -- so
    cheb_impl="pallas" now trains (gradients flow into the learned filter
    MLP through c AND into the trunk through M).
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
    out = cheb_filter_matrices_ad(M, c, degree, kblk=kblk, interpret=interpret)
    return (out * r.astype(M.dtype)).astype(M.dtype)
