"""Pallas TPU kernel: the ENTIRE fixed-iteration ADMM solve fused.

One grid program per instance; all state (Z, G planes, phi/h rows) lives in
VMEM across every iteration -- zero HBM traffic between iterations and no
per-op dispatch for the phi-update / H-projection / assembly / dual ascent
that the XLA path pays for 100 times per solve.

MEASURED NEGATIVE RESULT (v5e, B=1024, 100 iters): 5.7k inst-iter/s vs the
XLA-glue + per-step polar kernel's 54.5k.  One-instance-per-program
serializes (a) the nested-bisection H-projection onto a single (1, TILE)
VPU row (32x32 sequential reduction steps per iteration that the XLA path
instead batches across all instances) and (b) the dependent 128^3 matmul
chain, which cannot pipeline across instances from inside one program.
The solve is NOT HBM-bound between iterations (measured ~85 GB/s of ~819),
so the fusion solves a non-problem.  Kept as a correctness-checked
demonstration; the production path is solver.admm_solve_fixed with
kernels.polar for the PSD step.

Structure per iteration (math identical to solver/admm.py's fixed path with
phi_update="diag", g_update="polar"):

  g, zeta   : Hermitian trick -- the lifted corner column equals the
              conjugate of row n (G[0:n, n] = conj(G[n, 0:n])), so column
              extraction becomes a cheap row read;
  phi       : elementwise row update with precomputed weight and y/b;
  t         : Re diag(G + Z/rho) via eye-mask reduce;
  h         : exact nested-bisection projection onto
              {A*||h||_inf + sum(h) <= 1}, lane-masked to the logical n;
  B         : mask-assembled lifted block matrix (diag h, phi border,
              1/lambda^2 corner);
  G         : minimax quintic polar PSD step (see kernels/polar.py), all
              matmuls at Precision.HIGHEST;
  Z         : Z + rho (G - B).

Matrices are padded n+1=101 -> 128 (exact for the sign schedule: zero is a
fixed point); vectors are padded n=100 -> 128 with explicit lane masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from admmnet_tpu.ops.projections import POLAR_QUINTIC_SCHEDULE

TILE = 128


def _mm(a, b):
    return jax.lax.dot(
        a, b, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _polar_psd(Mr, Mi):
    """(P(M)r, P(M)i): PSD step via the quintic sign schedule (VMEM)."""
    norm = jnp.sqrt(jnp.sum(Mr * Mr) + jnp.sum(Mi * Mi))
    inv = 1.0 / jnp.maximum(norm, 1e-30)
    Xr = Mr * inv
    Xi = Mi * inv
    eye = jnp.eye(TILE, dtype=jnp.float32)
    for a, b, c in POLAR_QUINTIC_SCHEDULE:
        XrXi = _mm(Xr, Xi)
        X2r = _mm(Xr, Xr) - _mm(Xi, Xi)
        X2i = XrXi - XrXi.T
        X2rX2i = _mm(X2r, X2i)
        X4r = _mm(X2r, X2r) - _mm(X2i, X2i)
        X4i = X2rX2i - X2rX2i.T
        Yr = a * eye + b * X2r + c * X4r
        Yi = b * X2i + c * X4i
        t1 = _mm(Xr, Yr)
        t2 = _mm(Xi, Yi)
        t3 = _mm(Xr + Xi, Yr + Yi)
        Xr = t1 - t2
        Xi = t3 - t1 - t2
    t1 = _mm(Xr, Mr)
    t2 = _mm(Xi, Mi)
    t3 = _mm(Xr + Xi, Mr + Mi)
    Ar = t1 - t2
    Ai = t3 - t1 - t2
    Ar = 0.5 * (Ar + Ar.T)
    Ai = 0.5 * (Ai - Ai.T)
    Pr = 0.5 * (Mr + Ar)
    Pi = 0.5 * (Mi + Ai)
    return 0.5 * (Pr + Pr.T), 0.5 * (Pi - Pi.T)


def _project_sum_inf_row(t, A, lane_ok, outer_iters, inner_iters):
    """Projection of a (1, TILE) row onto {A*||h||_inf + sum h <= 1}.

    ``lane_ok``: (1, TILE) 0/1 mask of logical lanes.  Mirrors
    ops.projections.project_sum_inf (nested bisection)."""
    t = t * lane_ok

    def f_of(h):
        return A * jnp.max(jnp.abs(h)) + jnp.sum(h)

    def l1_project(v, radius):
        av = jnp.abs(v)
        inside = jnp.sum(av) <= radius

        def body(_, lohi):
            lo, hi = lohi
            tau = 0.5 * (lo + hi)
            s = jnp.sum(jnp.maximum(av - tau, 0.0) * lane_ok)
            big = s > radius
            return jnp.where(big, tau, lo), jnp.where(big, hi, tau)

        lo, hi = jax.lax.fori_loop(
            0, inner_iters, body, (jnp.float32(0.0), jnp.max(av))
        )
        tau = 0.5 * (lo + hi)
        x = jnp.maximum(av - tau, 0.0) * lane_ok
        xs = jnp.sum(x)
        x = x * jnp.where(xs > 0, radius / jnp.maximum(xs, 1e-30), 0.0)
        return jnp.where(inside, v, jnp.sign(v) * x)

    def h_of(mu):
        v = (t - mu) * lane_ok
        return (v - l1_project(v, mu * A)) * lane_ok

    feasible = f_of(t) <= 1.0
    mu_hi0 = jnp.maximum(1.0, 0.5 * jnp.sum(t * t) + 1.0)

    def body(_, lohi):
        lo, hi = lohi
        mu = 0.5 * (lo + hi)
        viol = f_of(h_of(mu)) > 1.0
        return jnp.where(viol, mu, lo), jnp.where(viol, hi, mu)

    lo, hi = jax.lax.fori_loop(0, outer_iters, body, (jnp.float32(0.0), mu_hi0))
    h = h_of(hi)
    return jnp.where(feasible, t, h)


def _fused_kernel(
    yob_r_ref, yob_i_ref, w_ref, A_ref,
    phi_r_ref, phi_i_ref,
    *, n, num_iters, rho, lam_inv_sq, outer_iters, inner_iters,
):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    lane_ok = (lane < n).astype(jnp.float32)  # logical h/phi lanes
    eye = jnp.eye(TILE, dtype=jnp.float32)
    # masks for the lifted matrix: diag block lanes [0, n), border index n
    col_is_n = (lane == n).astype(jnp.float32)  # (1, TILE)
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    row_is_n = (sub == n).astype(jnp.float32)  # (TILE, 1)

    yob_r = yob_r_ref[0] * lane_ok
    yob_i = yob_i_ref[0] * lane_ok
    w = w_ref[0] * lane_ok
    A = A_ref[0, 0, 0]

    def body(_, carry):
        Gr, Gi, Zr, Zi, _pr, _pi = carry
        # corner column via Hermitian row read: g = conj(G[n, :]) etc.
        g_r = Gr[n : n + 1, :] * lane_ok
        g_i = -Gi[n : n + 1, :] * lane_ok
        z_r = Zr[n : n + 1, :] * lane_ok
        z_i = -Zi[n : n + 1, :] * lane_ok

        phi_r = w * (yob_r + rho * g_r + z_r)
        phi_i = w * (yob_i + rho * g_i + z_i)

        diag_G = jnp.sum(Gr * eye, axis=0, keepdims=True)
        diag_Z = jnp.sum(Zr * eye, axis=0, keepdims=True)
        t = (diag_G + diag_Z / rho) * lane_ok
        h = _project_sum_inf_row(t, A, lane_ok, outer_iters, inner_iters)

        # assemble B = [[diag h, phi], [phi^H, lam_inv_sq]] with masks
        phi_col_r = phi_r.T  # (TILE, 1)
        phi_col_i = phi_i.T
        # phi lanes exclude n, so the border terms vanish at (n, n) and the
        # corner mask adds lam_inv_sq there exactly once.
        Br = eye * h + row_is_n * phi_r + col_is_n * phi_col_r \
            + (row_is_n * col_is_n) * lam_inv_sq
        Bi = row_is_n * (-phi_i) + col_is_n * phi_col_i

        Mr = Br - Zr / rho
        Mi = Bi - Zi / rho
        Mr = 0.5 * (Mr + Mr.T)
        Mi = 0.5 * (Mi - Mi.T)
        Gr2, Gi2 = _polar_psd(Mr, Mi)
        Zr2 = Zr + rho * (Gr2 - Br)
        Zi2 = Zi + rho * (Gi2 - Bi)
        # phi is carried so the OUTPUT is the phi computed inside the last
        # iteration (from the pre-update G/Z), matching admm_solve_fixed.
        return Gr2, Gi2, Zr2, Zi2, phi_r, phi_i

    zeros = jnp.zeros((TILE, TILE), jnp.float32)
    zrow = jnp.zeros((1, TILE), jnp.float32)
    _, _, _, _, phi_r, phi_i = jax.lax.fori_loop(
        0, num_iters, body, (zeros, zeros, zeros, zeros, zrow, zrow)
    )
    phi_r_ref[0] = phi_r
    phi_i_ref[0] = phi_i


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "rho", "lambda_val", "interpret",
                     "outer_iters", "inner_iters"),
)
def admm_solve_fused(
    y: jnp.ndarray,
    b: jnp.ndarray,
    sigma: jnp.ndarray,
    num_iters: int = 100,
    rho: float = 1.0,
    lambda_val: float = 1.0,
    interpret: bool = False,
    outer_iters: int = 32,
    inner_iters: int = 32,
) -> jnp.ndarray:
    """Fully-fused fixed-iteration batched solve; returns phi (B, n) complex.

    Equivalent to admm_solve_fixed(..., ADMMOptions(g_update="polar")) but
    with the whole loop inside one Pallas call.
    """
    B, n = y.shape
    if n + 1 > TILE:
        raise ValueError(f"lifted size {n + 1} exceeds tile {TILE}")
    b_sq = jnp.abs(b) ** 2
    w = (b_sq / (1.0 + rho * b_sq)).astype(jnp.float32)
    yob = y / b
    pad = ((0, 0), (0, TILE - n))
    # rows are carried as (B, 1, TILE) so the VMEM block (1, 1, TILE) has its
    # sublane dim equal to the array dim (Mosaic divisibility rule).
    yob_r = jnp.pad(jnp.real(yob).astype(jnp.float32), pad)[:, None, :]
    yob_i = jnp.pad(jnp.imag(yob).astype(jnp.float32), pad)[:, None, :]
    w = jnp.pad(w, pad)[:, None, :]
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (B,))
    A = (2.0 * jnp.sqrt(float(n)) * sigma + sigma**2).reshape(B, 1, 1)

    kernel = functools.partial(
        _fused_kernel,
        n=n,
        num_iters=num_iters,
        rho=float(rho),
        lam_inv_sq=float(1.0 / lambda_val**2),
        outer_iters=outer_iters,
        inner_iters=inner_iters,
    )
    row = pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    phi_r, phi_i = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[row, row, row, scal],
        out_specs=[row, row],
        out_shape=[jax.ShapeDtypeStruct((B, 1, TILE), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=B * num_iters * 66 * 2 * TILE**3,
            bytes_accessed=B * 6 * TILE * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(yob_r, yob_i, w, A)
    return (phi_r[:, 0, :n] + 1j * phi_i[:, 0, :n]).astype(jnp.complex64)
