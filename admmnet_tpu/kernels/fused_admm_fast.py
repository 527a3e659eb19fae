"""Pallas TPU kernel: whole fixed-iteration ADMM solve fused, fast schedule.

Second-generation fused solve (first attempt: kernels/fused_admm.py, a
measured negative result at 5.7k inst-iter/s).  What changed, and why this
one wins (measured rationale in RESULTS.md 3.5):

1. **K-interleaved instances per program** (kernels/polar.py's kblk trick).
   The single-instance fused kernel serialized the dependent 128^3 matmul
   chain; issuing each op for K independent instances back-to-back fills
   the MXU pipeline (pure projection: K=1 14.0 ms -> K=8 5.1 ms per
   2048-batch iteration, at the bf16 schedule's MXU roofline).
2. **bf16 sign schedule** (POLAR_BF16_SCHEDULE, one-pass Mosaic DEFAULT
   matmuls with per-step Hermitian re-projection; 72 MXU passes per
   projection instead of 396 all-HIGHEST).
3. **Vectorized in-kernel H-projection**: the nested bisection runs ONCE on
   a (K, TILE) tile instead of per-instance rows -- and, unlike the XLA
   project_sum_inf whose ~1000 tiny reduce ops cost 2.5 ms/iteration of
   dispatch, it is VMEM-resident VPU work.
4. **Zero HBM traffic between iterations**: G and Z planes never leave
   VMEM; the only HBM I/O of the whole solve is the (B, n) input rows and
   the (B, n) phi output.

Math is identical to solver/admm.py's fixed path with phi_update="diag",
g_update="polar_fast" (reference behavior: admm.py:63-112; the H-step
replaces the per-iteration cvxpy/ECOS solve of reference admm.py:117-148,
the G-step the per-iteration LAPACK SVD of admm.py:151-179).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from admmnet_tpu.ops.projections import POLAR_BF16_POLISH, POLAR_BF16_SCHEDULE

TILE = 128


def _mm(a, b, hi=False):
    return jax.lax.dot(
        a, b,
        precision=jax.lax.Precision.HIGHEST if hi else jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _mm3(a, b):
    """3-pass split-bf16 f32 matmul (XLA's BF16_6X "HIGHEST" at half the
    passes): a = ah + al with ah = bf16(a) (top ~8 mantissa bits) and al
    the bf16-rounded residual (next ~8 bits); a@b ~ ah@bh + ah@bl + al@bh,
    each a one-pass Mosaic DEFAULT matmul with f32 accumulation.  Dropped
    al@bl and the residual representation error bound the result at ~1e-5
    relative -- between DEFAULT (~4e-3) and HIGHEST (~1e-7).  Round-5
    precision-ladder experiment (RESULTS 3.9)."""
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    al = a - ah
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    bl = b - bh
    return _mm(ah, bh) + _mm(ah, bl) + _mm(al, bh)


def _polar_psd_fast(Mr, Mi, K, hi_steps, schedule=POLAR_BF16_SCHEDULE,
                    final_hi=True, resym_out=True, fixed_inv=None,
                    skip_finals=False, emit_a_stats=None, all_hi=False,
                    three_pass=False):
    """Fast-schedule PSD step on K interleaved (TILE, TILE) plane pairs.

    Same math as kernels/polar.py mode="fast": bf16-stable box-constrained
    schedule at one-pass DEFAULT precision with per-step Hermitian
    re-projection; the final |M| products run HIGHEST unless ``final_hi``
    is off (a HIGHEST matmul is ~6 one-pass MXU passes, so with a short
    schedule the 3 closing products dominate the pass count; their one-pass
    noise ~4e-3 is far below the short schedules' eigenvalue write-off).

    ``emit_a_stats``: when set to the logical corner index n, also return
    (adiag, arow_r, arow_i) -- the diagonal and the n-th row of the
    symmetrized |M| product A (each (K, TILE)).  With P = (M + A)/2 and the
    lean Z-update Z' = rho (P - M), the NEXT iteration's two plane reads
    are exactly functions of A: diag(G' + Z'/rho) = diag(A) and
    (rho G' + Z')[n, :] = rho A[n, :] -- so extracting them here, while A
    is in registers, replaces the next iteration's K eye-masked plane
    reductions + 4K corner-row reads (the 13% "diag extraction" line of
    the round-3 profile, runs/profile_lean.py).
    """
    # all_hi (round 5, the fused_exact mode): run EVERY schedule step's
    # matmuls at HIGHEST -- the caller passes a minimax quintic schedule
    # (POLAR_QUINTIC[5]_SCHEDULE) whose large early coefficients are not
    # bf16-safe; no polish step is appended (the schedules close themselves).
    schedule = tuple(schedule) + (
        (POLAR_BF16_POLISH,) if (hi_steps >= 1 and not all_hi) else ()
    )
    nsteps = len(schedule)

    def mm(x, y, hi):
        # three_pass (round-5 precision ladder): hi products run the 3-pass
        # split-bf16 emulation instead of Mosaic's ~6-pass HIGHEST
        return _mm3(x, y) if (hi and three_pass) else _mm(x, y, hi)

    if fixed_inv is not None:  # profiling ablation "norm" only
        inv = [jnp.float32(fixed_inv)] * K
    else:
        inv = [
            1.0
            / jnp.maximum(
                jnp.sqrt(jnp.sum(Mr[k] * Mr[k]) + jnp.sum(Mi[k] * Mi[k])), 1e-30
            )
            for k in range(K)
        ]
    Xr = [Mr[k] * inv[k] for k in range(K)]
    Xi = [Mi[k] * inv[k] for k in range(K)]
    eye = jnp.eye(TILE, dtype=jnp.float32)
    for s, (a, b, c) in enumerate(schedule):
        hi = all_hi or s >= nsteps - hi_steps
        XrXi = [mm(Xr[k], Xi[k], hi) for k in range(K)]
        X2r = [mm(Xr[k], Xr[k], hi) - mm(Xi[k], Xi[k], hi) for k in range(K)]
        X2i = [XrXi[k] - XrXi[k].T for k in range(K)]
        X2rX2i = [mm(X2r[k], X2i[k], hi) for k in range(K)]
        X4r = [
            mm(X2r[k], X2r[k], hi) - mm(X2i[k], X2i[k], hi) for k in range(K)
        ]
        X4i = [X2rX2i[k] - X2rX2i[k].T for k in range(K)]
        Yr = [a * eye + b * X2r[k] + c * X4r[k] for k in range(K)]
        Yi = [b * X2i[k] + c * X4i[k] for k in range(K)]
        t1 = [mm(Xr[k], Yr[k], hi) for k in range(K)]
        t2 = [mm(Xi[k], Yi[k], hi) for k in range(K)]
        t3 = [mm(Xr[k] + Xi[k], Yr[k] + Yi[k], hi) for k in range(K)]
        Xr = [t1[k] - t2[k] for k in range(K)]
        Xi = [t3[k] - t1[k] - t2[k] for k in range(K)]
        if not hi or three_pass:
            # one-pass-bf16 noise breaks Hermitian symmetry; re-project each
            # low step (see kernels/polar.py for the stability argument)
            Xr = [0.5 * (Xr[k] + Xr[k].T) for k in range(K)]
            Xi = [0.5 * (Xi[k] - Xi[k].T) for k in range(K)]
    if skip_finals:  # profiling ablation "finals" only
        return Xr, Xi
    t1 = [mm(Xr[k], Mr[k], final_hi) for k in range(K)]
    t2 = [mm(Xi[k], Mi[k], final_hi) for k in range(K)]
    t3 = [mm(Xr[k] + Xi[k], Mr[k] + Mi[k], final_hi) for k in range(K)]
    Pr, Pi = [], []
    a_stats = [] if emit_a_stats is not None else None
    for k in range(K):
        Ar = t1[k] - t2[k]
        Ai = t3[k] - t1[k] - t2[k]
        Ar = 0.5 * (Ar + Ar.T)
        Ai = 0.5 * (Ai - Ai.T)
        if emit_a_stats is not None:
            nn = emit_a_stats
            a_stats.append((
                jnp.sum(Ar * eye, axis=0, keepdims=True),  # diag(A), (1,TILE)
                Ar[nn : nn + 1, :],
                Ai[nn : nn + 1, :],
            ))
        pr = 0.5 * (Mr[k] + Ar)
        pi = 0.5 * (Mi[k] + Ai)
        if resym_out:
            # only needed when M itself is not exactly Hermitian (the lean
            # kernel assembles it exactly so and passes resym_out=False:
            # 0.5*(p + p.T) of an exactly-symmetric p is a bitwise no-op)
            pr = 0.5 * (pr + pr.T)
            pi = 0.5 * (pi - pi.T)
        Pr.append(pr)
        Pi.append(pi)
    if emit_a_stats is not None:
        adiag = jnp.concatenate([s[0] for s in a_stats], axis=0)
        arow_r = jnp.concatenate([s[1] for s in a_stats], axis=0)
        arow_i = jnp.concatenate([s[2] for s in a_stats], axis=0)
        return Pr, Pi, (adiag, arow_r, arow_i)
    return Pr, Pi


def _project_sum_inf_block(t, A, lane_ok, outer_iters, inner_iters,
                           bracket=None):
    """Projection of (K, TILE) rows onto {A*||h||_inf + sum h <= 1}
    (vectorized ops.projections.project_sum_inf), all K instances together.

    Root-finding is the serial-latency hot spot of the fused solve (in-kernel
    loops run once PER PROGRAM, not once per batch like XLA ops):

    - outer (multiplier mu with f(mu) = A*||h(mu)||_inf + sum h(mu) - 1 = 0,
      f strictly decreasing): plain bisection on [0, mu_hi].  Faster
      root-finders were tried and REJECTED: secant/Illinois stagnates
      against the loose mu_hi bound (f collapses from ~1e3 to ~-1 within a
      tiny fraction of the bracket; measured total failures), and
      unsafeguarded 2-D semismooth Newton on (mu, tau) cycles on ~1% of
      random instances.  Bisection is the only variant whose error is a
      guaranteed function of the step count.
    - inner (prox of the scaled inf-norm): the prox is a CLAMP at the
      l1-waterline tau solving sum max(|v| - tau, 0) = mu*A, found by
      Newton from below.  s(tau) is convex piecewise linear decreasing with
      slope -count(|v| > tau), so tau += (s - r)/count increases
      monotonically to the exact root (validated to ~1e-15 vs a 100-step
      bisection oracle); ``inner_iters`` ~ 5-8 replaces ~32 bisections, and
      the clamp form makes h one select instead of the sign/rescale detour.

    Depth tuning (measured 2026-08-19, B=2048 x 100 iters, anchor + random
    -SNR gates): ADMM's inexact-prox tolerance makes shallow depths free --
    outer/inner 16/8 -> 261k, 10/6 -> 319k, 6/5 -> 342.5k inst-iter/s with
    phi-NMSE-vs-eigh FLAT (~7e-2, the bf16 write-off floor) and detection
    F1 1.0 / tau RMSE ~0.004 at every depth.  With the short PSD schedules
    the root-finder became the dominant non-matmul cost and 4/3 was also
    gate-checked flat (random-scene F1 = the exact-eigh control); 4/3 is
    the ADMMOptions production default.

    ``A``: (K, 1); ``lane_ok``: (1, TILE) 0/1 mask of logical lanes.

    ``bracket``: optional carried (lo, hi) pair of (K, 1) arrays -- the
    warm-started outer bisection (round-3 profile follow-up: the
    root-finder's serial per-program latency was 30% of the lean iteration
    at K=16).  The constraint-multiplier root mu* drifts slowly as the
    outer ADMM converges, so instead of re-bisecting the loose global
    bracket [0, 0.5 sum t^2 + 1] every iteration, the bracket survives
    across iterations: each call clamps the carried bracket into the
    current global one, runs ``outer_iters`` bisection steps, and returns
    a re-widened bracket (+- one width, floored at 5% of hi) for the next
    call.  The widening floor guarantees geometric recovery when the root
    drifts outside the carried bracket (a stuck bracket re-opens by >= 5%
    of hi per iteration in the right direction); with 2 bisection steps the
    asymptotic width contracts by (1 + 2*1)/4 = 0.75 per iteration until
    the floor, so accuracy ends ~5% relative -- far TIGHTER than the
    cold 3-step bisection's global_hi/8 absolute width, at 2/3 the
    h-evaluations.  Feasible instances (f(t) <= 1, root at 0) reset their
    bracket to the global one so a later infeasible spell restarts clean.
    Returns (h, (lo_next, hi_next)) when ``bracket`` is given, else h.
    """
    t = t * lane_ok
    n_lanes = jnp.sum(lane_ok)

    def f_of(h):  # (K, TILE) -> (K, 1)
        return A * jnp.max(jnp.abs(h), axis=-1, keepdims=True) + jnp.sum(
            h, axis=-1, keepdims=True
        )

    def h_of(mu):  # mu: (K, 1)
        v = (t - mu) * lane_ok
        av = jnp.abs(v)
        r = mu * A
        total = jnp.sum(av, axis=-1, keepdims=True)
        tau = jnp.maximum(0.0, (total - r) / n_lanes)
        for _ in range(inner_iters):
            s = jnp.sum(jnp.maximum(av - tau, 0.0) * lane_ok,
                        axis=-1, keepdims=True)
            cnt = jnp.maximum(
                jnp.sum((av > tau).astype(jnp.float32) * lane_ok,
                        axis=-1, keepdims=True),
                1.0,
            )
            tau = tau + (s - r) / cnt
        h = jnp.clip(v, -tau, tau) * lane_ok
        # prox radius >= ||v||_1: the l1-projection returns v, so h = 0
        return jnp.where(total <= r, 0.0, h)

    feasible = f_of(t) <= 1.0
    glob_hi = jnp.maximum(1.0, 0.5 * jnp.sum(t * t, axis=-1, keepdims=True) + 1.0)
    if bracket is None:
        lo = jnp.zeros((t.shape[0], 1), jnp.float32)
        hi = glob_hi
    else:
        # clamp the carried bracket into the current global one (the global
        # hi is a guaranteed-feasible endpoint for the CURRENT t)
        lo = jnp.clip(bracket[0], 0.0, glob_hi)
        hi = jnp.clip(bracket[1], lo, glob_hi)
    for _ in range(outer_iters):
        mu = 0.5 * (lo + hi)
        viol = f_of(h_of(mu)) > 1.0
        lo = jnp.where(viol, mu, lo)
        hi = jnp.where(viol, hi, mu)
    h = h_of(hi)  # hi endpoint is always feasible when the bracket is valid
    h = jnp.where(feasible, t, h)
    if bracket is None:
        return h
    # re-widen for the next ADMM iteration: +- one bracket width, floored
    # at 5% of hi so a bracket that drifted off the root re-opens
    # geometrically instead of pinching shut around the wrong point
    w = jnp.maximum(hi - lo, 0.05 * hi + 1e-2)
    lo_n = jnp.maximum(lo - w, 0.0)
    hi_n = hi + w
    big = jnp.float32(3e37)
    lo_n = jnp.where(feasible, 0.0, lo_n)
    hi_n = jnp.where(feasible, big, hi_n)  # reset: next clamp -> global
    return h, (lo_n, hi_n)


def _fused_fast_kernel_lean(
    yob_r_ref, yob_i_ref, w_ref, A_ref,
    phi_r_ref, phi_i_ref,
    *, n, kblk, num_iters, rho, lam_inv_sq, hi_steps, outer_iters, inner_iters,
    schedule, final_hi, ablate="none", loop_unroll=1, fold_diag=False,
    warm_root=False, all_hi=False, three_pass=False,
):
    """Lean fused solve: the list kernel with its measured glue costs removed.

    Slope-calibrated subtraction profile of the original list kernel (B=2048,
    K=16, marginal cost per 2048-instance iteration after removing the ~65 ms
    fixed per-call dispatch/tunnel cost): assembly 0.82 ms of 2.38 total, M
    re-symmetrization 0.15, Frobenius norms 0.14, Z-update 0.09, two schedule
    steps 0.67, root-finder 0.10, corner/diag reads ~0, loop carry ~0.  This
    variant removes the three dominated pieces by construction:

    - **B is never materialized**: Z' = Z + rho (G' - B) with B = M + Z/rho
      collapses to Z' = rho (G' - M), so only M is assembled (directly,
      including the -Z/rho term) and the Z-update is one subtract.
    - **One phi transpose per iteration instead of 2K**: the corner column
      of each block needs phi[k] as a (TILE, 1) column; the list kernel paid
      2K tiny (1,TILE)->(TILE,1) relayouts per iteration (the dominant
      assembly cost); here phi (K, TILE) is transposed ONCE and per-block
      columns are static slices.
    - **No M/P re-symmetrization**: every assembly term is symmetric or
      antisymmetric bit-for-bit and elementwise ops preserve that exactly,
      so M (and P = (M + |M|)/2 after the |M| products are symmetrized) is
      exactly Hermitian by construction; the 4 transposes the list kernel
      spent there were numerical no-ops.
    - **rho == 1 static folds** (the production default): Z/rho and
      rho-scaled updates compile to plain adds/subs.

    A selector-matmul "stacked" layout (all glue as one-hot (K, K*TILE)
    matmuls on (K*TILE, TILE) planes) was tried and REJECTED: skinny 16-row
    matmuls waste the 128x128 systolic array, measured 1.65x SLOWER than the
    list kernel end to end.

    ``ablate`` (PROFILING ONLY -- output is mathematically wrong for any
    value but "none"): removes one component per variant so its marginal
    cost can be measured by subtraction (the list kernel's profile method,
    RESULTS.md 3.5).  When ablating, the caller adds a debug output of the
    final G corner rows so the plane-update chain stays live even when phi
    no longer depends on it (otherwise Mosaic could dead-code-eliminate the
    loop body being measured).  Variants: "corner" (corner-row reads),
    "diag" (diagonal extraction), "h" (root-finder), "norm" (per-iteration
    Frobenius normalization), "assemble" (M assembly glue), "zupd"
    (Z-update subtracts), "finals" (closing |M| products).
    """
    K = kblk
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    lane_ok = (lane < n).astype(jnp.float32)
    eye = jnp.eye(TILE, dtype=jnp.float32)
    col_is_n = (lane == n).astype(jnp.float32)  # (1, TILE)
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    row_is_n = (sub == n).astype(jnp.float32)  # (TILE, 1)
    # constant corner term lam^-2 e_n e_n^T: hoisted, one plane per program
    C_lam = (row_is_n * col_is_n) * lam_inv_sq
    rho1 = rho == 1.0

    def zscale(z):  # Z / rho, folded away at the rho=1 production point
        # true divide (not reciprocal-multiply) so the rho != 1 path is
        # bitwise the list kernel's Zr[k]/rho
        return z if rho1 else z / rho

    yob_r = yob_r_ref[:, 0, :] * lane_ok  # (K, TILE)
    yob_i = yob_i_ref[:, 0, :] * lane_ok
    w = w_ref[:, 0, :] * lane_ok
    A = jnp.stack([A_ref[k, 0, 0] for k in range(K)]).reshape(K, 1)

    def body(_, carry):
        if warm_root:
            state, lo_b, hi_b = carry[0], carry[1], carry[2]
        else:
            state = carry
        if fold_diag:
            # G planes are not carried at all: the two plane reads of the
            # baseline body (corner rows of rho G + Z for phi, diag of
            # G + Z/rho for the H-projection) are exactly rho*A[n, :] and
            # diag(A) of the PREVIOUS iteration's symmetrized |M| product
            # (see _polar_psd_fast emit_a_stats), which the finals emitted
            # into the carry while A was in registers.
            Zr, Zi, adiag, arow_r, arow_i, _pr, _pi = state
            phi_r = w * (yob_r + (arow_r if rho1 else rho * arow_r))
            phi_i = w * (yob_i - (arow_i if rho1 else rho * arow_i))
            diag = adiag
        else:
            Gr, Gi, Zr, Zi, _pr, _pi = state
            if ablate == "corner":
                g_r, g_i, z_r, z_i = _pr, _pi, _pr, _pi
            else:
                # corner column via Hermitian row read (G[0:n, n] = conj(G[n, :]))
                g_r = jnp.concatenate([Gr[k][n : n + 1, :] for k in range(K)], axis=0)
                g_i = -jnp.concatenate([Gi[k][n : n + 1, :] for k in range(K)], axis=0)
                z_r = jnp.concatenate([Zr[k][n : n + 1, :] for k in range(K)], axis=0)
                z_i = -jnp.concatenate([Zi[k][n : n + 1, :] for k in range(K)], axis=0)
                g_r, g_i, z_r, z_i = (v * lane_ok for v in (g_r, g_i, z_r, z_i))

            phi_r = w * (yob_r + (g_r if rho1 else rho * g_r) + z_r)  # (K, TILE)
            phi_i = w * (yob_i + (g_i if rho1 else rho * g_i) + z_i)

            if ablate == "diag":
                diag = phi_r
            else:
                diag = jnp.concatenate(
                    [
                        jnp.sum((Gr[k] + zscale(Zr[k])) * eye, axis=0, keepdims=True)
                        for k in range(K)
                    ],
                    axis=0,
                )  # (K, TILE)
        if ablate == "h":
            h = diag * lane_ok
        elif warm_root:
            h, (lo_b, hi_b) = _project_sum_inf_block(
                diag * lane_ok, A, lane_ok, outer_iters, inner_iters,
                bracket=(lo_b, hi_b),
            )
        else:
            h = _project_sum_inf_block(
                diag * lane_ok, A, lane_ok, outer_iters, inner_iters
            )

        if ablate == "assemble":
            Mr = [0.5 * Gr[k] - zscale(Zr[k]) for k in range(K)]
            Mi = [0.5 * Gi[k] - zscale(Zi[k]) for k in range(K)]
        else:
            # all corner columns from ONE small transpose: column k of phi^T
            phiT_r = phi_r.T  # (TILE, K)
            phiT_i = phi_i.T
            Mr, Mi = [], []
            for k in range(K):
                pr = phi_r[k : k + 1, :]
                pi = phi_i[k : k + 1, :]
                pc_r = jax.lax.slice(phiT_r, (0, k), (TILE, k + 1))  # (TILE, 1)
                pc_i = jax.lax.slice(phiT_i, (0, k), (TILE, k + 1))
                # M = B - Z/rho assembled directly; exactly Hermitian (each
                # term is symmetric/antisymmetric bit-for-bit)
                Mr.append(
                    eye * h[k : k + 1, :] + row_is_n * pr + pc_r * col_is_n
                    + C_lam - zscale(Zr[k])
                )
                Mi.append(
                    row_is_n * (-pi) + pc_i * col_is_n - zscale(Zi[k])
                )

        psd = _polar_psd_fast(
            Mr, Mi, K, hi_steps, schedule, final_hi, resym_out=False,
            fixed_inv=1.0 / 64.0 if ablate == "norm" else None,
            skip_finals=ablate == "finals",
            emit_a_stats=n if fold_diag else None,
            all_hi=all_hi, three_pass=three_pass,
        )
        if fold_diag:
            Gr2, Gi2, (adiag2, arow_r2, arow_i2) = psd
        else:
            Gr2, Gi2 = psd
        # Z' = Z + rho (G' - B) = rho (G' - M) since B = M + Z/rho
        if ablate == "zupd":
            Zr2, Zi2 = Gr2, Gi2
        elif rho1:
            Zr2 = [Gr2[k] - Mr[k] for k in range(K)]
            Zi2 = [Gi2[k] - Mi[k] for k in range(K)]
        else:
            Zr2 = [rho * (Gr2[k] - Mr[k]) for k in range(K)]
            Zi2 = [rho * (Gi2[k] - Mi[k]) for k in range(K)]
        # phi carried so the output is the last iteration's phi (computed
        # from the pre-update G/Z), matching admm_solve_fixed
        if fold_diag:
            state2 = (Zr2, Zi2, adiag2, arow_r2, arow_i2, phi_r, phi_i)
        else:
            state2 = (Gr2, Gi2, Zr2, Zi2, phi_r, phi_i)
        return (state2, lo_b, hi_b) if warm_root else state2

    zeros = [jnp.zeros((TILE, TILE), jnp.float32) for _ in range(K)]
    zrow = jnp.zeros((K, TILE), jnp.float32)
    if fold_diag:
        # A == 0 at the zero init, so the folded stats start at zero too
        state0 = (list(zeros), list(zeros), zrow, zrow, zrow, zrow, zrow)
    else:
        state0 = (zeros, list(zeros), list(zeros), list(zeros), zrow, zrow)
    if warm_root:
        init = (state0,
                jnp.zeros((K, 1), jnp.float32),
                jnp.full((K, 1), 3e37, jnp.float32))
    else:
        init = state0
    final = jax.lax.fori_loop(
        0, num_iters,
        body,
        init,
        unroll=loop_unroll if loop_unroll > 1 else None,
    )
    state_f = final[0] if warm_root else final
    phi_r, phi_i = state_f[-2], state_f[-1]
    phi_r_ref[:, 0, :] = phi_r
    phi_i_ref[:, 0, :] = phi_i
    if ablate != "none":
        # keep the plane-update chain live under any ablation: the debug
        # output reads every final G plane (see docstring; ablate profiling
        # is baseline-layout-shape only, so state_f[0] is the G planes)
        Gr = state_f[0]
        dbg = jnp.concatenate([Gr[k][n : n + 1, :] for k in range(K)], axis=0)
        phi_r_ref[:, 0, :] = phi_r + 0.0 * dbg


def _fused_fast_kernel(
    yob_r_ref, yob_i_ref, w_ref, A_ref,
    phi_r_ref, phi_i_ref,
    *, n, kblk, num_iters, rho, lam_inv_sq, hi_steps, outer_iters, inner_iters,
    schedule, final_hi,
):
    K = kblk
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    lane_ok = (lane < n).astype(jnp.float32)
    eye = jnp.eye(TILE, dtype=jnp.float32)
    col_is_n = (lane == n).astype(jnp.float32)  # (1, TILE)
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    row_is_n = (sub == n).astype(jnp.float32)  # (TILE, 1)

    yob_r = yob_r_ref[:, 0, :] * lane_ok  # (K, TILE)
    yob_i = yob_i_ref[:, 0, :] * lane_ok
    w = w_ref[:, 0, :] * lane_ok
    A = jnp.stack([A_ref[k, 0, 0] for k in range(K)]).reshape(K, 1)

    def body(_, carry):
        Gr, Gi, Zr, Zi, _pr, _pi = carry
        # corner column via the Hermitian row read (G[0:n, n] = conj(G[n, :]))
        g_r = jnp.concatenate([Gr[k][n : n + 1, :] for k in range(K)], axis=0)
        g_i = -jnp.concatenate([Gi[k][n : n + 1, :] for k in range(K)], axis=0)
        z_r = jnp.concatenate([Zr[k][n : n + 1, :] for k in range(K)], axis=0)
        z_i = -jnp.concatenate([Zi[k][n : n + 1, :] for k in range(K)], axis=0)
        g_r, g_i, z_r, z_i = (
            v * lane_ok for v in (g_r, g_i, z_r, z_i)
        )

        phi_r = w * (yob_r + rho * g_r + z_r)  # (K, TILE)
        phi_i = w * (yob_i + rho * g_i + z_i)

        diag = jnp.concatenate(
            [
                jnp.sum((Gr[k] + Zr[k] / rho) * eye, axis=0, keepdims=True)
                for k in range(K)
            ],
            axis=0,
        )  # (K, TILE)
        h = _project_sum_inf_block(
            diag * lane_ok, A, lane_ok, outer_iters, inner_iters
        )

        Br, Bi, Mr, Mi = [], [], [], []
        for k in range(K):
            pr = phi_r[k : k + 1, :]
            pi = phi_i[k : k + 1, :]
            br = eye * h[k : k + 1, :] + row_is_n * pr + col_is_n * pr.T \
                + (row_is_n * col_is_n) * lam_inv_sq
            bi = row_is_n * (-pi) + col_is_n * pi.T
            mr = br - Zr[k] / rho
            mi = bi - Zi[k] / rho
            Br.append(br)
            Bi.append(bi)
            Mr.append(0.5 * (mr + mr.T))
            Mi.append(0.5 * (mi - mi.T))

        Gr2, Gi2 = _polar_psd_fast(Mr, Mi, K, hi_steps, schedule, final_hi)
        Zr2 = [Zr[k] + rho * (Gr2[k] - Br[k]) for k in range(K)]
        Zi2 = [Zi[k] + rho * (Gi2[k] - Bi[k]) for k in range(K)]
        # phi carried so the output is the last iteration's phi (computed
        # from the pre-update G/Z), matching admm_solve_fixed
        return Gr2, Gi2, Zr2, Zi2, phi_r, phi_i

    zeros = [jnp.zeros((TILE, TILE), jnp.float32) for _ in range(K)]
    zrow = jnp.zeros((K, TILE), jnp.float32)
    _, _, _, _, phi_r, phi_i = jax.lax.fori_loop(
        0, num_iters,
        body,
        (zeros, list(zeros), list(zeros), list(zeros), zrow, zrow),
    )
    phi_r_ref[:, 0, :] = phi_r
    phi_i_ref[:, 0, :] = phi_i


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "rho", "lambda_val", "kblk", "hi_steps",
                     "interpret", "outer_iters", "inner_iters", "schedule",
                     "final_hi", "layout", "ablate", "loop_unroll",
                     "fold_diag", "warm_root", "all_hi", "three_pass"),
)
def admm_solve_fused_fast(
    y: jnp.ndarray,
    b: jnp.ndarray,
    sigma: jnp.ndarray,
    num_iters: int = 100,
    rho: float = 1.0,
    lambda_val: float = 1.0,
    kblk: int = 16,
    hi_steps: int = 0,
    interpret: bool = False,
    outer_iters: int = 6,
    inner_iters: int = 5,
    schedule: tuple = POLAR_BF16_SCHEDULE,
    final_hi: bool = True,
    layout: str = "lean",
    ablate: str = "none",
    loop_unroll: int = 1,
    fold_diag: bool = False,
    warm_root: bool = False,
    all_hi: bool = False,
    three_pass: bool = False,
) -> jnp.ndarray:
    """Fully-fused fast-schedule fixed-iteration solve; phi (B, n) complex.

    ``all_hi=True`` (round 5, the ``g_update="fused_exact"`` mode): every
    schedule step's matmuls run at HIGHEST (Mosaic ~6 bf16 passes per f32
    matmul) -- pass a minimax quintic schedule (ops.projections
    POLAR_QUINTIC_SCHEDULE / POLAR_QUINTIC5_SCHEDULE) and deep root-finder
    iterations; this is the whole-solve fusion of the per-step ``polar``
    mode (phi-faithful contract of reference trainPhi.py:89-94) with the
    XLA inter-iteration glue removed.

    Equivalent to admm_solve_fixed(..., ADMMOptions(g_update="polar_fast"))
    with the whole loop inside one Pallas call.  The batch is zero-padded to
    a kblk multiple (zero instances solve to zero phi harmlessly).

    This function's own defaults are the CONSERVATIVE parity point (full
    6-step schedule, HIGHEST final products, 6/5 root-finder) that tracks
    the scan-path polar_fast solve; the production speed point lives in
    ADMMOptions (fused_schedule="sched2", final_hi off, 4/3 depths --
    670.8k inst-iter/s, every detection gate equal to the exact solver;
    see core/config.py and RESULTS.md 3.5) and is applied by
    admm_solve_fixed's dispatch.
    """
    B0, n = y.shape
    if n + 1 > TILE:
        raise ValueError(f"lifted size {n + 1} exceeds tile {TILE}")
    b_sq = jnp.abs(b) ** 2
    w = (b_sq / (1.0 + rho * b_sq)).astype(jnp.float32)
    yob = y / b
    kblk = min(kblk, max(1, B0))
    B = (B0 + kblk - 1) // kblk * kblk
    pad = ((0, B - B0), (0, TILE - n))
    yob_r = jnp.pad(jnp.real(yob).astype(jnp.float32), pad)[:, None, :]
    yob_i = jnp.pad(jnp.imag(yob).astype(jnp.float32), pad)[:, None, :]
    w = jnp.pad(w, pad)[:, None, :]
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (B0,))
    A = (2.0 * jnp.sqrt(float(n)) * sigma + sigma**2)
    A = jnp.pad(A, ((0, B - B0),), constant_values=1.0).reshape(B, 1, 1)

    if layout not in ("lean", "lists"):
        raise ValueError(f"unknown layout {layout!r}")
    if ablate != "none" and layout != "lean":
        raise ValueError("ablate profiling is lean-layout only")
    if ablate != "none" and fold_diag:
        raise ValueError("ablate profiling assumes the unfolded carry layout")
    if (fold_diag or warm_root or all_hi or three_pass) and layout != "lean":
        raise ValueError(
            "fold_diag/warm_root/all_hi/three_pass are lean-layout options"
        )
    kernel = functools.partial(
        _fused_fast_kernel_lean if layout == "lean"
        else _fused_fast_kernel,
        n=n,
        kblk=kblk,
        num_iters=num_iters,
        rho=float(rho),
        lam_inv_sq=float(1.0 / lambda_val**2),
        hi_steps=hi_steps,
        outer_iters=outer_iters,
        inner_iters=inner_iters,
        schedule=tuple(schedule),
        final_hi=final_hi,
        **(
            {"ablate": ablate, "loop_unroll": loop_unroll,
             "fold_diag": fold_diag, "warm_root": warm_root,
             "all_hi": all_hi, "three_pass": three_pass}
            if layout == "lean" else {}
        ),
    )
    row = pl.BlockSpec(
        (kblk, 1, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    scal = pl.BlockSpec(
        (kblk, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    nsteps = len(schedule) + (1 if hi_steps else 0)
    # Scoped-VMEM stack usage is ~0.95 MB per interleaved instance (measured:
    # K=32 wants 29.1 MB); the default 16 MB limit only fits K<=16.  Raise it
    # explicitly for wider interleaves, leave the default untouched otherwise
    # so K<=16 compilation is unchanged.  The all-HIGHEST exact mode needs
    # ~1.63 MB/instance (measured: K=32 all_hi wants 52.01 MB -- Mosaic's
    # 6-pass f32 matmul emulation stages operand splits per product), so it
    # gets a 2 MB/instance budget at any kblk.
    per_instance = (1 << 21) if all_hi else (1 << 20)
    compiler_params = None
    if kblk > 16 or all_hi:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=kblk * per_instance + (8 << 20)
        )
    phi_r, phi_i = pl.pallas_call(
        kernel,
        grid=(B // kblk,),
        in_specs=[row, row, row, scal],
        out_specs=[row, row],
        out_shape=[jax.ShapeDtypeStruct((B, 1, TILE), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=B * num_iters * (9 * nsteps + 3) * 2 * TILE**3,
            bytes_accessed=B * 6 * TILE * 4,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(yob_r, yob_i, w, A)
    return (phi_r[:B0, 0, :n] + 1j * phi_i[:B0, 0, :n]).astype(jnp.complex64)
