"""Fast-schedule fully-fused ADMM solve (kernels/fused_admm_fast.py) vs the
XLA fixed-iteration path (interpret mode on CPU; the compiled path is the
bench default on TPU)."""

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.kernels.fused_admm_fast import admm_solve_fused_fast
from admmnet_tpu.solver import admm_solve_fixed


def test_fused_fast_matches_scan_path():
    """Interpret mode runs the bf16 schedule at f32, exactly like the scan
    path's off-TPU polar_fast fallback.  At outer_iters=32 (the XLA
    projection's bisection depth; the in-kernel inner Newton waterline is
    MORE exact than XLA's 32-step inner bisection) the two solvers agree to
    float32 accumulation noise."""
    y, b, s = make_anchor_batch(4, mode="redemod", seed=3)
    phi_f = np.asarray(
        admm_solve_fused_fast(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s),
                              20, kblk=4, outer_iters=32, interpret=True)
    )
    phi_x = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 20,
                         1.0, ADMMOptions(g_update="polar_fast"))
    )
    err = np.linalg.norm(phi_f - phi_x, axis=-1) / np.linalg.norm(phi_x, axis=-1)
    assert err.max() < 5e-5, err


def test_fused_fast_kblk_padding():
    """Batch not a kblk multiple: padded instances must not corrupt output."""
    y, b, s = make_anchor_batch(3, mode="redemod", seed=4)
    phi_p = np.asarray(
        admm_solve_fused_fast(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s),
                              10, kblk=2, interpret=True)
    )
    phi_1 = np.asarray(
        admm_solve_fused_fast(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s),
                              10, kblk=1, interpret=True)
    )
    np.testing.assert_allclose(phi_p, phi_1, rtol=2e-5, atol=1e-6)


def test_fused_fast_reduced_bisection_stays_on_floor():
    """The production config (16-deep outer bisection) must stay at the
    fast mode's phi accuracy floor relative to the 32-deep reference."""
    y, b, s = make_anchor_batch(2, mode="redemod", seed=5)
    args = (jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 30)
    p16 = np.asarray(admm_solve_fused_fast(
        *args, kblk=2, outer_iters=16, interpret=True))
    p32 = np.asarray(admm_solve_fused_fast(
        *args, kblk=2, outer_iters=32, interpret=True))
    err = np.linalg.norm(p16 - p32, axis=-1) / np.linalg.norm(p32, axis=-1)
    assert err.max() < 0.05, err


def test_fused_fast_short_schedules_stay_near_full():
    """The shortened detection-grade PSD schedules (larger eigenvalue
    write-off; production default sched2 via ADMMOptions.fused_schedule)
    must stay within the measured deviation band of the full schedule --
    interpret mode reproduces the write-off effect exactly (it is a
    property of the polynomial, not of bf16 noise; measured 0.057-0.065
    scale-invariant NMSE at these settings, TPU end-to-end detection gates
    in RESULTS.md 3.5)."""
    from admmnet_tpu.ops.projections import (
        POLAR_BF16_SCHED2,
        POLAR_BF16_SCHED3,
    )

    y, b, s = make_anchor_batch(4, mode="redemod", seed=3)
    args = (jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 30)
    ref = np.asarray(admm_solve_fused_fast(*args, kblk=4, interpret=True))

    def si_nmse(a, bb):
        num = np.sum(np.conj(bb) * a, -1, keepdims=True)
        den = np.sum(np.abs(bb) ** 2, -1, keepdims=True)
        proj = num / den * bb
        return np.max(np.sum(np.abs(a - proj) ** 2, -1)
                      / np.sum(np.abs(a) ** 2, -1))

    for sched in (POLAR_BF16_SCHED3, POLAR_BF16_SCHED2):
        phi = np.asarray(admm_solve_fused_fast(
            *args, kblk=4, interpret=True, outer_iters=4, inner_iters=3,
            schedule=sched, final_hi=False))
        assert si_nmse(phi, ref) < 0.2


def test_solver_dispatch_fused_fast_falls_back_off_tpu():
    """g_update="fused_fast" through admm_solve_fixed on CPU uses the scan
    path with polar_fast math (the kernel needs the real MXU)."""
    y, b, s = make_anchor_batch(2, mode="redemod", seed=6)
    phi_d = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 12,
                         1.0, ADMMOptions(g_update="fused_fast"))
    )
    phi_x = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 12,
                         1.0, ADMMOptions(g_update="polar_fast"))
    )
    np.testing.assert_allclose(phi_d, phi_x, rtol=1e-6)


def test_fused_fast_lean_layout_matches_lists():
    """The lean kernel (B-free Z-update, single phi transpose, no M/P
    re-symmetrization, rho==1 folds) is the production layout; it must match
    the original list-layout kernel to f32 accumulation noise -- including
    the rho != 1 path, where Z' = rho*(G' - M) replaces Z + rho*(G' - B)."""
    y, b, s = make_anchor_batch(6, mode="redemod", seed=6)
    args = (jnp.asarray(y), jnp.asarray(b), jnp.asarray(s))
    for rho in (1.0, 1.7):
        kw = dict(num_iters=15, kblk=3, rho=rho, outer_iters=4,
                  inner_iters=3, final_hi=False, interpret=True)
        p_lists = np.asarray(
            admm_solve_fused_fast(*args, layout="lists", **kw))
        p_lean = np.asarray(
            admm_solve_fused_fast(*args, layout="lean", **kw))
        err = (np.linalg.norm(p_lean - p_lists, axis=-1)
               / np.linalg.norm(p_lists, axis=-1))
        assert err.max() < 5e-5, (rho, err)


def test_solver_dispatch_passes_fused_layout(monkeypatch):
    """ADMMOptions.fused_layout reaches the kernel from the production
    dispatch (escape hatch back to the validated "lists" layout)."""
    import jax

    import admmnet_tpu.kernels.fused_admm_fast as ff
    import admmnet_tpu.solver.admm as solver_mod

    seen = {}

    def fake(y, b, s, num_iters, rho, lam, **kw):
        seen.update(kw)
        return jnp.zeros_like(y)

    monkeypatch.setattr(ff, "admm_solve_fused_fast", fake)
    monkeypatch.setattr(
        solver_mod.jax, "default_backend", lambda: "tpu", raising=True
    )
    y, b, s = make_anchor_batch(2, mode="redemod", seed=5)
    opts = ADMMOptions(g_update="fused_fast", fused_layout="lists")
    admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 3,
                     1.0, opts)
    assert seen["layout"] == "lists"
    assert seen["kblk"] == opts.fused_kblk


def test_ablate_rejected_on_lists_layout():
    y, b, s = make_anchor_batch(2, mode="redemod", seed=5)
    import pytest

    with pytest.raises(ValueError, match="lean-layout only"):
        admm_solve_fused_fast(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s),
                              2, kblk=2, interpret=True, layout="lists",
                              ablate="h")


def test_fused_fast_fold_diag_matches_baseline():
    """fold_diag extracts the next iteration's plane reads (diag of
    G + Z/rho, corner rows of rho G + Z) from the symmetrized |M| product
    inside the PSD finals instead of re-reading the planes.  In exact
    arithmetic the two dataflows are identical (G' + Z'/rho == A and
    rho G' + Z' == rho A when Z' = rho(G' - M) and G' = (M + A)/2); in f32
    they differ by accumulation noise only -- same band as the lean-vs-lists
    differential.  Checked at rho=1 (production static folds) and rho!=1."""
    y, b, s = make_anchor_batch(4, mode="redemod", seed=7)
    args = (jnp.asarray(y), jnp.asarray(b), jnp.asarray(s))
    for rho in (1.0, 1.7):
        kw = dict(num_iters=15, kblk=2, rho=rho, outer_iters=4,
                  inner_iters=3, final_hi=False, interpret=True)
        p_base = np.asarray(admm_solve_fused_fast(*args, **kw))
        p_fold = np.asarray(admm_solve_fused_fast(*args, fold_diag=True, **kw))
        err = (np.linalg.norm(p_fold - p_base, axis=-1)
               / np.linalg.norm(p_base, axis=-1))
        assert err.max() < 1e-3, (rho, err)


def test_fused_fast_warm_root_stays_on_floor():
    """warm_root carries the outer-bisection bracket across ADMM iterations;
    at 2 bisection steps per iteration the asymptotic bracket is TIGHTER
    than the cold 3-step one, so phi must stay within the fast mode's
    accuracy band of the 32-deep cold reference."""
    y, b, s = make_anchor_batch(4, mode="redemod", seed=8)
    args = (jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 30)
    ref = np.asarray(admm_solve_fused_fast(
        *args, kblk=2, outer_iters=32, interpret=True))
    warm = np.asarray(admm_solve_fused_fast(
        *args, kblk=2, outer_iters=2, inner_iters=3, warm_root=True,
        interpret=True))
    err = np.linalg.norm(warm - ref, axis=-1) / np.linalg.norm(ref, axis=-1)
    assert err.max() < 0.05, err


def test_fused_fast_fold_warm_combined_detection_band():
    """Both round-4 rungs together at the production-style settings stay in
    the fast mode's scale-invariant NMSE band vs the conservative fused
    reference (the same band test the short schedules pass)."""
    from admmnet_tpu.ops.projections import POLAR_BF16_SCHED2

    y, b, s = make_anchor_batch(4, mode="redemod", seed=3)
    args = (jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 30)
    ref = np.asarray(admm_solve_fused_fast(*args, kblk=4, interpret=True))

    def si_nmse(a, bb):
        num = np.sum(np.conj(bb) * a, -1, keepdims=True)
        den = np.sum(np.abs(bb) ** 2, -1, keepdims=True)
        proj = num / den * bb
        return np.max(np.sum(np.abs(a - proj) ** 2, -1)
                      / np.sum(np.abs(a) ** 2, -1))

    phi = np.asarray(admm_solve_fused_fast(
        *args, kblk=4, interpret=True, outer_iters=2, inner_iters=2,
        schedule=POLAR_BF16_SCHED2, final_hi=False, fold_diag=True,
        warm_root=True))
    assert si_nmse(phi, ref) < 0.2


def test_solver_dispatch_passes_round4_knobs(monkeypatch):
    """ADMMOptions.fused_fold_diag / fused_warm_root reach the kernel."""
    import admmnet_tpu.kernels.fused_admm_fast as ff
    import admmnet_tpu.solver.admm as solver_mod

    seen = {}

    def fake(y, b, s, num_iters, rho, lam, **kw):
        seen.update(kw)
        return jnp.zeros_like(y)

    monkeypatch.setattr(ff, "admm_solve_fused_fast", fake)
    monkeypatch.setattr(
        solver_mod.jax, "default_backend", lambda: "tpu", raising=True
    )
    y, b, s = make_anchor_batch(2, mode="redemod", seed=5)
    opts = ADMMOptions(g_update="fused_fast", fused_fold_diag=True,
                       fused_warm_root=True, fused_proj_iters=2)
    admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 3,
                     1.0, opts)
    assert seen["fold_diag"] is True
    assert seen["warm_root"] is True
    assert seen["outer_iters"] == 2


def test_round4_production_defaults_pinned():
    """The shipped ADMMOptions production point is the gated round-4 config
    (results/r04/sweep_r04.json + gate_r04.json): K=32, warm-rooted 2-step
    outer bisection, folded plane reads.  A drive-by change to these
    defaults must consciously re-run the gates."""
    o = ADMMOptions()
    assert o.fused_kblk == 32
    assert (o.fused_proj_iters, o.fused_inner_iters) == (2, 2)
    assert o.fused_warm_root is True
    assert o.fused_fold_diag is True
    assert o.fused_schedule == "sched2"
    assert o.fused_layout == "lean"


def test_warm_bracket_recovers_from_drift():
    """The carried bracket must re-acquire the root when the projection
    input drifts (the widening floor's purpose): project a sequence whose
    scale jumps 1.5x mid-sequence and check the final h still satisfies
    the constraint to the shallow-bisection band.

    Domain note (measured): the widening floor is 5% of hi per iteration,
    so recovery from a root jump of factor r takes ~log(r)/log(1.05)
    iterations -- fine for the kernel's actual use (the bracket never
    carries ACROSS solves, and within a solve the diag input evolves by
    the ADMM step size), but a 10x discontinuity would need ~50
    iterations.  The production gates (results/r04/gate_r04.json) certify
    the real-trajectory behavior."""
    import jax

    from admmnet_tpu.kernels.fused_admm_fast import _project_sum_inf_block

    rng = np.random.default_rng(0)
    K, TILE, n = 4, 128, 100
    lane_ok = (np.arange(TILE) < n).astype(np.float32)[None, :]
    A = np.full((K, 1), 2.0, np.float32)
    lo = jnp.zeros((K, 1), jnp.float32)
    hi = jnp.full((K, 1), 3e37, jnp.float32)
    for step in range(24):
        scale = 2.0 if step < 12 else 3.0  # realistic drift magnitude
        # positive entries -> A*max + sum >> 1, the constraint binds and
        # the outer root is strictly positive (zero-mean t is trivially
        # feasible via a negative sum and never exercises the bracket)
        t = jnp.asarray(
            np.abs(rng.normal(size=(K, TILE)) * scale).astype(np.float32)
            * lane_ok
        )
        h, (lo, hi) = _project_sum_inf_block(
            t, jnp.asarray(A), jnp.asarray(lane_ok), 2, 3, bracket=(lo, hi)
        )
    # the design claim, measured: against a 32/8-deep cold oracle on the
    # FINAL draw, the warm 2-step result is tighter than a cold 2-step
    # bisection from the global bracket (whose width is ~the loose
    # 0.5*sum(t^2)+1 bound / 4)
    h_deep = _project_sum_inf_block(
        t, jnp.asarray(A), jnp.asarray(lane_ok), 32, 8
    )
    h_cold2 = _project_sum_inf_block(
        t, jnp.asarray(A), jnp.asarray(lane_ok), 2, 3
    )

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return np.linalg.norm(a - b, axis=-1) / np.linalg.norm(b, axis=-1)

    assert np.all(rel(h, h_deep) < rel(h_cold2, h_deep)), (
        rel(h, h_deep), rel(h_cold2, h_deep)
    )
    assert rel(h, h_deep).max() < 0.5


def test_fused_exact_matches_scan_polar_interpret():
    """Round-5 fused_exact (all_hi + quintic schedule + deep root-finder)
    vs the scan-path polar mode: both run the all-HIGHEST quintic PSD step
    (interpret mode evaluates at f32, like the off-TPU polar path), so the
    trajectories must agree to f32 accumulation noise.  The band is wider
    than the polar_fast differential's (5e-5): the quintic's large step-1
    coefficients (a=8.5, c=18.6) amplify the rounding difference between
    the kernel's 3-matmul Karatsuba products and XLA's complex matmul
    (measured ~1.1e-4 at 15 iterations -- trajectory noise, not bias; the
    hardware NMSE gate in runs/exact_r05.py is the binding contract)."""
    from admmnet_tpu.ops.projections import POLAR_QUINTIC_SCHEDULE

    y, b, s = make_anchor_batch(4, mode="redemod", seed=5)
    phi_f = np.asarray(
        admm_solve_fused_fast(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s),
                              15, kblk=4, outer_iters=32, inner_iters=8,
                              schedule=POLAR_QUINTIC_SCHEDULE, all_hi=True,
                              hi_steps=0, final_hi=True, interpret=True)
    )
    phi_x = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 15,
                         1.0, ADMMOptions(g_update="polar"))
    )
    err = np.linalg.norm(phi_f - phi_x, axis=-1) / np.linalg.norm(phi_x, axis=-1)
    assert err.max() < 5e-4, err


def test_fused_exact_dispatch_and_fallback(monkeypatch):
    """g_update='fused_exact' routes through the fused kernel with the
    exact knobs on TPU, and falls back to scan+polar off-TPU (loudly)."""
    import warnings

    import admmnet_tpu.solver.admm as admm_mod

    y, b, s = make_anchor_batch(2, mode="redemod", seed=6)
    opts = ADMMOptions(g_update="fused_exact", fused_exact_proj_iters=9,
                       fused_exact_inner_iters=7,
                       fused_exact_schedule="quintic7",
                       fused_exact_warm_root=True)

    # off-TPU: falls back to polar with a warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        phi = admm_solve_fixed(jnp.asarray(y), jnp.asarray(b),
                               jnp.asarray(s), 5, 1.0, opts)
    assert phi.shape == y.shape
    assert any("fused_exact" in str(x.message) for x in w)

    # pretend-TPU: capture the kernel call kwargs
    seen = {}

    def fake_kernel(yb, bb, sb, num_iters, rho, lam, **kw):
        seen.update(kw)
        return jnp.zeros(yb.shape, jnp.complex64)

    monkeypatch.setattr(admm_mod.jax, "default_backend", lambda: "tpu")
    import admmnet_tpu.kernels.fused_admm_fast as fk

    monkeypatch.setattr(fk, "admm_solve_fused_fast", fake_kernel)
    admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 5, 1.0,
                     opts)
    from admmnet_tpu.ops.projections import POLAR_QUINTIC_SCHEDULE

    assert seen["all_hi"] is True
    assert seen["final_hi"] is True
    assert seen["hi_steps"] == 0
    assert seen["outer_iters"] == 9
    assert seen["inner_iters"] == 7
    assert seen["warm_root"] is True
    assert seen["three_pass"] is True  # fused_exact_three_pass default
    assert seen["schedule"] == POLAR_QUINTIC_SCHEDULE


def test_admm_options_validate_fused_exact_schedule():
    import pytest

    with pytest.raises(ValueError, match="fused_exact_schedule"):
        ADMMOptions(fused_exact_schedule="quintic6")


def test_fused_exact_three_pass_interpret():
    """Round-5 precision ladder: the 3-pass split-bf16 exact variant must
    track the scan-path polar trajectory to the split representation error
    (~1e-5/matmul -> ~1e-3 relative after amplification through the
    quintic's large early coefficients).  Pins the _mm3 plumbing; the
    hardware NMSE verdict is results/r05/exact3p_r05.json."""
    from admmnet_tpu.ops.projections import POLAR_QUINTIC_SCHEDULE

    y, b, s = make_anchor_batch(4, mode="redemod", seed=5)
    phi_f = np.asarray(
        admm_solve_fused_fast(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s),
                              10, kblk=4, outer_iters=32, inner_iters=8,
                              schedule=POLAR_QUINTIC_SCHEDULE, all_hi=True,
                              three_pass=True, hi_steps=0, final_hi=True,
                              interpret=True)
    )
    phi_x = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 10,
                         1.0, ADMMOptions(g_update="polar"))
    )
    err = np.linalg.norm(phi_f - phi_x, axis=-1) / np.linalg.norm(phi_x, axis=-1)
    # far looser than the true-HIGHEST differential (5e-4): the split drops
    # ~8 mantissa bits per operand by construction
    assert err.max() < 3e-2, err
    # and it must be strictly noisier than the true-HIGHEST variant would
    # be, i.e. nonzero (guards against three_pass silently not applying)
    assert err.max() > 1e-7


def test_round5_exact_defaults_pinned():
    """The shipped fused_exact point is the gated round-5 config
    (results/r05/exact_r05.json + exact3p_r05.json): quintic7 schedule,
    cold 16/8 root-finder, 3-pass split-bf16 matmuls.  A drive-by change
    must consciously re-run the NMSE-vs-eigh gate (<= 1e-5 contract)."""
    o = ADMMOptions()
    assert o.fused_exact_schedule == "quintic7"
    assert (o.fused_exact_proj_iters, o.fused_exact_inner_iters) == (16, 8)
    assert o.fused_exact_warm_root is False
    assert o.fused_exact_three_pass is True
