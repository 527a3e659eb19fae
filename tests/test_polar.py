"""Minimax quintic polar PSD projection: accuracy vs exact eigh."""

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.ops.projections import (
    POLAR_QUINTIC_SCHEDULE,
    psd_project_eigh,
    psd_project_polar,
)
from admmnet_tpu.peaks import scale_invariant_nmse
from admmnet_tpu.solver import admm_solve_fixed


def test_polar_schedule_sign_accuracy():
    """The composed polynomial maps [1e-3, 1] to within 1e-6 of 1."""
    x = np.linspace(1e-3, 1.0, 50001)
    y = x.copy()
    for a, b, c in POLAR_QUINTIC_SCHEDULE:
        y = a * y + b * y**3 + c * y**5
    # 6-decimal coefficient rounding leaves ~1e-6 composed error
    assert np.abs(y - 1.0).max() < 5e-6


def test_polar_matches_eigh_on_random_hermitian():
    rng = np.random.default_rng(3)
    X = (rng.normal(size=(12, 101, 101)) + 1j * rng.normal(size=(12, 101, 101))).astype(
        np.complex64
    )
    M = (X + np.conj(np.swapaxes(X, -1, -2))) / 2
    Pe = np.asarray(psd_project_eigh(jnp.asarray(M)))
    Pp = np.asarray(psd_project_polar(jnp.asarray(M)))
    err = np.linalg.norm(Pe - Pp, axis=(1, 2)) / np.linalg.norm(Pe, axis=(1, 2))
    assert err.max() < 2e-4, err.max()


def test_polar_pallas_kblk_padding():
    """K-blocked kernel (interpret mode): batch not a multiple of kblk, and
    kblk larger than the batch, both pad with zero matrices exactly."""
    import pytest

    from admmnet_tpu.kernels.polar import psd_project_polar_pallas

    rng = np.random.default_rng(7)
    X = (rng.normal(size=(5, 33, 33)) + 1j * rng.normal(size=(5, 33, 33))).astype(
        np.complex64
    )
    M = (X + np.conj(np.swapaxes(X, -1, -2))) / 2
    Pe = np.asarray(psd_project_eigh(jnp.asarray(M)))
    for kblk in (2, 4, 8):  # 5 % 2 != 0; kblk=8 > batch
        Pp = np.asarray(
            psd_project_polar_pallas(jnp.asarray(M), interpret=True, kblk=kblk)
        )
        err = np.linalg.norm(Pe - Pp, axis=(1, 2)) / np.linalg.norm(Pe, axis=(1, 2))
        assert err.max() < 2e-4, (kblk, err.max())


def test_polar_solver_mode_matches_eigh_mode():
    y, b, s = make_anchor_batch(2, mode="redemod", seed=5)
    phi_e = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 40, 1.0,
                         ADMMOptions(g_update="eigh"))
    )
    phi_p = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 40, 1.0,
                         ADMMOptions(g_update="polar"))
    )
    assert scale_invariant_nmse(phi_p, phi_e) < 1e-4


def test_fit_polar_schedule_reproduces_committed_prefix():
    """Greedy LP fitter: each step contracts the band, and the fitted
    schedule's first steps match the committed POLAR_QUINTIC_SCHEDULE
    (greedy => a shorter fit is a prefix of a longer one)."""
    from admmnet_tpu.ops.fit_polar_schedule import composed_errors, fit_schedule

    sched, _ = fit_schedule(3, l0=1e-3)
    for got, want in zip(sched, POLAR_QUINTIC_SCHEDULE):
        assert np.allclose(got, want, atol=2e-5), (got, want)
    # 3-step band error is still large; the committed 7-step one is ~1e-6
    band3, _ = composed_errors(sched, 1e-3)
    assert band3 > 1e-2
