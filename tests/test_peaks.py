"""Peak-search tests: atom-impulse oracle (known analytic peak), multi-target
ordering, refinement precision, spectrum parity with the naive per-point
oracle (reference utils/peakSearchUtils.py:9-33 semantics)."""

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.core.config import PeakSearchConfig
from admmnet_tpu.ops.atoms import atom
from admmnet_tpu.peaks import find_peaks, match_peaks, spectrum_grid


def np_spectrum_point(phi, tau, f, Nb, Nd):
    s = np.exp(1j * 2 * np.pi * np.linspace(0, (Nb - 1) * f, Nb))
    d = np.exp(1j * 2 * np.pi * np.linspace(0, (Nd - 1) * tau, Nd))
    a = np.kron(s, np.conj(d))
    return np.abs(np.vdot(phi, a)) ** 2


def test_spectrum_grid_matches_pointwise_oracle():
    rng = np.random.default_rng(0)
    Nb = Nd = 6
    phi = (rng.normal(size=Nb * Nd) + 1j * rng.normal(size=Nb * Nd)).astype(
        np.complex64
    )
    taus = np.array([0.1, 0.33, 0.7], np.float32)
    fs = np.array([-0.2, 0.05], np.float32)
    Z = np.asarray(spectrum_grid(jnp.asarray(phi), taus, fs, Nb, Nd))
    for yi, f in enumerate(fs):
        for xi, t in enumerate(taus):
            want = np_spectrum_point(phi, t, f, Nb, Nd)
            np.testing.assert_allclose(Z[yi, xi], want, rtol=2e-3)


def test_atom_impulse_peak_location_and_height():
    """phi = a(tau0, f0) gives a Dirichlet-kernel spectrum with global max n^2
    at (tau0, f0); off-grid location must be recovered to refinement
    precision."""
    Nb = Nd = 10
    tau0, f0 = 0.4567, -0.1234
    phi = atom(tau0, f0, Nb, Nd)
    cfg = PeakSearchConfig()
    res = find_peaks(phi, Nb, Nd, cfg)
    assert bool(res.valid[0])
    assert abs(float(res.tau[0]) - tau0) < 2e-4
    assert abs(float(res.f[0]) - f0) < 2e-4
    n = Nb * Nd
    assert abs(float(res.height[0]) - n**2) / n**2 < 1e-3


def test_three_targets_sorted_by_height():
    Nb = Nd = 10
    taus = [0.2, 0.5, 0.8]
    fs = [0.3, -0.3, 0.0]
    amps = [3.0, 2.0, 1.0]
    phi = sum(a * atom(t, f, Nb, Nd) for a, t, f in zip(amps, taus, fs))
    res = find_peaks(phi, Nb, Nd)
    stats = match_peaks(
        np.asarray(res.tau)[None, :3],
        np.asarray(res.f)[None, :3],
        np.asarray(taus)[None, :],
        np.asarray(fs)[None, :],
        tol_tau=0.03,
        tol_f=0.03,
    )
    assert stats["f1"] == 1.0
    # heights ordered by amplitude: first peak is the amp-3 target
    assert abs(float(res.tau[0]) - 0.2) < 0.03
    assert abs(float(res.f[0]) - 0.3) < 0.03


def test_batched_search_shapes_and_padding():
    Nb = Nd = 8
    phi = jnp.stack([atom(0.3, 0.1, Nb, Nd), atom(0.6, -0.2, Nb, Nd)])
    res = find_peaks(phi, Nb, Nd, PeakSearchConfig(max_peaks=8))
    assert res.tau.shape == (2, 8)
    hv = np.asarray(res.height)
    vv = np.asarray(res.valid)
    # invalid slots are -inf and come last
    assert np.all(np.isneginf(hv[~vv]))
    assert np.all(np.diff(np.nan_to_num(hv, neginf=-1e30), axis=-1) <= 1e-3)


def test_match_peaks_counts():
    stats = match_peaks(
        pred_tau=[[0.2, 0.9]],
        pred_f=[[0.1, 0.4]],
        true_tau=[[0.21, 0.5]],
        true_f=[[0.1, -0.2]],
        tol_tau=0.05,
        tol_f=0.05,
    )
    assert stats["tp"] == 1 and stats["fp"] == 1 and stats["fn"] == 1
    assert 0 < stats["tau_rmse"] < 0.05


def test_scale_invariant_nmse_resolves_tiny_errors_in_float64():
    """An orthogonal perturbation of relative size eps has si-NMSE ~= eps^2;
    complex64 accumulation saturates 1 - |ip|^2/(na*nb) to exactly 0.0 below
    ~1e-7, so the metric must accumulate in float64 (VERDICT r2 weak-2)."""
    from admmnet_tpu.peaks.metrics import scale_invariant_nmse

    rng = np.random.default_rng(0)
    a = (rng.normal(size=64) + 1j * rng.normal(size=64)).astype(np.complex64)
    q = rng.normal(size=64) + 1j * rng.normal(size=64)
    a64 = a.astype(np.complex128)
    q -= (np.vdot(a64, q) / np.vdot(a64, a64)) * a64
    eps = 1e-5
    b = (a64 + eps * np.linalg.norm(a64) / np.linalg.norm(q) * q).astype(
        np.complex64
    )
    v = scale_invariant_nmse(b, a)
    assert 0.5 * eps**2 < v < 2.0 * eps**2, v
    assert scale_invariant_nmse(a, a) == 0.0


def test_peak_config_validates_refine_knobs():
    """Round-5: refine_precision enum + the zoom-coverage invariant
    (refine_points >= 1/reduce_factor + 1) raise at construction."""
    import pytest

    with pytest.raises(ValueError, match="refine_precision"):
        PeakSearchConfig(refine_precision="Default")
    with pytest.raises(ValueError, match="cannot cover"):
        PeakSearchConfig(refine_points=9)  # < 1/0.1 + 1
    # a coarser reduce factor legalizes fewer points
    assert PeakSearchConfig(refine_points=9, reduce_factor=0.2).refine_points == 9


def test_production_peaks_config_and_default_precision_parity():
    """PRODUCTION_PEAKS (round-5 gated deployment point) is constructible,
    and refine_precision='default' returns identical peaks to 'highest' on
    CPU (where DEFAULT is full f32) -- pins the precision plumbing."""
    import dataclasses

    from admmnet_tpu.core.config import (
        DETECTION_BUDGET_ITERS,
        PRODUCTION_PEAKS,
    )

    assert DETECTION_BUDGET_ITERS == 10
    assert PRODUCTION_PEAKS.refine_iters == 2
    assert PRODUCTION_PEAKS.refine_precision == "default"

    rng = np.random.default_rng(3)
    Nb = Nd = 10
    phi = (rng.normal(size=(4, Nb * Nd))
           + 1j * rng.normal(size=(4, Nb * Nd))).astype(np.complex64)
    hi = find_peaks(jnp.asarray(phi), Nb, Nd,
                    dataclasses.replace(PRODUCTION_PEAKS,
                                        refine_precision="highest"))
    de = find_peaks(jnp.asarray(phi), Nb, Nd, PRODUCTION_PEAKS)
    np.testing.assert_array_equal(np.asarray(hi.tau), np.asarray(de.tau))
    np.testing.assert_array_equal(np.asarray(hi.f), np.asarray(de.f))
