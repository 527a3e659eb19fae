"""Unit tests for the atom factory against independent numpy oracles
(oracle behavior transcribed from the math in reference utils/mathUtils.py)."""

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.ops import atoms


def np_vander(x, y, length):
    return np.exp(1j * 2 * np.pi * np.linspace(x, y, length))


def test_vander_vec_matches_numpy():
    got = np.asarray(atoms.vander_vec(0.0, 9 * 0.14, 10))
    want = np_vander(0.0, 9 * 0.14, 10)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_steering_equals_vander():
    f = 0.23
    got = np.asarray(atoms.doppler_steering(f, 10))
    want = np_vander(0, 9 * f, 10)
    np.testing.assert_allclose(got, want, atol=1e-5)
    tau = 0.41
    got = np.asarray(atoms.delay_steering(tau, 7))
    want = np_vander(0, 6 * tau, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_khatri_rao_matches_columnwise_kron():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(4, 3)) + 1j * rng.normal(size=(4, 3))
    B = rng.normal(size=(5, 3)) + 1j * rng.normal(size=(5, 3))
    got = np.asarray(atoms.khatri_rao(jnp.asarray(A), jnp.asarray(B)))
    want = np.stack([np.kron(A[:, i], B[:, i]) for i in range(3)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_atom_layout_matches_kron_of_steerings():
    Nb, Nd = 4, 5
    tau, f = 0.37, -0.12
    a = np.asarray(atoms.atom(tau, f, Nb, Nd))
    s = np_vander(0, (Nb - 1) * f, Nb)
    d = np_vander(0, (Nd - 1) * tau, Nd)
    want = np.kron(s, np.conj(d))
    np.testing.assert_allclose(a, want, atol=1e-5)


def test_target_signal_matches_reference_psi_construction():
    """Psi = kr(S, conj(D)) @ C exactly as reference main.py:19-29."""
    Nb, Nd, L = 10, 10, 3
    f = np.array([-0.25, 0.0, 0.14])
    tau = np.array([0.45, 0.25, 0.63])
    C = np.array([-0.5 + 1j, 0.6 - 0.2j, 0.3 + 0.7j])

    S = np.stack([np_vander(0, (Nb - 1) * f[i], Nb) for i in range(L)], axis=1)
    D = np.stack([np_vander(0, (Nd - 1) * tau[i], Nd) for i in range(L)], axis=1)
    kr = np.stack([np.kron(S[:, i], np.conj(D[:, i])) for i in range(L)], axis=1)
    want = kr @ C

    got = np.asarray(atoms.target_signal(tau, f, C, Nb, Nd))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_atom_batched_shapes():
    taus = jnp.linspace(0, 0.9, 7)
    fs = jnp.linspace(-0.4, 0.4, 7)
    A = atoms.atom_matrix(taus, fs, 10, 10)
    assert A.shape == (7, 100)
    # unit modulus entries
    np.testing.assert_allclose(np.abs(np.asarray(A)), 1.0, atol=1e-5)
