"""PSK/AWGN parity tests against numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from admmnet_tpu.ops import signal as sig


def np_pskmod(data, M, off):
    return np.exp(1j * (2 * np.pi * data / M + off))


def np_pskdemod(s, M, off):
    ang = np.mod(np.angle(s) - off + np.pi / M, 2 * np.pi)
    return np.floor(ang * M / (2 * np.pi)).astype(int) % M


def test_pskmod_matches_numpy():
    data = np.arange(4)
    got = np.asarray(sig.pskmod(jnp.asarray(data), 4, np.pi / 4))
    np.testing.assert_allclose(got, np_pskmod(data, 4, np.pi / 4), atol=1e-6)


def test_mod_demod_roundtrip():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 4, 1000)
    s = sig.pskmod(jnp.asarray(data), 4, np.pi / 4)
    back = np.asarray(sig.pskdemod(s, 4, np.pi / 4))
    np.testing.assert_array_equal(back, data)


def test_demod_matches_numpy_on_noisy_signal():
    rng = np.random.default_rng(8)
    s = rng.normal(size=200) + 1j * rng.normal(size=200)
    got = np.asarray(sig.pskdemod(jnp.asarray(s, jnp.complex64), 4, np.pi / 4))
    want = np_pskdemod(s.astype(np.complex64), 4, np.pi / 4)
    np.testing.assert_array_equal(got, want)


def test_awgn_snr_statistics():
    key = jax.random.PRNGKey(0)
    s = jnp.ones(200_000, jnp.complex64)
    noisy = sig.awgn(key, s, 10.0)
    noise_power = float(jnp.mean(jnp.abs(noisy - s) ** 2))
    assert abs(noise_power - 0.1) < 0.005  # 10 dB below unit power


def test_awgn_batched_snr():
    key = jax.random.PRNGKey(1)
    s = jnp.ones((2, 100_000), jnp.complex64)
    noisy = sig.awgn(key, s, jnp.asarray([10.0, 20.0]))
    p = np.asarray(jnp.mean(jnp.abs(noisy - s) ** 2, axis=-1))
    assert abs(p[0] - 0.1) < 0.01 and abs(p[1] - 0.01) < 0.001
