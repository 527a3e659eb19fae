"""PSK modulation / demodulation and AWGN as pure-JAX, PRNG-keyed ops.

Functional parity with reference utils/mathUtils.py:53-111, but batched and
deterministic under explicit jax.random keys (the reference uses the numpy
global RNG, unseeded in data generation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from admmnet_tpu.ops.atoms import COMPLEX


def pskmod(data: jnp.ndarray, order: int, phase_offset: float = 0.0) -> jnp.ndarray:
    """M-ary PSK modulation: ints [0, M) -> unit-modulus complex symbols.

    Matches reference utils/mathUtils.py:53-68.
    """
    angle = 2.0 * jnp.pi * data.astype(jnp.float32) / order + phase_offset
    return jnp.exp(1j * angle).astype(COMPLEX)


def pskdemod(sig: jnp.ndarray, order: int, phase_offset: float = 0.0) -> jnp.ndarray:
    """M-ary PSK hard demodulation to ints [0, M).

    Matches reference utils/mathUtils.py:71-90: shift the decision boundary by
    pi/M, wrap to [0, 2*pi), quantize.
    """
    angles = jnp.angle(sig) - phase_offset
    angles = jnp.mod(angles + jnp.pi / order, 2.0 * jnp.pi)
    return jnp.floor(angles * order / (2.0 * jnp.pi)).astype(jnp.int32) % order


def awgn(key: jax.Array, sig: jnp.ndarray, snr_db, axis: int = -1) -> jnp.ndarray:
    """Add complex AWGN at the given per-signal SNR (dB).

    Matches reference utils/mathUtils.py:93-111: noise power = mean |sig|^2 /
    10^(snr/10), split evenly between real/imag parts.  ``snr_db`` may be
    batched (broadcast against sig without the ``axis`` dim).
    """
    sig_power = jnp.mean(jnp.abs(sig) ** 2, axis=axis, keepdims=True)
    snr_lin = 10.0 ** (jnp.asarray(snr_db, jnp.float32) / 10.0)
    noise_power = sig_power / jnp.expand_dims(snr_lin, axis)
    kr_, ki_ = jax.random.split(key)
    shape = sig.shape
    noise = jax.random.normal(kr_, shape) + 1j * jax.random.normal(ki_, shape)
    return sig + jnp.sqrt(noise_power / 2.0).astype(COMPLEX) * noise.astype(COMPLEX)
