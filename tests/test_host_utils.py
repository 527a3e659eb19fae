"""Complex-safe host<->device boundary helpers."""

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.utils import cjit, to_device, to_host


def test_cjit_roundtrips_complex_args():
    y = (np.arange(6) + 1j * np.ones(6)).astype(np.complex64)

    @cjit
    def f(y, scale):
        return jnp.abs(y) * scale, y * 2

    mag, doubled = f(y, np.float32(2.0))
    np.testing.assert_allclose(np.asarray(mag), 2 * np.abs(y), rtol=1e-6)
    out = to_host(doubled)
    np.testing.assert_allclose(out, 2 * y, rtol=1e-6)


def test_to_host_handles_mixed_pytree():
    tree = {"a": jnp.ones(3), "b": (jnp.asarray([1 + 2j]), 5)}
    host = to_host(tree)
    np.testing.assert_allclose(host["a"], 1.0)
    np.testing.assert_allclose(host["b"][0], [1 + 2j])
    assert host["b"][1] == 5


def test_to_device_and_back():
    x = {"phi": (np.random.default_rng(0).normal(size=4)
                 + 1j * np.random.default_rng(1).normal(size=4)).astype(np.complex64)}
    dev = to_device(x)
    assert jnp.iscomplexobj(dev["phi"])
    back = to_host(dev)
    np.testing.assert_allclose(back["phi"], x["phi"], rtol=1e-6)
