"""Anchor-case construction parity with the bundled data.npz facts."""

import numpy as np

from admmnet_tpu.data.anchor import load_anchor, make_anchor_batch


def test_fixed_e_anchor_facts():
    sc = load_anchor(mode="fixed_e", rng=np.random.default_rng(0))
    assert abs(sc.sigma - 4.4641016) < 1e-4  # ||e/b|| + 1 from data.npz
    assert sc.ser == 6.0  # 6 of 100 symbols in error
    np.testing.assert_allclose(np.abs(sc.b), 1.0, atol=1e-12)
    assert sc.y.shape == (100,)


def test_redemod_anchor_has_fresh_errors():
    sc1 = load_anchor(mode="redemod", rng=np.random.default_rng(1))
    sc2 = load_anchor(mode="redemod", rng=np.random.default_rng(2))
    assert not np.allclose(sc1.y, sc2.y)
    np.testing.assert_allclose(np.abs(sc1.b), 1.0, atol=1e-12)


def test_anchor_batch_shapes():
    y, b, s = make_anchor_batch(4, seed=0)
    assert y.shape == (4, 100) and b.shape == (4, 100) and s.shape == (4,)
    assert y.dtype == np.complex64
