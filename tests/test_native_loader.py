"""Native C++ loader: build, gather parity with numpy, prefetch iteration."""

import numpy as np
import pytest

from admmnet_tpu.data.loader import (
    PrefetchLoader,
    ensure_built,
    gather_rows,
    shuffle_indices,
)

pytestmark = pytest.mark.skipif(
    not ensure_built(), reason="native toolchain unavailable"
)


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1000, 37)).astype(np.float32)
    idx = rng.integers(0, 1000, 256).astype(np.int64)
    got = gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])


def test_shuffle_is_permutation_and_deterministic():
    i1 = shuffle_indices(1000, seed=7)
    i2 = shuffle_indices(1000, seed=7)
    i3 = shuffle_indices(1000, seed=8)
    np.testing.assert_array_equal(i1, i2)
    assert not np.array_equal(i1, i3)
    np.testing.assert_array_equal(np.sort(i1), np.arange(1000))


def test_prefetch_loader_covers_dataset_with_complex():
    rng = np.random.default_rng(1)
    N = 300
    data = {
        "y": (rng.normal(size=(N, 16)) + 1j * rng.normal(size=(N, 16))).astype(
            np.complex64
        ),
        "sigma": rng.normal(size=N).astype(np.float32),
        "L_true": rng.integers(0, 3, N).astype(np.int32),
    }
    loader = PrefetchLoader(data, batch_size=64, shuffle=True, seed=3)
    seen_sigma = []
    total = 0
    for batch in loader:
        assert batch["y"].dtype == np.complex64
        assert batch["y"].shape[1:] == (16,)
        total += batch["y"].shape[0]
        seen_sigma.append(batch["sigma"])
        # row integrity: y row must match the row whose sigma it came with
        for j in range(0, batch["y"].shape[0], 17):
            src_row = np.where(data["sigma"] == batch["sigma"][j])[0][0]
            np.testing.assert_allclose(batch["y"][j], data["y"][src_row])
    assert total == N
    all_sigma = np.sort(np.concatenate(seen_sigma))
    np.testing.assert_allclose(all_sigma, np.sort(data["sigma"]))


def test_prefetch_loader_unshuffled_order():
    N = 100
    data = {"x": np.arange(N * 2, dtype=np.float32).reshape(N, 2)}
    loader = PrefetchLoader(data, batch_size=32, shuffle=False)
    rows = np.concatenate([b["x"] for b in loader])
    np.testing.assert_array_equal(rows, data["x"])
