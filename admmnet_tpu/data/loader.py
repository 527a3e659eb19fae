"""Batch pipeline with native (C++) shuffle/gather and background prefetch.

``PrefetchLoader`` assembles shuffled minibatches in C++ worker threads (GIL
released via ctypes) one batch ahead of consumption, so host batch prep
overlaps with device compute -- the native runtime counterpart the
reference's DataLoader config promises but never wires up (reference
train.py:21 vs generate_data.py:298).

Falls back transparently to the pure-numpy `iterate_batches` path when the
shared library is unavailable (e.g. no toolchain); `ensure_built()` compiles
it on demand with make/g++.
"""

from __future__ import annotations

import ctypes
import queue
import subprocess
import threading
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libfastloader.so"
_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libfastloader.so if missing; return availability."""
    global _lib
    if _lib is not None:
        return True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=quiet,
            )
        except Exception:
            return False
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return False
    lib.fl_gather_rows.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.fl_gather_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.fl_shuffle_indices.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
    ]
    _lib = lib
    return True


def native_available() -> bool:
    return ensure_built()


def _as2d(v: np.ndarray) -> np.ndarray:
    return v.reshape(v.shape[0], -1)


def gather_rows(src: np.ndarray, idx: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """Native dst[i] = src[idx[i]] for float32 2-D arrays (testing hook)."""
    assert ensure_built()
    src = np.ascontiguousarray(_as2d(src), np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((idx.shape[0], src.shape[1]), np.float32)
    _lib.fl_gather_rows(
        src.ctypes.data, src.shape[0], src.shape[1],
        idx.ctypes.data, idx.shape[0], out.ctypes.data, n_threads,
    )
    return out


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic native Fisher-Yates permutation of [0, n)."""
    assert ensure_built()
    idx = np.empty(n, np.int64)
    _lib.fl_shuffle_indices(idx.ctypes.data, n, ctypes.c_uint64(seed))
    return idx


class _SplitComplex:
    """View a complex array as a float32 (rows, 2*cols) plane for gathering."""

    def __init__(self, v: np.ndarray):
        self.complex = np.iscomplexobj(v)
        self.shape = v.shape
        if self.complex:
            c = np.ascontiguousarray(v.astype(np.complex64))
            self.plane = c.view(np.float32).reshape(v.shape[0], -1)
        else:
            self.plane = np.ascontiguousarray(
                _as2d(v).astype(np.float32)
            )

    def assemble(self, gathered: np.ndarray, n: int) -> np.ndarray:
        if self.complex:
            out = gathered.view(np.complex64)
            return out.reshape(n, *self.shape[1:])
        return gathered.reshape(n, *self.shape[1:])


class PrefetchLoader:
    """Iterate shuffled minibatches with native gather + background prefetch.

    Integer arrays (e.g. L_true) are gathered host-side in numpy (cheap);
    float/complex features go through the C++ path.
    """

    def __init__(
        self,
        data: Dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        n_threads: int = 4,
        prefetch: int = 2,
        drop_remainder: bool = False,
    ):
        if not ensure_built():
            raise RuntimeError("native loader unavailable; use iterate_batches")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.n_threads = n_threads
        self.prefetch = prefetch
        self.drop_remainder = drop_remainder
        self._float_keys = [
            k for k, v in data.items() if v.dtype.kind in "fc"
        ]
        self._other = {k: v for k, v in data.items() if v.dtype.kind not in "fc"}
        self._views = {k: _SplitComplex(data[k]) for k in self._float_keys}
        self.n = next(iter(data.values())).shape[0]

    def _assemble(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        n = idx.shape[0]
        planes = [self._views[k].plane for k in self._float_keys]
        outs = [np.empty((n, p.shape[1]), np.float32) for p in planes]
        src_ptrs = (ctypes.c_void_p * len(planes))(
            *[p.ctypes.data for p in planes]
        )
        dst_ptrs = (ctypes.c_void_p * len(outs))(*[o.ctypes.data for o in outs])
        colss = np.asarray([p.shape[1] for p in planes], np.int64)
        idx = np.ascontiguousarray(idx, np.int64)
        _lib.fl_gather_batch(
            src_ptrs, dst_ptrs, colss.ctypes.data, len(planes),
            idx.ctypes.data, n, self.n_threads,
        )
        batch = {
            k: self._views[k].assemble(o, n)
            for k, o in zip(self._float_keys, outs)
        }
        for k, v in self._other.items():
            batch[k] = v[idx]
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.shuffle:
            order = shuffle_indices(self.n, self.seed)
        else:
            order = np.arange(self.n, dtype=np.int64)
        stop = (
            self.n - (self.n % self.batch_size)
            if self.drop_remainder else self.n
        )
        starts = list(range(0, stop, self.batch_size))
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def producer():
            for s in starts:
                q.put(self._assemble(order[s : s + self.batch_size]))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()

    def __len__(self) -> int:
        return (self.n + self.batch_size - 1) // self.batch_size
