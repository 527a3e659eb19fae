"""Host <-> device boundary helpers for complex data.

Empirical contract of the axon TPU tunnel backend (probed, 2026-08):

- complex arrays CANNOT cross the host<->device boundary in either direction:
  host complex fed to jit poisons the whole execution (every output transfer
  then fails UNIMPLEMENTED), eager ``jnp.asarray(complex)`` fails, and complex
  jit outputs cannot be fetched;
- complex arrays living on device (produced inside jit) are fine, including
  as arguments to further jit calls;
- real/int/bool jit outputs fetch normally; eager-op outputs do not.

Consequently every host-facing entry point in this framework moves complex
data as float32 (real, imag) pairs and recombines/splits INSIDE jit.  These
helpers implement that convention; on CPU backends they are equivalent no-ops
in behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_host", "to_device", "cjit"]

_combine = jax.jit(lambda re, im: (re + 1j * im).astype(jnp.complex64))
_split = jax.jit(lambda z: (jnp.real(z), jnp.imag(z)))
_idn = jax.jit(lambda x: x + jnp.zeros_like(x))  # force a jit-computed result


def _is_jax_array(v):
    return isinstance(v, jax.Array)


def _fetch_leaf(v):
    if isinstance(v, (np.ndarray, np.generic, int, float, bool, complex)):
        return np.asarray(v)
    if jnp.iscomplexobj(v):
        re, im = _split(v)
        return np.asarray(re) + 1j * np.asarray(im)
    try:
        return np.asarray(v)
    except Exception:
        return np.asarray(_idn(v))


def to_host(tree):
    """Fetch a pytree of device arrays to host numpy, complex-safe."""
    return jax.tree.map(_fetch_leaf, tree)


def _put_leaf(v):
    if isinstance(v, np.ndarray) and np.iscomplexobj(v):
        return _combine(
            np.ascontiguousarray(v.real, np.float32),
            np.ascontiguousarray(v.imag, np.float32),
        )
    return v


def to_device(tree):
    """Move a host pytree to device, splitting complex leaves through jit."""
    return jax.tree.map(_put_leaf, tree)


def cjit(fn, **jit_kwargs):
    """``jax.jit`` that tolerates host complex numpy arguments and fetchable
    outputs.

    Host complex numpy leaves are re-encoded as float pairs and recombined
    inside the jitted function; device-resident complex leaves pass through.
    Outputs stay on device (complex included) -- use :func:`to_host` to fetch.
    """
    inner = jax.jit(_DecodeCall(fn), **jit_kwargs)

    @functools.wraps(fn)
    def wrapper(*args):
        enc = jax.tree.map(_encode_leaf, args)
        return inner(enc)

    return wrapper


def _encode_leaf(v):
    if isinstance(v, np.ndarray) and np.iscomplexobj(v):
        # plain dict: a pytree node jit can traverse (keys "re"/"im" are
        # reserved markers of an encoded complex leaf)
        return {
            "re": np.ascontiguousarray(v.real, np.float32),
            "im": np.ascontiguousarray(v.imag, np.float32),
        }
    return v


def _decode_leaf(v):
    if isinstance(v, dict) and set(v.keys()) == {"re", "im"}:
        return (v["re"] + 1j * v["im"]).astype(jnp.complex64)
    return v


class _DecodeCall:
    """Hashable callable wrapper so jit caches on the underlying fn."""

    def __init__(self, fn):
        self._fn = fn

    def __call__(self, enc_args):
        args = jax.tree.map(
            _decode_leaf,
            enc_args,
            is_leaf=lambda x: isinstance(x, dict) and set(x.keys()) == {"re", "im"},
        )
        return self._fn(*args)

    def __hash__(self):
        return hash(self._fn)

    def __eq__(self, other):
        return isinstance(other, _DecodeCall) and self._fn == other._fn
