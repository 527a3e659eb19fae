"""Fused Clenshaw spectral-filter kernel (kernels/cheb_filter.py) vs the
XLA matrix-function evaluation (ops/chebyshev.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from admmnet_tpu.kernels.cheb_filter import (
    apply_spectral_filter_pallas,
    cheb_filter_matrices,
)
from admmnet_tpu.ops.chebyshev import (
    apply_spectral_filter,
    chebyshev_nodes,
    coefficient_matrix,
)


def _random_hermitian(b, m, seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(b, m, m)) + 1j * rng.normal(size=(b, m, m))
    return ((X + np.conj(np.swapaxes(X, -1, -2))) / 2).astype(np.complex64)


def test_cheb_kernel_matches_xla_default():
    """Interpret mode runs the kernel's one-pass matmuls at f32, exactly the
    XLA path's off-TPU DEFAULT -- same polynomial, same normalization, so
    the two evaluations agree to f32 accumulation noise."""
    M = jnp.asarray(_random_hermitian(6, 33, 0))

    def f(w):  # a PSD-projection-like filter
        return jax.nn.softplus(w - 0.3)

    ref = np.asarray(apply_spectral_filter(
        M, f, degree=24, precision=jax.lax.Precision.DEFAULT))
    out = np.asarray(apply_spectral_filter_pallas(
        M, f, degree=24, kblk=2, interpret=True))
    err = (np.linalg.norm((out - ref).reshape(6, -1), axis=-1)
           / np.linalg.norm(ref.reshape(6, -1), axis=-1))
    assert err.max() < 5e-5, err


def test_cheb_kernel_is_a_matrix_function():
    """Against the eigendecomposition oracle: the kernel must apply f to the
    spectrum (V f(L) V^H) within Chebyshev truncation error."""
    M = jnp.asarray(_random_hermitian(4, 16, 1))

    def f(w):
        return jnp.tanh(w) * 0.5 + 0.5 * w  # smooth filter

    out = np.asarray(apply_spectral_filter_pallas(
        M, f, degree=48, kblk=4, interpret=True))
    w, V = np.linalg.eigh(np.asarray(M))
    oracle = np.einsum("...ij,...j,...kj->...ik", V, np.asarray(f(w)),
                       np.conj(V))
    err = (np.linalg.norm((out - oracle).reshape(4, -1), axis=-1)
           / np.linalg.norm(oracle.reshape(4, -1), axis=-1))
    # ~1.2e-3 is the float32 truncation floor of the METHOD (the XLA engine
    # measures the same against this oracle; kernel-vs-XLA is ~2e-7)
    assert err.max() < 5e-3, err


def test_cheb_kernel_padding_and_coeffs():
    """Batch not a kblk multiple + direct coefficient entry point."""
    M = jnp.asarray(_random_hermitian(3, 20, 2))
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.normal(size=(3, 16)).astype(np.float32) * 0.1)
    out2 = np.asarray(cheb_filter_matrices(M, c, 16, kblk=2, interpret=True))
    out1 = np.asarray(cheb_filter_matrices(M, c, 16, kblk=1, interpret=True))
    np.testing.assert_allclose(out2, out1, rtol=2e-5, atol=1e-6)


def test_glayer_pallas_impl_cpu_fallback():
    """GLayer(cheb_impl="pallas") off-TPU falls back to the XLA one-pass
    evaluation -- the numerics the kernel implements -- so the model runs
    everywhere with one config."""
    from admmnet_tpu.core.config import ModelConfig, ProblemSpec
    from admmnet_tpu.models import PhiEstADMMNet

    spec = ProblemSpec(Nb=4, Nd=4, L_max=2)
    rng = np.random.default_rng(0)
    y = (rng.normal(size=(2, 16)) + 1j * rng.normal(size=(2, 16))).astype(
        np.complex64)
    b = np.exp(1j * rng.uniform(0, 2 * np.pi, (2, 16))).astype(np.complex64)
    s = np.ones(2, np.float32)

    outs = {}
    for impl in ("xla", "pallas"):
        mcfg = ModelConfig(spec=spec, num_layers=2, g_mode="chebyshev",
                           cheb_degree=16, cheb_impl=impl,
                           cheb_precision="default")
        model = PhiEstADMMNet(cfg=mcfg)
        p = model.init(jax.random.PRNGKey(0), jnp.asarray(y), jnp.asarray(b),
                       jnp.asarray(s))
        outs[impl] = np.asarray(model.apply(p, jnp.asarray(y), jnp.asarray(b),
                                            jnp.asarray(s)))
    np.testing.assert_allclose(outs["pallas"], outs["xla"], rtol=1e-5,
                               atol=1e-6)
