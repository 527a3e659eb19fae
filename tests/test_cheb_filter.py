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


def test_cheb_kernel_vjp_matches_xla_autodiff():
    """Round-5 training VJP: gradients of a scalar loss through the fused
    Clenshaw (custom_vjp: reversible backward kernel, interpret mode, exact
    matmuls) must match XLA autodiff through the identical polynomial to
    f32 accumulation noise -- both wrt M (through the normalization chain)
    and wrt the filter parameters (through the coefficients)."""
    from admmnet_tpu.kernels.cheb_filter import cheb_filter_matrices_ad

    M = jnp.asarray(_random_hermitian(3, 17, 2))
    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.normal(size=(3, 17, 17))
                    + 1j * rng.normal(size=(3, 17, 17))).astype(jnp.complex64)
    degree = 16
    c0 = jnp.asarray(rng.normal(size=(3, degree)).astype(np.float32) * 0.3)

    def xla_poly(M, c):
        """The identical normalized-domain Clenshaw in plain XLA."""
        m = M.shape[-1]
        r = jnp.sqrt(jnp.sum(jnp.abs(M) ** 2, axis=(-1, -2), keepdims=True))
        Mh = M / jnp.maximum(jnp.real(r), 1e-20).astype(M.dtype)
        eye = jnp.eye(m, dtype=M.dtype)
        b1 = jnp.zeros_like(M)
        b2 = jnp.zeros_like(M)
        for j in range(degree - 1, 0, -1):
            b0 = c[..., j, None, None].astype(M.dtype) * eye + (
                2.0 * jnp.matmul(Mh, b1,
                                 precision=jax.lax.Precision.HIGHEST) - b2
            )
            b1, b2 = b0, b1
        return c[..., 0, None, None].astype(M.dtype) * eye + (
            jnp.matmul(Mh, b1, precision=jax.lax.Precision.HIGHEST) - b2
        )

    def loss_xla(M, c):
        out = xla_poly(M, c)
        return jnp.sum(jnp.real(out * jnp.conj(W)))

    def loss_pal(M, c):
        out = cheb_filter_matrices_ad(M, c, degree, kblk=3, interpret=True,
                                      bwd_three_pass=False)
        return jnp.sum(jnp.real(out * jnp.conj(W)))

    gM_x, gc_x = jax.grad(loss_xla, argnums=(0, 1))(M, c0)
    gM_p, gc_p = jax.grad(loss_pal, argnums=(0, 1))(M, c0)

    def herm(X):
        return 0.5 * (np.asarray(X) + np.conj(np.swapaxes(np.asarray(X),
                                                          -1, -2)))

    # The two backward definitions agree on the Hermitian manifold: the
    # kernel's VJP symmetrizes the cotangent (adjoint of its closing
    # re-projection), the plain polynomial's does not, so the raw
    # cotangents differ by an ANTI-Hermitian component that every caller
    # kills (GLayer feeds hermitianize(M), whose adjoint projects it out).
    # Compare the Hermitian projections -- the gradients that exist.
    relM = np.linalg.norm(herm(gM_p) - herm(gM_x)) / np.linalg.norm(
        herm(gM_x))
    relc = np.linalg.norm(np.asarray(gc_p - gc_x)) / np.linalg.norm(
        np.asarray(gc_x))
    assert relM < 2e-4, relM
    assert relc < 2e-4, relc

    # 3-pass backward stays within split-precision error of the exact one
    def loss_pal3(M, c):
        out = cheb_filter_matrices_ad(M, c, degree, kblk=3, interpret=True,
                                      bwd_three_pass=True)
        return jnp.sum(jnp.real(out * jnp.conj(W)))

    gM_3, gc_3 = jax.grad(loss_pal3, argnums=(0, 1))(M, c0)
    relM3 = np.linalg.norm(herm(gM_3) - herm(gM_x)) / np.linalg.norm(
        herm(gM_x))
    assert relM3 < 3e-3, relM3


def test_glayer_pallas_impl_trains():
    """cheb_impl='pallas' must now produce gradients through the whole
    learned filter (threshold + value MLP + trunk), matching the XLA
    engine's gradients -- the round-4 ADVICE item (obscure Pallas
    transpose error) is closed by the custom VJP."""
    from admmnet_tpu.kernels.cheb_filter import apply_spectral_filter_pallas

    M = jnp.asarray(_random_hermitian(2, 12, 5))
    thr = jnp.float32(0.2)

    def loss(thr, impl_pallas):
        def f(w):
            return jax.nn.softplus(w - thr) * jax.nn.sigmoid(w)

        if impl_pallas:
            out = apply_spectral_filter_pallas(M, f, degree=12, kblk=2,
                                               interpret=True)
        else:
            out = apply_spectral_filter(
                M, f, degree=12, precision=jax.lax.Precision.DEFAULT)
        return jnp.sum(jnp.abs(out) ** 2)

    g_x = jax.grad(lambda t: loss(t, False))(thr)
    g_p = jax.grad(lambda t: loss(t, True))(thr)
    assert abs(float(g_p - g_x)) / max(abs(float(g_x)), 1e-9) < 1e-3, (
        float(g_p), float(g_x))
