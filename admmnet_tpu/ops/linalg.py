"""Lifted-matrix assembly and norm helpers for the ANM-DUMV ADMM.

The lifted variable is the (n+1) x (n+1) Hermitian block matrix
``[[H, phi], [phi^H, 1/lambda^2]]`` with H = diag(h) real
(reference admm.py:88-92,151-164; admm_net.py:262-290).  All ops are batched
over leading dims and built from scatter-free concatenation so XLA fuses them.
"""

from __future__ import annotations

import jax.numpy as jnp

from admmnet_tpu.ops.atoms import COMPLEX


def assemble_lifted(h: jnp.ndarray, phi: jnp.ndarray, lam_inv_sq) -> jnp.ndarray:
    """Build [[diag(h), phi], [phi^H, lam_inv_sq]] of shape (..., n+1, n+1).

    h: (..., n) real; phi: (..., n) complex; lam_inv_sq: scalar or (...,).
    """
    n = phi.shape[-1]
    H = jnp.zeros((*phi.shape, n), dtype=COMPLEX) + (
        h.astype(COMPLEX)[..., None] * jnp.eye(n, dtype=COMPLEX)
    )
    top = jnp.concatenate([H, phi[..., :, None]], axis=-1)  # (..., n, n+1)
    corner = jnp.broadcast_to(
        jnp.asarray(lam_inv_sq, COMPLEX), phi.shape[:-1]
    )[..., None, None]
    bottom = jnp.concatenate(
        [jnp.conj(phi)[..., None, :], corner], axis=-1
    )  # (..., 1, n+1)
    return jnp.concatenate([top, bottom], axis=-2)


def lifted_topleft(M: jnp.ndarray) -> jnp.ndarray:
    """Upper-left n x n block of a lifted (..., n+1, n+1) matrix."""
    return M[..., :-1, :-1]


def lifted_corner_vec(M: jnp.ndarray) -> jnp.ndarray:
    """Last column without the corner: M[..., :n, n], shape (..., n)."""
    return M[..., :-1, -1]


def hermitianize(M: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (M + jnp.conj(jnp.swapaxes(M, -1, -2)))


def fro_norm(M: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm over the trailing two dims, batched."""
    return jnp.sqrt(jnp.sum(jnp.abs(M) ** 2, axis=(-1, -2)))


def vec_norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=-1))
