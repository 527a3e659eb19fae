"""Fully-fused ADMM Pallas kernel vs the XLA fixed-iteration path
(interpret mode on CPU; the compiled path is exercised on TPU by bench)."""

import numpy as np
import jax.numpy as jnp

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.kernels.fused_admm import admm_solve_fused
from admmnet_tpu.solver import admm_solve_fixed


def test_fused_matches_fixed_path():
    y, b, s = make_anchor_batch(3, mode="redemod", seed=0)
    phi_f = np.asarray(
        admm_solve_fused(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 15,
                         interpret=True)
    )
    phi_x = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 15,
                         1.0, ADMMOptions(g_update="polar"))
    )
    err = np.linalg.norm(phi_f - phi_x, axis=-1) / np.linalg.norm(phi_x, axis=-1)
    assert err.max() < 5e-4, err


def test_fused_lambda_and_rho_parameters():
    y, b, s = make_anchor_batch(2, mode="redemod", seed=1)
    phi_f = np.asarray(
        admm_solve_fused(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 8,
                         rho=2.0, lambda_val=0.5, interpret=True)
    )
    phi_x = np.asarray(
        admm_solve_fixed(jnp.asarray(y), jnp.asarray(b), jnp.asarray(s), 8,
                         0.5, ADMMOptions(g_update="polar", rho=2.0))
    )
    err = np.linalg.norm(phi_f - phi_x, axis=-1) / np.linalg.norm(phi_x, axis=-1)
    assert err.max() < 5e-4, err
