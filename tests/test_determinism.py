"""Determinism guarantees the reference lacks (SURVEY.md section 4: its
training/data-gen are unseeded)."""

import numpy as np
import jax

from admmnet_tpu.core.config import ADMMOptions, DataConfig, ProblemSpec
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.data.anchor import make_anchor_batch
from admmnet_tpu.solver import admm_solve_fixed


def test_generate_batch_deterministic_under_key():
    cfg = DataConfig(spec=ProblemSpec(4, 4, 2))
    a = generate_batch(jax.random.PRNGKey(5), cfg, 32)
    b = generate_batch(jax.random.PRNGKey(5), cfg, 32)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    c = generate_batch(jax.random.PRNGKey(6), cfg, 32)
    assert not np.allclose(a["y"], c["y"])


def test_solver_is_deterministic():
    import jax.numpy as jnp

    y, b, s = make_anchor_batch(2, mode="redemod", seed=0)
    p1 = np.asarray(admm_solve_fixed(jnp.asarray(y), jnp.asarray(b),
                                     jnp.asarray(s), 10, 1.0, ADMMOptions()))
    p2 = np.asarray(admm_solve_fixed(jnp.asarray(y), jnp.asarray(b),
                                     jnp.asarray(s), 10, 1.0, ADMMOptions()))
    np.testing.assert_array_equal(p1, p2)


def test_anchor_batch_deterministic_under_seed():
    a = make_anchor_batch(4, seed=11)
    b = make_anchor_batch(4, seed=11)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
