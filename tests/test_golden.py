"""Golden-value regression tests on the deterministic fixed_e anchor."""

import numpy as np
import jax.numpy as jnp
from pathlib import Path

from admmnet_tpu.core.config import ADMMOptions
from admmnet_tpu.data.anchor import load_anchor
from admmnet_tpu.peaks import phi_nmse
from admmnet_tpu.solver import admm_solve

GOLDEN = Path(__file__).parent / "golden" / "anchor_refcompat_phi.npy"


def test_ref_compat_phi_matches_golden_snapshot():
    """The ref-compat solver output on the fixed anchor is frozen: any change
    to phi here means reference-parity broke."""
    sc = load_anchor(mode="fixed_e", rng=np.random.default_rng(0))
    res = admm_solve(
        jnp.asarray(sc.y, jnp.complex64),
        jnp.asarray(sc.b, jnp.complex64),
        jnp.float32(sc.sigma),
        1.0,
        ADMMOptions(phi_update="ref_dense", g_update="ref_identity",
                    max_iter=100),
    )
    golden = np.load(GOLDEN)
    assert phi_nmse(np.asarray(res.phi), golden) < 1e-8
    assert int(res.iterations) == 5
