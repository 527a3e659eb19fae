"""Data-parallel (mesh) training inside the REAL trainer (VERDICT round-1
item 1): the sharded trainer must reproduce the single-device loss
trajectory, and the device-side eval metrics must match the host (numpy)
reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from admmnet_tpu.core.config import (
    DataConfig,
    ModelConfig,
    ProblemSpec,
    TrainConfig,
)
from admmnet_tpu.data.generator import generate_batch
from admmnet_tpu.parallel import data_mesh
from admmnet_tpu.train.trainer import (
    _detection_counts,
    _detection_counts_dev,
    _masked_rmse,
    _masked_rmse_dev,
    _matched_rmse_pair,
    _matched_rmse_pair_dev,
    train_admmnet,
    train_phinet,
)


def _silent(*_a, **_k):
    pass


def _tiny_data(B=16, seed=0, with_phi=False):
    spec = ProblemSpec(Nb=4, Nd=4, L_max=2)
    data = generate_batch(jax.random.PRNGKey(seed), DataConfig(spec=spec), B)
    if with_phi:
        # cheap synthetic phi labels: enough to drive PhiAlignmentLoss
        rng = np.random.default_rng(seed)
        n = spec.n
        data["phi"] = (
            rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n))
        ).astype(np.complex64)
    return spec, data


def test_mesh_trainer_matches_single_device(tmp_path):
    spec, data = _tiny_data(16)
    mcfg = ModelConfig(spec=spec, num_layers=2, hidden_dim=32)
    tcfg = TrainConfig(batch_size=8, epochs=2, patience=10)

    r_single = train_admmnet(
        mcfg, tcfg, data, data, test_data=data,
        workdir=tmp_path / "single", log_fn=_silent,
    )
    r_mesh = train_admmnet(
        mcfg, tcfg, data, data, test_data=data,
        workdir=tmp_path / "mesh", log_fn=_silent, mesh=data_mesh(8),
    )

    np.testing.assert_allclose(
        r_mesh.history["train_loss"], r_single.history["train_loss"],
        rtol=5e-4,
    )
    np.testing.assert_allclose(
        r_mesh.history["val_loss"], r_single.history["val_loss"], rtol=5e-4
    )
    np.testing.assert_allclose(
        r_mesh.history["tau_rmse"], r_single.history["tau_rmse"], atol=2e-4
    )
    for k in ("f1_score", "precision", "recall"):
        assert r_mesh.test_metrics[k] == pytest.approx(
            r_single.test_metrics[k], abs=1e-6
        )
    # the mesh run must have produced real (process-0) artifacts
    assert (tmp_path / "mesh" / "training_history.json").exists()
    assert (tmp_path / "mesh" / "test_result.json").exists()


def test_mesh_trainer_phi_mode(tmp_path):
    spec, data = _tiny_data(16, with_phi=True)
    mcfg = ModelConfig(spec=spec, num_layers=2, hidden_dim=32)
    tcfg = TrainConfig(batch_size=8, epochs=1, patience=5)
    r = train_phinet(
        mcfg, tcfg, data, data, workdir=tmp_path / "phi",
        log_fn=_silent, mesh=data_mesh(8),
    )
    assert np.isfinite(r.history["train_loss"][-1])
    assert np.isfinite(r.best_val_loss)


def test_device_metrics_match_numpy():
    rng = np.random.default_rng(3)
    B, L = 32, 3
    tau_p = rng.uniform(0, 1, (B, L)).astype(np.float32)
    f_p = rng.uniform(-0.5, 0.5, (B, L)).astype(np.float32)
    tau_t = rng.uniform(0, 1, (B, L)).astype(np.float32)
    f_t = rng.uniform(-0.5, 0.5, (B, L)).astype(np.float32)
    conf = rng.uniform(0, 1, (B, L)).astype(np.float32)
    L_true = rng.integers(0, L + 1, B).astype(np.int32)

    assert float(
        _masked_rmse_dev(jnp.asarray(tau_p), jnp.asarray(tau_t), jnp.asarray(L_true))
    ) == pytest.approx(_masked_rmse(tau_p, tau_t, L_true), abs=1e-6)

    t_np, f_np = _matched_rmse_pair(tau_p, f_p, tau_t, f_t, L_true)
    t_dv, f_dv = _matched_rmse_pair_dev(
        jnp.asarray(tau_p), jnp.asarray(f_p), jnp.asarray(tau_t),
        jnp.asarray(f_t), jnp.asarray(L_true),
    )
    assert float(t_dv) == pytest.approx(t_np, abs=1e-6)
    assert float(f_dv) == pytest.approx(f_np, abs=1e-6)

    tp, fp, fn = _detection_counts(conf, L_true, 0.5)
    tp_d, fp_d, fn_d = _detection_counts_dev(
        jnp.asarray(conf), jnp.asarray(L_true), 0.5
    )
    assert (int(tp_d), int(fp_d), int(fn_d)) == (tp, fp, fn)


def test_device_metrics_empty_scenes():
    z = jnp.zeros((4, 3), jnp.float32)
    L0 = jnp.zeros(4, jnp.int32)
    assert float(_masked_rmse_dev(z, z, L0)) == 0.0
    t, f = _matched_rmse_pair_dev(z, z, z, z, L0)
    assert float(t) == 0.0 and float(f) == 0.0
