"""End-to-end training-driver tests on tiny problems (CPU)."""

import numpy as np
import pytest

from admmnet_tpu.core.config import (
    ADMMOptions,
    DataConfig,
    ModelConfig,
    ProblemSpec,
    TrainConfig,
)
from admmnet_tpu.data.generator import DatasetGenerator, generate_batch, iterate_batches
from admmnet_tpu.train.trainer import train_admmnet, train_phinet
from admmnet_tpu.train.schedules import sgdr_schedule

import jax

SPEC = ProblemSpec(Nb=4, Nd=4, L_max=2)
DCFG = DataConfig(spec=SPEC)


def _dataset(n, seed=0, with_phi=False):
    data = generate_batch(jax.random.PRNGKey(seed), DCFG, n)
    if with_phi:
        from admmnet_tpu.data.generator import label_phi

        data["phi"] = label_phi(
            data["y"], data["b"], data["sigma"], ADMMOptions(), iters=10
        )
    return data


def test_generate_batch_distributions():
    d = _dataset(512)
    assert d["y"].shape == (512, 16) and d["y"].dtype == np.complex64
    assert d["tau"].min() >= 0.1 and d["tau"].max() <= 0.9
    assert d["f"].min() >= -0.4 and d["f"].max() <= 0.4
    np.testing.assert_allclose(np.abs(d["b"]), 1.0, atol=1e-5)
    assert np.all(d["sigma"] >= 1.0)
    assert d["L_true"].tolist() == [2] * 512
    # gains roughly N(0, 0.7^2)
    assert abs(np.std(d["C"].real) - 0.7) < 0.1


def test_sgdr_schedule_restarts():
    s = sgdr_schedule(1e-3, steps_per_epoch=10, total_epochs=40, t0_epochs=10)
    # start of cycle ~ base lr; end of first cycle ~ eta_min; restart jumps back
    assert abs(float(s(0)) - 1e-3) < 1e-9
    assert float(s(99)) < 5e-5
    assert abs(float(s(100)) - 1e-3) < 5e-5


def test_train_admmnet_end_to_end(tmp_path):
    mcfg = ModelConfig(spec=SPEC, num_layers=2, hidden_dim=32)
    tcfg = TrainConfig(batch_size=32, epochs=2, patience=5, seed=0)
    train = _dataset(96, seed=1)
    val = _dataset(32, seed=2)
    test = _dataset(32, seed=3)
    res = train_admmnet(mcfg, tcfg, train, val, test, workdir=tmp_path / "run")
    assert len(res.history["train_loss"]) == 2
    assert np.isfinite(res.history["train_loss"]).all()
    assert res.best_val_loss < np.inf
    assert (tmp_path / "run" / "best_model.msgpack").exists()
    assert (tmp_path / "run" / "training_history.json").exists()
    assert (tmp_path / "run" / "test_result.json").exists()
    assert set(res.test_metrics) >= {"precision", "recall", "f1_score", "tau_rmse"}
    # the position-matched protocol is co-reported in every e2e test artifact
    # (a collapsed head scores count-F1 1.0 but matched-F1 ~0; verdict r3)
    import json

    on_disk = json.loads((tmp_path / "run" / "test_result.json").read_text())
    assert set(on_disk) >= {
        "precision", "recall", "f1_score", "tau_rmse", "f_rmse",
        "matched_precision", "matched_recall", "matched_f1",
        "matched_tau_rmse", "matched_f_rmse", "match_tol",
    }
    assert on_disk["match_tol"] == 0.05


def test_train_admmnet_spectrum_head(tmp_path):
    """e2e training with the differentiable spectral-search head
    (ModelConfig.head="spectrum") runs, checkpoints, and scores."""
    mcfg = ModelConfig(spec=SPEC, num_layers=2, hidden_dim=32, head="spectrum")
    tcfg = TrainConfig(
        batch_size=32, epochs=2, patience=5, seed=0, assignment="perm",
        spectral_weight=0.5,
    )
    train = _dataset(96, seed=1)
    val = _dataset(32, seed=2)
    test = _dataset(32, seed=3)
    res = train_admmnet(mcfg, tcfg, train, val, test, workdir=tmp_path / "run")
    assert len(res.history["train_loss"]) == 2
    assert np.isfinite(res.history["train_loss"]).all()
    assert (tmp_path / "run" / "best_model.msgpack").exists()
    assert set(res.test_metrics) >= {"precision", "recall", "f1_score", "tau_rmse"}


def test_train_admmnet_init_from_phinet(tmp_path):
    """--init-from grafts a trained PhiEstADMMNet trunk into the e2e
    ADMMNet before fine-tuning (the reference deploys exactly this
    combination, main_for_net.py:99-104)."""
    import flax.serialization as fser

    mcfg_phi = ModelConfig(spec=SPEC, num_layers=2, hidden_dim=32)
    tcfg1 = TrainConfig(batch_size=32, epochs=1, seed=0)
    phi_train = _dataset(64, seed=7, with_phi=True)
    phi_val = _dataset(32, seed=8, with_phi=True)
    train_phinet(mcfg_phi, tcfg1, phi_train, phi_val, None,
                 workdir=tmp_path / "phi")

    mcfg = ModelConfig(spec=SPEC, num_layers=2, hidden_dim=32, head="spectrum")
    tcfg = TrainConfig(batch_size=32, epochs=1, seed=0, assignment="perm",
                       spectral_weight=0.5)
    logs = []
    res = train_admmnet(
        mcfg, tcfg, _dataset(64, seed=1), _dataset(32, seed=2), None,
        workdir=tmp_path / "e2e", init_from=tmp_path / "phi",
        log_fn=lambda m: logs.append(str(m)),
    )
    assert any("warm-started" in m and "['trunk']" in m for m in logs), logs
    assert np.isfinite(res.history["train_loss"]).all()

    # the e2e checkpoint's trunk must differ from fresh init (it was grafted)
    raw = fser.msgpack_restore(
        (tmp_path / "phi" / "best_model.msgpack").read_bytes()
    )
    assert "trunk" in raw["params"]["params"]


def test_train_resume(tmp_path):
    mcfg = ModelConfig(spec=SPEC, num_layers=1, hidden_dim=16)
    train = _dataset(64, seed=4)
    val = _dataset(32, seed=5)
    t1 = TrainConfig(batch_size=32, epochs=1, seed=0)
    r1 = train_admmnet(mcfg, t1, train, val, None, workdir=tmp_path / "run")
    t2 = TrainConfig(batch_size=32, epochs=2, seed=0)
    r2 = train_admmnet(mcfg, t2, train, val, None, workdir=tmp_path / "run")
    # second call resumed from epoch 1 and ran only epoch 2
    assert r2.epochs_run == 2
    assert len(r2.history["train_loss"]) >= 2


def test_train_phinet_improves_loss(tmp_path):
    mcfg = ModelConfig(spec=SPEC, num_layers=2)
    tcfg = TrainConfig(batch_size=32, epochs=4, lr=5e-3, patience=10, seed=0)
    train = _dataset(128, seed=6, with_phi=True)
    val = _dataset(32, seed=7, with_phi=True)
    res = train_phinet(mcfg, tcfg, train, val, None, workdir=tmp_path / "phi")
    losses = res.history["train_loss"]
    assert losses[-1] < losses[0], losses


def test_dataset_generator_roundtrip(tmp_path):
    gen = DatasetGenerator(DCFG, data_dir=tmp_path / "ds")
    gen.generate_complete_dataset(total_samples=40, seed=0, with_phi=True,
                                  phi_iters=5)
    loaded = gen.load_split("train")
    assert loaded["y"].shape[0] == 28  # 0.7 * 40
    assert "phi" in loaded
    val = gen.load_split("val")
    assert val["y"].shape[0] == 6
    batches = list(iterate_batches(loaded, 10, shuffle=True, seed=0))
    assert sum(b["y"].shape[0] for b in batches) == 28


def test_permutation_matched_loss_invariance():
    """perm assignment: loss is invariant to target order and upper-bounded
    by the slot loss; slot loss changes when targets are permuted."""
    import jax.numpy as jnp

    from admmnet_tpu.train.losses import (
        basic_parameter_loss,
        permutation_matched_parameter_loss,
    )

    rng = np.random.default_rng(0)
    B, L = 8, 3
    tau_p = jnp.asarray(rng.uniform(0.1, 0.9, (B, L)).astype(np.float32))
    f_p = jnp.asarray(rng.uniform(-0.4, 0.4, (B, L)).astype(np.float32))
    conf = jnp.asarray(rng.uniform(0.5, 1.0, (B, L)).astype(np.float32))
    tau_t = jnp.asarray(rng.uniform(0.1, 0.9, (B, L)).astype(np.float32))
    f_t = jnp.asarray(rng.uniform(-0.4, 0.4, (B, L)).astype(np.float32))
    L_true = jnp.asarray(np.full(B, 3, np.int32))

    perm = np.array([2, 0, 1])
    args = (tau_p, f_p, conf)
    base = float(permutation_matched_parameter_loss(*args, tau_t, f_t, L_true))
    shuf = float(
        permutation_matched_parameter_loss(
            *args, tau_t[:, perm], f_t[:, perm], L_true
        )
    )
    assert abs(base - shuf) < 1e-6

    slot = float(basic_parameter_loss(*args, tau_t, f_t, L_true))
    slot_shuf = float(
        basic_parameter_loss(*args, tau_t[:, perm], f_t[:, perm], L_true)
    )
    assert base <= slot + 1e-7 and base <= slot_shuf + 1e-7
    assert abs(slot - slot_shuf) > 1e-4  # slot loss is order-sensitive

    # when predictions equal (a permutation of) the targets, perm loss hits
    # the conf-only floor exactly
    floor = float(
        permutation_matched_parameter_loss(
            tau_t[:, perm], f_t[:, perm], conf, tau_t, f_t, L_true
        )
    )
    conf_only = float(np.mean(np.sum(0.1 * (np.asarray(conf)[:, perm] - 1) ** 2,
                                     axis=-1) / 3))
    assert abs(floor - conf_only) < 1e-6


def test_matched_rmse_pair_scores_under_best_assignment():
    """eval metric counterpart of the perm loss: zero when predictions are a
    permutation of the targets, equal to slot RMSE when already aligned, and
    invariant to target order."""
    from admmnet_tpu.train.trainer import _masked_rmse, _matched_rmse_pair

    rng = np.random.default_rng(1)
    B, L = 16, 3
    tau_t = rng.uniform(0.1, 0.9, (B, L)).astype(np.float32)
    f_t = rng.uniform(-0.4, 0.4, (B, L)).astype(np.float32)
    L_true = rng.integers(1, L + 1, B).astype(np.int32)

    # predictions = permuted targets -> matched RMSE must be ~0 even though
    # slot RMSE is large
    perm = np.array([2, 0, 1])
    t_rm, f_rm = _matched_rmse_pair(tau_t[:, perm], f_t[:, perm], tau_t, f_t, L_true)
    assert t_rm < 1e-6 and f_rm < 1e-6
    assert _masked_rmse(tau_t[:, perm], tau_t, L_true) > 1e-2

    # aligned noisy predictions: matched == slot pairing is the best pairing
    # only sample-by-sample; matched is never worse on the combined criterion
    tau_p = tau_t + rng.normal(0, 1e-3, (B, L)).astype(np.float32)
    f_p = f_t + rng.normal(0, 1e-3, (B, L)).astype(np.float32)
    t_rm2, f_rm2 = _matched_rmse_pair(tau_p, f_p, tau_t, f_t, L_true)
    assert abs(t_rm2 - _masked_rmse(tau_p, tau_t, L_true)) < 1e-6
    assert abs(f_rm2 - _masked_rmse(f_p, f_t, L_true)) < 1e-6

    # invariance to target column order
    t_rm3, f_rm3 = _matched_rmse_pair(
        tau_p, f_p, tau_t[:, perm], f_t[:, perm],
        L_true * 0 + 3,  # full masks so permuting targets is lossless
    )
    t_rm4, f_rm4 = _matched_rmse_pair(tau_p, f_p, tau_t, f_t, L_true * 0 + 3)
    assert abs(t_rm3 - t_rm4) < 1e-6 and abs(f_rm3 - f_rm4) < 1e-6


def test_matched_rmse_pair_empty_scenes():
    from admmnet_tpu.train.trainer import _matched_rmse_pair

    B, L = 4, 3
    z = np.zeros((B, L), np.float32)
    t_rm, f_rm = _matched_rmse_pair(z, z, z, z, np.zeros(B, np.int32))
    assert t_rm == 0.0 and f_rm == 0.0


def test_param_group_lrs_match_reference():
    """Pin the actual per-group learning rates for BOTH training modes.

    Reference: train.py:107-121 AND trainPhi.py:105-113 put the
    unrolled-ADMM-layer params in a 0.5x-lr group
    (``{'params': admm_params, 'lr': config['lr'] * 0.5}``).  For
    PhiEstADMMNet every parameter matches the grouping prefixes, so the
    reference phi trainer runs the WHOLE model at an effective 0.5 * lr;
    the e2e trainer runs the trunk at 0.5 * lr and the peak head at lr.

    The first AdamW step with uniform grads and zero weight decay moves
    every param by ~group_lr (bias-corrected m/sqrt(v) = 1), so the step
    magnitude IS the group LR.  Global-norm clipping rescales all grads by
    one constant, which cancels in m/sqrt(v).
    """
    from admmnet_tpu.models import ADMMNet, PhiEstADMMNet
    from admmnet_tpu.train.trainer import make_optimizer, param_group_labels

    lr = 5e-3
    tcfg = TrainConfig(lr=lr, weight_decay=0.0, admm_lr_scale=0.5, epochs=10)
    mcfg = ModelConfig(spec=SPEC, num_layers=2, hidden_dim=16)
    d = _dataset(2, seed=0)
    key = jax.random.PRNGKey(0)

    def first_step_lrs(model):
        params = model.init(key, d["y"], d["b"], d["sigma"])
        tx = make_optimizer(tcfg, 10, admm_modules=type(model).ADMM_LR_MODULES)
        state = tx.init(params)
        grads = jax.tree.map(lambda p: np.ones_like(p), params)
        updates, _ = tx.update(grads, state, params)
        return jax.tree.map(lambda u: float(np.max(np.abs(u))), updates)

    # e2e: trunk at 0.5*lr, peak head at lr (reference train.py:107-121)
    ups = first_step_lrs(ADMMNet(cfg=mcfg))["params"]
    for leaf in jax.tree.leaves(ups["trunk"]):
        assert abs(leaf - 0.5 * lr) < 1e-4 * lr, leaf
    for leaf in jax.tree.leaves(ups["peak_head"]):
        assert abs(leaf - lr) < 1e-4 * lr, leaf

    # phi: the trunk is the whole model -> everything at 0.5*lr
    # (reference trainPhi.py:105-113: all params match the admm prefixes)
    ups = first_step_lrs(PhiEstADMMNet(cfg=mcfg))["params"]
    for leaf in jax.tree.leaves(ups):
        assert abs(leaf - 0.5 * lr) < 1e-4 * lr, leaf

    # a renamed trunk must fail LOUDLY, not silently reshuffle LR groups
    params = ADMMNet(cfg=mcfg).init(key, d["y"], d["b"], d["sigma"])
    renamed = {"params": {("new_" + k if k == "trunk" else k): v
                          for k, v in params["params"].items()}}
    with pytest.raises(ValueError, match="matched no params"):
        param_group_labels(renamed, ("trunk",))


def test_resume_reset_best_for_curriculum(tmp_path):
    """Curriculum stage switch: with reset_best the second stage must be
    able to checkpoint even when its val losses are worse than stage 1's
    (measured failure mode: runs/spec50k, RESULTS.md)."""
    mcfg = ModelConfig(spec=SPEC, num_layers=1, hidden_dim=16)
    easy = _dataset(64, seed=1)
    val_easy = _dataset(32, seed=2)
    tcfg = TrainConfig(batch_size=32, epochs=1, patience=3, seed=0)
    train_admmnet(mcfg, tcfg, easy, val_easy, None, workdir=tmp_path / "run")

    import json
    meta1 = json.loads((tmp_path / "run" / "metadata.json").read_text())

    hard = _dataset(64, seed=4)
    val_hard = _dataset(32, seed=5)
    tcfg2 = TrainConfig(batch_size=32, epochs=3, patience=3, seed=0,
                        reset_best=True)
    res = train_admmnet(mcfg, tcfg2, hard, val_hard, None,
                        workdir=tmp_path / "run")
    meta2 = json.loads((tmp_path / "run" / "metadata.json").read_text())
    # stage 2 re-checkpointed (epoch advanced past stage 1's checkpoint)
    assert meta2["epoch"] > meta1["epoch"]
    assert res.epochs_run == 3


def test_init_from_grafts_into_learned_sensing_superset(tmp_path):
    """Warm-starting a learned_sensing model from a plain-trunk checkpoint:
    shared layers graft, the sensing matrix keeps its identity init."""
    import flax.serialization as fser
    import jax.numpy as jnp
    from admmnet_tpu.models import ADMMNet
    from admmnet_tpu.train.trainer import _graft_params

    mcfg = ModelConfig(spec=SPEC, num_layers=1, hidden_dim=16)
    d = _dataset(2, seed=0)
    key = jax.random.PRNGKey(0)
    donor = ADMMNet(cfg=mcfg).init(key, d["y"], d["b"], d["sigma"])

    mcfg_s = ModelConfig(spec=SPEC, num_layers=1, hidden_dim=16,
                         learned_sensing=True)
    tgt = ADMMNet(cfg=mcfg_s).init(jax.random.PRNGKey(1), d["y"], d["b"],
                                   d["sigma"])
    msgs = []
    out = _graft_params(tgt, donor, msgs.append)
    # shared trunk layer params came from the donor
    donor_leaf = jax.tree.leaves(donor["params"]["trunk"])[0]
    out_leaf = jax.tree.leaves(out["params"]["trunk"]["phi_0"])[0]
    np.testing.assert_allclose(
        np.asarray(out["params"]["trunk"]["phi_0"]["rho"]),
        np.asarray(donor["params"]["trunk"]["phi_0"]["rho"]),
    )
    # sensing kept its fresh identity init
    np.testing.assert_allclose(
        np.asarray(out["params"]["trunk"]["sensing"]["w_real"]),
        np.eye(SPEC.n), atol=0,
    )
    assert any("sensing" in m for m in msgs)


def test_matched_detection_dev_agrees_with_match_peaks():
    """Device matched-detection counts == peaks.metrics.match_peaks (the
    host oracle) on random batches, including sub-threshold confidences and
    variable L_true; and a mean-collapsed head scores matched-F1 0 while the
    count-based protocol scores 1.0 (the degenerate case the co-report
    exists to expose, verdict r3 weak-7)."""
    import jax.numpy as jnp

    from admmnet_tpu.peaks import match_peaks
    from admmnet_tpu.train.trainer import (
        _detection_counts,
        _matched_detection_dev,
    )

    rng = np.random.default_rng(0)
    B, K = 64, 3
    for trial in range(3):
        true_tau = rng.uniform(0.1, 0.9, (B, K))
        true_f = rng.uniform(-0.4, 0.4, (B, K))
        # predictions: mostly near-truth, some displaced, some low-conf
        pred_tau = true_tau + rng.normal(0, 0.03, (B, K))
        pred_f = true_f + rng.normal(0, 0.03, (B, K))
        conf = rng.uniform(0, 1, (B, K))
        L_true = np.full(B, K) if trial == 0 else rng.integers(0, K + 1, B)
        tp, fp, fn, tsse, fsse = [
            np.asarray(x)
            for x in _matched_detection_dev(
                jnp.asarray(pred_tau, jnp.float32),
                jnp.asarray(pred_f, jnp.float32),
                jnp.asarray(conf, jnp.float32),
                jnp.asarray(true_tau, jnp.float32),
                jnp.asarray(true_f, jnp.float32),
                jnp.asarray(L_true),
                0.05,
                0.5,
            )
        ]
        # host oracle: valid truths only (match_peaks has no L_true mask, so
        # feed it per-sample via the valid slots -- emulate by scoring only
        # samples where L_true == K for the exact-comparison trial)
        if trial == 0:
            st = match_peaks(
                pred_tau.astype(np.float32), pred_f.astype(np.float32),
                true_tau.astype(np.float32), true_f.astype(np.float32),
                tol_tau=0.05, tol_f=0.05, pred_valid=conf > 0.5,
            )
            assert (int(tp), int(fp), int(fn)) == (st["tp"], st["fp"], st["fn"])
            if st["tp"]:
                np.testing.assert_allclose(
                    np.sqrt(tsse / tp), st["tau_rmse"], rtol=1e-4
                )
                np.testing.assert_allclose(
                    np.sqrt(fsse / tp), st["f_rmse"], rtol=1e-4
                )
        else:
            # consistency invariants under variable L_true
            assert int(tp) + int(fn) == int(np.sum(L_true))
            assert int(tp) + int(fp) == int(np.sum(conf > 0.5))

    # mean-collapsed head: all predictions at the dataset mean, conf ~ 1
    true_tau = rng.uniform(0.1, 0.9, (B, K))
    true_f = rng.uniform(-0.4, 0.4, (B, K))
    pred_tau = np.full((B, K), 0.5)
    pred_f = np.full((B, K), 0.0)
    conf = np.full((B, K), 0.99)
    L_true = np.full(B, K)
    tp, fp, fn, _, _ = [
        np.asarray(x)
        for x in _matched_detection_dev(
            jnp.asarray(pred_tau, jnp.float32), jnp.asarray(pred_f, jnp.float32),
            jnp.asarray(conf, jnp.float32), jnp.asarray(true_tau, jnp.float32),
            jnp.asarray(true_f, jnp.float32), jnp.asarray(L_true), 0.05, 0.5,
        )
    ]
    # a handful of truths can sit within tol of the mean by chance; the
    # matched F1 must still be far from the count-based 1.0
    ctp, cfp, cfn = _detection_counts(conf, L_true.astype(float), 0.5)
    assert (ctp, cfp, cfn) == (B * K, 0, 0)  # count protocol: perfect
    matched_f1 = 2 * tp / max(2 * tp + fp + fn, 1)
    assert matched_f1 < 0.3
