"""Auxiliary subsystems: profiling timers, NaN guards, JSONL metrics."""

import numpy as np
import pytest
import jax.numpy as jnp

from admmnet_tpu.train.metrics_io import MetricsWriter
from admmnet_tpu.utils.debug import check_finite, nan_guard
from admmnet_tpu.utils.profiling import StepTimer, timed_fetch


def test_step_timer_summary():
    t = StepTimer(items_per_step=10)
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["items_per_s"] > 0


def test_timed_fetch_barriers():
    import jax

    f = jax.jit(lambda x: (x * 2).sum())
    out, dt = timed_fetch(f, jnp.ones(16))
    assert float(out) == 32.0 and dt >= 0


def test_check_finite_flags_nan():
    check_finite({"ok": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="bad"):
        check_finite({"bad": jnp.asarray([1.0, np.nan])})


def test_nan_guard_raises_at_producing_op():
    import jax

    with nan_guard():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)) + 1


def test_metrics_writer_roundtrip(tmp_path):
    w = MetricsWriter(tmp_path)
    w.log("epoch", epoch=1, loss=0.5)
    w.log("epoch", epoch=2, loss=0.25)
    recs = w.read_jsonl()
    assert [r["epoch"] for r in recs] == [1, 2]
    w.write_history({"train_loss": [0.5, 0.25]})
    assert (tmp_path / "training_history.json").exists()


def test_device_retry_recovers_from_transient_failures():
    from admmnet_tpu.utils.retry import device_retry

    calls = {"n": 0}

    @device_retry(attempts=3, cooldown_s=0.01, log_fn=lambda s: None)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: TPU worker process crashed")
        return 42

    assert flaky() == 42 and calls["n"] == 3


def test_device_retry_raises_non_retryable():
    from admmnet_tpu.utils.retry import device_retry

    @device_retry(attempts=3, cooldown_s=0.01, log_fn=lambda s: None)
    def broken():
        raise ValueError("logic bug")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        broken()
