"""Utility subsystems: stage timers, metric logging/plots, config validation,
profiling context."""

import json
import os

import numpy as np
import pytest


def test_stage_timer():
    import time

    from text2loc_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.01
    assert t.rate("a", 100) > 0
    report = t.report()
    assert "a:" in report and "b:" in report


def test_metric_logger_jsonl_and_plot(tmp_path, capsys):
    from text2loc_tpu.utils.logging import MetricLogger

    log_path = tmp_path / "m.jsonl"
    logger = MetricLogger(str(log_path))
    logger.log(0, loss=1.5, acc=0.2)
    logger.log(1, loss=1.2, acc=0.4)
    out = capsys.readouterr().out
    assert "epoch 000" in out and "loss=1.5000" in out

    rows = [json.loads(l) for l in open(log_path)]
    assert rows[1]["acc"] == 0.4

    png = logger.plot(str(tmp_path / "curves.png"))
    assert png is not None and os.path.exists(png)


def test_profile_trace_noop_and_dir(tmp_path):
    from text2loc_tpu.utils.profiling import profile_trace

    with profile_trace(None):
        pass  # no-op path
    import jax
    import jax.numpy as jnp

    with profile_trace(str(tmp_path / "trace")):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.isdir(tmp_path / "trace")


def test_config_validation():
    import dataclasses

    from text2loc_tpu.config import Config, LossConfig, TrainConfig

    Config().validate()  # defaults valid
    bad = Config(train=TrainConfig(loss=LossConfig(ranking_loss="nope")))
    with pytest.raises(AssertionError):
        bad.validate()
    bad2 = Config().replace(
        model=dataclasses.replace(Config().model, use_features=("bogus",))
    )
    with pytest.raises(AssertionError):
        bad2.validate()


def test_native_fallbacks_match(tmp_path):
    """numpy fallbacks == native results for the host kernels."""
    from text2loc_tpu import native
    from text2loc_tpu.prep.voxel import voxel_downsample_indices

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    pts = rng.random((2000, 3)) * 3
    a = native.voxel_downsample_indices(pts, 0.2)

    # Force the numpy path by calling the module's internals directly.
    keys = np.floor((pts - pts.min(axis=0)) / 0.2).astype(np.int64)
    spans = keys.max(axis=0) + 1
    flat = (keys[:, 0] * spans[1] + keys[:, 1]) * spans[2] + keys[:, 2]
    order = np.argsort(flat, kind="stable")
    first = np.ones(len(flat), bool)
    first[1:] = flat[order][1:] != flat[order][:-1]
    b = np.sort(order[first])
    np.testing.assert_array_equal(a, b)


def test_checkify_step_catches_nan_and_passes_clean():
    """The compiled-mode sanitizer (SURVEY 5.2's checkify equivalent of the
    reference's always-on autograd anomaly mode)."""
    import jax
    import jax.numpy as jnp

    from text2loc_tpu.utils.debug import checkify_step

    def step(x):
        return jnp.log(x) * 2.0

    checked = checkify_step(step)
    out = checked(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out), np.log([1.0, 2.0]) * 2, rtol=1e-6)

    with pytest.raises(Exception) as exc:
        checked(jnp.asarray([-1.0, 2.0]))  # log(-1) = NaN
    assert "nan" in str(exc.value).lower()
