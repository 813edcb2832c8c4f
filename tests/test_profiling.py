"""Profiling utilities: stage timing and device tracing."""

import logging
import os

import numpy as np

import jax.numpy as jnp

from semanticlens_tpu.utils import StageTimer, device_trace, force_materialize


def test_stage_timer_accumulates(caplog):
    timer = StageTimer()
    with caplog.at_level(logging.INFO, logger="semanticlens_tpu.utils.profiling"):
        with timer.stage("collect", items=100):
            pass
        with timer.stage("collect", items=50):
            pass
    s = timer.summary()
    assert s["collect"]["items"] == 150
    assert "items_per_sec" in s["collect"]
    assert "[stage:collect]" in caplog.text


def test_device_trace_writes_profile(tmp_path):
    with device_trace(str(tmp_path)):
        x = jnp.ones((64, 64), jnp.float32)
        force_materialize((x @ x).sum())
    files = [f for _, _, fs in os.walk(tmp_path) for f in fs]
    assert files, "no trace files written"


def test_force_materialize_pytree():
    tree = {"a": jnp.ones((2, 2)), "b": [jnp.zeros(3)]}
    force_materialize(tree)  # must not raise
    assert np.asarray(tree["a"]).shape == (2, 2)
