"""Multi-host input sharding: shard-range math, id offsets, global merge.

Two layers of coverage for SURVEY §2's DCN scope:

1. a single-process simulation sweeping each host shard with ``id_offset``
   and merging — fails if ``host_shard_range`` or the id-offset plumbing
   regress;
2. a REAL 2-process ``jax.distributed`` run (CPU backend, local coordinator)
   through ``collect_multihost`` + ``process_allgather``.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.collect.engine import CollectEngine
from semanticlens_tpu.data import ArrayDataset
from semanticlens_tpu.data.dataset import Subset
from semanticlens_tpu.data.grain_adapter import host_shard_range
from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import conv2d
from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
from semanticlens_tpu.ops.topk import TopKState, topk_merge


class OneConv(SubjectModel):
    module_names = ("c",)

    def apply(self, params, x, tap_names=()):
        tap = TapCollector(tap_names)
        return tap("c", conv2d(x, params["w"])), tap.taps


@pytest.fixture()
def fixture():
    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 3, 6)).astype(np.float32))}
    ds = ArrayDataset(np.random.default_rng(1).normal(size=(22, 8, 8, 3)).astype(np.float32), name="d")
    mk = lambda: CollectEngine(
        model=OneConv(), layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5
    )
    return params, ds, mk


def test_subset_view_and_bounds():
    ds = ArrayDataset(np.arange(5 * 2 * 2 * 3, dtype=np.float32).reshape(5, 2, 2, 3), name="d")
    sub = Subset(ds, 1, 4)
    assert len(sub) == 3
    np.testing.assert_array_equal(sub.images, ds.images[1:4])
    np.testing.assert_array_equal(sub[0][0], ds[1][0])
    assert sub.name == "d[1:4]"
    with pytest.raises(IndexError):
        sub[3]
    with pytest.raises(ValueError):
        Subset(ds, 3, 6)


def test_host_shard_ranges_tile_exactly():
    for n, pc in [(22, 3), (8, 8), (5, 8), (0, 2), (24, 2)]:
        ranges = [host_shard_range(n, process_index=i, process_count=pc) for i in range(pc)]
        flat = [i for a, b in ranges for i in range(a, b)]
        assert flat == list(range(n)), (n, pc, ranges)


def test_simulated_multihost_equals_single_host(fixture):
    """Per-shard sweeps with id_offset + cross-host merge == one full sweep."""
    params, ds, mk = fixture
    ref_states, _ = mk().run(params, ds, 4)

    n_hosts = 3
    shard_states = []
    for pi in range(n_hosts):
        start, stop = host_shard_range(len(ds), process_index=pi, process_count=n_hosts)
        states, seen = mk().run(params, Subset(ds, start, stop), 4, id_offset=start)
        assert seen == stop - start
        shard_states.append(states["c"])

    merged = topk_merge(
        TopKState(
            values=jnp.stack([s.values for s in shard_states]),
            ids=jnp.stack([s.ids for s in shard_states]),
        )
    )
    np.testing.assert_array_equal(np.asarray(merged.ids), np.asarray(ref_states["c"].ids))
    np.testing.assert_array_equal(
        np.asarray(merged.values, np.float32), np.asarray(ref_states["c"].values, np.float32)
    )


def test_id_offset_produces_global_ids(fixture):
    params, ds, mk = fixture
    start, stop = 8, 16
    states, _ = mk().run(params, Subset(ds, start, stop), 4, id_offset=start)
    ids = np.asarray(states["c"].ids)
    real = ids[ids >= 0]
    assert real.size and (real >= start).all() and (real < stop).all()


def test_real_two_process_collect(fixture, tmp_path):
    """Spawn 2 jax.distributed CPU processes; both must return the single-host result."""
    params, ds, mk = fixture  # noqa: F841 — reference result computed below on 24 samples
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "multihost_worker.py"
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""}
    env["PYTHONPATH"] = os.pathsep.join(
        [str(Path(__file__).parent.parent), env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), f"127.0.0.1:{port}", "2", str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host workers timed out")
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        line = [ln for ln in stdout.splitlines() if ln.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT ") :]))

    assert outs[0]["n"] == outs[1]["n"] == 24
    assert outs[0]["ids"] == outs[1]["ids"], "processes disagree on merged ids"
    assert outs[0]["values"] == outs[1]["values"]

    # and the 2-process result equals an in-process single-host sweep over the
    # same deterministic 24-sample dataset
    ds24 = ArrayDataset(np.random.default_rng(1).normal(size=(24, 8, 8, 3)).astype(np.float32), name="mh")
    ref, _ = mk().run(params, ds24, 4)
    np.testing.assert_array_equal(np.asarray(ref["c"].ids), np.asarray(outs[0]["ids"]))


def test_empty_shard_produces_full_shape_states(fixture):
    """Hosts with empty shards must still contribute (n_latents, k) states."""
    from semanticlens_tpu.parallel.multihost import local_shard_sweep

    params, ds, mk = fixture
    eng = mk()
    full_states, seen = local_shard_sweep(eng, params, ds, 4, 0, 8)
    empty_states, seen0 = local_shard_sweep(mk(), params, ds, 4, 8, 8)
    assert seen == 8 and seen0 == 0
    assert np.asarray(empty_states["c"].values).shape == np.asarray(full_states["c"].values).shape
    assert (np.asarray(empty_states["c"].ids) == -1).all()

    # merging an empty shard's sentinels must not perturb the result
    merged = topk_merge(
        TopKState(
            values=jnp.stack([full_states["c"].values, empty_states["c"].values]),
            ids=jnp.stack([full_states["c"].ids, empty_states["c"].ids]),
        )
    )
    np.testing.assert_array_equal(np.asarray(merged.ids), np.asarray(full_states["c"].ids))
