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
        fline = [ln for ln in stdout.splitlines() if ln.startswith("FUSED ")][-1]
        outs[-1]["fused"] = json.loads(fline[len("FUSED ") :])
        gline = [ln for ln in stdout.splitlines() if ln.startswith("GRAIN ")][-1]
        outs[-1]["grain"] = json.loads(gline[len("GRAIN ") :])

    assert outs[0]["n"] == outs[1]["n"] == 24
    assert outs[0]["ids"] == outs[1]["ids"], "processes disagree on merged ids"
    assert outs[0]["values"] == outs[1]["values"]

    # fused Collect+Embed: both processes return the same concept DB
    assert outs[0]["fused"]["db_shape"] == outs[1]["fused"]["db_shape"] == [6, 5, 4]
    assert outs[0]["fused"]["ids"] == outs[1]["fused"]["ids"]
    assert outs[0]["fused"]["db"] == outs[1]["fused"]["db"]

    # grain-backed pipeline (worker-parallel decode, grain even_split shards):
    # same merged global states as the plain path, agreed by both processes
    assert outs[0]["grain"]["n"] == outs[1]["grain"]["n"] == 24
    assert outs[0]["grain"]["shard"] == [0, 12] and outs[1]["grain"]["shard"] == [12, 24]
    assert outs[0]["grain"]["ids"] == outs[1]["grain"]["ids"] == outs[0]["ids"]
    assert outs[0]["grain"]["values"] == outs[0]["values"]

    # and the 2-process result equals an in-process single-host sweep over the
    # same deterministic 24-sample dataset
    ds24 = ArrayDataset(np.random.default_rng(1).normal(size=(24, 8, 8, 3)).astype(np.float32), name="mh")
    ref, _ = mk().run(params, ds24, 4)
    np.testing.assert_array_equal(np.asarray(ref["c"].ids), np.asarray(outs[0]["ids"]))

    # single-host fused + gather reproduces the 2-process fused concept DB
    from semanticlens_tpu.parallel import fused_multihost

    proj = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4)).astype(np.float32))

    def embed_fn(raw):
        return jnp.mean(raw.astype(jnp.float32), axis=(1, 2)) @ proj

    _, ref_db, _ = fused_multihost(mk(), params, ds24, 4, embed_fn)
    np.testing.assert_allclose(
        np.asarray(outs[0]["fused"]["db"], np.float32), np.round(ref_db["c"], 5), atol=2e-5
    )


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


def test_fused_multihost_single_process_equals_plain(fixture):
    """P=1 fused_multihost == run_fused + local gather (full code path)."""
    from semanticlens_tpu.parallel import fused_multihost

    params, ds, mk = fixture
    proj = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4)).astype(np.float32))

    def embed_fn(raw):
        return jnp.mean(raw.astype(jnp.float32), axis=(1, 2)) @ proj

    states, db, n = fused_multihost(mk(), params, ds, 4, embed_fn)
    assert n == len(ds)

    ref_states, ref_embeds, _ = mk().run_fused(params, ds, 4, embed_fn)
    ids = np.asarray(ref_states["c"].ids)
    want = np.zeros((*ids.shape, 4), np.float32)
    want[ids >= 0] = ref_embeds[ids[ids >= 0]]
    np.testing.assert_array_equal(np.asarray(states["c"].ids), ids)
    np.testing.assert_allclose(db["c"], want, rtol=1e-6)


def test_gather_selected_rows_ownership_sum():
    """Two simulated shards: per-owner fills sum to the exact selected table."""
    from semanticlens_tpu.parallel import gather_selected_rows

    rng = np.random.default_rng(0)
    full = rng.normal(size=(20, 6)).astype(np.float32)
    needed = np.asarray([0, 3, 9, 10, 17, 19])
    t0 = gather_selected_rows(needed, full[0:10], 0, 10)   # host 0 owns [0, 10)
    t1 = gather_selected_rows(needed, full[10:20], 10, 20)  # host 1 owns [10, 20)
    np.testing.assert_allclose(t0 + t1, full[needed], rtol=0, atol=0)
    # no overlap: each row filled by exactly one host
    assert ((np.abs(t0) > 0).any(1) ^ (np.abs(t1) > 0).any(1)).all()


def test_run_fused_id_offset_keeps_rows_local(fixture):
    """run_fused(id_offset=s): global ids in states, shard-local embed rows."""
    params, ds, mk = fixture
    proj = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4)).astype(np.float32))

    def embed_fn(raw):
        return jnp.mean(raw.astype(jnp.float32), axis=(1, 2)) @ proj

    start, stop = 8, 16
    states, embeds, seen = mk().run_fused(params, Subset(ds, start, stop), 4, embed_fn, id_offset=start)
    assert seen == stop - start and embeds.shape == (8, 4)
    ids = np.asarray(states["c"].ids)
    real = ids[ids >= 0]
    assert real.size and (real >= start).all() and (real < stop).all()


def test_int32_id_range_guard(fixture):
    """Datasets whose global ids would exceed int32 must fail loudly
    (VERDICT r2 Weak#7: on-device ids are int32; 2^31+ samples silently
    wrapped). The on-disk format stays int64."""
    params, ds, mk = fixture
    CollectEngine._check_id_range(10, 0)  # fine
    with pytest.raises(ValueError, match="int32"):
        CollectEngine._check_id_range(2**31, 0)
    with pytest.raises(ValueError, match="int32"):
        mk().run(params, ds, 4, id_offset=2**31 - 10)


# --------------------------------------------------------------------------- #
# Grain-backed input pipeline (VERDICT r3 item 6)
# --------------------------------------------------------------------------- #
def _f32(record):
    return np.asarray(record, np.float32)


def test_grain_shard_range_matches_grain_even_split():
    """Our shard math must be bit-identical to grain's even_split — sample
    ids in the stream and row ownership in the exchange depend on it."""
    pytest.importorskip("grain")
    import grain.python as gp
    from grain._src.core.sharding import even_split

    from semanticlens_tpu.data.grain_adapter import grain_shard_range

    for n, pc in [(22, 3), (24, 2), (8, 8), (5, 8), (0, 2), (100, 7)]:
        for pi in range(pc):
            opts = gp.ShardOptions(shard_index=pi, shard_count=pc, drop_remainder=False)
            assert grain_shard_range(n, process_index=pi, process_count=pc) == tuple(
                even_split(n, opts)
            ), (n, pc, pi)


@pytest.mark.parametrize("workers", [0, 2])
def test_grain_backed_collect_equals_array_dataset(fixture, workers):
    """A grain DataLoader stream (IndexSampler, optional worker processes)
    must produce the exact states of the plain in-memory path."""
    pytest.importorskip("grain")
    from semanticlens_tpu.data.grain_adapter import GrainShardDataset

    params, ds, mk = fixture
    ref_states, _ = mk().run(params, ds, 4)

    grain_ds = GrainShardDataset(
        ds.images, transform=_f32, name="g", worker_count=workers,
        process_index=0, process_count=1,
    )
    states, seen = mk().run(params, grain_ds, 4)
    assert seen == len(ds)
    np.testing.assert_array_equal(np.asarray(states["c"].ids), np.asarray(ref_states["c"].ids))
    np.testing.assert_array_equal(
        np.asarray(states["c"].values, np.float32),
        np.asarray(ref_states["c"].values, np.float32),
    )


def test_grain_simulated_multihost_shards_merge_to_single_host(fixture):
    """3 grain shards (process_index override) + topk_merge == full sweep."""
    pytest.importorskip("grain")
    from semanticlens_tpu.data.grain_adapter import GrainShardDataset, grain_shard_range

    params, ds, mk = fixture
    ref_states, _ = mk().run(params, ds, 4)

    shard_states = []
    for pi in range(3):
        gds = GrainShardDataset(
            ds.images, transform=_f32, name="g", process_index=pi, process_count=3
        )
        start, stop = grain_shard_range(len(ds), process_index=pi, process_count=3)
        assert (gds.start, gds.stop) == (start, stop)
        states, seen = mk().run(params, gds, 4, id_offset=gds.start)
        assert seen == stop - start
        shard_states.append(states["c"])

    merged = topk_merge(
        TopKState(
            values=jnp.stack([s.values for s in shard_states]),
            ids=jnp.stack([s.ids for s in shard_states]),
        )
    )
    np.testing.assert_array_equal(np.asarray(merged.ids), np.asarray(ref_states["c"].ids))


def test_grain_fused_multihost_single_process(fixture):
    """fused_multihost accepts a GrainShardDataset (P=1 full code path)."""
    pytest.importorskip("grain")
    from semanticlens_tpu.data.grain_adapter import GrainShardDataset
    from semanticlens_tpu.parallel import fused_multihost

    params, ds, mk = fixture
    proj = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4)).astype(np.float32))

    def embed_fn(raw):
        return jnp.mean(raw.astype(jnp.float32), axis=(1, 2)) @ proj

    gds = GrainShardDataset(ds.images, transform=_f32, name="g",
                            process_index=0, process_count=1)
    states, db, n = fused_multihost(mk(), params, gds, 4, embed_fn)
    assert n == len(ds)

    _, ref_db, _ = fused_multihost(mk(), params, ds, 4, embed_fn)
    np.testing.assert_allclose(db["c"], ref_db["c"], rtol=1e-6)


def test_grain_resume_skips_decode_of_earlier_records(fixture):
    """Resuming at start_index must SLICE the stream, not decode-and-drop
    (an almost-done sweep must not pay O(shard) decode on resume)."""
    pytest.importorskip("grain")
    from semanticlens_tpu.data.grain_adapter import GrainShardDataset

    params, ds, mk = fixture
    touched = []

    class CountingSource:
        def __len__(self):
            return len(ds.images)

        def __getitem__(self, k):
            touched.append(int(k))
            return ds.images[k]

    gds = GrainShardDataset(CountingSource(), transform=_f32, name="g",
                            process_index=0, process_count=1)
    batches = list(gds.iter_batches(4, start_index=16))
    assert batches[0].start_index == 16
    assert min(touched) >= 16, f"records before the resume point were decoded: {sorted(set(touched))[:5]}"
    assert max(touched) == len(ds.images) - 1

    with pytest.raises(ValueError, match="multiple of"):
        list(gds.iter_batches(4, start_index=3))
