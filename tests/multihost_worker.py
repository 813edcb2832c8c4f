"""Worker process for the real 2-process multi-host collect test.

Launched by tests/test_multihost.py: initializes jax.distributed on a local
coordinator, runs collect_multihost over a deterministic dataset, and prints
the merged per-layer ids/values as JSON (both processes must agree).
"""

import json
import sys


def main():
    coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np
    import jax.numpy as jnp

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.models.base import SubjectModel, TapCollector
    from semanticlens_tpu.models.layers import conv2d
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.parallel import collect_multihost

    class OneConv(SubjectModel):
        module_names = ("c",)

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            return tap("c", conv2d(x, params["w"])), tap.taps

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 3, 6)).astype(np.float32))}
    ds = ArrayDataset(
        np.random.default_rng(1).normal(size=(24, 8, 8, 3)).astype(np.float32), name="mh"
    )
    engine = CollectEngine(
        model=OneConv(), layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5
    )
    states, n = collect_multihost(engine, params, ds, batch_size=4)
    out = {
        "process": process_id,
        "n": n,
        "ids": np.asarray(states["c"].ids).tolist(),
        "values": np.asarray(states["c"].values, np.float32).tolist(),
    }
    print("RESULT " + json.dumps(out))

    # fused Collect+Embed across both hosts: selected-rows-only exchange
    from semanticlens_tpu.parallel import fused_multihost

    proj = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4)).astype(np.float32))

    def embed_fn(raw):
        return jnp.mean(raw.astype(jnp.float32), axis=(1, 2)) @ proj

    fengine = CollectEngine(
        model=OneConv(), layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5
    )
    fstates, concept_db, fn_total = fused_multihost(fengine, params, ds, 4, embed_fn)
    print(
        "FUSED "
        + json.dumps(
            {
                "n": fn_total,
                "ids": np.asarray(fstates["c"].ids).tolist(),
                "db_shape": list(concept_db["c"].shape),
                "db_sum": round(float(np.abs(concept_db["c"]).sum()), 4),
                "db": np.round(concept_db["c"], 5).tolist(),
            }
        )
    )

    # grain-backed input pipeline: IndexSampler sharded by process_index,
    # worker-parallel decode, driven through the same collect_multihost
    from semanticlens_tpu.data.grain_adapter import GrainShardDataset

    grain_ds = GrainShardDataset(
        ds.images, transform=_decode, name="mh-grain", worker_count=2
    )
    gengine = CollectEngine(
        model=OneConv(), layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=5
    )
    gstates, gn = collect_multihost(gengine, params, grain_ds, batch_size=4)
    print(
        "GRAIN "
        + json.dumps(
            {
                "n": gn,
                "shard": [grain_ds.start, grain_ds.stop],
                "ids": np.asarray(gstates["c"].ids).tolist(),
                "values": np.asarray(gstates["c"].values, np.float32).tolist(),
            }
        )
    )


def _decode(record):
    """Picklable record→image transform (runs inside grain worker procs)."""
    import numpy as np

    return np.asarray(record, np.float32)


if __name__ == "__main__":
    main()
