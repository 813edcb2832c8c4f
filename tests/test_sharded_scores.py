"""Analyze stage sharded over the mesh: scores on component-sharded inputs.

Every score is independent per component, so a concept DB sharded on the
component axis runs the whole Analyze stage data-parallel with no code
changes to the jitted score fns (SURVEY.md §7 build item 8). These tests pin
(a) the placement helper and (b) numerical equality with the replicated path
on the virtual 8-device CPU mesh.
"""

import numpy as np

import jax
import jax.numpy as jnp

from semanticlens_tpu import scores
from semanticlens_tpu.core import data_mesh, shard_concept_db


def _db(n_components=16, n_samples=6, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "layer4": rng.normal(size=(n_components, n_samples, d)).astype(np.float32),
        # 17 doesn't divide 8 → must stay replicated, still correct
        "odd": rng.normal(size=(17, n_samples, d)).astype(np.float32),
    }


def test_shard_concept_db_placement():
    mesh = data_mesh(8)
    db = shard_concept_db(_db(), mesh)
    shardings = {k: v.sharding for k, v in db.items()}
    assert shardings["layer4"].spec == jax.sharding.PartitionSpec("data")
    assert shardings["odd"].spec == jax.sharding.PartitionSpec()
    assert db["layer4"].shape == (16, 6, 32)


def test_scores_match_on_sharded_input():
    mesh = data_mesh(8)
    raw = _db()
    sharded = shard_concept_db(raw, mesh)
    for name in raw:
        want_c = np.asarray(scores.clarity_score(jnp.asarray(raw[name])))
        got_c = np.asarray(scores.clarity_score(sharded[name]))
        np.testing.assert_allclose(got_c, want_c, rtol=1e-5, atol=1e-6)

        want_p = np.asarray(scores.polysemanticity_score(jnp.asarray(raw[name])))
        got_p = np.asarray(scores.polysemanticity_score(sharded[name]))
        np.testing.assert_allclose(got_p, want_p, rtol=1e-4, atol=1e-5)


def test_redundancy_on_sharded_aggregated_db():
    mesh = data_mesh(8)
    raw = _db()["layer4"].mean(1)  # (C, D) aggregated form
    sharded = jax.device_put(
        jnp.asarray(raw), jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )
    want = np.asarray(scores.redundancy_score(jnp.asarray(raw)))
    got = np.asarray(scores.redundancy_score(sharded))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
