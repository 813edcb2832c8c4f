"""Text-modality Collect+Embed: LM dissection through the standard pipeline."""

import hashlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu import scores
from semanticlens_tpu.collect import TextActivationComponentVisualizer, TokenTextDataset
from semanticlens_tpu.models import GPT2

V, T, D = 64, 12, 32


class FakeTextFM:
    """Deterministic text tower: embedding = hash of the raw string."""

    name = "fake-text-fm"
    dim = 16

    def tokenize(self, texts):
        out = np.zeros((len(texts), T), np.int32)
        for i, t in enumerate(texts):
            codes = [ord(c) % V for c in t][:T]
            out[i, : len(codes)] = codes
        return jnp.asarray(out)

    def encode_text(self, tokens):
        rows = []
        for row in np.asarray(tokens):
            h = hashlib.sha1(row.tobytes()).digest()
            v = np.frombuffer(h[: self.dim], np.uint8).astype(np.float32) - 128.0
            rows.append(v / np.linalg.norm(v))
        return jnp.asarray(np.stack(rows))


@pytest.fixture(scope="module")
def text_setup():
    rng = np.random.default_rng(0)
    texts = [f"sample text number {i} about topic {i % 5}" for i in range(30)]
    tokens = rng.integers(0, V, size=(30, T), dtype=np.int64)
    ds = TokenTextDataset(tokens, texts, name="tiny-corpus")
    model = GPT2(vocab_size=V, n_positions=T, width=D, depth=2, heads=2,
                 dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "tiny-gpt"
    return ds, model


def test_token_dataset_validation():
    with pytest.raises(ValueError, match="must be"):
        TokenTextDataset(np.zeros((4, 3, 2)), ["a"] * 4)
    with pytest.raises(ValueError, match="mismatch"):
        TokenTextDataset(np.zeros((4, 3)), ["a"] * 3)


def test_from_texts_tokenizes_pads_and_truncates():
    texts = ["ab", "abcdefgh", ""]
    tok = lambda t: [ord(c) for c in t]
    ds = TokenTextDataset.from_texts(texts, tok, seq_len=4, pad_id=-1)
    assert ds.images.shape == (3, 4) and ds.images.dtype == np.int32
    # left padding keeps the last real token at position T-1
    np.testing.assert_array_equal(ds.images[0], [-1, -1, ord("a"), ord("b")])
    # over-long sequences keep their TAIL so the final real token survives
    # (what aggregate_transformer_last_token summarizes)
    np.testing.assert_array_equal(ds.images[1], [ord(c) for c in "efgh"])
    np.testing.assert_array_equal(ds.images[2], [-1] * 4)
    assert ds.texts == texts
    assert ds.pad_id == -1 and ds.pad == "left"

    right = TokenTextDataset.from_texts(texts, tok, seq_len=4, pad="right")
    np.testing.assert_array_equal(right.images[0], [ord("a"), ord("b"), 0, 0])
    with pytest.raises(ValueError, match="pad must be"):
        TokenTextDataset.from_texts(texts, tok, seq_len=4, pad="center")


def test_lm_collect_embed_analyze_e2e(text_setup, tmp_path):
    ds, model = text_setup
    cv = TextActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds.texts_view(),
        layer_names=["transformer.h.1.mlp.act"], num_samples=4,
        cache_dir=tmp_path)
    fm = FakeTextFM()
    db = cv._compute_concept_db(fm, batch_size=8)
    mat = db["transformer.h.1.mlp.act"]
    assert mat.shape == (4 * D, 4, fm.dim)

    # evidence ids hit the engine's standard top-k path
    ids = cv.get_max_reference("transformer.h.1.mlp.act")
    assert ids.shape == (4 * D, 4)
    assert (ids < len(ds)).all()

    # Analyze machinery applies verbatim
    clarity = scores.clarity_score(jnp.asarray(mat))
    assert np.isfinite(np.asarray(clarity)).all()

    # evidence strings resolve through dataset_fm
    texts = cv.get_max_reference_texts("transformer.h.1.mlp.act")
    live = [t for t in texts[int(np.argmax(ids[:, 0] >= 0))] if t]
    assert live and all(t.startswith("sample text") for t in live)

    # text "plot": evidence report written under storage_dir/plots
    report = cv.visualize_components([0, 1], "transformer.h.1.mlp.act", n_samples=2)
    assert "transformer.h.1.mlp.act #0" in report
    assert (cv.storage_dir / "plots" / "transformer.h.1.mlp.act-components.txt").exists()

    # collect cache round-trips in the reference file format
    cv2 = TextActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds.texts_view(),
        layer_names=["transformer.h.1.mlp.act"], num_samples=4,
        cache_dir=tmp_path)
    cv2.engine = None  # load path must not recompute
    cache = cv2.run(batch_size=8)
    np.testing.assert_array_equal(
        np.asarray(cache["transformer.h.1.mlp.act"].sample_ids), ids)


def test_non_string_fm_dataset_rejected(text_setup):
    ds, model = text_setup
    cv = TextActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,  # tokens, not strings
        layer_names=["transformer.h.0.mlp.act"], num_samples=2, cache_dir=None)
    with pytest.raises(TypeError, match="raw strings"):
        cv._compute_concept_db(FakeTextFM(), batch_size=8)


def test_lm_causal_ablation(text_setup):
    """Causal interventions reach the LM family through the tap contract."""
    from semanticlens_tpu import causal

    ds, model = text_setup
    ids = jnp.asarray(ds.images[:2])
    delta = causal.ablation_effects(model, model.params, "transformer.h.0.mlp.act",
                                    ids, [3, 17])
    assert delta.shape == (2, 2, T, V)
    assert np.abs(np.asarray(delta)).sum() > 0


def test_last_token_aggregator(text_setup):
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_last_token

    ds, model = text_setup
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 4, 3))
    np.testing.assert_array_equal(np.asarray(aggregate_transformer_last_token(x)),
                                  np.asarray(x[:, -1]))
    with pytest.raises(ValueError):
        aggregate_transformer_last_token(jnp.zeros((2, 3)))

    # flows through the text CV as a cache-name-stable aggregator
    cv = TextActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds.texts_view(),
        layer_names=["transformer.h.0.mlp.act"], num_samples=3,
        aggregate_fn=aggregate_transformer_last_token, cache_dir=None)
    cache = cv.run(batch_size=8)
    assert cache["transformer.h.0.mlp.act"].sample_ids.shape == (4 * D, 3)


def test_sae_latents_on_lm_text_evidence(text_setup, tmp_path):
    """SAE latents trained on an LM layer audit through the text pipeline:
    virtual "{layer}.sae" tap + string evidence via the FM text tower."""
    from semanticlens_tpu.collect import TextSAEComponentVisualizer
    from semanticlens_tpu.sae import SAEConfig

    ds, model = text_setup
    layer = "transformer.h.1.mlp.act"
    cfg = SAEConfig(d_in=4 * D, n_latents=24, k=4, positions_per_image=4, batch_rows=32)
    # no model_preprocess: the text trainer defaults to the integer cast
    sae_params = TextSAEComponentVisualizer.train(model, ds, layer, cfg,
                                                  batch_size=8, epochs=1)
    cv = TextSAEComponentVisualizer(
        model, ds, ds.texts_view(), layer, sae_params, num_samples=3,
        cache_dir=tmp_path)
    fm = FakeTextFM()
    db = cv._compute_concept_db(fm, batch_size=8)
    (name, mat), = db.items()
    assert name == f"{layer}.sae"
    assert mat.shape == (24, 3, fm.dim)
    texts = cv.get_max_reference_texts(name)
    assert len(texts) == 24
    live = [t for row in texts for t in row if t]
    assert live and all(t.startswith("sample text") for t in live)


def test_lm_concept_db_serves(text_setup, tmp_path):
    """An LM-derived concept DB drives the serving layer unchanged (the
    banks are joint-space vectors; the service never inspects modality)."""
    from semanticlens_tpu.serve import SearchService

    ds, model = text_setup
    cv = TextActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds.texts_view(),
        layer_names=["transformer.h.0.mlp.act"], num_samples=3, cache_dir=None)
    fm = FakeTextFM()
    db = cv._compute_concept_db(fm, batch_size=8)
    agg = {k: np.asarray(v, np.float32).mean(1) for k, v in db.items()}
    svc = SearchService(fm, agg, templates=["{}"], warmup=False)
    hits = svc.text_search("sample text number 3 about topic 3", k=3)
    layer_hits = hits["transformer.h.0.mlp.act"]
    assert len(layer_hits["ids"]) == 3
    assert np.isfinite(np.asarray(layer_hits["scores"])).all()
