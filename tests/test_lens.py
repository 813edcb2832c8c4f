"""Lens orchestration tests: caching behavior, probing, eval dispatch.

Mirrors reference tests/test_lens.py (MagicMock FM + fake CV seams).
"""

from unittest.mock import MagicMock

import numpy as np
import pytest

from semanticlens_tpu.lens import Lens, text_probing


class FakeFM:
    name = "fake-fm"

    def __init__(self, dim=16):
        self.dim = dim
        self._rng = np.random.default_rng(0)
        self._table = self._rng.normal(size=(1024, dim)).astype(np.float32)

    def tokenize(self, txt):
        # sha1, not builtin hash(): PYTHONHASHSEED varies per process and a
        # bucket collision between test words silently aliases embeddings.
        import hashlib

        txts = txt if isinstance(txt, list) else [txt]
        return np.asarray(
            [[int(hashlib.sha1(t.encode()).hexdigest(), 16) % 1024] for t in txts], np.int32
        )

    def encode_text(self, tokens):
        return self._table[tokens[:, 0]]

    def preprocess(self, img):
        arr = np.asarray(img, np.float32)
        return arr[None] if arr.ndim == 3 else arr

    def encode_image(self, img):
        return np.asarray(img).reshape(len(img), -1)[:, : self.dim].astype(np.float32)


def _fake_cv(tmp_path, caching=True):
    cv = MagicMock()
    cv.caching = caching
    cv.storage_dir = tmp_path
    cv.metadata = {
        "aggregation_fn_name": "aggregate_conv_mean",
        "n_collect": "5",
        "layer_names": "['layer4']",
        "dataset": "ds",
        "model": "m",
    }
    rng = np.random.default_rng(1)
    cv._compute_concept_db.return_value = {
        "layer4": rng.normal(size=(4, 5, 16)).astype(np.float32)
    }
    return cv


def test_compute_concept_db_cache_miss_then_hit(tmp_path):
    fm = FakeFM()
    lens = Lens(fm)
    cv = _fake_cv(tmp_path)

    db1 = lens.compute_concept_db(cv)
    assert cv._compute_concept_db.call_count == 1
    expected = tmp_path / "concept_database" / "fake-fm" / (
        "concept_db-aggregate_conv_mean-5-['layer4'].safetensors"
    )
    assert expected.exists(), list(tmp_path.rglob("*"))

    db2 = lens.compute_concept_db(cv)
    assert cv._compute_concept_db.call_count == 1  # loaded from cache
    np.testing.assert_allclose(db1["layer4"], db2["layer4"], atol=1e-6)


def test_compute_concept_db_no_caching(tmp_path):
    lens = Lens(FakeFM())
    cv = _fake_cv(tmp_path, caching=False)
    lens.compute_concept_db(cv)
    lens.compute_concept_db(cv)
    assert cv._compute_concept_db.call_count == 2


def test_fallback_fm_name():
    bare = MagicMock(spec=["encode_text", "tokenize", "encode_image", "preprocess"])
    Lens(bare)
    assert hasattr(bare, "name") and bare.name.startswith("MagicMock")


def test_text_probing_shapes():
    fm = FakeFM()
    lens = Lens(fm)
    rng = np.random.default_rng(2)
    agg_db = {"layer4": rng.normal(size=(10, 16)).astype(np.float32)}

    out = lens.text_probing("dog", agg_db)
    assert out["layer4"].shape == (1, 10)

    out = lens.text_probing(["dog", "cat", "car"], agg_db, templates=["a photo of a {}", "{}"])
    assert out["layer4"].shape == (3, 10)


def test_text_probing_template_bias_subtraction():
    """Single query + templates: must equal mean_t(embed(t(q)) − embed(t('')))."""
    fm = FakeFM()
    templates = ["a photo of a {}", "an image of {}"]
    q = "dog"
    templated = fm.encode_text(fm.tokenize([t.format(q) for t in templates]))
    empty = fm.encode_text(fm.tokenize([t.format("") for t in templates]))
    expected = (templated - empty).mean(0, keepdims=True)

    rng = np.random.default_rng(3)
    agg_db = rng.normal(size=(6, 16)).astype(np.float32)
    out = text_probing(fm, q, agg_db, templates=templates)

    en = expected / np.linalg.norm(expected, axis=-1, keepdims=True)
    dn = agg_db / np.linalg.norm(agg_db, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, en @ dn.T, atol=1e-5)


def test_image_probing_mean_pools_multiple_queries():
    fm = FakeFM()
    lens = Lens(fm)
    rng = np.random.default_rng(4)
    agg_db = rng.normal(size=(6, 16)).astype(np.float32)
    imgs = rng.normal(size=(3, 4, 4, 3)).astype(np.float32)
    out = lens.image_probing(imgs, agg_db)
    assert out.shape == (1, 6)


def test_eval_dispatch_dict_and_tensor():
    lens = Lens(FakeFM())
    rng = np.random.default_rng(5)
    V = rng.normal(size=(4, 6, 16)).astype(np.float32)

    c_dict = lens.eval_clarity({"l": V})
    assert np.asarray(c_dict["l"]).shape == (4,)
    c_arr = lens.eval_clarity(V)
    np.testing.assert_allclose(np.asarray(c_arr), np.asarray(c_dict["l"]), atol=1e-6)

    r = lens.eval_redundancy({"l": V.mean(1)})
    assert np.asarray(r["l"]).shape == ()

    p = lens.eval_polysemanticity({"l": V})
    assert np.asarray(p["l"]).shape == (4,)


def test_label_components_clip_dissect_style():
    from semanticlens_tpu.lens import label_components

    fm = FakeFM(dim=16)
    vocab = ["dog", "cat", "wheel", "stripe", "sky"]
    vocab_embeds = fm.encode_text(fm.tokenize(vocab))
    # Components built to align exactly with specific vocabulary words.
    agg_db = {"layer4": np.stack([vocab_embeds[3], vocab_embeds[0], vocab_embeds[4]])}
    out = label_components(fm, vocab, agg_db, top_m=2)
    words, scores = out["layer4"]
    assert [w[0] for w in words] == ["stripe", "dog", "sky"]
    assert scores.shape == (3, 2)
    np.testing.assert_allclose(scores[:, 0], 1.0, rtol=1e-5)
    assert (scores[:, 0] >= scores[:, 1]).all()


def test_label_components_lens_method_and_bare_array():
    fm = FakeFM(dim=16)
    lens = Lens(fm)
    vocab = ["a", "b", "c"]
    bank = fm.encode_text(fm.tokenize(vocab))[:2]
    words, scores = lens.label_components(vocab, bank, top_m=3)
    assert words[0][0] == "a" and words[1][0] == "b"
    assert scores.shape == (2, 3)

    with pytest.raises(ValueError):
        lens.label_components([], bank)


def test_eval_scores_preserve_jax_input_sharding():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from semanticlens_tpu.core import data_mesh

    mesh = data_mesh(8)
    V = jnp.asarray(np.random.default_rng(0).normal(size=(16, 5, 8)).astype(np.float32))
    sharded = jax.device_put(V, NamedSharding(mesh, P("data")))
    lens = Lens(FakeFM())
    out = lens.eval_clarity({"l": sharded})["l"]
    # the jitted score must have consumed the sharded array directly and the
    # result shape follows the component axis
    assert out.shape == (16,)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(lens.eval_clarity({"l": np.asarray(V)})["l"]), rtol=1e-5
    )


def test_label_components_multi_template_alignment():
    """q>1 AND t>1 must keep (word, template) pairing straight — the probing
    helper's reference-parity (q t) reshape quirk must NOT leak in here."""
    from semanticlens_tpu.lens import label_components

    class TemplFM:
        """Tokenizer-sensitive fake: 'a photo of a X' and 'art of the X'
        embed to DIFFERENT deterministic vectors per template, with the
        word's identity recoverable after exact per-template bias removal."""

        name = "templ-fm"
        dim = 8

        def tokenize(self, txts):
            return txts  # pass strings through

        def encode_text(self, txts):
            out = []
            for t in txts:
                rng = np.random.default_rng(abs(hash(t)) % (2**32))
                out.append(rng.normal(size=(self.dim,)).astype(np.float32))
            return np.stack(out)

    fm = TemplFM()
    vocab = ["dog", "cat", "wheel"]
    templates = ["a photo of a {}", "art of the {}"]
    # ground truth: correctly-aligned bias-corrected mean per word
    want = []
    for w in vocab:
        filled = fm.encode_text([t.format(w) for t in templates])
        empty = fm.encode_text([t.format("") for t in templates])
        want.append((filled - empty).mean(0))
    want = np.stack(want)

    bank = want[[2, 0]]  # components aligned with 'wheel' and 'dog'
    words, scores = label_components(fm, vocab, bank, top_m=1, templates=templates)
    assert [w[0] for w in words] == ["wheel", "dog"]
    np.testing.assert_allclose(scores[:, 0], 1.0, rtol=1e-5)


def test_label_components_batches_large_vocab():
    fm = FakeFM(dim=16)
    calls = []
    orig = fm.encode_text

    def counting(tokens):
        calls.append(len(tokens))
        return orig(tokens)

    fm.encode_text = counting
    from semanticlens_tpu.lens import label_components

    vocab = [f"word{i}" for i in range(10)]
    bank = orig(fm.tokenize(vocab))[:3]
    label_components(fm, vocab, bank, top_m=2, batch_size=4)
    assert max(calls) <= 4, f"vocabulary not chunked: {calls}"


def test_eval_scores_cast_bf16_jax_input_to_f32():
    import jax.numpy as jnp

    V = np.random.default_rng(0).normal(size=(6, 4, 8)).astype(np.float32)
    lens = Lens(FakeFM())
    got = lens.eval_clarity({"l": jnp.asarray(V).astype(jnp.bfloat16)})["l"]
    assert got.dtype == jnp.float32
    want = lens.eval_clarity({"l": V.astype(np.float32)})["l"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_wpmi_labels_polysemantic_unit_that_cosine_mislabels():
    """soft-WPMI (VERDICT r3 item 5): a unit firing on dogs AND cats has a
    mean vector at the midpoint — cosine names it with whatever word sits
    near that midpoint; WPMI scores words by the evidence images and names
    the true modes."""
    from semanticlens_tpu.lens import label_components
    from semanticlens_tpu.scores import soft_wpmi

    rng = np.random.default_rng(0)
    D = 16
    dog, cat = np.eye(D)[0], np.eye(D)[1]
    blur = (dog + cat) / np.linalg.norm(dog + cat)  # midpoint word
    vocab = ["dog", "cat", "blur"]
    vocab_embeds = np.stack([dog, cat, blur]).astype(np.float32)

    image_embeds = np.concatenate(
        [
            dog[None].repeat(5, 0) + rng.normal(0, 0.05, (5, D)),
            cat[None].repeat(5, 0) + rng.normal(0, 0.05, (5, D)),
            rng.normal(0, 1, (40, D)) * 0.25,  # background corpus
        ]
    ).astype(np.float32)
    evidence = np.arange(10)[None, :]  # the unit's top-10: 5 dogs + 5 cats
    bank = image_embeds[:10].mean(0)[None]  # aggregated concept vector

    class NoTextFM:  # vocab_embeds passed explicitly; FM text path unused
        name = "stub"

    # cosine mislabels: midpoint word wins
    w_cos, _ = label_components(
        NoTextFM(), vocab, bank, top_m=1, vocab_embeds=vocab_embeds
    )
    assert w_cos[0][0] == "blur"

    # wpmi names the true modes and demotes the midpoint word
    w_wpmi, s_wpmi = label_components(
        NoTextFM(),
        vocab,
        bank,
        top_m=3,
        vocab_embeds=vocab_embeds,
        scoring="wpmi",
        evidence_ids=evidence,
        image_embeds=image_embeds,
        temperature=25.0,
    )
    assert w_wpmi[0][0] == "dog" and "blur" not in w_wpmi[0][:2], w_wpmi
    assert (np.diff(s_wpmi[0]) <= 0).all()

    # sentinel ids contribute nothing
    with_sentinel = np.concatenate([evidence, np.full((1, 4), -1, np.int64)], axis=1)
    s_a = soft_wpmi(vocab_embeds, image_embeds, evidence, temperature=25.0)
    s_b = soft_wpmi(vocab_embeds, image_embeds, with_sentinel, temperature=25.0)
    np.testing.assert_allclose(s_a, s_b, atol=1e-5)


def test_wpmi_requires_evidence_and_table():
    from semanticlens_tpu.lens import label_components

    bank = np.eye(4, dtype=np.float32)
    with pytest.raises(ValueError, match="wpmi"):
        label_components(
            FakeFM(dim=4), ["a", "b"], bank, scoring="wpmi",
            vocab_embeds=np.eye(2, 4, dtype=np.float32),
        )
    with pytest.raises(ValueError, match="scoring"):
        label_components(FakeFM(dim=4), ["a"], bank, scoring="bogus")


def test_wpmi_dict_db_dispatch_and_cv_table_retention(tmp_path):
    """Dict DBs route per-layer evidence; the CV retains the (N, D) table."""
    from semanticlens_tpu.lens import label_components

    fm = FakeFM(dim=16)
    rng = np.random.default_rng(1)
    image_embeds = rng.normal(size=(20, 16)).astype(np.float32)
    vocab = ["a", "b", "c", "d"]
    ve = fm.encode_text(fm.tokenize(vocab))
    db = {"l1": rng.normal(size=(3, 16)).astype(np.float32)}
    ids = {"l1": rng.integers(0, 20, (3, 5))}
    out = label_components(
        fm, vocab, db, scoring="wpmi", evidence_ids=ids, image_embeds=image_embeds,
        vocab_embeds=np.asarray(ve, np.float32), top_m=2,
    )
    words, scores = out["l1"]
    assert len(words) == 3 and scores.shape == (3, 2)
    with pytest.raises(ValueError, match="dict"):
        label_components(
            fm, vocab, db, scoring="wpmi", evidence_ids=ids["l1"],
            image_embeds=image_embeds, vocab_embeds=np.asarray(ve, np.float32),
        )


def test_wpmi_evidence_bank_shape_mismatch_rejected():
    """Sliced banks with full-size evidence (or missing layers) must fail
    loudly, not silently label the wrong rows."""
    from semanticlens_tpu.lens import label_components

    fm = FakeFM(dim=8)
    table = np.random.default_rng(0).normal(size=(10, 8)).astype(np.float32)
    ve = np.asarray(fm.encode_text(fm.tokenize(["a", "b"])), np.float32)
    bank = np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32)
    ids_wrong = np.zeros((5, 2), np.int64)  # 5 evidence rows vs 3 bank rows
    with pytest.raises(ValueError, match="does not match"):
        label_components(fm, ["a", "b"], bank, scoring="wpmi",
                         evidence_ids=ids_wrong, image_embeds=table, vocab_embeds=ve)
    with pytest.raises(ValueError, match="missing layers"):
        label_components(fm, ["a", "b"], {"l1": bank, "l2": bank}, scoring="wpmi",
                         evidence_ids={"l1": np.zeros((3, 2), np.int64)},
                         image_embeds=table, vocab_embeds=ve)
    with pytest.raises(ValueError, match="out of range"):
        label_components(fm, ["a", "b"], bank, scoring="wpmi",
                         evidence_ids=np.full((3, 2), 99, np.int64),
                         image_embeds=table, vocab_embeds=ve)


def test_cav_probing_separates_concept_components():
    """CAV probing ranks the concept-aligned component first even when a
    style direction shared by pos/neg examples would confound image probing."""
    from semanticlens_tpu.lens import cav_probing, image_probing

    d = 16
    concept = np.zeros(d, np.float32); concept[0] = 1.0
    style = np.zeros(d, np.float32); style[1] = 1.0

    class IdentityFM:
        name = "idfm"

        def preprocess(self, img):
            return np.asarray(img, np.float32)

        def encode_image(self, img):
            # "images" here ARE embeddings — isolates the probing math.
            return np.asarray(img, np.float32)

    rng = np.random.default_rng(1)
    pos = concept + style + rng.normal(0, 0.05, (8, d)).astype(np.float32)
    neg = style + rng.normal(0, 0.05, (8, d)).astype(np.float32)

    bank = np.stack([concept, style, rng.normal(0, 1, d).astype(np.float32)])
    out = cav_probing(IdentityFM(), pos, neg, {"l": bank})
    scores = np.asarray(out["l"])[0]
    assert scores.argmax() == 0, scores

    # the confound: a raw image probe scores the style component competitively
    raw = np.asarray(image_probing(IdentityFM(), pos, {"l": bank})["l"])[0]
    assert raw[1] > 0.5  # style reads as a strong match without the CAV
