"""Int8 quantization path (ops/quant.py + the linear() integration).

Pins: primitive error bounds, exact column slicing of fused in-proj weights,
the full-tower cosine-parity target for the opt-in quantized Embed tower,
and the LRP fallback (attribution never sees quantization rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semanticlens_tpu.models import layers
from semanticlens_tpu.ops.quant import (
    QuantizedTensor,
    col_slice,
    dequantize,
    int8_conv,
    int8_matmul,
    quantize_params,
    quantize_weight,
    transformer_dense_match,
)


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


def test_quantize_roundtrip_error_bound():
    w = _rand((64, 96))
    qt = quantize_weight(w)
    assert qt.q.dtype == jnp.int8 and qt.scale.shape == (96,)
    # symmetric per-channel: |error| <= scale/2 per element
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w))
    assert (err <= np.asarray(qt.scale)[None, :] * 0.5 + 1e-7).all()


def test_quantize_zero_column_is_exact():
    w = jnp.zeros((8, 4))
    qt = quantize_weight(w)
    assert np.asarray(qt.scale).all() == 1.0 or (np.asarray(qt.q) == 0).all()
    np.testing.assert_array_equal(np.asarray(dequantize(qt)), 0.0)


def test_int8_matmul_cosine():
    w, x = _rand((128, 256), 1), _rand((4, 10, 128), 2)
    ref = np.asarray(jnp.matmul(x, w))
    out = np.asarray(int8_matmul(x, quantize_weight(w)))
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.999


def test_int8_matmul_zero_rows_exact():
    w = _rand((16, 8), 3)
    x = jnp.zeros((5, 16))
    np.testing.assert_array_equal(np.asarray(int8_matmul(x, quantize_weight(w))), 0.0)


def test_col_slice_matches_full_quantization():
    """Slicing a quantized fused in-proj == quantizing the slice (per-out-
    channel scales make the column split exact)."""
    w = _rand((32, 96), 4)
    qt = quantize_weight(w)
    part = col_slice(qt, 32, 64)
    direct = quantize_weight(w[:, 32:64])
    np.testing.assert_array_equal(np.asarray(part.q), np.asarray(direct.q))
    np.testing.assert_allclose(np.asarray(part.scale), np.asarray(direct.scale))
    # plain arrays pass through
    np.testing.assert_array_equal(np.asarray(col_slice(w, 0, 8)), np.asarray(w[:, :8]))


def test_linear_routes_quantized_weight():
    w, x = _rand((64, 32), 5), _rand((3, 64), 6)
    b = _rand((32,), 7)
    ref = np.asarray(layers.linear(x, w, b))
    out = np.asarray(layers.linear(x, quantize_weight(w), b))
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.999
    assert out.dtype == ref.dtype


def test_linear_quantized_under_lrp_dequantizes():
    """Under an active composite the quantized weight falls back to float —
    relevance conservation must not absorb rounding noise."""
    w, x = _rand((16, 16), 8), _rand((2, 16), 9)
    with layers.lrp_composite("epsilon"):
        out = layers.linear(x, quantize_weight(w))
    ref = np.asarray(jnp.matmul(x, np.asarray(dequantize(quantize_weight(w)))))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_quantize_params_predicate_and_rank_guard():
    params = {
        "visual.transformer.resblocks.0.attn.in_proj_weight": _rand((8, 24)),
        "visual.transformer.resblocks.0.ln_1.weight": _rand((8,)),
        "transformer.resblocks.0.mlp.c_fc.weight": _rand((8, 32)),
    }
    out = quantize_params(params, transformer_dense_match("visual.transformer."))
    assert isinstance(out["visual.transformer.resblocks.0.attn.in_proj_weight"], QuantizedTensor)
    assert not isinstance(out["transformer.resblocks.0.mlp.c_fc.weight"], QuantizedTensor)
    assert not isinstance(out["visual.transformer.resblocks.0.ln_1.weight"], QuantizedTensor)
    with pytest.raises(ValueError, match="rank"):
        quantize_params(
            {"x.attn.in_proj_weight": _rand((4,))}, transformer_dense_match("")
        )


def test_quantized_tensor_is_pytree():
    qt = quantize_weight(_rand((8, 8), 10))
    leaves, treedef = jax.tree.flatten(qt)
    assert len(leaves) == 2
    rebuilt = jax.tree.unflatten(treedef, leaves)
    assert isinstance(rebuilt, QuantizedTensor)

    @jax.jit
    def f(q, x):
        return int8_matmul(x, q)

    out = f(qt, _rand((2, 8), 11))
    assert out.shape == (2, 8)


def test_openclip_quantized_tower_cosine():
    """Full ViT-B/32 tower: quantized vs float embeddings at cosine >= 0.995
    (measured 0.9997 on random weights; published weights behave the same
    class — the scheme is weight-dominant)."""
    from semanticlens_tpu.foundation_models.clip import OpenClip

    fm = OpenClip("ViT-B-32", dtype=jnp.float32, seed=0)
    fmq = OpenClip("ViT-B-32", dtype=jnp.float32, seed=0, quantize="int8")
    assert "int8" in repr(fmq)
    # concept-DB caches key on fm.name — quantized towers must segregate
    assert fmq.name != fm.name and "int8" in fmq.name
    imgs = np.random.RandomState(0).randint(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    a = np.asarray(fm.encode_image(imgs))
    b = np.asarray(fmq.encode_image(imgs))
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert (cos > 0.995).all(), cos


def test_siglip_quantized_tower_cosine():
    from semanticlens_tpu.foundation_models.siglip import SigLipV2

    fm = SigLipV2(dtype=jnp.float32, seed=0)
    fmq = SigLipV2(dtype=jnp.float32, seed=0, quantize="int8")
    imgs = np.random.RandomState(1).randint(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    a = np.asarray(fm.encode_image(imgs))
    b = np.asarray(fmq.encode_image(imgs))
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert (cos > 0.995).all(), cos


def test_mobileclip_quantized_tower_cosine():
    """ClipMobile(quantize='int8'): pointwise convs + attention denses int8,
    depthwise/stem/head float; embeddings cosine-close; caches segregate."""
    from semanticlens_tpu.foundation_models.mobileclip import (
        ClipMobile,
        quantize_mobileclip_params,
    )

    fm = ClipMobile("s1", dtype=jnp.float32, seed=0)
    fmq = ClipMobile("s1", dtype=jnp.float32, seed=0, quantize="int8")
    assert fmq.name != fm.name and "int8" in fmq.name

    qp = fmq.params
    assert isinstance(qp["visual.stage0.blocks.0.ffn.fc1.weight"], QuantizedTensor)
    assert isinstance(qp["visual.stage1.downsample.pw.weight"], QuantizedTensor)
    # depthwise, stem, head and text tower stay float by default
    assert not isinstance(qp["visual.stage0.blocks.0.ffn.dw.weight"], QuantizedTensor)
    assert not isinstance(qp["visual.stem.0.weight"], QuantizedTensor)
    assert not isinstance(qp["visual.head.proj"], QuantizedTensor)
    attn_qkv = [k for k in qp if k.endswith(".attn.qkv.weight") and k.startswith("visual.")]
    assert attn_qkv and all(isinstance(qp[k], QuantizedTensor) for k in attn_qkv)
    text_dense = [k for k in qp if k.startswith("transformer.") and k.endswith(".mlp.c_fc.weight")]
    assert text_dense and not any(isinstance(qp[k], QuantizedTensor) for k in text_dense)

    # include_text quantizes the text transformer blocks too
    qp_t = quantize_mobileclip_params(fm.params, include_text=True)
    assert all(isinstance(qp_t[k], QuantizedTensor) for k in text_dense)

    size = fm.cfg.image_size
    imgs = np.random.RandomState(2).randint(0, 255, (2, size, size, 3), dtype=np.uint8)
    a = np.asarray(fm.encode_image(imgs))
    b = np.asarray(fmq.encode_image(imgs))
    cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    assert (cos > 0.995).all(), cos


def test_mobileclip_quantize_rejects_unknown_mode():
    from semanticlens_tpu.foundation_models.mobileclip import ClipMobile

    with pytest.raises(ValueError, match="int8"):
        ClipMobile("s1", seed=0, quantize="fp8")


def test_openclip_quantize_rejects_unknown_mode():
    from semanticlens_tpu.foundation_models.clip import OpenClip

    with pytest.raises(ValueError, match="int8"):
        OpenClip("ViT-B-32", seed=0, quantize="int4")


# --------------------------------------------------------------------- convs


def test_quantize_weight_rank4_scale_per_out_channel():
    w = _rand((3, 3, 16, 32), 12)  # HWIO
    qt = quantize_weight(w)
    assert qt.q.dtype == jnp.int8 and qt.q.shape == w.shape and qt.scale.shape == (32,)
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w))
    assert (err <= np.asarray(qt.scale)[None, None, None, :] * 0.5 + 1e-7).all()


def test_int8_conv_cosine_vs_float():
    w = _rand((3, 3, 8, 16), 13)
    x = _rand((2, 14, 14, 8), 14)
    ref = np.asarray(layers.conv2d(x, w, stride=2, padding=1))
    out = np.asarray(layers.conv2d(x, quantize_weight(w), stride=2, padding=1))
    assert out.shape == ref.shape and out.dtype == ref.dtype
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.999


def test_int8_conv_zero_input_exact():
    w = _rand((1, 1, 4, 4), 15)
    out = np.asarray(int8_conv(jnp.zeros((2, 5, 5, 4)), quantize_weight(w)))
    np.testing.assert_array_equal(out, 0.0)


def test_int8_conv_grouped():
    w = _rand((3, 3, 4, 8), 16)  # groups=2: in-per-group 4, in total 8
    x = _rand((1, 9, 9, 8), 17)
    ref = np.asarray(layers.conv2d(x, w, padding=1, groups=2))
    out = np.asarray(layers.conv2d(x, quantize_weight(w), padding=1, groups=2))
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.999


def test_conv2d_quantized_under_lrp_dequantizes():
    w = _rand((3, 3, 4, 4), 18)
    x = _rand((1, 8, 8, 4), 19)
    with layers.lrp_composite("epsilon"):
        out = np.asarray(layers.conv2d(x, quantize_weight(w), padding=1))
    ref = np.asarray(layers.conv2d(x, dequantize(quantize_weight(w)), padding=1))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_resnet_int8_collect_tower():
    """ResNet(quantize='int8'): stage convs quantized, stem/BN/fc float;
    tapped pooled activations stay cosine-close to the float tower; repr
    (and thus the ActMax cache key) segregates."""
    from semanticlens_tpu.models.resnet import ResNet

    m = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    mq = ResNet(depth=18, num_classes=10, dtype=jnp.float32, quantize="int8")
    assert "int8" in repr(mq) and "int8" not in repr(m)
    params = m.init(jax.random.PRNGKey(0))
    qparams = mq.init(jax.random.PRNGKey(0))
    assert isinstance(qparams["layer1.0.conv1.weight"], QuantizedTensor)
    assert isinstance(qparams["layer2.0.downsample.0.weight"], QuantizedTensor)
    assert not isinstance(qparams["conv1.weight"], QuantizedTensor)  # stem float
    assert not isinstance(qparams["layer1.0.bn1.weight"], QuantizedTensor)
    assert not isinstance(qparams["fc.weight"], QuantizedTensor)

    x = _rand((2, 64, 64, 3), 20)
    taps = ("layer1", "layer4")
    _, ref = m.apply(params, x, taps)
    _, out = mq.apply(qparams, x, taps)
    for name in taps:
        a = np.asarray(ref[name]).mean(axis=(1, 2)).ravel()
        b = np.asarray(out[name]).mean(axis=(1, 2)).ravel()
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, (name, cos)


def test_resnet_quantize_rejects_unknown_mode():
    from semanticlens_tpu.models.resnet import ResNet

    with pytest.raises(ValueError, match="quantize"):
        ResNet(depth=18, quantize="int4")
