"""Golden-value tests of the NN primitives against torch.nn.functional.

These primitives carry every subject model and both CLIP towers, so parity
here underwrites the embedding-parity target (BASELINE.md: cosine ≥ 0.999).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from semanticlens_tpu.models import layers

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _np(x):
    return np.asarray(x, np.float32)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)  # HWIO
    b = rng.normal(size=(8,)).astype(np.float32)

    ours = layers.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1)
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        torch.from_numpy(b),
        stride=2,
        padding=1,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=2e-4)


def test_batch_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    w, b = rng.normal(size=8).astype(np.float32), rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.random(8).astype(np.float32) + 0.5

    ours = layers.batch_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), jnp.asarray(mean), jnp.asarray(var))
    ref = F.batch_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(mean),
        torch.from_numpy(var),
        torch.from_numpy(w),
        torch.from_numpy(b),
        training=False,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=2e-5)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 9, 9, 4)).astype(np.float32)
    ours = layers.max_pool(jnp.asarray(x), window=3, stride=2, padding=1)
    ref = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, 1).permute(0, 2, 3, 1)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-6)


def test_avg_pool_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    ours = layers.avg_pool(jnp.asarray(x), window=2, stride=2)
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2).permute(0, 2, 3, 1)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-6)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w, b = rng.normal(size=16).astype(np.float32), rng.normal(size=16).astype(np.float32)
    ours = layers.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    ref = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=2e-5)


def test_linear_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 16)).astype(np.float32)
    w = rng.normal(size=(8, 16)).astype(np.float32)  # torch (out, in)
    b = rng.normal(size=8).astype(np.float32)
    ours = layers.linear(jnp.asarray(x), jnp.asarray(w.T), jnp.asarray(b))
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=2e-4)


def test_multi_head_attention_matches_torch():
    rng = np.random.default_rng(6)
    d, h, t, bsz = 32, 4, 6, 2
    x = rng.normal(size=(bsz, t, d)).astype(np.float32)
    in_w = rng.normal(size=(3 * d, d)).astype(np.float32) * 0.1
    in_b = rng.normal(size=(3 * d,)).astype(np.float32) * 0.1
    out_w = rng.normal(size=(d, d)).astype(np.float32) * 0.1
    out_b = rng.normal(size=(d,)).astype(np.float32) * 0.1

    params = {
        "attn.in_proj_weight": jnp.asarray(in_w.T),
        "attn.in_proj_bias": jnp.asarray(in_b),
        "attn.out_proj.weight": jnp.asarray(out_w.T),
        "attn.out_proj.bias": jnp.asarray(out_b),
    }
    ours = layers.multi_head_attention(jnp.asarray(x), params, "attn", h)

    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(in_w))
        mha.in_proj_bias.copy_(torch.from_numpy(in_b))
        mha.out_proj.weight.copy_(torch.from_numpy(out_w))
        mha.out_proj.bias.copy_(torch.from_numpy(out_b))
        ref, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=2e-4)


def test_causal_mask_attention_matches_torch():
    rng = np.random.default_rng(7)
    d, h, t = 16, 2, 5
    x = rng.normal(size=(1, t, d)).astype(np.float32)
    in_w = rng.normal(size=(3 * d, d)).astype(np.float32) * 0.2
    in_b = np.zeros(3 * d, np.float32)
    out_w = rng.normal(size=(d, d)).astype(np.float32) * 0.2
    out_b = np.zeros(d, np.float32)
    mask = np.triu(np.full((t, t), -np.inf, np.float32), k=1)

    params = {
        "attn.in_proj_weight": jnp.asarray(in_w.T),
        "attn.in_proj_bias": jnp.asarray(in_b),
        "attn.out_proj.weight": jnp.asarray(out_w.T),
        "attn.out_proj.bias": jnp.asarray(out_b),
    }
    ours = layers.multi_head_attention(jnp.asarray(x), params, "attn", h, mask=jnp.asarray(mask))

    mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(in_w))
        mha.in_proj_bias.copy_(torch.from_numpy(in_b))
        mha.out_proj.weight.copy_(torch.from_numpy(out_w))
        mha.out_proj.bias.copy_(torch.from_numpy(out_b))
        ref, _ = mha(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            attn_mask=torch.from_numpy(mask),
        )
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=2e-4)


def test_sdpa_fused_matches_manual_formulation():
    """The fused-attention lowering must equal softmax(qk^T/sqrt(d)+mask)v —
    incl. the additive causal-mask convention the text towers rely on."""
    import numpy as np

    import jax

    from semanticlens_tpu.models.layers import scaled_dot_product_attention

    rng = np.random.default_rng(0)
    b, t, d, h = 3, 7, 16, 4
    q = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    causal = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)

    def manual(q, k, v, mask):
        hd = d // h
        qh = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        logits = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits, axis=-1)
        return (w @ vh).transpose(0, 2, 1, 3).reshape(b, t, d)

    for mask in (None, causal):
        got = np.asarray(scaled_dot_product_attention(q, k, v, h, mask=mask))
        want = np.asarray(manual(q, k, v, mask))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    # cross-attention shape (kv length != q length)
    s = 5
    k2 = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    out = scaled_dot_product_attention(q, k2, v2, h)
    assert out.shape == (b, t, d)
