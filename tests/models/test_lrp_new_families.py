"""ε-LRP relevance conservation through the round-3 family blocks.

Same methodology as the MBConv/Swin/Inception conservation tests: biases
and running means zeroed (they absorb relevance by design), one block run
under the ε composite, input-relevance sum must equal output sum. Guards
the composite's coverage of each family's structural ops: SE gates
(CP-LRP constants), channel split/concat/shuffle (exact partitions),
proportional residual splits, detached-denominator LayerNorm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import TapCollector
from semanticlens_tpu.models.layers import lrp_composite


def _zeroed(params):
    return {
        k: (jnp.zeros_like(v) if k.endswith((".bias", ".running_mean")) else v)
        for k, v in params.items()
    }


def _assert_conserves(block, x, rtol):
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(block, x)
        (r_in,) = vjp_fn(out)
    r_in_sum = float(np.asarray(r_in, np.float64).sum())
    r_out_sum = float(np.asarray(out, np.float64).sum())
    np.testing.assert_allclose(r_in_sum, r_out_sum, rtol=rtol)


def test_regnet_block_conserves():
    """RegNet-Y bottleneck: grouped conv, SE constant gate, proj shortcut
    with proportional residual split."""
    from semanticlens_tpu.models.regnet import RegNet

    model = RegNet("y_400mf", num_classes=0, dtype=jnp.float32)
    params = _zeroed(model.init(jax.random.PRNGKey(0)))
    blk = model.stages[1][0]  # stage-2 first block: proj + SE

    def block(x):
        return model._block(params, x, "trunk_output.block2.block2-0", blk,
                            TapCollector(()))

    x = jnp.asarray(np.abs(np.random.default_rng(1).normal(size=(2, 8, 8, 48))).astype(np.float32))
    _assert_conserves(block, x, rtol=1e-3)


def test_shufflenet_units_conserve():
    """ShuffleNetV2 units: channel split / concat / shuffle are exact
    relevance partitions; both the stride-1 (split) and stride-2
    (dual-branch) units must conserve."""
    from semanticlens_tpu.models.shufflenet import ShuffleNetV2

    model = ShuffleNetV2("x0_5", num_classes=0, dtype=jnp.float32)
    params = _zeroed(model.init(jax.random.PRNGKey(0)))
    down, keep = model.stages[1][0], model.stages[1][1]

    x_down = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8, 48)).astype(np.float32))
    _assert_conserves(lambda x: model._unit(params, x, "stage3.0", down, TapCollector(())),
                      x_down, rtol=1e-3)
    x_keep = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 4, 96)).astype(np.float32))
    _assert_conserves(lambda x: model._unit(params, x, "stage3.1", keep, TapCollector(())),
                      x_keep, rtol=1e-3)


def test_mnasnet_residual_block_conserves():
    """MNASNet inverted residual: the skip is a proportional LRP split
    (a bare + would double-count relevance across the two branches)."""
    from semanticlens_tpu.models.mnasnet import MNASNet

    model = MNASNet("0_5", num_classes=0, dtype=jnp.float32)
    params = _zeroed(model.init(jax.random.PRNGKey(0)))
    blk = model.stacks[0][1]  # stride-1, in==out → residual
    assert blk.residual

    def block(x):
        return model._ir_block(params, x, "layers.8.1", blk, TapCollector(()))

    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 8, 8, blk.c_in)).astype(np.float32))
    _assert_conserves(block, x, rtol=1e-3)


def test_efficientnet_v2_fused_block_conserves():
    """Fused-MBConv: dense expansion conv + projection + residual."""
    from semanticlens_tpu.models.efficientnet import EfficientNetV2

    model = EfficientNetV2("v2_s", num_classes=0, dtype=jnp.float32)
    params = _zeroed(model.init(jax.random.PRNGKey(0)))
    cfg = model.stages[1][1]  # fused, expand-4, stride-1 residual
    assert cfg.fused and cfg.residual

    def block(x):
        return model._fused_mbconv(params, x, "features.2.1", cfg, TapCollector(()))

    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 8, 8, cfg.c_in)).astype(np.float32))
    _assert_conserves(block, x, rtol=1e-3)


def test_swin_v2_block_conserves():
    """Swin-V2 post-norm block: CP-LRP cosine attention (probs + logit
    scale as constants), detached-denominator LN AFTER each branch,
    proportional residual splits."""
    from semanticlens_tpu.models.swin import SwinTransformerV2

    model = SwinTransformerV2("tiny", num_classes=0, dtype=jnp.float32)
    params = _zeroed(model.init(jax.random.PRNGKey(2)))

    def block(x):
        return model._block(params, x, "features.1.1", 3, 4, TapCollector(()))

    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 16, 16, 96)).astype(np.float32))
    _assert_conserves(block, x, rtol=5e-2)


def test_squeezenet_fire_conserves():
    """Fire module: squeeze conv feeding two expand branches whose concat
    partitions relevance exactly."""
    from semanticlens_tpu.models.classic import SqueezeNet

    model = SqueezeNet("1_1", num_classes=0, dtype=jnp.float32)
    params = _zeroed(model.init(jax.random.PRNGKey(0)))

    def block(x):
        return model._fire(params, x, "features.4", TapCollector(()))

    x = jnp.asarray(np.abs(np.random.default_rng(7).normal(size=(2, 8, 8, 128))).astype(np.float32))
    _assert_conserves(block, x, rtol=1e-3)
