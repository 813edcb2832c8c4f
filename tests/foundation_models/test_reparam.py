"""Reparameterization folding math vs real torch conv/BN modules."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from semanticlens_tpu.foundation_models.reparam import (
    fold_branches,
    fuse_conv_bn,
    fuse_mobileone_block,
    fuse_repmixer,
    identity_kernel,
    pad_kernel,
)


def _rand_bn(c, seed):
    g = torch.Generator().manual_seed(seed)
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.rand(c, generator=g) + 0.5)
        bn.bias.copy_(torch.randn(c, generator=g) * 0.1)
        bn.running_mean.copy_(torch.randn(c, generator=g) * 0.2)
        bn.running_var.copy_(torch.rand(c, generator=g) + 0.3)
    return bn


def _apply_conv(x, w, b, *, padding, groups=1):
    return torch.nn.functional.conv2d(
        x, torch.from_numpy(w).float(), torch.from_numpy(b).float(), padding=padding, groups=groups
    )


def test_fuse_conv_bn_matches_torch():
    conv = torch.nn.Conv2d(4, 6, 3, padding=1, bias=False)
    bn = _rand_bn(6, 0)
    x = torch.randn(2, 4, 8, 8, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = bn(conv(x))
    w, b = fuse_conv_bn(
        conv.weight.detach().numpy(),
        bn.weight.detach().numpy(),
        bn.bias.detach().numpy(),
        bn.running_mean.numpy(),
        bn.running_var.numpy(),
    )
    got = _apply_conv(x, w, b, padding=1)
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-5, atol=1e-5)


def test_identity_kernel_dense_and_depthwise():
    x = torch.randn(1, 5, 4, 4)
    dense = _apply_conv(x, identity_kernel(5, 1, 3), np.zeros(5), padding=1)
    np.testing.assert_allclose(dense.numpy(), x.numpy(), atol=1e-6)
    dw = _apply_conv(x, identity_kernel(5, 5, 3), np.zeros(5), padding=1, groups=5)
    np.testing.assert_allclose(dw.numpy(), x.numpy(), atol=1e-6)


def test_pad_kernel_preserves_conv_output():
    conv1 = torch.nn.Conv2d(3, 4, 1, bias=False)
    x = torch.randn(2, 3, 6, 6)
    with torch.no_grad():
        want = conv1(x)
    w3 = pad_kernel(conv1.weight.detach().numpy(), 3)
    got = _apply_conv(x, w3, np.zeros(4), padding=1)
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        pad_kernel(w3, 1)


class _MobileOneish(torch.nn.Module):
    """Train-form block with MobileOne naming: k conv branches + scale + skip."""

    def __init__(self, c, k=3, n_conv=2, groups=1, with_scale=True, with_skip=True, seed=0):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.groups, self.k = groups, k

        def conv_bn(kernel):
            m = torch.nn.Module()
            m.conv = torch.nn.Conv2d(c, c, kernel, padding=kernel // 2, groups=groups, bias=False)
            with torch.no_grad():
                m.conv.weight.copy_(torch.randn(m.conv.weight.shape, generator=g) * 0.2)
            m.bn = _rand_bn(c, seed + kernel)
            return m

        self.rbr_conv = torch.nn.ModuleList([conv_bn(k) for _ in range(n_conv)])
        self.rbr_scale = conv_bn(1) if with_scale else None
        self.rbr_skip = _rand_bn(c, seed + 99) if with_skip else None

    def forward(self, x):
        out = sum(m.bn(m.conv(x)) for m in self.rbr_conv)
        if self.rbr_scale is not None:
            out = out + self.rbr_scale.bn(self.rbr_scale.conv(x))
        if self.rbr_skip is not None:
            out = out + self.rbr_skip(x)
        return out


@pytest.mark.parametrize("groups,with_scale,with_skip", [(1, True, True), (1, False, False), (1, True, False)])
def test_fuse_mobileone_block_dense(groups, with_scale, with_skip):
    c = 6
    block = _MobileOneish(c, groups=groups, with_scale=with_scale, with_skip=with_skip).eval()
    sd = {f"b.{k}": v.detach().numpy() for k, v in block.state_dict().items()}
    w, b = fuse_mobileone_block(sd, "b", channels=c, groups=groups, k=3)
    x = torch.randn(2, c, 8, 8, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want = block(x)
    got = _apply_conv(x, w, b, padding=1, groups=groups)
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-4, atol=1e-4)


def test_fuse_mobileone_block_depthwise():
    c = 8
    block = _MobileOneish(c, groups=c, n_conv=1, seed=3).eval()
    sd = {f"m.{k}": v.detach().numpy() for k, v in block.state_dict().items()}
    w, b = fuse_mobileone_block(sd, "m", channels=c, groups=c, k=3)
    x = torch.randn(2, c, 5, 5, generator=torch.Generator().manual_seed(8))
    with torch.no_grad():
        want = block(x)
    got = _apply_conv(x, w, b, padding=1, groups=c)
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-4, atol=1e-4)


def test_fuse_repmixer_matches_train_form():
    """x + mixer(x) − norm(x) == x + conv(x; fused) for depthwise branches."""
    c = 6
    mixer = _MobileOneish(c, groups=c, n_conv=1, with_scale=True, with_skip=True, seed=11).eval()
    norm = _MobileOneish(c, groups=c, n_conv=0, with_scale=False, with_skip=True, seed=12).eval()
    sd = {}
    sd.update({f"rm.mixer.{k}": v.detach().numpy() for k, v in mixer.state_dict().items()})
    sd.update({f"rm.norm.{k}": v.detach().numpy() for k, v in norm.state_dict().items()})
    w, b = fuse_repmixer(sd, "rm", channels=c, k=3)
    x = torch.randn(2, c, 7, 7, generator=torch.Generator().manual_seed(13))
    with torch.no_grad():
        want = x + mixer(x) - norm(x)
    got = x + _apply_conv(x, w, b, padding=1, groups=c)
    np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-4, atol=1e-4)


def test_fuse_repmixer_accepts_deployed_form():
    """A checkpoint already carrying reparam_conv round-trips (identity removed)."""
    c = 4
    w_dep = np.random.default_rng(0).normal(size=(c, 1, 3, 3)).astype(np.float32)
    sd = {"rm.reparam_conv.weight": w_dep, "rm.reparam_conv.bias": np.zeros(c, np.float32)}
    w, _b = fuse_repmixer(sd, "rm", channels=c, k=3)
    np.testing.assert_allclose(w + identity_kernel(c, c, 3), w_dep, atol=1e-6)


def test_fold_branches_rejects_empty():
    with pytest.raises(ValueError):
        fold_branches([], 3)
    with pytest.raises(KeyError):
        fuse_mobileone_block({}, "nope", channels=2, groups=1, k=3)
