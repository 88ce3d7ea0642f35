"""Parity tests for the native FID InceptionV3 (models/inception.py) against a
hand-written torch mirror of the torchvision/torch-fidelity geometry, with
channel counts divided by 8 so the test stays cheap (the JAX side is
shape-agnostic — it reads all channel counts from the ported params)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from diffusion_models_moe_tpu.models.inception import (  # noqa: E402
    InceptionConfig, inception_logits, inception_pool_features, preprocess_fid)
from diffusion_models_moe_tpu.weights.port_torchvision import (  # noqa: E402
    port_inception)


class _BC(nn.Module):
    """BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x, fid):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=not fid)


class _A(nn.Module):
    def __init__(self, cin, pool, d, fid):
        super().__init__()
        self.fid = fid
        self.branch1x1 = _BC(cin, 64 // d, kernel_size=1)
        self.branch5x5_1 = _BC(cin, 48 // d, kernel_size=1)
        self.branch5x5_2 = _BC(48 // d, 64 // d, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BC(cin, 64 // d, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64 // d, 96 // d, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96 // d, 96 // d, kernel_size=3, padding=1)
        self.branch_pool = _BC(cin, pool, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch1x1(x),
                          self.branch5x5_2(self.branch5x5_1(x)),
                          b3, self.branch_pool(_avg(x, self.fid))], 1)


class _B(nn.Module):
    def __init__(self, cin, d):
        super().__init__()
        self.branch3x3 = _BC(cin, 384 // d, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BC(cin, 64 // d, kernel_size=1)
        self.branch3x3dbl_2 = _BC(64 // d, 96 // d, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BC(96 // d, 96 // d, kernel_size=3, stride=2)

    def forward(self, x):
        b = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), b, F.max_pool2d(x, 3, 2)], 1)


class _C(nn.Module):
    def __init__(self, cin, c7, d, fid):
        super().__init__()
        self.fid = fid
        o = 192 // d
        self.branch1x1 = _BC(cin, o, kernel_size=1)
        self.branch7x7_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7_2 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BC(c7, o, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BC(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BC(c7, o, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BC(cin, o, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x, self.fid))], 1)


class _D(nn.Module):
    def __init__(self, cin, d):
        super().__init__()
        o = 192 // d
        self.branch3x3_1 = _BC(cin, o, kernel_size=1)
        self.branch3x3_2 = _BC(o, 320 // d, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BC(cin, o, kernel_size=1)
        self.branch7x7x3_2 = _BC(o, o, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BC(o, o, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BC(o, o, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        return torch.cat([self.branch3x3_2(self.branch3x3_1(x)), b7,
                          F.max_pool2d(x, 3, 2)], 1)


class _E(nn.Module):
    def __init__(self, cin, d, pool, fid):
        super().__init__()
        self.pool, self.fid = pool, fid
        self.branch1x1 = _BC(cin, 320 // d, kernel_size=1)
        self.branch3x3_1 = _BC(cin, 384 // d, kernel_size=1)
        self.branch3x3_2a = _BC(384 // d, 384 // d, kernel_size=(1, 3),
                                padding=(0, 1))
        self.branch3x3_2b = _BC(384 // d, 384 // d, kernel_size=(3, 1),
                                padding=(1, 0))
        self.branch3x3dbl_1 = _BC(cin, 448 // d, kernel_size=1)
        self.branch3x3dbl_2 = _BC(448 // d, 384 // d, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BC(384 // d, 384 // d, kernel_size=(1, 3),
                                   padding=(0, 1))
        self.branch3x3dbl_3b = _BC(384 // d, 384 // d, kernel_size=(3, 1),
                                   padding=(1, 0))
        self.branch_pool = _BC(cin, 192 // d, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "max":
            bp = F.max_pool2d(x, 3, 1, 1)
        else:
            bp = _avg(x, self.fid)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class _Inception(nn.Module):
    """InceptionV3 with torchvision naming, channels / d, FID-variant pools."""

    def __init__(self, d=8, num_classes=11, fid=True):
        super().__init__()
        self.Conv2d_1a_3x3 = _BC(3, 32 // d, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BC(32 // d, 32 // d, kernel_size=3)
        self.Conv2d_2b_3x3 = _BC(32 // d, 64 // d, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BC(64 // d, 80 // d, kernel_size=1)
        self.Conv2d_4a_3x3 = _BC(80 // d, 192 // d, kernel_size=3)
        c = 192 // d
        self.Mixed_5b = _A(c, 32 // d, d, fid)
        c = (64 + 64 + 96 + 32) // d
        self.Mixed_5c = _A(c, 64 // d, d, fid)
        c = (64 + 64 + 96 + 64) // d
        self.Mixed_5d = _A(c, 64 // d, d, fid)
        self.Mixed_6a = _B(c, d)
        c = c + (384 + 96) // d
        self.Mixed_6b = _C(c, 128 // d, d, fid)
        self.Mixed_6c = _C(c, 160 // d, d, fid)
        self.Mixed_6d = _C(c, 160 // d, d, fid)
        self.Mixed_6e = _C(c, 192 // d, d, fid)
        self.Mixed_7a = _D(c, d)
        c = c + (320 + 192) // d
        self.Mixed_7b = _E(c, d, "avg", fid)
        c = (320 + 2 * 384 + 2 * 384 + 192) // d
        self.Mixed_7c = _E(c, d, "max" if fid else "avg", fid)
        self.fc = nn.Linear(c, num_classes)

    def forward(self, x):
        for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
            x = getattr(self, name)(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, 2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        pooled = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return pooled, self.fc(pooled)


@pytest.fixture(scope="module", params=[True, False],
                ids=["fid_variant", "torchvision"])
def torch_inception(request):
    gen = torch.Generator().manual_seed(5)
    model = _Inception(fid=request.param).eval()
    with torch.no_grad():
        # He-scaled weights: a flat small scale decays the signal to zero over
        # ~20 layers, leaving input-INDEPENDENT (bias-only) features
        for p in model.parameters():
            fan_in = p.shape[1:].numel() if p.ndim > 1 else p.shape[0]
            p.copy_(torch.randn(p.shape, generator=gen)
                    * (2.0 / max(fan_in, 1)) ** 0.5)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(0.8 + 0.4 * torch.rand(m.weight.shape,
                                                      generator=gen))
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=gen) * 0.2)
                m.running_var.copy_(torch.rand(m.running_var.shape,
                                               generator=gen) + 0.5)
    return model, request.param


def test_inception_parity(torch_inception):
    model, fid_variant = torch_inception
    rng = np.random.RandomState(6)
    img = (rng.rand(2, 299, 299, 3) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        want_pool, want_logits = model(torch.from_numpy(
            img.transpose(0, 3, 1, 2)))
    params = port_inception(model.state_dict())
    cfg = InceptionConfig(fid_variant=fid_variant, num_classes=11)
    got_pool = np.asarray(inception_pool_features(params, jnp.asarray(img),
                                                  cfg))
    got_logits = np.asarray(inception_logits(params, jnp.asarray(img), cfg))
    np.testing.assert_allclose(got_pool, want_pool.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_logits, want_logits.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_inception_fid_pipeline(torch_inception):
    """Featurizer + streaming FID: identical sets -> ~0, disjoint sets > 0."""
    model, fid_variant = torch_inception
    if not fid_variant:
        pytest.skip("FID path only needs the fid_variant graph")
    from diffusion_models_moe_tpu.benchmarks.fid import (
        fid_from_features, make_inception_featurizer)
    params = port_inception(model.state_dict())
    feat = make_inception_featurizer(params, InceptionConfig(num_classes=11))
    rng = np.random.RandomState(8)
    a = feat(jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32))
    b = feat(jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32))
    assert a.shape[-1] == (320 + 2 * 384 + 2 * 384 + 192) // 8
    same = fid_from_features(np.asarray(a), np.asarray(a))
    diff = fid_from_features(np.asarray(a), np.asarray(b))
    assert abs(same) < 1e-6
    assert np.isfinite(diff) and diff > 0


def test_preprocess_fid():
    rng = np.random.RandomState(7)
    img = rng.rand(2, 128, 128, 3).astype(np.float32)
    out = np.asarray(preprocess_fid(jnp.asarray(img)))
    assert out.shape == (2, 299, 299, 3)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # already-299 inputs skip the resize but still rescale
    img299 = rng.rand(1, 299, 299, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(preprocess_fid(jnp.asarray(img299))),
                               img299 * 2 - 1, rtol=1e-6)
