"""Parity tests for the native judge backbones (models/backbones.py) against
hand-written torch modules that mirror torchvision's module naming — the same
golden-porter pattern used for the CLIP/T5 encoders. Covers the reference's
three delegated judges: ResNet-50 classification (object_erase), SSCD embedding
(inference_mem), LPIPS (calculate_scores)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from diffusion_models_moe_tpu.models.backbones import (  # noqa: E402
    AlexNetConfig, lpips_distance, make_lpips_fn, preprocess_imagenet,
    resnet_logits, sscd_embed, tiny_alexnet_config, tiny_resnet_config)
from diffusion_models_moe_tpu.weights.port_torchvision import (  # noqa: E402
    port_lpips, port_resnet, port_sscd)


# ---------------------------------------------------------- torch mirrors
class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=False)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idn)


class _ResNet(nn.Module):
    """Bottleneck ResNet with torchvision state-dict naming."""

    def __init__(self, blocks, stem, num_classes):
        super().__init__()
        self.inplanes = stem
        self.conv1 = nn.Conv2d(3, stem, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(stem)
        self.relu = nn.ReLU(inplace=False)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        for i, n in enumerate(blocks):
            planes = stem * (2 ** i)
            setattr(self, f"layer{i + 1}",
                    self._make_layer(planes, n, stride=1 if i == 0 else 2))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(self.inplanes, num_classes)

    def _make_layer(self, planes, n_blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes) for _ in range(n_blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def _randomize_bn_stats(model, gen):
    """Non-trivial running stats so batch-norm porting is actually exercised."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=gen) + 0.5)


@pytest.fixture(scope="module")
def torch_resnet():
    gen = torch.Generator().manual_seed(0)
    cfg = tiny_resnet_config(num_classes=7)
    model = _ResNet(cfg.stage_blocks, cfg.stem_width, cfg.num_classes).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
        _randomize_bn_stats(model, gen)
    return model, cfg


def test_resnet_parity(torch_resnet):
    model, cfg = torch_resnet
    rng = np.random.RandomState(1)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    params = port_resnet(model.state_dict(), cfg)
    got = np.asarray(resnet_logits(params, jnp.asarray(img), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sscd_embed_parity(torch_resnet):
    """SSCD head: GeM(p=3) + projection + l2 norm over the same trunk; parity
    against an explicit torch computation, via the backbone.-prefixed porter."""
    model, cfg = torch_resnet
    rng = np.random.RandomState(2)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    proj = rng.randn(256, 16).astype(np.float32) * 0.1

    sd = {f"backbone.{k}": v for k, v in model.state_dict().items()
          if not k.startswith("fc.")}
    sd["embeddings.weight"] = torch.from_numpy(proj.T.copy())
    params = port_sscd(sd, cfg)
    got = np.asarray(sscd_embed(params, jnp.asarray(img), cfg))

    with torch.no_grad():
        x = torch.from_numpy(img.transpose(0, 3, 1, 2))
        x = model.maxpool(model.relu(model.bn1(model.conv1(x))))
        for i in range(4):
            x = getattr(model, f"layer{i + 1}")(x)
        pooled = (x.clamp(min=1e-6) ** 3).mean(dim=(2, 3)) ** (1 / 3)
        emb = pooled @ torch.from_numpy(proj)
        want = (emb / emb.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_preprocess_imagenet_constants():
    img = np.full((1, 4, 4, 3), 0.5, np.float32)
    out = np.asarray(preprocess_imagenet(jnp.asarray(img)))
    np.testing.assert_allclose(out[0, 0, 0],
                               (0.5 - np.array([0.485, 0.456, 0.406]))
                               / np.array([0.229, 0.224, 0.225]), rtol=1e-5)


# ------------------------------------------------------------------- LPIPS
def _torch_alexnet_features(cfg: AlexNetConfig, gen):
    c = cfg.channels
    layers, in_c = [], 3
    for i in range(5):
        layers.append(nn.Conv2d(in_c, c[i], cfg.kernels[i], cfg.strides[i],
                                cfg.pads[i]))
        layers.append(nn.ReLU(inplace=False))
        if i in (0, 1, 4):
            layers.append(nn.MaxPool2d(3, 2))
        in_c = c[i]
    model = nn.Sequential(*layers).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
    return model


def _torch_lpips(feats, lins, a, b):
    """Reference LPIPS math in torch (Zhang et al.): scaling layer, unit-norm
    taps, squared diff, per-channel head, spatial mean, sum."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        out, h = [], (x - shift) / scale
        for m in feats:
            h = m(h)
            if isinstance(m, nn.ReLU):
                out.append(h)
        return out

    total = torch.zeros(a.shape[0])
    for ta, tb, w in zip(taps(a), taps(b), lins):
        na = ta / ta.pow(2).sum(1, keepdim=True).sqrt().clamp(min=1e-10)
        nb = tb / tb.pow(2).sum(1, keepdim=True).sqrt().clamp(min=1e-10)
        d = (na - nb).pow(2) * w.view(1, -1, 1, 1)
        total = total + d.sum(1).mean(dim=(1, 2))
    return total


def test_lpips_parity():
    gen = torch.Generator().manual_seed(3)
    cfg = tiny_alexnet_config()
    feats = _torch_alexnet_features(cfg, gen)
    lins = [torch.rand(c, generator=gen) for c in cfg.channels]
    rng = np.random.RandomState(4)
    a = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
    b = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)

    with torch.no_grad():
        want = _torch_lpips(feats, lins,
                            torch.from_numpy(a.transpose(0, 3, 1, 2)),
                            torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()

    lin_sd = {f"lin{i}.model.1.weight": w.reshape(1, -1, 1, 1)
              for i, w in enumerate(lins)}
    params = port_lpips(feats.state_dict(), lin_sd, cfg)
    got = np.asarray(lpips_distance(params, jnp.asarray(a), jnp.asarray(b), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # identical images -> zero distance; callable wrapper labels the metric
    same = np.asarray(lpips_distance(params, jnp.asarray(a), jnp.asarray(a), cfg))
    np.testing.assert_allclose(same, 0.0, atol=1e-6)
    fn = make_lpips_fn(params, cfg)
    assert fn.metric_name == "lpips_alex_native"
    np.testing.assert_allclose(fn((a + 1) / 2, (b + 1) / 2), want,
                               rtol=1e-4, atol=1e-5)
