"""Golden parity: the Flax VAE decoder vs an independent torch mirror of
diffusers' AutoencoderKL decoder semantics, wired through export_vae_decoder's
diffusers-named state dict.

Same anchoring strategy as tests/test_unet_torch_parity.py: the mirror is
written from diffusers' documented decoder structure (post_quant_conv ->
conv_in -> mid resnet/attn/resnet -> up blocks of layers_per_block+1 resnets
with nearest-2x upsampling between levels -> GroupNorm+SiLU+conv_out), NOT from
the Flax code, so layout/transposition/eps bugs in model or exporter fail it.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_models_moe_tpu.config import VAEConfig  # noqa: E402
from diffusion_models_moe_tpu.models.vae import VAEDecoder  # noqa: E402
from diffusion_models_moe_tpu.weights.export import (  # noqa: E402
    export_vae_decoder)


class _TResnet(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return h + (x if self.conv_shortcut is None else self.conv_shortcut(x))


class _TVAEAttn(nn.Module):
    """Single-head spatial self-attention (diffusers AttentionBlock/Attention
    with one head over HW positions)."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        att = torch.softmax(q @ k.transpose(-1, -2) * c ** -0.5, dim=-1) @ v
        y = self.to_out[0](att)
        return x + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class _THolder(nn.Module):
    def __init__(self):
        super().__init__()
        self.resnets = nn.ModuleList()
        self.attentions = nn.ModuleList()
        self.upsamplers = nn.ModuleList()


class _TUp(nn.Module):
    def __init__(self, conv):
        super().__init__()
        self.conv = conv


class _TorchVAEDecoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.cfg = cfg
        rev = list(reversed(cfg.block_out_channels))
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)
        dec = nn.Module()
        dec.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, 1, 1)
        mid = _THolder()
        mid.resnets.append(_TResnet(rev[0], rev[0], cfg.norm_num_groups))
        mid.attentions.append(_TVAEAttn(rev[0], cfg.norm_num_groups))
        mid.resnets.append(_TResnet(rev[0], rev[0], cfg.norm_num_groups))
        dec.mid_block = mid
        dec.up_blocks = nn.ModuleList()
        cur = rev[0]
        for i, ch in enumerate(rev):
            blk = _THolder()
            for _ in range(cfg.layers_per_block + 1):
                blk.resnets.append(_TResnet(cur, ch, cfg.norm_num_groups))
                cur = ch
            if i < len(rev) - 1:
                blk.upsamplers.append(_TUp(nn.Conv2d(ch, ch, 3, 1, 1)))
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, rev[-1],
                                         eps=1e-6)
        dec.conv_out = nn.Conv2d(rev[-1], cfg.in_channels, 3, 1, 1)
        self.decoder = dec

    def forward(self, scaled_latents):
        z = scaled_latents / self.cfg.scaling_factor
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if blk.upsamplers:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


@pytest.mark.parametrize("channels,layers", [((16, 32), 1), ((16, 16, 32), 2)])
def test_vae_decoder_matches_torch_mirror(channels, layers):
    cfg = VAEConfig(block_out_channels=channels, layers_per_block=layers,
                    norm_num_groups=4, dtype=jnp.float32)
    model = VAEDecoder(cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (2, 4, 4, cfg.latent_channels)) * cfg.scaling_factor
    params = model.init(jax.random.PRNGKey(0), lat)["params"]
    out_flax = np.asarray(model.apply({"params": params}, lat))

    sd = export_vae_decoder(params, cfg)
    tm = _TorchVAEDecoder(cfg)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()
    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.asarray(lat)).permute(0, 3, 1, 2))
    out_torch = out_t.permute(0, 2, 3, 1).numpy()
    assert out_flax.shape == out_torch.shape
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4, rtol=2e-4)


class _TorchVAEEncoder(nn.Module):
    """diffusers AutoencoderKL encoder semantics: conv_in -> down blocks
    (resnets + asymmetric-pad strided downsample) -> mid resnet/attn/resnet ->
    GroupNorm+SiLU+conv_out -> quant_conv; output chunks to (mean, logvar)."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.cfg = cfg
        ch = list(cfg.block_out_channels)
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, 1, 1)
        enc.down_blocks = nn.ModuleList()
        cur = ch[0]
        for i, c in enumerate(ch):
            blk = _THolder()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(_TResnet(cur, c, cfg.norm_num_groups))
                cur = c
            if i < len(ch) - 1:
                # downsamplers.0.conv with padding=0; F.pad (0,1,0,1) applied
                # in forward (diffusers Downsample2D asymmetric padding)
                blk.upsamplers.append(_TUp(nn.Conv2d(c, c, 3, 2, 0)))
            enc.down_blocks.append(blk)
        mid = _THolder()
        mid.resnets.append(_TResnet(ch[-1], ch[-1], cfg.norm_num_groups))
        mid.attentions.append(_TVAEAttn(ch[-1], cfg.norm_num_groups))
        mid.resnets.append(_TResnet(ch[-1], ch[-1], cfg.norm_num_groups))
        enc.mid_block = mid
        enc.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * cfg.latent_channels, 3, 1, 1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)

    def forward(self, images):
        h = self.encoder.conv_in(images)
        for blk in self.encoder.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if blk.upsamplers:
                h = blk.upsamplers[0].conv(F.pad(h, (0, 1, 0, 1)))
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h).chunk(2, dim=1)


def _rename_downsampler_keys(sd):
    """Mirror stores the downsample conv under upsamplers (shared holder);
    remap the exporter's diffusers names onto the mirror's module names."""
    out = {}
    for k, v in sd.items():
        out[k.replace("downsamplers.0.conv", "upsamplers.0.conv")] = v
    return out


@pytest.mark.parametrize("channels,layers", [((16, 32), 1), ((16, 16, 32), 2)])
def test_vae_encoder_matches_torch_mirror(channels, layers):
    from diffusion_models_moe_tpu.models.vae import VAEEncoder
    from diffusion_models_moe_tpu.weights.export import export_vae_encoder

    cfg = VAEConfig(block_out_channels=channels, layers_per_block=layers,
                    norm_num_groups=4, dtype=jnp.float32)
    model = VAEEncoder(cfg)
    res = 8 * 2 ** (len(channels) - 1)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, res, res, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    mean_f, logvar_f = model.apply({"params": params}, imgs)

    sd = _rename_downsampler_keys(export_vae_encoder(params, cfg))
    tm = _TorchVAEEncoder(cfg)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()
    with torch.no_grad():
        mean_t, logvar_t = tm(
            torch.from_numpy(np.asarray(imgs)).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(mean_f),
                               mean_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(logvar_f),
                               logvar_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=2e-4)


def test_vae_encoder_port_export_roundtrip(tmp_path):
    """export_vae_encoder -> safetensors -> port_vae_encoder recovers the
    exact param tree (porter/exporter are inverses)."""
    from diffusion_models_moe_tpu.models.vae import VAEEncoder
    from diffusion_models_moe_tpu.weights.export import (export_vae_encoder,
                                                         save_safetensors)
    from diffusion_models_moe_tpu.weights.port import port_vae_encoder

    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=4, dtype=jnp.float32)
    model = VAEEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]
    sd = export_vae_encoder(params, cfg)
    save_safetensors(sd, str(tmp_path / "diffusion_pytorch_model.safetensors"))
    back = port_vae_encoder(str(tmp_path), cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[path]), atol=0, rtol=0)
