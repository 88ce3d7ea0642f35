"""Golden parity: the Flax PixArt DiT vs an independent torch mirror of
diffusers' PixArtTransformer2DModel semantics, wired through the PORTER
(torch mirror saves a diffusers-layout state dict; port_pixart_transformer
loads it), like the CLIP/T5 golden tests.

The mirror implements the documented diffusers structure — p-stride conv
patch embed + fixed sincos buffer, adaLN-single (shared 6-way conditioning
from the timestep embedding + per-block learned tables), self-attn with
modulated norm, un-modulated cross-attn, tanh-GELU FF, final
scale_shift_table + embedded-timestep modulation, unpatchify — NOT copied
from the Flax code, so weight-layout/ordering/eps bugs in model or porter
break it. The fixed (non-learned) sincos positional buffer is taken from the
framework's `sincos_pos_embed` on both sides: it is not part of the state
dict, and the anchor here is the learned-weight path.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_models_moe_tpu.models.pixart import (PixArtConfig,  # noqa: E402
                                                    PixArtTransformer2D)
from diffusion_models_moe_tpu.weights.port_pixart import (  # noqa: E402
    port_pixart_transformer, sincos_pos_embed)


def _t_emb(timesteps, dim):
    """diffusers Timesteps(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    emb = timesteps[:, None].float() * torch.exp(exponent / half)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class _TAttn(nn.Module):
    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(ctx_dim or dim, dim)
        self.to_v = nn.Linear(ctx_dim or dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        c = x if ctx is None else ctx
        q, k, v = self.to_q(x), self.to_k(c), self.to_v(c)
        b, s, dim = q.shape
        h, d = self.heads, dim // self.heads

        def split(t):
            return t.view(b, t.shape[1], h, d).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        att = torch.softmax(q @ k.transpose(-1, -2) * d ** -0.5, dim=-1) @ v
        return self.to_out[0](att.transpose(1, 2).reshape(b, s, dim))


class _TFF(nn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        proj = nn.Linear(dim, dim * mult)
        self.net = nn.ModuleList([nn.ModuleDict({"proj": proj}),
                                  nn.Identity(), nn.Linear(dim * mult, dim)])

    def forward(self, x):
        x = F.gelu(self.net[0]["proj"](x), approximate="tanh")
        return self.net[2](x)


class _TBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim, mult):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim ** 0.5)
        self.attn1 = _TAttn(dim, heads)
        self.attn2 = _TAttn(dim, heads, ctx_dim)
        self.ff = _TFF(dim, mult)
        self.norm = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)

    def forward(self, x, ctx, cond6):
        mods = cond6 + self.scale_shift_table[None]
        (shift_sa, scale_sa, gate_sa,
         shift_ff, scale_ff, gate_ff) = (mods[:, i].unsqueeze(1)
                                         for i in range(6))
        h = self.norm(x) * (1 + scale_sa) + shift_sa
        x = x + gate_sa * self.attn1(h)
        x = x + self.attn2(x, ctx)
        h = self.norm(x) * (1 + scale_ff) + shift_ff
        return x + gate_ff * self.ff(h)


class _TorchPixArt(nn.Module):
    def __init__(self, cfg: PixArtConfig, sample_size: int):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        grid = sample_size // cfg.patch_size
        pos = nn.Module()
        pos.proj = nn.Conv2d(cfg.sample_channels, d, cfg.patch_size,
                             cfg.patch_size)
        self.pos_embed = pos
        self.register_buffer("pos_buf", torch.from_numpy(
            sincos_pos_embed(d, grid, grid, base_size=grid)))
        ada = nn.Module()
        emb = nn.Module()
        te = nn.Module()
        te.linear_1 = nn.Linear(256, d)
        te.linear_2 = nn.Linear(d, d)
        emb.timestep_embedder = te
        ada.emb = emb
        ada.linear = nn.Linear(d, 6 * d)
        self.adaln_single = ada
        cap = nn.Module()
        cap.linear_1 = nn.Linear(cfg.text_in_dim, cfg.cross_attention_dim)
        cap.linear_2 = nn.Linear(cfg.cross_attention_dim,
                                 cfg.cross_attention_dim)
        self.caption_projection = cap
        self.transformer_blocks = nn.ModuleList(
            [_TBlock(d, cfg.num_heads, cfg.cross_attention_dim, cfg.ff_mult)
             for _ in range(cfg.num_layers)])
        self.scale_shift_table = nn.Parameter(torch.randn(2, d) / d ** 0.5)
        self.norm_out = nn.LayerNorm(d, eps=1e-6, elementwise_affine=False)
        self.proj_out = nn.Linear(
            d, cfg.patch_size ** 2 * cfg.out_channels)

    def forward(self, sample, timestep, text_feats):
        cfg, p = self.cfg, self.cfg.patch_size
        b, c, hh, ww = sample.shape
        gh, gw = hh // p, ww // p
        x = self.pos_embed.proj(sample)                       # (B, D, gh, gw)
        x = x.flatten(2).transpose(1, 2) + self.pos_buf[None]
        temb = self.adaln_single.emb.timestep_embedder.linear_2(F.silu(
            self.adaln_single.emb.timestep_embedder.linear_1(
                _t_emb(timestep.expand(b), 256))))
        cond6 = self.adaln_single.linear(F.silu(temb)).view(
            b, 6, cfg.hidden_size)
        ctx = self.caption_projection.linear_2(F.gelu(
            self.caption_projection.linear_1(text_feats), approximate="tanh"))
        for blk in self.transformer_blocks:
            x = blk(x, ctx, cond6)
        shift, scale = (self.scale_shift_table[None]
                        + temb[:, None]).chunk(2, dim=1)
        x = self.norm_out(x) * (1 + scale) + shift
        x = self.proj_out(x)
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = torch.einsum("nhwpqc->nchpwq", x).reshape(
            b, cfg.out_channels, gh * p, gw * p)
        return x


def test_pixart_matches_torch_mirror(tmp_path):
    from safetensors.numpy import save_file

    cfg = PixArtConfig(hidden_size=32, num_layers=3, num_heads=4,
                       cross_attention_dim=32, text_in_dim=48)
    sample_size = 8
    torch.manual_seed(0)
    tm = _TorchPixArt(cfg, sample_size).eval()
    (tmp_path / "transformer").mkdir()
    save_file({k: v.detach().numpy()
               for k, v in tm.state_dict().items() if k != "pos_buf"},
              str(tmp_path / "transformer"
                  / "diffusion_pytorch_model.safetensors"))
    params = port_pixart_transformer(str(tmp_path), cfg,
                                     sample_size=sample_size)

    rng = np.random.RandomState(1)
    lat = rng.randn(2, sample_size, sample_size,
                    cfg.sample_channels).astype(np.float32)
    text = rng.randn(2, 6, cfg.text_in_dim).astype(np.float32)
    t_val = 17
    with torch.no_grad():
        ref = tm(torch.from_numpy(lat).permute(0, 3, 1, 2),
                 torch.tensor([t_val]), torch.from_numpy(text))
    out = np.asarray(PixArtTransformer2D(cfg).apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray([t_val]),
        jnp.asarray(text)))
    ref_nhwc = ref.permute(0, 2, 3, 1).numpy()
    assert out.shape == ref_nhwc.shape
    np.testing.assert_allclose(out, ref_nhwc, atol=2e-4, rtol=2e-4)
