"""Golden parity: the Flax UNet vs an independent torch mirror of diffusers'
UNet2DConditionModel semantics, wired through the exporter's diffusers-named
state dict (weights/export.py).

CLIP/T5 are golden-tested against transformers, the judge backbones against
torchvision-style mirrors; this closes the same loop for the UNet — the one
model previously validated only by exporter<->porter roundtrips. The mirror is
written from diffusers' documented layer semantics (reference L0 dependency:
UNet2DConditionModel; SURVEY.md §1), NOT from the Flax code, so transposition /
group-ordering / eps / block-order bugs in either the model or the exporter
break the test. diffusers itself is not installed in this environment (no
network); an independent reimplementation of its semantics is the strongest
available anchor.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_models_moe_tpu.config import UNetConfig  # noqa: E402
from diffusion_models_moe_tpu.models.unet import UNet2DCondition  # noqa: E402
from diffusion_models_moe_tpu.weights.export import export_unet  # noqa: E402


# ------------------------------------------------------------ torch mirror
class _TResnet(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        r = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return h + r


class _TAttention(nn.Module):
    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim or dim, dim, bias=False)
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
        att = att.transpose(1, 2).reshape(b, s, dim)
        return self.to_out[0](att)


class _TGEGLU(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * hidden)

    def forward(self, x):
        hidden, gate = self.proj(x).chunk(2, dim=-1)
        return hidden * F.gelu(gate, approximate="none")


class _TFeedForward(nn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        self.net = nn.ModuleList(
            [_TGEGLU(dim, dim * mult), nn.Identity(), nn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class _TBasicBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim, mult):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)                 # torch default eps 1e-5
        self.attn1 = _TAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = _TAttention(dim, heads, ctx_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = _TFeedForward(dim, mult)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class _TTransformer2D(nn.Module):
    def __init__(self, dim, heads, ctx_dim, depth, groups, mult):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [_TBasicBlock(dim, heads, ctx_dim, mult) for _ in range(depth)])
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = self.proj_out(y)
        return y.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res


class _TDown(nn.Module):
    def __init__(self, conv):
        super().__init__()
        self.conv = conv


class _TTimestepMLP(nn.Module):
    def __init__(self, cin, dim, cond_dim=0):
        super().__init__()
        self.linear_1 = nn.Linear(cin, dim)
        self.linear_2 = nn.Linear(dim, dim)
        if cond_dim:
            # diffusers TimestepEmbedding.cond_proj (LCM guidance embedding):
            # added to the sinusoidal embedding BEFORE linear_1
            self.cond_proj = nn.Linear(cond_dim, cin, bias=False)

    def forward(self, x, cond=None):
        if cond is not None:
            x = x + self.cond_proj(cond)
        return self.linear_2(F.silu(self.linear_1(x)))


def _t_emb(timesteps, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    emb = timesteps[:, None].float() * torch.exp(exponent / half)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class _TBlockHolder(nn.Module):
    """Container matching diffusers down/up block naming."""

    def __init__(self):
        super().__init__()
        self.resnets = nn.ModuleList()
        self.attentions = nn.ModuleList()
        self.downsamplers = nn.ModuleList()
        self.upsamplers = nn.ModuleList()


class _TorchUNet(nn.Module):
    """diffusers-semantics UNet2DCondition for the subset the Flax model covers
    (SD1.x geometry; NCHW; state-dict names == weights/export.py output)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        ch = list(cfg.block_out_channels)
        tdim = ch[0] * 4
        self.conv_in = nn.Conv2d(cfg.sample_channels, ch[0], 3, 1, 1)
        self.time_embedding = _TTimestepMLP(ch[0], tdim,
                                            cond_dim=cfg.time_cond_proj_dim)
        if cfg.addition_embed_dim > 0:
            # SDXL micro-conditioning MLP: input = pooled text embeds ++
            # sinusoidal(time_ids) flattened (diffusers add_embedding;
            # 6 time_ids for SDXL)
            add_in = cfg.addition_embed_dim + 6 * cfg.addition_time_embed_dim
            self.add_embedding = _TTimestepMLP(add_in, tdim)
        self.down_blocks = nn.ModuleList()
        cur = ch[0]
        for i, kind in enumerate(cfg.down_block_types):
            blk = _TBlockHolder()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(
                    _TResnet(cur, ch[i], tdim, cfg.norm_num_groups))
                cur = ch[i]
                if kind == "cross":
                    blk.attentions.append(_TTransformer2D(
                        ch[i], cfg.heads_for_block(i), cfg.cross_attention_dim,
                        cfg.depth_for_block(i), cfg.norm_num_groups,
                        cfg.ff_mult))
            if i < len(cfg.down_block_types) - 1:
                blk.downsamplers.append(_TDown(nn.Conv2d(ch[i], ch[i], 3, 2, 1)))
            self.down_blocks.append(blk)
        mid = _TBlockHolder()
        mid.resnets.append(_TResnet(ch[-1], ch[-1], tdim, cfg.norm_num_groups))
        mid.attentions.append(_TTransformer2D(
            ch[-1], cfg.heads_for_block(len(ch) - 1), cfg.cross_attention_dim,
            cfg.depth_for_block(len(ch) - 1), cfg.norm_num_groups, cfg.ff_mult))
        mid.resnets.append(_TResnet(ch[-1], ch[-1], tdim, cfg.norm_num_groups))
        self.mid_block = mid
        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        # skip-connection channel bookkeeping mirrors the down-path pushes
        skips = [ch[0]]
        for i, kind in enumerate(cfg.down_block_types):
            skips += [ch[i]] * cfg.layers_per_block
            if i < len(cfg.down_block_types) - 1:
                skips.append(ch[i])
        cur = ch[-1]
        for i, kind in enumerate(cfg.up_block_types):
            blk = _TBlockHolder()
            for _ in range(cfg.layers_per_block + 1):
                cin = cur + skips.pop()
                blk.resnets.append(
                    _TResnet(cin, rev[i], tdim, cfg.norm_num_groups))
                cur = rev[i]
                if kind == "cross":
                    blk.attentions.append(_TTransformer2D(
                        rev[i], cfg.heads_for_block(len(ch) - 1 - i),
                        cfg.cross_attention_dim,
                        cfg.depth_for_block(len(ch) - 1 - i),
                        cfg.norm_num_groups, cfg.ff_mult))
            if i < len(cfg.up_block_types) - 1:
                blk.upsamplers.append(_TDown(nn.Conv2d(rev[i], rev[i], 3, 1, 1)))
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, 1, 1)

    def forward(self, sample, timestep, ctx, added_text_embeds=None,
                added_time_ids=None, timestep_cond=None):
        cfg = self.cfg
        t = timestep.expand(sample.shape[0])
        temb = self.time_embedding(_t_emb(t, cfg.block_out_channels[0]),
                                   cond=timestep_cond)
        if added_text_embeds is not None:
            b = sample.shape[0]
            id_emb = _t_emb(added_time_ids.reshape(-1).float(),
                            cfg.addition_time_embed_dim).reshape(b, -1)
            temb = temb + self.add_embedding(
                torch.cat([added_text_embeds, id_emb], dim=-1))
        h = self.conv_in(sample)
        stack = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if blk.attentions:
                    h = blk.attentions[j](h, ctx)
                stack.append(h)
            if blk.downsamplers:
                h = blk.downsamplers[0].conv(h)
                stack.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for i, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, stack.pop()], dim=1)
                h = res(h, temb)
                if blk.attentions:
                    h = blk.attentions[j](h, ctx)
            if blk.upsamplers:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ------------------------------------------------------------------- test
def _tiny_unet_cfg(**kw):
    base = dict(block_out_channels=(32, 64, 128, 128), cross_attention_dim=32,
                attention_head_dim=4, norm_num_groups=8, dtype=jnp.float32,
                flash_attention=False)
    base.update(kw)
    return UNetConfig(**base)


def _parity(cfg, b=2, size=8, ctx_len=6, t_val=17, tol=2e-4):
    model = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (b, size, size, cfg.sample_channels))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, ctx_len, cfg.cross_attention_dim))
    params = model.init(rng, lat, jnp.zeros((1,), jnp.int32), ctx)["params"]
    out_flax = np.asarray(model.apply(
        {"params": params}, lat, jnp.asarray([t_val]), ctx))

    sd = export_unet(params, cfg)
    tm = _TorchUNet(cfg)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()
    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.asarray(lat)).permute(0, 3, 1, 2),
                   torch.tensor([t_val]),
                   torch.from_numpy(np.asarray(ctx)))
    out_torch = out_t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=tol, rtol=tol)


def test_unet_matches_torch_mirror_sd1x_geometry():
    """Full forward parity on the SD1.x-shaped tiny config (16 FF layers)."""
    _parity(_tiny_unet_cfg())


def test_unet_matches_torch_mirror_depth_stacked():
    """SDXL-style depth-stacked transformer blocks and per-block head counts
    (transformer_layers_per_block tuple, 3-level geometry)."""
    cfg = _tiny_unet_cfg(block_out_channels=(32, 64, 128),
                         down_block_types=("plain", "cross", "cross"),
                         up_block_types=("cross", "cross", "plain"),
                         transformer_layers_per_block=(0, 2, 2),
                         attention_head_dim=(2, 4, 4))
    _parity(cfg)


def test_timestep_embedding_matches_torch():
    """The sinusoidal embedding formula itself (flip_sin_to_cos, shift 0)."""
    from diffusion_models_moe_tpu.models.layers import timestep_embedding
    ts = np.asarray([0, 1, 19, 999], np.int32)
    ours = np.asarray(timestep_embedding(jnp.asarray(ts), 32))
    theirs = _t_emb(torch.from_numpy(ts), 32).numpy()
    # t=999 amplifies the f32 exp() ulp difference into the sin/cos phase
    # (999 * Δfreq ≈ 1e-3); the formula itself is identical
    np.testing.assert_allclose(ours, theirs, atol=2e-3)
    np.testing.assert_allclose(ours[:2], theirs[:2], atol=1e-6)


def test_unet_matches_torch_mirror_sdxl_microconditioning():
    """SDXL added conditioning: pooled text embeds ++ sinusoidal time_ids
    through add_embedding, summed into the time embedding — the concat order
    and per-id embedding flattening are classic porting bugs."""
    cfg = _tiny_unet_cfg(addition_embed_dim=24, addition_time_embed_dim=8)
    model = UNet2DCondition(cfg)
    b, size, ctx_len, t_val = 2, 8, 6, 17
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, size, size, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, ctx_len, cfg.cross_attention_dim))
    text_embeds = jax.random.normal(jax.random.PRNGKey(3), (b, 24))
    time_ids = jnp.asarray(np.tile(
        np.array([[512, 512, 0, 0, 512, 512]], np.int32), (b, 1)))
    params = model.init(jax.random.PRNGKey(0), lat,
                        jnp.zeros((1,), jnp.int32), ctx,
                        added_text_embeds=text_embeds,
                        added_time_ids=time_ids)["params"]
    out_flax = np.asarray(model.apply(
        {"params": params}, lat, jnp.asarray([t_val]), ctx,
        added_text_embeds=text_embeds, added_time_ids=time_ids))

    sd = export_unet(params, cfg)
    tm = _TorchUNet(cfg)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()
    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.asarray(lat)).permute(0, 3, 1, 2),
                   torch.tensor([t_val]),
                   torch.from_numpy(np.asarray(ctx)),
                   added_text_embeds=torch.from_numpy(np.asarray(text_embeds)),
                   added_time_ids=torch.from_numpy(np.asarray(time_ids)))
    np.testing.assert_allclose(out_flax, out_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=2e-4)


def test_unet_matches_torch_mirror_lcm_guidance_embedding():
    """LCM guidance-scale conditioning: cond_proj output added to the
    sinusoidal embedding BEFORE the time-embedding MLP (diffusers
    TimestepEmbedding.cond_proj)."""
    cfg = _tiny_unet_cfg(time_cond_proj_dim=16)
    model = UNet2DCondition(cfg)
    b, size, ctx_len, t_val = 2, 8, 6, 41
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, size, size, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, ctx_len, cfg.cross_attention_dim))
    w_emb = jax.random.normal(jax.random.PRNGKey(4), (b, 16))
    params = model.init(jax.random.PRNGKey(0), lat,
                        jnp.zeros((1,), jnp.int32), ctx,
                        timestep_cond=w_emb)["params"]
    out_flax = np.asarray(model.apply(
        {"params": params}, lat, jnp.asarray([t_val]), ctx,
        timestep_cond=w_emb))

    sd = export_unet(params, cfg)
    tm = _TorchUNet(cfg)
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)
    tm.eval()
    with torch.no_grad():
        out_t = tm(torch.from_numpy(np.asarray(lat)).permute(0, 3, 1, 2),
                   torch.tensor([t_val]),
                   torch.from_numpy(np.asarray(ctx)),
                   timestep_cond=torch.from_numpy(np.asarray(w_emb)))
    np.testing.assert_allclose(out_flax, out_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=2e-4)
