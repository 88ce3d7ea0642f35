"""Qwen2-VL: native vision transformer + M-RoPE Qwen2 LM, the alternate judge.

The reference scores with either LLaVA-1.5 or a Qwen VLM
(reference: modularity/qwen_score.py:15-45). Its exact checkpoint
(Qwen-VL-Chat) is trust_remote_code-only, so the native build targets the
successor Qwen2-VL — fully specified in transformers, hence parity-testable —
behind the same VQAFn protocol interface. Every stage runs on TPU:

  * vision: flattened (seq, C*tps*ps*ps) patches -> dense patch embed
    (the Conv3d with stride == kernel is a single matmul) -> pre-LN blocks
    with fused-QKV full attention and 2D rotary embeddings over the
    merge-grouped (h, w) patch order -> PatchMerger (LN + 2x2 concat + MLP)
    into LM width
  * LM: the models/llama.py stack with Qwen2's q/k/v biases and multimodal
    3D RoPE (`mrope_section`); KV-cache greedy decode with the position
    offset continuing from the max prompt position (mrope deltas)
  * preprocessing: HF smart_resize (dimensions to multiples of
    patch*merge, pixel budget clamped) + the exact image-processor patch
    flatten order, in numpy

Grids are static per image size, so each (grid, prompt-bucket) pair compiles
once. Weights port from HF Qwen2-VL snapshots (weights/port_qwen2vl.py);
parity vs transformers Qwen2VLForConditionalGeneration is tested at tiny dims
(tests/test_qwen2vl.py).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.models.llama import (LlamaConfig, LlamaModel,
                                                   embed_tokens,
                                                   greedy_decode)

# Qwen2-VL normalizes with the OpenAI CLIP constants
from diffusion_models_moe_tpu.models.clip_vision import (CLIP_IMAGE_MEAN,
                                                         CLIP_IMAGE_STD)


@dataclasses.dataclass(frozen=True)
class Qwen2VisionConfig:
    """Defaults are the Qwen2-VL-2B/7B vision tower (they share it)."""
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 3584          # LM width the merger projects into
    mlp_ratio: float = 4.0
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vision: Qwen2VisionConfig = dataclasses.field(
        default_factory=Qwen2VisionConfig)
    text: LlamaConfig = dataclasses.field(default_factory=lambda: LlamaConfig(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_layers=28, num_heads=28, num_kv_heads=4, rope_theta=1e6,
        rms_eps=1e-6, attention_bias=True, mrope_section=(16, 24, 24)))
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    eos_id: int = 151645             # <|im_end|>
    pad_id: int = 151643             # <|endoftext|>


def tiny_qwen2vl_config() -> Qwen2VLConfig:
    return Qwen2VLConfig(
        vision=Qwen2VisionConfig(depth=2, embed_dim=32, hidden_size=48,
                                 mlp_ratio=2.0, num_heads=4, patch_size=4),
        text=LlamaConfig(vocab_size=128, hidden_size=48, intermediate_size=96,
                         num_layers=2, num_heads=4, num_kv_heads=2,
                         rope_theta=10000.0, rms_eps=1e-6,
                         attention_bias=True, mrope_section=(2, 2, 2)),
        image_token_id=120, vision_start_token_id=121, eos_id=122, pad_id=0)


# ------------------------------------------------------------- preprocessing

def smart_resize(height: int, width: int, factor: int,
                 min_pixels: int, max_pixels: int) -> tuple[int, int]:
    """HF Qwen2VLImageProcessor.smart_resize: round both dims to multiples of
    `factor` keeping the pixel count inside [min_pixels, max_pixels]."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio over 200")
    h = round(height / factor) * factor
    w = round(width / factor) * factor
    if h * w > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h = max(factor, math.floor(height / beta / factor) * factor)
        w = max(factor, math.floor(width / beta / factor) * factor)
    elif h * w < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h = math.ceil(height * beta / factor) * factor
        w = math.ceil(width * beta / factor) * factor
    return h, w


def preprocess_image(image, cfg: Qwen2VisionConfig,
                     min_pixels: int = 56 * 56,
                     max_pixels: int = 28 * 28 * 1280
                     ) -> tuple[np.ndarray, tuple[int, int, int]]:
    """image -> (flattened patches (S, patch_dim) float32, grid (t, h, w)).

    Mirrors the HF processor: bicubic resize to smart_resize dims, rescale to
    [0,1], CLIP mean/std normalize, duplicate the frame to the temporal patch
    size, then the exact merge-grouped patch flatten order
    (image_processing_qwen2_vl.py:270-297)."""
    from PIL import Image

    from diffusion_models_moe_tpu.imaging import to_uint8_rgb

    img = to_uint8_rgb(image)
    ih, iw = img.shape[:2]
    factor = cfg.patch_size * cfg.spatial_merge_size
    h, w = smart_resize(ih, iw, factor, min_pixels, max_pixels)
    pil = Image.fromarray(img).resize((w, h), Image.BICUBIC)
    x = np.asarray(pil, np.float32) / 255.0
    x = (x - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    x = x.transpose(2, 0, 1)[None]                       # (1, C, H, W)
    x = np.repeat(x, cfg.temporal_patch_size, axis=0)    # duplicate frame
    ps, m, tps = cfg.patch_size, cfg.spatial_merge_size, cfg.temporal_patch_size
    grid_t = x.shape[0] // tps
    grid_h, grid_w = h // ps, w // ps
    x = x.reshape(grid_t, tps, cfg.in_channels, grid_h // m, m, ps,
                  grid_w // m, m, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = x.reshape(grid_t * grid_h * grid_w, cfg.patch_dim)
    return np.ascontiguousarray(flat, np.float32), (grid_t, grid_h, grid_w)


def vision_rope(cfg: Qwen2VisionConfig,
                grid: tuple[int, int, int]) -> np.ndarray:
    """(S, head_dim/2) rotary angles over the merge-grouped patch order
    (modeling_qwen2_vl.py rot_pos_emb)."""
    t, h, w = grid
    m = cfg.spatial_merge_size
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def grouped(p):
        return p.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).ravel()

    pos = np.stack([grouped(hpos), grouped(wpos)], axis=-1)   # (h*w, 2)
    pos = np.tile(pos, (t, 1))
    dim = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    freqs = np.arange(max(h, w), dtype=np.float32)[:, None] * inv[None]
    return freqs[pos].reshape(len(pos), -1)                   # (S, hd/2)


# ------------------------------------------------------------- vision tower

class _VisionBlock(nn.Module):
    cfg: Qwen2VisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, attn_mask):
        cfg = self.cfg
        s = x.shape[0]
        nh, hd = cfg.num_heads, cfg.head_dim
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="norm1")(x).astype(cfg.dtype)
        qkv = nn.Dense(3 * cfg.embed_dim, dtype=cfg.dtype, name="qkv")(h)
        q, k, v = [a.reshape(s, nh, hd) for a in jnp.split(qkv, 3, axis=-1)]

        def rope(a):  # rotate_half over head_dim, f32 like HF
            af = a.astype(jnp.float32)
            half = jnp.concatenate([-af[..., hd // 2:], af[..., :hd // 2]],
                                   axis=-1)
            return (af * cos[:, None] + half * sin[:, None]).astype(cfg.dtype)

        q, k = rope(q), rope(k)
        logits = jnp.einsum("qhd,khd->hqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        logits = jnp.where(attn_mask[None], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        att = jnp.einsum("hqk,khd->qhd", probs, v).reshape(s, cfg.embed_dim)
        x = x + nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="proj")(att)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="norm2")(x).astype(cfg.dtype)
        h = nn.Dense(int(cfg.embed_dim * cfg.mlp_ratio), dtype=cfg.dtype,
                     name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # quick_gelu (Qwen2-VL vision act)
        return x + nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="fc2")(h)


class Qwen2VisionTower(nn.Module):
    """Flattened patches (S, patch_dim) + static grid -> (S/m^2, lm_width)."""
    cfg: Qwen2VisionConfig
    grid: tuple[int, int, int]

    @nn.compact
    def __call__(self, patches):
        cfg = self.cfg
        t, h, w = self.grid
        x = nn.Dense(cfg.embed_dim, use_bias=False, dtype=cfg.dtype,
                     name="patch_embed")(patches.astype(cfg.dtype))
        angles = jnp.asarray(vision_rope(cfg, self.grid))
        emb = jnp.concatenate([angles, angles], axis=-1)
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        # attention is per temporal frame (HF cu_seqlens chunks of h*w)
        s = x.shape[0]
        frame = jnp.arange(s) // (h * w)
        attn_mask = frame[:, None] == frame[None, :]
        for i in range(cfg.depth):
            x = _VisionBlock(cfg, name=f"blocks_{i}")(x, cos, sin, attn_mask)
        # PatchMerger: LN, concat each 2x2 merge group, 2-layer GELU MLP
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln_q")(x).astype(cfg.dtype)
        mm = cfg.spatial_merge_size ** 2
        x = x.reshape(s // mm, mm * cfg.embed_dim)
        x = nn.Dense(mm * cfg.embed_dim, dtype=cfg.dtype, name="mlp_0")(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_2")(x)


# ------------------------------------------------------------------ M-RoPE

def rope_index(cfg: Qwen2VLConfig, ids: np.ndarray,
               grid: tuple[int, int, int]) -> tuple[np.ndarray, int]:
    """Single-sequence 3D position ids (HF get_rope_index, one image).

    `ids` must already carry the image token EXPANDED to its merged-patch
    count. Returns (positions (3, 1, L) int32, delta = max_pos + 1 - L)."""
    ids = np.asarray(ids).reshape(-1)
    m = cfg.vision.spatial_merge_size
    t, h, w = grid
    lh, lw = h // m, w // m
    img = np.nonzero(ids == cfg.image_token_id)[0]
    if len(img) == 0:
        pos = np.broadcast_to(np.arange(len(ids)), (3, len(ids)))
        return np.ascontiguousarray(pos[:, None]).astype(np.int32), 0
    if len(img) != t * lh * lw:
        raise ValueError(f"{len(img)} image tokens != grid {t}x{lh}x{lw}")
    st = int(img[0])
    parts = [np.broadcast_to(np.arange(st), (3, st))]
    t_idx = np.repeat(np.arange(t), lh * lw)
    h_idx = np.tile(np.repeat(np.arange(lh), lw), t)
    w_idx = np.tile(np.arange(lw), t * lh)
    parts.append(np.stack([t_idx, h_idx, w_idx]) + st)
    tail = len(ids) - (st + t * lh * lw)
    # parts[0] is empty when the sequence opens with the image span
    st_idx = max(int(p.max()) for p in parts if p.size) + 1
    parts.append(np.broadcast_to(np.arange(tail), (3, tail)) + st_idx)
    pos = np.concatenate(parts, axis=1)
    delta = int(pos.max()) + 1 - len(ids)
    return np.ascontiguousarray(pos[:, None]).astype(np.int32), delta


# ---------------------------------------------------------------- front door

def prompt_ids(tokenize: Callable, question: str, n_image_tokens: int,
               cfg: Qwen2VLConfig, history: Sequence = ()) -> np.ndarray:
    """Qwen2-VL chat-format ids with the image pad expanded.

    tokenize(text) -> ids WITHOUT the vision tokens; this builds
    system + user turns and splices <|vision_start|> <pad>*n <|vision_end|>
    (the processor's expansion; vision_end = start id + 1 by convention of
    the published vocab). `history` is prior (question, answer) pairs — the
    image rides only the first user turn, per the HF chat template."""
    sys_part = np.asarray(tokenize(
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n"), np.int64)
    turns = ""
    for q, a in history:
        turns += (f"{q}<|im_end|>\n<|im_start|>assistant\n"
                  f"{a}<|im_end|>\n<|im_start|>user\n")
    tail = np.asarray(tokenize(
        f"{turns}{question}<|im_end|>\n<|im_start|>assistant\n"), np.int64)
    vis = np.concatenate([[cfg.vision_start_token_id],
                          [cfg.image_token_id] * n_image_tokens,
                          [cfg.vision_start_token_id + 1]])
    return np.concatenate([sys_part, vis, tail]).astype(np.int64)


def generate(params: dict, cfg: Qwen2VLConfig, input_ids: np.ndarray,
             patches: np.ndarray, grid: tuple[int, int, int],
             max_new_tokens: int = 32,
             pad_to: Optional[int] = None) -> np.ndarray:
    """input_ids (1D, image token expanded) + preprocessed patches ->
    generated ids (B, T). Static (grid, padded-length) pairs compile once.

    `patches` is (n_patches, patch_dim) for one image or (B, n_patches,
    patch_dim) for a co-batch of same-grid images all answering the SAME
    prompt (the M-RoPE positions depend only on (ids, grid), so every sample
    shares them; right-padded co-batching decodes exactly as solo — see
    models/llama.py greedy_decode)."""
    patches = np.asarray(patches)
    pb = patches if patches.ndim == 3 else patches[None]
    vfn = _vision_jit(cfg.vision, tuple(grid))
    # one compiled vision executable, applied per sample (the decode scan is
    # the expensive part worth co-batching; vision is one prefill-sized pass)
    feats = jnp.stack([vfn(params["vision"], jnp.asarray(p)) for p in pb])
    ids = np.asarray(input_ids).reshape(-1)
    img = np.nonzero(ids == cfg.image_token_id)[0]
    if len(img) != feats.shape[1]:
        raise ValueError(f"{len(img)} image tokens != {feats.shape[1]} "
                         "vision features")
    b = feats.shape[0]
    embeds = embed_tokens(params["language"], jnp.asarray(ids))
    embeds = jnp.broadcast_to(embeds, (b,) + embeds.shape)
    embeds = embeds.at[:, jnp.asarray(img)].set(feats.astype(embeds.dtype))
    positions, delta = rope_index(cfg, ids, grid)
    length = len(ids)
    target = pad_to or length
    if target < length:
        raise ValueError(f"pad_to {target} < prompt length {length}")
    if target > length:
        embeds = jnp.pad(embeds, ((0, 0), (0, target - length), (0, 0)))
        positions = np.pad(positions, ((0, 0), (0, 0),
                                       (0, target - length)))
    positions = np.broadcast_to(positions, (3, b, positions.shape[-1]))
    toks = _decode_jit(LlamaModel(cfg.text), max_new_tokens, cfg.eos_id,
                       cfg.pad_id, params["language"], embeds,
                       jnp.full((b,), length, jnp.int32),
                       jnp.asarray(positions),
                       jnp.full((b,), delta, jnp.int32))
    return np.asarray(jax.device_get(toks))


@partial(jax.jit, static_argnums=(0, 1))
def _vision_jit_impl(cfg, grid, vparams, patches):
    return Qwen2VisionTower(cfg, grid).apply({"params": vparams}, patches)


def _vision_jit(cfg, grid):
    return lambda vp, x: _vision_jit_impl(cfg, grid, vp, x)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _decode_jit(model, max_new_tokens, eos_id, pad_id, params, embeds,
                lengths, positions, deltas):
    # pad with THIS vocab's pad id (151643), not the default 0 ('!' here),
    # so build_vqa's (pad, eos) filter really strips post-EOS slots
    return greedy_decode(model, params, embeds, lengths, max_new_tokens,
                         eos_id=eos_id, pad_id=pad_id,
                         prefill_positions=positions, pos_offset=deltas)


def build_vqa(params: dict, cfg: Qwen2VLConfig, tokenize: Callable,
              detokenize: Callable, max_new_tokens: int = 32,
              pad_multiple: int = 64,
              max_pixels: int = 28 * 28 * 576) -> Callable:
    """The benchmarks/vqa.py VQAFn on the native Qwen2-VL stack.

    tokenize(text) -> 1D ids (plain text, incl. the <|im_start|> special
    strings — the HF tokenizer.json handles them); detokenize(ids) -> text.
    `max_pixels` bounds the vision sequence (default 576 merged tokens)."""
    def ask(image, question: str, history: Sequence = ()) -> str:
        patches, grid = preprocess_image(image, cfg.vision,
                                         max_pixels=max_pixels)
        m2 = cfg.vision.spatial_merge_size ** 2
        n_img = patches.shape[0] // m2
        ids = prompt_ids(tokenize, question, n_img, cfg, history)
        pad_to = -(-len(ids) // pad_multiple) * pad_multiple
        toks = generate(params, cfg, ids, patches, grid,
                        max_new_tokens=max_new_tokens, pad_to=pad_to)[0]
        keep = [int(t) for t in toks
                if int(t) not in (cfg.pad_id, cfg.eos_id)]
        return detokenize(keep)

    def vqa(image, question: str) -> str:
        return ask(image, question)

    def batch(images: Sequence, question: str,
              batch_size: int = 8) -> list:
        """Score many images on the SAME question in fixed-size decode
        batches. Images are grouped by smart-resize grid (protocol runs
        score same-size generations, so typically one group); within a
        group every sample shares ids/positions and right-padded
        co-batching is sample-exact. Answers return in input order."""
        pre = [preprocess_image(img, cfg.vision, max_pixels=max_pixels)
               for img in images]
        groups: dict = {}
        for i, (_, grid) in enumerate(pre):
            groups.setdefault(tuple(grid), []).append(i)
        out: list = [None] * len(pre)
        m2 = cfg.vision.spatial_merge_size ** 2
        for grid, idxs in groups.items():
            n_img = pre[idxs[0]][0].shape[0] // m2
            ids = prompt_ids(tokenize, question, n_img, cfg)
            pad_to = -(-len(ids) // pad_multiple) * pad_multiple
            for start in range(0, len(idxs), batch_size):
                chunk = idxs[start:start + batch_size]
                plist = [pre[i][0] for i in chunk]
                while len(plist) < batch_size:  # fixed-shape executable
                    plist.append(np.zeros_like(plist[0]))
                toks = generate(params, cfg, ids, np.stack(plist), grid,
                                max_new_tokens=max_new_tokens, pad_to=pad_to)
                for j, i in enumerate(chunk):
                    keep = [int(t) for t in toks[j]
                            if int(t) not in (cfg.pad_id, cfg.eos_id)]
                    out[i] = detokenize(keep)
        return out

    def chat(image, questions: Sequence[str]) -> list:
        """Multi-turn chat-with-history (the reference's qwen_score.py and
        qwen_bb.py warm up with 'what is this?' before the real question)."""
        history: list = []
        for q in questions:
            history.append((q, ask(image, q, history)))
        return [a for _, a in history]

    vqa.chat = chat    # type: ignore[attr-defined]
    vqa.batch = batch  # type: ignore[attr-defined]
    return vqa
