"""Llama decoder-only LM with KV-cache greedy decode — the native VLM judge LM.

The reference scores erasure runs with LLaVA-1.5 (a Vicuna/Llama-7B LM behind a
CLIP vision tower; reference: modularity/llava_score.py:15-41,
modularity/mod_utils.py:195-290). This is the TPU-native Llama stack that LM:

  * RMSNorm (f32 stats) -> GQA self-attention with rotary embeddings ->
    residual; RMSNorm -> SwiGLU MLP -> residual; final RMSNorm -> lm_head
  * RoPE follows the HF convention: half-split rotate (not interleaved),
    cos/sin built from `rope_theta` at f32
  * one module serves both phases: prefill (full prompt, causal + pad mask,
    returns per-layer K/V to seed the cache) and decode (one token per step,
    `dynamic_update_slice` append into a fixed-size cache — static shapes, so
    the whole greedy loop is a single `lax.scan`)
  * right-padded batches: per-sample lengths drive the append index, the RoPE
    position, and the key-validity mask, so co-batched samples decode exactly
    as they would alone (the serving determinism contract)

Weights port from any HF Llama/Vicuna/LLaVA checkpoint
(weights/port_llava.py); parity vs transformers' LlamaForCausalLM is tested at
tiny dims (tests/test_llava.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Defaults are Llama/Vicuna-7B, LLaVA-1.5's LM.

    The same stack serves Qwen2 geometries (the Qwen2-VL judge LM): Qwen2 is
    this architecture with bias on the q/k/v projections (`attention_bias`)
    and, for Qwen2-VL, 3D multimodal RoPE (`mrope_section` — channel sections
    rotated by the temporal/height/width position axes; HF
    apply_multimodal_rotary_pos_emb semantics)."""
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    attention_bias: bool = False
    mrope_section: tuple = ()          # empty = standard 1D RoPE
    quant_int8: bool = False           # W8A8 projections (ops/quant.py);
    # lm_head stays fp32 (argmax sensitivity), like conv_in/out in the UNet
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_llama_config(vocab_size: int = 128) -> LlamaConfig:
    return LlamaConfig(vocab_size=vocab_size, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       num_kv_heads=2)


def rope_cos_sin(positions: jax.Array, head_dim: int,
                 theta: float) -> tuple[jax.Array, jax.Array]:
    """(..., S) int positions -> cos/sin of shape (..., S, head_dim), HF
    layout: frequencies repeated as [f0..f_{d/2-1}, f0..f_{d/2-1}]."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                           / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv  # (..., S, d/2)
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def mrope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                  section: tuple) -> tuple[jax.Array, jax.Array]:
    """Multimodal 3D RoPE (Qwen2-VL): positions (3, B, S) for the
    temporal/height/width axes -> cos/sin (B, S, head_dim) where channel
    section i (of the doubled `section` list) rotates by axis i % 3."""
    import numpy as np
    if positions.ndim == 2:  # text-only: all three axes share the position
        positions = jnp.broadcast_to(positions[None], (3,) + positions.shape)
    cos3, sin3 = rope_cos_sin(positions, head_dim, theta)  # (3, B, S, hd)
    axis_of = np.repeat(np.arange(len(section) * 2) % 3,
                        np.tile(np.asarray(section), 2))   # (hd,)
    onehot = jnp.asarray(np.eye(3, dtype=np.float32)[axis_of].T)  # (3, hd)
    cos = jnp.einsum("absd,ad->bsd", cos3, onehot)
    sin = jnp.einsum("absd,ad->bsd", sin3, onehot)
    return cos, sin


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, H, S, D), cos/sin (B, S, D) — HF rotate_half convention."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos[:, None].astype(x.dtype)
    s = sin[:, None].astype(x.dtype)
    return x * c + rot * s


class _RMSNorm(nn.Module):
    eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        # HF LlamaRMSNorm casts back to the input dtype BEFORE the scale
        y = (xf * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return y * scale.astype(self.dtype)


class _Attention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cos, sin, kv_mask, cache=None, cache_pos=None):
        """x (B, S, D); kv_mask (B, K) True=attendable; cache None (prefill:
        K=S, causality applied here) or (k, v) of (B, KVH, C, hd) with
        per-sample append index cache_pos (B,) (decode: S=1, K=C).
        Returns (out, (k_all, v_all))."""
        cfg = self.cfg
        b, s, _ = x.shape
        hd = cfg.head_dim

        from diffusion_models_moe_tpu.models.attention import make_dense

        def proj(n_heads, name):
            y = make_dense(n_heads * hd, use_bias=cfg.attention_bias,
                           dtype=cfg.dtype, quant=cfg.quant_int8,
                           name=name)(x)
            return y.reshape(b, s, n_heads, hd).transpose(0, 2, 1, 3)

        q = apply_rope(proj(cfg.num_heads, "q_proj"), cos, sin)
        k = apply_rope(proj(cfg.num_kv_heads, "k_proj"), cos, sin)
        v = proj(cfg.num_kv_heads, "v_proj")

        if cache is None:
            k_all, v_all = k, v
            causal = jnp.tril(jnp.ones((s, s), bool))
            mask = causal[None] & kv_mask[:, None, :]  # (B, S, K)
        else:
            def append(c, new, i):  # (KVH, C, hd), (KVH, 1, hd), scalar
                return jax.lax.dynamic_update_slice(c, new, (0, i, 0))
            k_all = jax.vmap(append)(cache[0], k, cache_pos)
            v_all = jax.vmap(append)(cache[1], v, cache_pos)
            mask = kv_mask[:, None, :]  # (B, 1, K): validity is causality

        rep = cfg.num_heads // cfg.num_kv_heads
        if rep > 1:
            k_att = jnp.repeat(k_all, rep, axis=1)
            v_att = jnp.repeat(v_all, rep, axis=1)
        else:
            k_att, v_att = k_all, v_all
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_att,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        logits = jnp.where(mask[:, None], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v_att)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.num_heads * hd)
        out = make_dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                         quant=cfg.quant_int8, name="o_proj")(out)
        return out, (k_all, v_all)


class _Block(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, cos, sin, kv_mask, cache=None, cache_pos=None):
        cfg = self.cfg
        h = _RMSNorm(cfg.rms_eps, cfg.dtype, name="input_layernorm")(x)
        att, kv = _Attention(cfg, name="self_attn")(h, cos, sin, kv_mask,
                                                    cache, cache_pos)
        x = x + att
        h = _RMSNorm(cfg.rms_eps, cfg.dtype,
                     name="post_attention_layernorm")(x)
        from diffusion_models_moe_tpu.models.attention import make_dense
        dense = lambda n, name: make_dense(n, use_bias=False, dtype=cfg.dtype,
                                           quant=cfg.quant_int8, name=name)
        g = dense(cfg.intermediate_size, "gate_proj")(h)
        u = dense(cfg.intermediate_size, "up_proj")(h)
        y = dense(cfg.hidden_size, "down_proj")(jax.nn.silu(g) * u)
        return x + y, kv


class LlamaModel(nn.Module):
    """Embeddings in, logits out; shared by prefill and decode.

    __call__(embeds, positions, kv_mask, caches=None, cache_pos=None):
      * embeds (B, S, D) — token or multimodal embeddings (LLaVA splices
        image features before calling)
      * positions (B, S) — RoPE positions
      * kv_mask (B, K) — True where a key slot is attendable; prefill K=S
        (pad mask; causality is internal), decode K=C (cache validity)
      * caches — list of per-layer (k, v) with shape (B, KVH, C, hd);
        cache_pos (B,) is each sample's append slot
    Returns (logits (B, S, V), new_caches).
    """
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, embeds, positions, kv_mask, caches=None,
                 cache_pos=None):
        cfg = self.cfg
        if cfg.mrope_section:
            cos, sin = mrope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                                     cfg.mrope_section)
        else:
            cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        x = embeds.astype(cfg.dtype)
        new_caches = []
        for i in range(cfg.num_layers):
            cache = None if caches is None else caches[i]
            x, kv = _Block(cfg, name=f"layers_{i}")(x, cos, sin, kv_mask,
                                                    cache, cache_pos)
            new_caches.append(kv)
        x = _RMSNorm(cfg.rms_eps, cfg.dtype, name="norm")(x)
        logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=jnp.float32,
                          name="lm_head")(x.astype(jnp.float32))
        return logits, new_caches


def embed_tokens(params: dict, ids: jax.Array) -> jax.Array:
    """Token ids -> embeddings from the ported embedding table."""
    return jnp.asarray(params["embed_tokens"])[ids]


def init_cache(cfg: LlamaConfig, batch: int, size: int) -> list:
    kv = lambda: jnp.zeros((batch, cfg.num_kv_heads, size, cfg.head_dim),
                           cfg.dtype)
    return [(kv(), kv()) for _ in range(cfg.num_layers)]


def greedy_decode(model: LlamaModel, params: dict, embeds: jax.Array,
                  lengths: jax.Array, max_new_tokens: int,
                  eos_id: int, pad_id: int = 0,
                  prefill_positions: Optional[jax.Array] = None,
                  pos_offset: Optional[jax.Array] = None) -> jax.Array:
    """Greedy decode from right-padded prompt embeddings.

    embeds (B, P, D); lengths (B,) valid prompt lengths. Prefill seeds a
    (P + max_new_tokens)-slot cache; a lax.scan appends one token per step.
    Returns (B, max_new_tokens) int32, pad_id after each sample's EOS.
    Pure function of arrays — jit/shard at the call site.

    Multimodal RoPE (Qwen2-VL): pass `prefill_positions` ((3, B, P) from
    get_rope_index) and `pos_offset` (B,) = max prompt position + 1 - length
    (HF's mrope_position_deltas), so generated tokens continue from the max
    position rather than the sequence slot.
    """
    lp = {k: v for k, v in params.items() if k != "embed_tokens"}
    emb_table = jnp.asarray(params["embed_tokens"])
    b, p, _ = embeds.shape
    cache_size = p + max_new_tokens
    slot = jnp.broadcast_to(jnp.arange(p), (b, p))
    positions = slot if prefill_positions is None else prefill_positions
    pad_mask = slot < lengths[:, None]
    if pos_offset is None:
        pos_offset = jnp.zeros((b,), jnp.int32)

    logits, kvs = model.apply({"params": lp}, embeds, positions, pad_mask)
    # seed the fixed-size cache with the prefill K/V (slot index == position)
    caches = []
    for k, v in kvs:
        pad = ((0, 0), (0, 0), (0, cache_size - p), (0, 0))
        caches.append((jnp.pad(k, pad), jnp.pad(v, pad)))
    last = jnp.take_along_axis(
        logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
    tok0 = jnp.argmax(last, axis=-1).astype(jnp.int32)

    slot_ids = jnp.arange(cache_size)

    def step(carry, _):
        caches, tok, cur_len, finished = carry
        x = emb_table[tok][:, None]
        pos = (cur_len + pos_offset)[:, None]
        kv_mask = slot_ids[None] <= cur_len[:, None]  # prompt + this token
        logits, caches = model.apply({"params": lp}, x, pos, kv_mask,
                                     caches=caches, cache_pos=cur_len)
        nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
        out = jnp.where(finished, pad_id, tok)
        finished = finished | (tok == eos_id)
        nxt = jnp.where(finished, eos_id, nxt)
        return (caches, nxt, cur_len + 1, finished), out

    finished = jnp.zeros((b,), bool)
    (_, _, _, _), toks = jax.lax.scan(
        step, (caches, tok0, lengths, finished), None, length=max_new_tokens)
    return toks.T  # (B, T)
