"""LLaVA-1.5: native CLIP vision tower + projector + Llama, as the VQA judge.

The reference's LLAVAScorer loads llava-1.5-13b through transformers on GPU
(reference: modularity/llava_score.py:15-41, mod_utils.py:195-290). Here every
stage runs natively on TPU: the CLIP ViT penultimate-layer patch features
(models/clip_vision.py `feature_layer=-2`, CLS dropped — LLaVA's 'default'
select strategy), a 2-layer GELU projector into the LM width, and the Llama
stack (models/llama.py) with KV-cache greedy decode. Weights port from any HF
llava-1.5 snapshot (weights/port_llava.py).

`build_vqa` returns the standard injected-judge callable
(`vqa(image, question) -> answer text`) that benchmarks/vqa.py's protocols
consume, so the native judge drops into MultipleChoiceScorer / presence
scoring unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.models.clip_vision import (CLIPVisionConfig,
                                                         CLIPVisionEncoder)
from diffusion_models_moe_tpu.models.llama import (LlamaConfig, LlamaModel,
                                                   embed_tokens,
                                                   greedy_decode)


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    """Defaults are llava-1.5 (7b/13b differ only in the LlamaConfig)."""
    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=lambda: CLIPVisionConfig(image_size=336))
    text: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    vision_feature_layer: int = -2
    image_token_id: int = 32000
    eos_id: int = 2

    @property
    def num_image_tokens(self) -> int:
        v = self.vision
        return (v.image_size // v.patch_size) ** 2


def tiny_llava_config() -> LlavaConfig:
    from diffusion_models_moe_tpu.models.clip_vision import tiny_vision_config
    from diffusion_models_moe_tpu.models.llama import tiny_llama_config
    return LlavaConfig(vision=tiny_vision_config(),
                       text=tiny_llama_config(vocab_size=128),
                       image_token_id=120, eos_id=2)


def prompt_template(question: str, history: Sequence = ()) -> str:
    """llava-1.5's conversation format (vicuna_v1 in the reference's serving
    stack; '<image>' is the placeholder the processor expands). `history` is
    prior (question, answer) pairs — the image appears only in the first
    user turn, answers close with </s> (the vicuna separator)."""
    if not history:
        return f"USER: <image>\n{question} ASSISTANT:"
    (q0, a0), rest = history[0], history[1:]
    text = f"USER: <image>\n{q0} ASSISTANT: {a0}</s>"
    for q, a in rest:
        text += f"USER: {q} ASSISTANT: {a}</s>"
    return text + f"USER: {question} ASSISTANT:"


@partial(jax.jit, static_argnums=(1,))
def _image_features_jit(params, cfg, images):
    feats = CLIPVisionEncoder(cfg.vision).apply(
        {"params": params["vision"]}, images,
        feature_layer=cfg.vision_feature_layer)
    feats = feats[:, 1:]  # drop CLS ('default' select strategy)
    p = params["projector"]
    h = feats.astype(jnp.float32) @ p["linear_1"]["kernel"] + \
        p["linear_1"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["linear_2"]["kernel"] + p["linear_2"]["bias"]
    return h.astype(cfg.text.dtype)


def image_features(params: dict, cfg: LlavaConfig,
                   images: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [0,1] -> projected image tokens (B, P, lm_width).

    Penultimate-layer patch features, CLS dropped, then the mlp2x_gelu
    projector (exact GELU, matching torch nn.GELU). Jitted — the 24-layer
    tower over 576 tokens runs once per judge call, twice per scored image."""
    return _image_features_jit(
        {"vision": params["vision"], "projector": params["projector"]},
        cfg, images)


def splice_image(params: dict, cfg: LlavaConfig, input_ids: np.ndarray,
                 img_feats: jax.Array) -> tuple[jax.Array, int]:
    """Replace the single image-token position in `input_ids` (1D) with the
    image feature span; returns (embeds (B, L, D), length L) for (B, P, D)
    features — the shared text embeds broadcast over the batch."""
    ids = np.asarray(input_ids).reshape(-1)
    where = np.nonzero(ids == cfg.image_token_id)[0]
    if len(where) != 1:
        raise ValueError(f"expected exactly one image token, got {len(where)}")
    i = int(where[0])
    b = img_feats.shape[0]
    pre = embed_tokens(params["language"], jnp.asarray(ids[:i])[None])
    post = embed_tokens(params["language"], jnp.asarray(ids[i + 1:])[None])
    embeds = jnp.concatenate([jnp.broadcast_to(pre, (b,) + pre.shape[1:]),
                              img_feats,
                              jnp.broadcast_to(post, (b,) + post.shape[1:])],
                             axis=1)
    return embeds, embeds.shape[1]


def preprocess_image(image, size: int) -> np.ndarray:
    """CLIP-style preprocessing to (size, size, 3) float32 in [0,1]: bicubic
    resize of the SHORT side then center crop (transformers CLIPImageProcessor
    defaults, which llava-1.5 uses; the long side is int-truncated like HF's
    get_resize_output_image_size). Normalization happens inside the tower."""
    from PIL import Image

    from diffusion_models_moe_tpu.imaging import to_uint8_rgb

    pil = Image.fromarray(to_uint8_rgb(image))
    w, h = pil.size
    if w <= h:
        new_w, new_h = size, int(size * h / w)
    else:
        new_w, new_h = int(size * w / h), size
    pil = pil.resize((new_w, new_h), Image.BICUBIC)
    w, h = pil.size
    left, top = (w - size) // 2, (h - size) // 2
    pil = pil.crop((left, top, left + size, top + size))
    return np.asarray(pil, np.float32) / 255.0


def generate(params: dict, cfg: LlavaConfig, input_ids: np.ndarray,
             images: jax.Array, max_new_tokens: int = 32,
             pad_to: Optional[int] = None) -> np.ndarray:
    """input_ids (1D with one image token) + images (B, H, W, 3) ->
    generated token ids (B, T) — every image answers the SAME prompt
    (co-batched samples decode exactly as they would alone, see
    models/llama.py). `pad_to` rounds the spliced prompt length up so
    repeated questions of similar size reuse one compiled executable."""
    feats = image_features(params, cfg, images)
    embeds, length = splice_image(params, cfg, input_ids, feats)
    target = pad_to or length
    if target < length:
        raise ValueError(f"pad_to {target} < prompt length {length}")
    if target > length:
        embeds = jnp.pad(embeds, ((0, 0), (0, target - length), (0, 0)))
    b = embeds.shape[0]
    toks = _decode_jit(LlamaModel(cfg.text), max_new_tokens, cfg.eos_id,
                       params["language"], embeds,
                       jnp.full((b,), length, jnp.int32))
    return np.asarray(jax.device_get(toks))


@partial(jax.jit, static_argnums=(0, 1, 2))
def _decode_jit(model, max_new_tokens, eos_id, params, embeds, lengths):
    return greedy_decode(model, params, embeds, lengths, max_new_tokens,
                         eos_id=eos_id)


def build_vqa(params: dict, cfg: LlavaConfig, tokenize: Callable,
              detokenize: Callable, max_new_tokens: int = 32,
              pad_multiple: int = 64) -> Callable:
    """The benchmarks/vqa.py VQAFn: `vqa(image, question) -> answer text`.

    tokenize(text) -> 1D int ids WITH the image placeholder id and BOS;
    detokenize(ids) -> text (EOS/pads stripped by the caller contract here).
    Prompt lengths are rounded up to `pad_multiple` to bound recompiles."""
    def ask(image, question: str, history: Sequence = ()) -> str:
        ids = np.asarray(tokenize(prompt_template(question, history)))
        img = preprocess_image(image, cfg.vision.image_size)
        n = len(ids) - 1 + cfg.num_image_tokens
        pad_to = -(-n // pad_multiple) * pad_multiple
        toks = generate(params, cfg, ids, jnp.asarray(img)[None],
                        max_new_tokens=max_new_tokens, pad_to=pad_to)[0]
        keep = [int(t) for t in toks if int(t) not in (0, cfg.eos_id)]
        return detokenize(keep)

    def vqa(image, question: str) -> str:
        return ask(image, question)

    def batch(images: Sequence, question: str,
              batch_size: int = 8) -> list:
        """Score many images on the SAME question in fixed-size decode
        batches (one compiled executable; right-padded co-batching is
        sample-exact). The big win on protocol runs, where the judge asks
        one question of hundreds of images."""
        ids = np.asarray(tokenize(prompt_template(question)))
        n = len(ids) - 1 + cfg.num_image_tokens
        pad_to = -(-n // pad_multiple) * pad_multiple
        out = []
        for start in range(0, len(images), batch_size):
            chunk = [preprocess_image(img, cfg.vision.image_size)
                     for img in images[start:start + batch_size]]
            real = len(chunk)
            while len(chunk) < batch_size:  # fixed-shape executable
                chunk.append(np.zeros_like(chunk[0]))
            toks = generate(params, cfg, ids, jnp.asarray(np.stack(chunk)),
                            max_new_tokens=max_new_tokens, pad_to=pad_to)
            for row in toks[:real]:
                keep = [int(t) for t in row
                        if int(t) not in (0, cfg.eos_id)]
                out.append(detokenize(keep))
        return out

    def chat(image, questions: Sequence[str]) -> list:
        """Multi-turn: each question sees the prior Q/A turns (the reference's
        qwen_score.py / qwen_bb.py chat-with-history protocol)."""
        history: list = []
        for q in questions:
            history.append((q, ask(image, q, history)))
        return [a for _, a in history]

    vqa.chat = chat    # type: ignore[attr-defined]
    vqa.batch = batch  # type: ignore[attr-defined]
    return vqa
