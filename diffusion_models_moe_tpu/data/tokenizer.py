"""CLIP BPE tokenizer (self-contained; loads vocab.json + merges.txt).

The reference relies on the pipeline's bundled transformers CLIPTokenizer. This
implementation needs only the two vocab files from any CLIP checkpoint directory and
produces the 77-token padded id arrays the text encoder consumes. Falls back to
transformers' tokenizer if a full snapshot is available.
"""
from __future__ import annotations

import functools
import json
import os
import re
from typing import Sequence

import numpy as np


@functools.lru_cache()
def _bytes_to_unicode() -> dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


# CLIP's exact unicode word pattern (\p{L}/\p{N} classes need the `regex`
# module; the stdlib-`re` ASCII variant silently mis-splits non-ASCII text —
# e.g. artist names with diacritics — so it is only a fallback)
_CLIP_PATTERN = (r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
                 r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+")
try:
    import regex as _regex
    _PAT = _regex.compile(_CLIP_PATTERN, _regex.IGNORECASE)
except ImportError:  # pragma: no cover
    _PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
        r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+", re.IGNORECASE)


class CLIPTokenizer:
    def __init__(self, vocab_path: str, merges_path: str, max_length: int = 77,
                 use_native: bool = True):
        with open(vocab_path, encoding="utf-8") as f:
            self.encoder: dict[str, int] = json.load(f)
        with open(merges_path, encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line of CLIP merges.txt is a version header
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#version")]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.max_length = max_length
        self.bos = self.encoder.get("<|startoftext|>")
        self.eos = self.encoder.get("<|endoftext|>")
        self.pad = self.eos
        self._cache: dict[str, str] = {}
        # native merge core (native/bpe_core.cpp): ~100x faster merge loops for
        # eval-scale tokenization (COCO-30k); falls back to Python silently
        self._native = None
        if use_native:
            try:
                from diffusion_models_moe_tpu.data._native_bpe import NativeBPE
                self._native = NativeBPE(self.encoder, merges)
            except Exception:
                self._native = None

    @classmethod
    def from_dir(cls, path: str, max_length: int = 77) -> "CLIPTokenizer":
        tok = cls(os.path.join(path, "vocab.json"),
                  os.path.join(path, "merges.txt"), max_length)
        # honor the snapshot's pad token: SDXL's tokenizer_2 pads with '!'
        # (id 0), not CLIP-L's eos — the bigG tower sees pad positions, so
        # the wrong pad id shifts its hidden states for short prompts
        for fname in ("special_tokens_map.json", "tokenizer_config.json"):
            try:
                with open(os.path.join(path, fname), encoding="utf-8") as f:
                    spec = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            pad = spec.get("pad_token")
            if isinstance(pad, dict):
                pad = pad.get("content")
            if isinstance(pad, str):
                if pad in tok.encoder:
                    tok.pad = tok.encoder[pad]
                elif pad + "</w>" in tok.encoder:
                    tok.pad = tok.encoder[pad + "</w>"]
                break
        return tok

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        text = re.sub(r"\s+", " ", text.strip()).lower()
        ids: list[int] = []
        for tok in _PAT.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            if self._native is not None:
                ids.extend(self._native.encode_word(tok))
            else:
                ids.extend(self.encoder[t] for t in self._bpe(tok).split(" ")
                           if t in self.encoder)
        return ids

    def __call__(self, texts: Sequence[str] | str) -> np.ndarray:
        """Tokenize to (B, max_length) int32, BOS/EOS framed, EOS-padded,
        truncated to max_length (CLIP convention)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.max_length), self.pad, np.int32)
        for i, t in enumerate(texts):
            ids = [self.bos] + self.encode(t)[: self.max_length - 2] + [self.eos]
            out[i, :len(ids)] = ids
        return out


def load_sdxl_tokenizers(snapshot_root: str, max_length: int = 77):
    """SDXL snapshots ship two CLIP BPE tokenizers (tokenizer/, tokenizer_2/);
    returns (tokenize_l, tokenize_bigG) for SDXLPipeline.generate's
    `cond_ids` / `cond_ids_2` inputs. The pair matters because the bigG
    tokenizer pads with id 0 ('!') while CLIP-L pads with eos — feeding
    CLIP-L ids to the bigG tower shifts its hidden states for short
    prompts."""
    return (load_tokenizer(os.path.join(snapshot_root, "tokenizer"),
                           max_length),
            load_tokenizer(os.path.join(snapshot_root, "tokenizer_2"),
                           max_length))


def load_tokenizer(path: str, max_length: int = 77):
    """Prefer the self-contained BPE; fall back to transformers if the files are
    in a full snapshot layout it understands."""
    try:
        return CLIPTokenizer.from_dir(path, max_length)
    except (FileNotFoundError, json.JSONDecodeError):
        from transformers import CLIPTokenizer as HFTok  # type: ignore
        hf = HFTok.from_pretrained(path)

        def tok(texts):
            if isinstance(texts, str):
                texts = [texts]
            return np.asarray(hf(list(texts), padding="max_length",
                                 max_length=max_length, truncation=True
                                 )["input_ids"], np.int32)

        return tok


def load_t5_tokenizer(path: str, max_length: int = 120):
    """T5 tokenizer for the PixArt pipeline (reference loads the
    PixArtAlphaPipeline's T5 tokenizer, utils.py:119-127; PixArt uses 120
    text tokens).

    Loads `tokenizer.json` (HF fast format) or converts `spiece.model`
    (sentencepiece unigram) via the `tokenizers` library — no sentencepiece
    runtime needed. Returns `tokenize(texts) -> (ids, attention_mask)` int32
    arrays of shape (B, max_length): T5 semantics, EOS (</s>, id 1) appended,
    pad id 0, mask 1 on real tokens."""
    import numpy as np

    json_path = os.path.join(path, "tokenizer.json")
    spm_path = os.path.join(path, "spiece.model")
    if os.path.exists(json_path):
        from tokenizers import Tokenizer
        tok = Tokenizer.from_file(json_path)
    elif os.path.exists(spm_path):
        from tokenizers.implementations import SentencePieceUnigramTokenizer
        tok = SentencePieceUnigramTokenizer.from_spm(spm_path)._tokenizer
    else:
        raise FileNotFoundError(
            f"no tokenizer.json or spiece.model under {path!r}")
    eos_id = tok.token_to_id("</s>")
    eos_id = 1 if eos_id is None else eos_id

    def tokenize(texts):
        ids = np.zeros((len(texts), max_length), np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            enc = tok.encode(t).ids
            # a tokenizer.json may carry a post-processor that already
            # appends EOS; append only if absent
            if not enc or enc[-1] != eos_id:
                enc = list(enc) + [eos_id]
            enc = enc[:max_length]
            if enc[-1] != eos_id:           # truncation dropped the EOS
                enc[-1] = eos_id
            ids[i, :len(enc)] = enc
            mask[i, :len(enc)] = 1
        return ids, mask

    return tokenize


def load_llama_tokenizer(path: str):
    """Llama/Vicuna tokenizer for the native LLaVA judge (models/llava.py).

    Loads `tokenizer.json` (HF fast format; llava-hf snapshots ship it with
    '<image>' registered as an added token). Returns (encode, decode):
    encode(text) -> 1D int32 ids with BOS prepended; decode(ids) -> text
    with sentencepiece whitespace markers resolved."""
    import numpy as np

    json_path = os.path.join(path, "tokenizer.json")
    if not os.path.exists(json_path):
        # tokenizer.model alone is sentencepiece BPE; converting it needs the
        # sentencepiece runtime this environment lacks (the tokenizers
        # library only converts unigram models). Every llava-hf snapshot
        # ships tokenizer.json.
        raise FileNotFoundError(
            f"no tokenizer.json under {path!r} (a raw tokenizer.model "
            "cannot be converted here — re-save the tokenizer with "
            "transformers to produce tokenizer.json)")
    from tokenizers import Tokenizer
    tok = Tokenizer.from_file(json_path)
    bos_id = tok.token_to_id("<s>")

    def encode(text: str) -> np.ndarray:
        ids = tok.encode(text).ids
        if bos_id is not None and (not ids or ids[0] != bos_id):
            ids = [bos_id] + list(ids)
        return np.asarray(ids, np.int32)

    def decode(ids) -> str:
        return tok.decode([int(i) for i in ids]).strip()

    return encode, decode


def load_qwen_tokenizer(path: str):
    """Qwen2/Qwen2-VL tokenizer (byte-level BPE, no BOS) for the native
    Qwen2-VL judge. Loads `tokenizer.json`; the special-token strings
    (<|im_start|> etc.) are added tokens there and encode to single ids.
    Returns (encode, decode) like load_llama_tokenizer."""
    import numpy as np

    json_path = os.path.join(path, "tokenizer.json")
    if not os.path.exists(json_path):
        raise FileNotFoundError(f"no tokenizer.json under {path!r}")
    from tokenizers import Tokenizer
    tok = Tokenizer.from_file(json_path)

    def encode(text: str) -> np.ndarray:
        return np.asarray(tok.encode(text).ids, np.int32)

    def decode(ids) -> str:
        return tok.decode([int(i) for i in ids]).strip()

    return encode, decode
