"""VQA judge scoring: "does the image still contain the concept?"

Rebuild of the reference's LLaVA-1.5-13B / Qwen-VL-Chat scorers
(reference: modularity/llava_score.py:15-41, LLAVAScorer in
modularity/mod_utils.py:195-290, modularity/qwen_score.py:15-45): a VLM is asked
structured questions about generated images before/after concept removal; answers are
parsed into object-presence and style scores.

The VLM is an injected callable (`vqa(image, question) -> answer text`) so any local
checkpoint (via transformers) or remote judge can plug in; the question protocol and
answer parsing are self-contained and tested. `load_transformers_vqa` builds the
callable from a local snapshot when one exists.
"""
from __future__ import annotations

import re
from typing import Callable, Optional, Sequence

import numpy as np

VQAFn = Callable[[object, str], str]


def load_transformers_vqa(model_path: str) -> VQAFn:
    """Build a VQA callable from a local image-text-to-text checkpoint."""
    from transformers import pipeline as hf_pipeline  # type: ignore
    pipe = hf_pipeline("image-text-to-text", model=model_path, device=-1)

    def vqa(image, question: str) -> str:
        out = pipe(images=image, text=question, max_new_tokens=32)
        return out[0]["generated_text"] if isinstance(out, list) else str(out)

    return vqa


def object_question(obj: str) -> str:
    """Object-presence question (reference: mod_utils.py LLAVAScorer object path)."""
    return (f"Is there a {obj} in the image? "
            "Answer with a single word, yes or no.")


def style_question(artist: str) -> str:
    """Style-attribution question (reference: mod_utils.py style path)."""
    return (f"Is this image in the style of {artist}? "
            "Answer with a single word, yes or no.")


def parse_yes_no(answer: str) -> Optional[bool]:
    a = answer.strip().lower()
    m = re.search(r"\b(yes|no)\b", a)
    return None if m is None else (m.group(1) == "yes")


def vqa_presence_score(vqa: VQAFn, images: Sequence, question: str) -> dict:
    """Fraction of images where the judge answers 'yes'; unparseable answers are
    excluded and counted."""
    yes = no = unparsed = 0
    for img in images:
        ans = parse_yes_no(vqa(img, question))
        if ans is None:
            unparsed += 1
        elif ans:
            yes += 1
        else:
            no += 1
    n = yes + no
    return {"yes_frac": yes / n if n else float("nan"),
            "n": n, "unparsed": unparsed}


def removal_score(vqa: VQAFn, before: Sequence, after: Sequence,
                  question: str) -> dict:
    """Removal efficacy: presence should drop from `before` to `after`
    (the HPO objective shape, reference: remove_experts_hpo.py:110-208)."""
    b = vqa_presence_score(vqa, before, question)
    a = vqa_presence_score(vqa, after, question)
    return {"before_yes_frac": b["yes_frac"], "after_yes_frac": a["yes_frac"],
            "removal_gain": (b["yes_frac"] - a["yes_frac"])
            if not (np.isnan(b["yes_frac"]) or np.isnan(a["yes_frac"]))
            else float("nan")}
