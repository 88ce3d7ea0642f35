"""Porters for judge-backbone weights: torchvision ResNet/AlexNet, LPIPS, SSCD.

Maps torch state dicts onto the functional param trees of models/backbones.py
(reference judges: benchmarks/object_erase.py:77-100 torchvision ResNet-50,
benchmarks/calculate_scores.py:10 lpips, benchmarks/inference_mem.py:46-68 SSCD).
Conv kernels transpose OIHW -> HWIO, linear weights (out, in) -> (in, out); batch
norms port their running statistics (the models run inference-only).

State dicts can come from torchvision checkpoints, `torch.jit.load(...).state_dict()`
(SSCD torchscript), or the lpips package; values may be torch tensors or numpy arrays.
"""
from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from diffusion_models_moe_tpu.models.backbones import AlexNetConfig, ResNetConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_p(sd: Mapping, key: str) -> dict:
    p = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        p["bias"] = _np(sd[f"{key}.bias"])
    return p


def _bn_p(sd: Mapping, key: str) -> dict:
    return {"scale": _np(sd[f"{key}.weight"]),
            "bias": _np(sd[f"{key}.bias"]),
            "mean": _np(sd[f"{key}.running_mean"]),
            "var": _np(sd[f"{key}.running_var"])}


def port_resnet(sd: Mapping, cfg: ResNetConfig, prefix: str = "") -> dict:
    """torchvision ResNet (bottleneck) state dict -> backbones.resnet_* params."""
    g = lambda k: prefix + k  # noqa: E731
    params = {"conv1": _conv_p(sd, g("conv1")), "bn1": _bn_p(sd, g("bn1"))}
    for si, n_blocks in enumerate(cfg.stage_blocks):
        for bi in range(n_blocks):
            base = g(f"layer{si + 1}.{bi}")
            block = {}
            for ci in (1, 2, 3):
                block[f"conv{ci}"] = _conv_p(sd, f"{base}.conv{ci}")
                block[f"bn{ci}"] = _bn_p(sd, f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _conv_p(sd, f"{base}.downsample.0"),
                    "bn": _bn_p(sd, f"{base}.downsample.1")}
            params[f"layer{si + 1}_{bi}"] = block
    if g("fc.weight") in sd:
        params["fc"] = {"kernel": _np(sd[g("fc.weight")]).T,
                        "bias": _np(sd[g("fc.bias")])}
    return params


def port_sscd(sd: Mapping, cfg: ResNetConfig | None = None) -> dict:
    """SSCD torchscript state dict (backbone.* ResNet-50 trunk + embeddings
    projection) -> backbones.sscd_embed params."""
    cfg = cfg or ResNetConfig()
    prefix = "backbone." if any(k.startswith("backbone.") for k in sd) else ""
    params = port_resnet(sd, cfg, prefix=prefix)
    emb_key = next(k for k in sd
                   if k.endswith("embeddings.weight") or k == "embeddings.weight")
    base = emb_key[: -len(".weight")]
    params["embeddings"] = {"kernel": _np(sd[emb_key]).T}
    if f"{base}.bias" in sd:
        params["embeddings"]["bias"] = _np(sd[f"{base}.bias"])
    return params


# torchvision AlexNet `features` module indices of the 5 convs
_ALEX_FEATURE_IDX = (0, 3, 6, 8, 10)


def port_alexnet(sd: Mapping, prefix: str | None = None) -> dict:
    """torchvision AlexNet state dict -> backbones.alexnet_features params.
    Prefix auto-detects: 'features.' (full torchvision model) or '' (a bare
    features Sequential)."""
    if prefix is None:
        prefix = "features." if "features.0.weight" in sd else ""
    return {f"conv{i}": _conv_p(sd, f"{prefix}{idx}")
            for i, idx in enumerate(_ALEX_FEATURE_IDX)}


def port_lpips(alex_sd: Mapping, lin_sd: Mapping,
               cfg: AlexNetConfig = AlexNetConfig()) -> dict:
    """AlexNet features + LPIPS linear heads -> backbones.lpips_distance params.

    `lin_sd` accepts the lpips package naming (`lin{i}.model.1.weight`, shape
    (1, C, 1, 1)) or bare `lin{i}.weight`."""
    lins = []
    for i, c in enumerate(cfg.channels):
        for key in (f"lin{i}.model.1.weight", f"lin{i}.weight", f"lin{i}"):
            if key in lin_sd:
                w = _np(lin_sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f"no LPIPS linear head for tap {i} in lin_sd")
        if w.shape[0] != c:
            raise ValueError(f"lin{i} has {w.shape[0]} channels, config says {c}")
        lins.append(w)
    return {"net": port_alexnet(alex_sd), "lins": lins}


def port_inception(sd: Mapping) -> dict:
    """torchvision / torch-fidelity InceptionV3 state dict ->
    models/inception.py params. Walks `<module>.conv.weight` + `<module>.bn.*`
    pairs generically (BasicConv2d is the only leaf kind); the aux head is
    dropped (eval-mode FID network has no aux logits)."""
    params: dict = {}
    for k in sd:
        if not k.endswith(".conv.weight") or k.startswith("AuxLogits"):
            continue
        base = k[: -len(".conv.weight")]
        parts = base.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {"conv": _conv_p(sd, f"{base}.conv"),
                           "bn": _bn_p(sd, f"{base}.bn")}
    if "fc.weight" in sd:
        params["fc"] = {"kernel": _np(sd["fc.weight"]).T,
                        "bias": _np(sd["fc.bias"])}
    return params


def census(params: dict, prefix: str = "") -> Sequence[str]:
    """Flattened key listing (debug aid, mirrors tests' key-census pattern)."""
    out = []
    for k, v in sorted(params.items()):
        if isinstance(v, dict):
            out.extend(census(v, f"{prefix}{k}."))
        elif isinstance(v, (list, tuple)):
            out.extend(f"{prefix}{k}.{i}" for i in range(len(v)))
        else:
            out.append(f"{prefix}{k}")
    return out


def load_state_dict(path: str) -> dict:
    """One shared '.npz or torch checkpoint -> flat state dict' loader for the
    judge-backbone porters (ResNet/SSCD/LPIPS/Inception). Handles: .npz
    archives of the same keys, plain torch state dicts, {'state_dict': ...}
    wrappers, and torchscript/module objects exposing .state_dict()."""
    if path.endswith(".npz"):
        import numpy as np
        return dict(np.load(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict):
        obj = obj.get("state_dict", obj)
    return obj
