"""Port NudeNet / YOLOv8 detector weights into models/yolo.py param trees.

Two input formats:

* **ONNX** (`port_yolo_from_onnx`) — the format NudeNet actually ships
  (reference: benchmarks/i2p_eval.py:16 uses the nudenet package's bundled
  `320n.onnx`). Parsed with the in-repo protobuf reader
  (weights/onnx_reader.py). Name-based mapping is tried first (torch exports
  keep module FQNs like ``model.0.conv.weight``); if the export mangled names,
  a structural fallback matches Conv nodes in graph order against
  models/yolo.py's ``conv_execution_order`` with shape validation.
* **torch state dict** (`port_yolo_from_torch`) — ultralytics module naming,
  fused (``N.conv.weight`` + ``.bias``) or unfused (conv without bias + a
  ``N.bn.*`` BatchNorm, fused here at load with ultralytics' eps=1e-3).

Output convs are {"kernel": HWIO float32, "bias": (C,)} — torch's OIHW is
transposed at port time, matching the other judge porters
(weights/port_torchvision.py).
"""
from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

from ..models.yolo import (YoloConfig, assemble_params, conv_execution_order,
                           conv_shapes)
from .onnx_reader import read_onnx

_BN_EPS = 1e-3  # ultralytics BatchNorm2d(eps=0.001)

# Detect head module index in the fixed 23-module YOLOv8 topology.
_DETECT_IDX = 22


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _fused_conv(weight: np.ndarray, bias: Optional[np.ndarray]) -> dict:
    """OIHW (+bias) -> our conv params."""
    w = np.asarray(weight, dtype=np.float32)
    b = (np.zeros((w.shape[0],), np.float32) if bias is None
         else np.asarray(bias, dtype=np.float32))
    return {"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}


def _torch_key(path: tuple[str, ...]) -> str:
    """Our conv path -> the ultralytics module owning it (without the
    trailing .conv/.weight, which depends on fused-vs-BN form)."""
    if path[0] == "layers":
        if len(path) == 2:
            return path[1]                       # plain Conv module
        if path[2] == "m":
            return f"{path[1]}.m.{path[3]}.{path[4]}"
        return f"{path[1]}.{path[2]}"            # C2f/SPPF cv1/cv2
    branch, i, j = path[1], path[2], path[3]
    return f"{_DETECT_IDX}.{branch}.{i}.{j}"


def _port_torch_conv(sd: Mapping, key: str, is_plain: bool) -> dict:
    """One conv from a state dict; `is_plain` marks Detect's final 1x1
    Conv2d, which has no BN/SiLU wrapper (key has no .conv suffix)."""
    if is_plain:
        return _fused_conv(_np(sd[f"{key}.weight"]),
                           _np(sd[f"{key}.bias"]) if f"{key}.bias" in sd
                           else None)
    w = _np(sd[f"{key}.conv.weight"]).astype(np.float64)
    if f"{key}.bn.weight" in sd:                 # unfused: fold BN in
        gamma = _np(sd[f"{key}.bn.weight"]).astype(np.float64)
        beta = _np(sd[f"{key}.bn.bias"]).astype(np.float64)
        mean = _np(sd[f"{key}.bn.running_mean"]).astype(np.float64)
        var = _np(sd[f"{key}.bn.running_var"]).astype(np.float64)
        scale = gamma / np.sqrt(var + _BN_EPS)
        w = w * scale[:, None, None, None]
        b = beta - mean * scale
    else:
        b = (_np(sd[f"{key}.conv.bias"])
             if f"{key}.conv.bias" in sd else None)
    return _fused_conv(w, b)


def port_yolo_from_torch(sd: Mapping, cfg: YoloConfig,
                         prefix: str = "model.") -> dict:
    """Ultralytics-style state dict -> param tree. Shapes are validated
    against the config's expected geometry."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: v
          for k, v in sd.items()}
    expected = conv_shapes(cfg)
    leaves = {}
    for path in conv_execution_order(cfg):
        is_plain = path[0] == "detect" and path[3] == "2"
        p = _port_torch_conv(sd, _torch_key(path), is_plain)
        _check_shape(path, p, expected[path])
        leaves[path] = p
    return assemble_params(leaves, cfg)


def _check_shape(path, p, exp) -> None:
    got = tuple(p["kernel"].shape)
    if got != tuple(exp):
        raise ValueError(
            f"conv {'.'.join(path)}: kernel shape {got} != expected {exp} — "
            "wrong YoloConfig for this checkpoint?")


def port_yolo_from_onnx(data: bytes | str, cfg: YoloConfig) -> dict:
    """NudeNet/ultralytics ONNX export -> param tree. Tries FQN initializer
    names first, then the structural graph-order fallback."""
    graph = read_onnx(data)
    by_name = graph.initializers
    fq = "model.0.conv.weight"
    if fq in by_name or "0.conv.weight" in by_name:
        prefix = "model." if fq in by_name else ""
        # fused exports keep conv bias; unfused keep bn stats
        return port_yolo_from_torch(by_name, cfg, prefix=prefix)
    return _port_structural(graph, cfg)


def _port_structural(graph, cfg: YoloConfig) -> dict:
    order = conv_execution_order(cfg)
    expected = conv_shapes(cfg)
    convs = graph.conv_weights_in_order()
    # Drop the DFL conv (frozen arange over reg_max bins, recomputed in
    # models/yolo.py:_dfl) wherever the export placed it.
    kept = []
    for w, b in convs:
        if w.shape == (1, cfg.reg_max, 1, 1):
            ref = np.arange(cfg.reg_max, dtype=np.float32).reshape(w.shape)
            if not np.allclose(np.asarray(w, np.float32), ref):
                raise ValueError(
                    "found a (1, reg_max, 1, 1) Conv that is not the DFL "
                    "arange — graph does not look like a YOLOv8 export")
            continue
        kept.append((w, b))
    if len(kept) != len(order):
        raise ValueError(
            f"graph has {len(kept)} Conv nodes (after DFL removal) but the "
            f"config expects {len(order)} — wrong YoloConfig or not YOLOv8?")
    leaves = {}
    for path, (w, b) in zip(order, kept):
        p = _fused_conv(w, b)
        _check_shape(path, p, expected[path])
        leaves[path] = p
    return assemble_params(leaves, cfg)
