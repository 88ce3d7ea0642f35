"""YOLOv8 detector in functional JAX — the NudeNet judge's architecture.

The reference's I2P nudity protocol delegates detection to the NudeNet package
(reference: benchmarks/i2p_eval.py:16,238-248, modularity/nudity_score.py:14),
whose v3 detector is a YOLOv8n exported to ONNX at 320x320. This module is that
architecture rebuilt TPU-native: NHWC convolutions, one jittable forward that
returns decoded (xywh, class-sigmoid) tensors with static shapes, no host syncs.
Weights port from the NudeNet ONNX file (weights/port_nudenet.py, via the
in-repo minimal protobuf reader — no onnx/onnxruntime dependency) or from an
ultralytics-style torch state dict.

Architecture transcribed from the public ultralytics YOLOv8 definition
(yolov8.yaml + nn/modules: Conv=conv/BN/SiLU, C2f, SPPF, anchor-free Detect
head with a reg_max-bin DFL box regression). Exported/fused checkpoints fold
batch norm into the conv bias, so the param format here is fused: each conv is
{"kernel": HWIO, "bias": (C,)}; the porter fuses BN when given an unfused
state dict.

Follows the judge-backbone conventions of models/backbones.py: inference-only,
plain nested-dict params, dataclass geometry configs with tiny variants so
parity tests run on CPU.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    """YOLOv8 geometry. Defaults are the 'n' scale at NudeNet's operating
    point: width 0.25 -> stage channels (16,32,64,128,256), depth 0.33 ->
    C2f repeats (1,2,2,1), 18 classes, reg_max=16 DFL bins, 320px input."""
    nc: int = 18
    reg_max: int = 16
    channels: Sequence[int] = (16, 32, 64, 128, 256)   # P1..P5 stage widths
    depths: Sequence[int] = (1, 2, 2, 1)               # backbone C2f repeats
    head_depth: int = 1                                 # head C2f repeats
    imgsz: int = 320

    @property
    def strides(self) -> tuple[int, int, int]:
        return (8, 16, 32)

    @property
    def detect_channels(self) -> tuple[int, int, int]:
        """Per-scale input widths of the Detect head (P3, P4, P5)."""
        c = self.channels
        return (c[2], c[3], c[4])

    @property
    def box_width(self) -> int:
        """Hidden width of the Detect box branch (ultralytics c2)."""
        return max(16, self.detect_channels[0] // 4, self.reg_max * 4)

    @property
    def cls_width(self) -> int:
        """Hidden width of the Detect class branch (ultralytics c3)."""
        return max(self.detect_channels[0], min(self.nc, 100))

    @property
    def num_anchors(self) -> int:
        return sum((self.imgsz // s) ** 2 for s in self.strides)


def yolov8n_config(nc: int = 18, imgsz: int = 320) -> YoloConfig:
    return YoloConfig(nc=nc, imgsz=imgsz)


def tiny_yolo_config(nc: int = 3, imgsz: int = 64) -> YoloConfig:
    """Small enough for CPU parity tests; same topology."""
    return YoloConfig(nc=nc, reg_max=4, channels=(4, 8, 8, 16, 16),
                      depths=(1, 1, 1, 1), imgsz=imgsz)


# ------------------------------------------------------------------ primitives
def _conv(p: dict, x: jax.Array, stride: int = 1, act: bool = True) -> jax.Array:
    """Fused Conv(+SiLU). Padding is the explicit torch-style symmetric k//2
    (ultralytics autopad) — NOT XLA "SAME", which at stride 2 pads (0, 1)
    where torch pads (1, 1) and would shift every downsampling conv."""
    k = p["kernel"].shape[0]
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + p["bias"].astype(x.dtype)
    return jax.nn.silu(out) if act else out


def _bottleneck(p: dict, x: jax.Array, shortcut: bool) -> jax.Array:
    y = _conv(p["cv2"], _conv(p["cv1"], x))
    return x + y if shortcut else y


def _c2f(p: dict, x: jax.Array, shortcut: bool) -> jax.Array:
    y = _conv(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    chunks = [a, b]
    for mp in p["m"]:
        chunks.append(_bottleneck(mp, chunks[-1], shortcut))
    return _conv(p["cv2"], jnp.concatenate(chunks, axis=-1))


def _sppf(p: dict, x: jax.Array, k: int = 5) -> jax.Array:
    y = _conv(p["cv1"], x)
    pools = [y]
    for _ in range(3):
        pools.append(jax.lax.reduce_window(
            pools[-1], -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            "SAME"))
    return _conv(p["cv2"], jnp.concatenate(pools, axis=-1))


def _upsample2(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


# --------------------------------------------------------------------- forward
def yolo_features(params: dict, images: jax.Array,
                  cfg: YoloConfig) -> list[jax.Array]:
    """Backbone + FPN/PAN neck. `images` is NHWC in [0, 1] (NudeNet divides
    by 255). Returns the three Detect-head inputs (P3, P4, P5)."""
    l = params["layers"]
    x = _conv(l["0"], images, stride=2)                 # P1/2
    x = _conv(l["1"], x, stride=2)                      # P2/4
    x = _c2f(l["2"], x, shortcut=True)
    x = _conv(l["3"], x, stride=2)                      # P3/8
    p3 = x = _c2f(l["4"], x, shortcut=True)
    x = _conv(l["5"], x, stride=2)                      # P4/16
    p4 = x = _c2f(l["6"], x, shortcut=True)
    x = _conv(l["7"], x, stride=2)                      # P5/32
    x = _c2f(l["8"], x, shortcut=True)
    p5 = x = _sppf(l["9"], x)
    # top-down
    x = jnp.concatenate([_upsample2(x), p4], axis=-1)   # 11
    n4 = x = _c2f(l["12"], x, shortcut=False)
    x = jnp.concatenate([_upsample2(x), p3], axis=-1)   # 14
    o3 = x = _c2f(l["15"], x, shortcut=False)
    # bottom-up
    x = _conv(l["16"], x, stride=2)
    x = jnp.concatenate([x, n4], axis=-1)               # 17
    o4 = x = _c2f(l["18"], x, shortcut=False)
    x = _conv(l["19"], x, stride=2)
    x = jnp.concatenate([x, p5], axis=-1)               # 20
    o5 = _c2f(l["21"], x, shortcut=False)
    return [o3, o4, o5]


def _detect_branch(convs: Sequence[dict], x: jax.Array) -> jax.Array:
    x = _conv(convs[0], x)
    x = _conv(convs[1], x)
    return _conv(convs[2], x, act=False)                # plain 1x1 Conv2d


def _dfl(box: jax.Array, reg_max: int) -> jax.Array:
    """Distribution focal decode: (B, A, 4*reg_max) -> expected ltrb distance
    per side, softmax-weighted over the reg_max bins (ultralytics DFL with the
    frozen arange conv)."""
    b, a, _ = box.shape
    box = box.reshape(b, a, 4, reg_max)
    probs = jax.nn.softmax(box.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.einsum("bagr,r->bag", probs, bins)


def make_anchors(cfg: YoloConfig) -> tuple[jax.Array, jax.Array]:
    """Grid-cell centers (+0.5 offset, grid units) and per-anchor strides for
    the three scales, concatenated in scale order — the ultralytics
    make_anchors layout (row-major per grid)."""
    points, strides = [], []
    for s in cfg.strides:
        n = cfg.imgsz // s
        xs = jnp.arange(n, dtype=jnp.float32) + 0.5
        gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
        points.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strides.append(jnp.full((n * n,), float(s), dtype=jnp.float32))
    return jnp.concatenate(points, axis=0), jnp.concatenate(strides, axis=0)


def yolo_detect(params: dict, images: jax.Array,
                cfg: YoloConfig) -> tuple[jax.Array, jax.Array]:
    """Full detector forward. Returns (boxes_xywh, class_probs):
    boxes (B, A, 4) as center-x, center-y, w, h in input pixels; class_probs
    (B, A, nc) sigmoid scores. A = cfg.num_anchors. Equivalent to the ONNX
    model's (B, 4+nc, A) output split and transposed."""
    feats = yolo_features(params, images, cfg)
    det = params["detect"]
    box_flat, cls_flat = [], []
    for i, f in enumerate(feats):
        raw_box = _detect_branch(det["cv2"][i], f)      # (B,h,w,4*reg_max)
        raw_cls = _detect_branch(det["cv3"][i], f)      # (B,h,w,nc)
        b = raw_box.shape[0]
        box_flat.append(raw_box.reshape(b, -1, 4 * cfg.reg_max))
        cls_flat.append(raw_cls.reshape(b, -1, cfg.nc))
    box = jnp.concatenate(box_flat, axis=1)
    cls = jnp.concatenate(cls_flat, axis=1)
    anchors, strides = make_anchors(cfg)
    dist = _dfl(box, cfg.reg_max)                       # (B, A, 4) ltrb
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    cxy = (x1y1 + x2y2) / 2.0
    wh = x2y2 - x1y1
    boxes = jnp.concatenate([cxy, wh], axis=-1) * strides[None, :, None]
    return boxes, jax.nn.sigmoid(cls.astype(jnp.float32))


# ----------------------------------------------------- param-tree construction
def conv_execution_order(cfg: YoloConfig) -> list[tuple[str, ...]]:
    """Paths of every fused conv in forward-execution order — the order conv
    nodes appear in a torch-exported ONNX graph of this model. Used by the
    structural (name-free) ONNX porter. The trailing DFL conv of the export is
    NOT listed (its weight is the frozen arange, recomputed in _dfl)."""
    order: list[tuple[str, ...]] = []

    def conv(*path):
        order.append(tuple(str(p) for p in path))

    def c2f(idx, n):
        conv("layers", idx, "cv1")
        for j in range(n):
            conv("layers", idx, "m", j, "cv1")
            conv("layers", idx, "m", j, "cv2")
        conv("layers", idx, "cv2")

    d = cfg.depths
    conv("layers", "0"); conv("layers", "1"); c2f("2", d[0])
    conv("layers", "3"); c2f("4", d[1])
    conv("layers", "5"); c2f("6", d[2])
    conv("layers", "7"); c2f("8", d[3])
    conv("layers", "9", "cv1"); conv("layers", "9", "cv2")      # SPPF
    c2f("12", cfg.head_depth); c2f("15", cfg.head_depth)
    conv("layers", "16"); c2f("18", cfg.head_depth)
    conv("layers", "19"); c2f("21", cfg.head_depth)
    for i in range(3):                                  # Detect.forward order
        for branch in ("cv2", "cv3"):
            for j in range(3):
                conv("detect", branch, i, j)
    return order


def init_yolo_params(rng: jax.Array, cfg: YoloConfig) -> dict:
    """Random fused params with the exact tree shape the porters produce.
    Used by tests and shape validation, not by any training path."""
    shapes = conv_shapes(cfg)
    leaves = {}
    keys = jax.random.split(rng, len(shapes))
    for key, (path, (kh, kw, cin, cout)) in zip(keys, shapes.items()):
        k1, _ = jax.random.split(key)
        scale = 1.0 / jnp.sqrt(kh * kw * cin)
        leaves[path] = {
            "kernel": jax.random.normal(k1, (kh, kw, cin, cout),
                                        jnp.float32) * scale,
            "bias": jnp.zeros((cout,), jnp.float32),
        }
    return assemble_params(leaves, cfg)


def conv_shapes(cfg: YoloConfig) -> dict[tuple[str, ...], tuple]:
    """(kh, kw, cin, cout) per conv path, in execution order."""
    c = list(cfg.channels)
    shapes: dict[tuple[str, ...], tuple] = {}

    def conv(path, k, cin, cout):
        shapes[path] = (k, k, cin, cout)

    def c2f(idx, cin, cout, n):
        h = cout // 2
        conv(("layers", idx, "cv1"), 1, cin, 2 * h)
        for j in range(n):
            conv(("layers", idx, "m", str(j), "cv1"), 3, h, h)
            conv(("layers", idx, "m", str(j), "cv2"), 3, h, h)
        conv(("layers", idx, "cv2"), 1, (2 + n) * h, cout)

    d = cfg.depths
    conv(("layers", "0"), 3, 3, c[0])
    conv(("layers", "1"), 3, c[0], c[1])
    c2f("2", c[1], c[1], d[0])
    conv(("layers", "3"), 3, c[1], c[2])
    c2f("4", c[2], c[2], d[1])
    conv(("layers", "5"), 3, c[2], c[3])
    c2f("6", c[3], c[3], d[2])
    conv(("layers", "7"), 3, c[3], c[4])
    c2f("8", c[4], c[4], d[3])
    conv(("layers", "9", "cv1"), 1, c[4], c[4] // 2)
    conv(("layers", "9", "cv2"), 1, c[4] * 2, c[4])
    c2f("12", c[3] + c[4], c[3], cfg.head_depth)
    c2f("15", c[2] + c[3], c[2], cfg.head_depth)
    conv(("layers", "16"), 3, c[2], c[2])
    c2f("18", c[2] + c[3], c[3], cfg.head_depth)
    conv(("layers", "19"), 3, c[3], c[3])
    c2f("21", c[3] + c[4], c[4], cfg.head_depth)
    dch, bw, cw = cfg.detect_channels, cfg.box_width, cfg.cls_width
    for i in range(3):
        conv(("detect", "cv2", str(i), "0"), 3, dch[i], bw)
        conv(("detect", "cv2", str(i), "1"), 3, bw, bw)
        conv(("detect", "cv2", str(i), "2"), 1, bw, 4 * cfg.reg_max)
        conv(("detect", "cv3", str(i), "0"), 3, dch[i], cw)
        conv(("detect", "cv3", str(i), "1"), 3, cw, cw)
        conv(("detect", "cv3", str(i), "2"), 1, cw, cfg.nc)
    return shapes


def assemble_params(leaves: dict[tuple[str, ...], dict],
                    cfg: YoloConfig) -> dict:
    """Nest flat {path: conv_params} into the tree yolo_detect expects."""
    params: dict = {"layers": {}, "detect": {"cv2": [[] for _ in range(3)],
                                             "cv3": [[] for _ in range(3)]}}
    for path, p in leaves.items():
        if path[0] == "layers":
            idx = path[1]
            if len(path) == 2:
                params["layers"][idx] = p
            else:
                node = params["layers"].setdefault(idx, {})
                if path[2] == "m":
                    ms = node.setdefault("m", [])
                    j = int(path[3])
                    while len(ms) <= j:
                        ms.append(None)
                    ms[j] = ms[j] or {}
                    ms[j][path[4]] = p
                else:
                    node[path[2]] = p
        else:                                            # detect
            branch, i, j = path[1], int(path[2]), int(path[3])
            lst = params["detect"][branch][i]
            while len(lst) <= j:
                lst.append(None)
            lst[j] = p
    return params
