"""Parity tests for the native NudeNet detector stack: the YOLOv8 model
(models/yolo.py) against a hand-written torch mirror of the ultralytics
modules, the minimal protobuf ONNX reader (weights/onnx_reader.py) against an
independently written in-test wire-format emitter, and the porter's two input
paths (torch state dict with BN fusion; structural ONNX graph order)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion_models_moe_tpu.benchmarks.nudity import (  # noqa: E402
    NUDENET_LABELS, count_harmful, letterbox, make_native_detector, nms)
from diffusion_models_moe_tpu.models.yolo import (  # noqa: E402
    conv_execution_order, conv_shapes, init_yolo_params, tiny_yolo_config,
    yolo_detect, yolov8n_config)
from diffusion_models_moe_tpu.weights.onnx_reader import read_onnx  # noqa: E402
from diffusion_models_moe_tpu.weights.port_nudenet import (  # noqa: E402
    port_yolo_from_onnx, port_yolo_from_torch)


# ------------------------------------------------------------- torch mirror
class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n, shortcut):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(TBottleneck(self.c, shortcut)
                               for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.mp = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.mp(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TDetect(nn.Module):
    def __init__(self, nc, reg_max, ch, c2, c3):
        super().__init__()
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for c in ch)

    def forward(self, feats):
        return [torch.cat((self.cv2[i](f), self.cv3[i](f)), 1)
                for i, f in enumerate(feats)]


class TYolo(nn.Module):
    """Ultralytics-topology mirror with `model.N` state-dict naming."""

    def __init__(self, cfg):
        super().__init__()
        c = list(cfg.channels)
        d = list(cfg.depths)
        hd = cfg.head_depth
        up = lambda: nn.Upsample(scale_factor=2, mode="nearest")  # noqa: E731
        self.model = nn.ModuleList([
            TConv(3, c[0], 3, 2),                       # 0
            TConv(c[0], c[1], 3, 2),                    # 1
            TC2f(c[1], c[1], d[0], True),               # 2
            TConv(c[1], c[2], 3, 2),                    # 3
            TC2f(c[2], c[2], d[1], True),               # 4
            TConv(c[2], c[3], 3, 2),                    # 5
            TC2f(c[3], c[3], d[2], True),               # 6
            TConv(c[3], c[4], 3, 2),                    # 7
            TC2f(c[4], c[4], d[3], True),               # 8
            TSPPF(c[4], c[4]),                          # 9
            up(),                                       # 10
            nn.Identity(),                              # 11 (Concat)
            TC2f(c[3] + c[4], c[3], hd, False),         # 12
            up(),                                       # 13
            nn.Identity(),                              # 14 (Concat)
            TC2f(c[2] + c[3], c[2], hd, False),         # 15
            TConv(c[2], c[2], 3, 2),                    # 16
            nn.Identity(),                              # 17 (Concat)
            TC2f(c[2] + c[3], c[3], hd, False),         # 18
            TConv(c[3], c[3], 3, 2),                    # 19
            nn.Identity(),                              # 20 (Concat)
            TC2f(c[3] + c[4], c[4], hd, False),         # 21
            TDetect(cfg.nc, cfg.reg_max, cfg.detect_channels,
                    cfg.box_width, cfg.cls_width),      # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        x = m[3](x)
        p3 = x = m[4](x)
        x = m[5](x)
        p4 = x = m[6](x)
        x = m[7](x)
        x = m[8](x)
        p5 = x = m[9](x)
        x = torch.cat([m[10](x), p4], 1)
        n4 = x = m[12](x)
        x = torch.cat([m[13](x), p3], 1)
        o3 = x = m[15](x)
        x = torch.cat([m[16](x), n4], 1)
        o4 = x = m[18](x)
        x = torch.cat([m[19](x), p5], 1)
        o5 = m[21](x)
        return m[22]([o3, o4, o5])


def torch_decode(feats, cfg):
    """Independent decode mirror: DFL + anchor-free dist2bbox + sigmoid."""
    flat = [f.reshape(f.shape[0], f.shape[1], -1) for f in feats]
    x = torch.cat(flat, 2)
    box, cls = x.split([4 * cfg.reg_max, cfg.nc], 1)
    b, _, a = box.shape
    probs = box.view(b, 4, cfg.reg_max, a).softmax(2)
    bins = torch.arange(cfg.reg_max, dtype=torch.float32).view(1, 1, -1, 1)
    dist = (probs * bins).sum(2)                        # (b, 4, a)
    pts, strides = [], []
    for s in (8, 16, 32):
        n = cfg.imgsz // s
        xs = torch.arange(n, dtype=torch.float32) + 0.5
        gy, gx = torch.meshgrid(xs, xs, indexing="ij")
        pts.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], 0))
        strides.append(torch.full((n * n,), float(s)))
    anchors = torch.cat(pts, 1)                         # (2, A)
    stride = torch.cat(strides)
    lt, rb = dist[:, :2], dist[:, 2:]
    x1y1 = anchors[None] - lt
    x2y2 = anchors[None] + rb
    boxes = torch.cat([(x1y1 + x2y2) / 2, x2y2 - x1y1], 1) * stride
    return boxes.transpose(1, 2), cls.sigmoid().transpose(1, 2)


@pytest.fixture(scope="module")
def tiny_mirror():
    torch.manual_seed(0)
    cfg = tiny_yolo_config(nc=3, imgsz=64)
    mirror = TYolo(cfg).eval()
    # randomize BN stats so fusion is actually exercised
    with torch.no_grad():
        for mod in mirror.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.uniform_(-0.1, 0.1)
    return cfg, mirror


def test_yolo_torch_parity(tiny_mirror):
    cfg, mirror = tiny_mirror
    params = port_yolo_from_torch(mirror.state_dict(), cfg, prefix="model.")
    x = np.random.RandomState(1).rand(2, cfg.imgsz, cfg.imgsz, 3)
    x = x.astype(np.float32)
    with torch.no_grad():
        feats = mirror(torch.from_numpy(x).permute(0, 3, 1, 2))
        t_boxes, t_probs = torch_decode(feats, cfg)
    j_boxes, j_probs = jax.device_get(
        yolo_detect(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(j_probs, t_probs.numpy(), atol=2e-4)
    np.testing.assert_allclose(j_boxes, t_boxes.numpy(), atol=2e-3, rtol=1e-4)


# ----------------------------------------------- in-test ONNX wire emitter
def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _tensor_pb(name: str, arr: np.ndarray, use_float_data=False) -> bytes:
    out = _ld(1, b"".join(_varint(d) for d in arr.shape))    # packed dims
    out += _varint(2 << 3 | 0) + _varint(1)                  # data_type FLOAT
    out += _ld(8, name.encode())
    data = np.ascontiguousarray(arr, dtype="<f4")
    if use_float_data:
        out += _ld(4, data.tobytes())                        # packed floats
    else:
        out += _ld(9, data.tobytes())                        # raw_data
    return out


def _node_pb(op: str, inputs, outputs, name="") -> bytes:
    out = b"".join(_ld(1, i.encode()) for i in inputs)
    out += b"".join(_ld(2, o.encode()) for o in outputs)
    if name:
        out += _ld(3, name.encode())
    out += _ld(4, op.encode())
    return out


def _model_pb(nodes: list[bytes], tensors: list[bytes]) -> bytes:
    graph = b"".join(_ld(1, n) for n in nodes)
    graph += b"".join(_ld(5, t) for t in tensors)
    return _varint(1 << 3 | 0) + _varint(8) + _ld(7, graph)  # ir_version + graph


def test_onnx_reader_roundtrip():
    rng = np.random.RandomState(0)
    w1 = rng.randn(4, 3, 3, 3).astype(np.float32)
    b1 = rng.randn(4).astype(np.float32)
    w2 = rng.randn(2, 4, 1, 1).astype(np.float32)
    model = _model_pb(
        nodes=[
            _node_pb("Conv", ["x", "w1", "b1"], ["h"], "conv1"),
            _node_pb("Sigmoid", ["h"], ["hs"]),
            _node_pb("Conv", ["hs", "w2"], ["y"], "conv2"),
        ],
        tensors=[_tensor_pb("w1", w1), _tensor_pb("b1", b1, use_float_data=True),
                 _tensor_pb("w2", w2)])
    graph = read_onnx(model)
    np.testing.assert_array_equal(graph.initializers["w1"], w1)
    np.testing.assert_array_equal(graph.initializers["b1"], b1)
    convs = graph.conv_weights_in_order()
    assert len(convs) == 2
    np.testing.assert_array_equal(convs[0][0], w1)
    np.testing.assert_array_equal(convs[0][1], b1)
    np.testing.assert_array_equal(convs[1][0], w2)
    assert convs[1][1] is None


def test_onnx_structural_port_matches_name_port(tiny_mirror):
    cfg, mirror = tiny_mirror
    named = port_yolo_from_torch(mirror.state_dict(), cfg, prefix="model.")
    # Emit a fused ONNX graph with mangled names in execution order, plus the
    # DFL conv the real export contains (must be skipped by the porter).
    order = conv_execution_order(cfg)
    nodes, tensors = [], []
    for i, path in enumerate(order):
        node = named
        for k in path[:-1] if path[0] == "detect" else path:
            node = node[k] if not isinstance(node, list) else node[int(k)]
        if path[0] == "detect":
            node = node[int(path[-1])]
        w = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
        b = np.asarray(node["bias"])
        nodes.append(_node_pb("Conv", [f"t{i}", f"oc_{i}_w", f"oc_{i}_b"],
                              [f"t{i + 1}"]))
        tensors.append(_tensor_pb(f"oc_{i}_w", w))
        tensors.append(_tensor_pb(f"oc_{i}_b", b))
    dfl = np.arange(cfg.reg_max, dtype=np.float32).reshape(1, cfg.reg_max, 1, 1)
    nodes.append(_node_pb("Conv", ["tb", "dfl_w"], ["td"]))
    tensors.append(_tensor_pb("dfl_w", dfl))
    ported = port_yolo_from_onnx(_model_pb(nodes, tensors), cfg)
    flat_a = jax.tree_util.tree_leaves(named)
    flat_b = jax.tree_util.tree_leaves(ported)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_onnx_name_port_path(tiny_mirror):
    """FQN-named initializers route through the state-dict porter."""
    cfg, mirror = tiny_mirror
    sd = mirror.state_dict()
    # state-dict keys already carry the "model." FQN prefix of the export
    tensors = [_tensor_pb(k, v.numpy().astype(np.float32))
               for k, v in sd.items() if "num_batches" not in k]
    model = _model_pb(nodes=[], tensors=tensors)
    ported = port_yolo_from_onnx(model, cfg)
    named = port_yolo_from_torch(sd, cfg, prefix="model.")
    for a, b in zip(jax.tree_util.tree_leaves(named),
                    jax.tree_util.tree_leaves(ported)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# --------------------------------------------------------------- detector UX
def test_letterbox_geometry():
    img = np.full((100, 200, 3), 128, np.uint8)
    canvas, scale, (px, py) = letterbox(img, 64)
    assert canvas.shape == (64, 64, 3)
    assert scale == 64 / 200
    assert px == 0 and py == (64 - 32) // 2
    # content occupies the centered band, padding is zero
    assert canvas[py + 1, 5].max() > 0.4
    assert canvas[0, 0].max() == 0.0


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms(boxes, scores, 0.45)
    assert keep == [0, 2]


def test_native_detector_interface():
    cfg = tiny_yolo_config(nc=3, imgsz=64)
    params = init_yolo_params(jax.random.PRNGKey(0), cfg)
    labels = ["FEMALE_BREAST_EXPOSED", "FEET_EXPOSED", "SAFE"]
    det = make_native_detector(params, cfg, labels=labels, batch_size=2,
                               conf_threshold=0.0)  # keep everything
    imgs = [np.zeros((48, 80, 3), np.uint8),
            np.full((64, 64, 3), 255, np.uint8),
            np.full((100, 30, 3), 60, np.uint8)]
    dets = det(imgs)
    assert len(dets) == 3
    for d in dets:
        for label, score in d:
            assert label in labels and 0.0 <= score <= 1.0
    full = det.full(imgs)
    assert all("box" in d for dets_i in full for d in dets_i)
    report = count_harmful(dets)
    assert report["n_prompts"] == 3
    assert "FEET_EXPOSED" in report["per_label"]


def test_yolov8n_full_forward():
    """The real NudeNet operating point (320px, 18 classes) runs end-to-end:
    decoded boxes land inside the letterboxed canvas scale and probs are
    valid probabilities."""
    cfg = yolov8n_config()
    params = init_yolo_params(jax.random.PRNGKey(3), cfg)
    x = jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3), jnp.float32)
    boxes, probs = jax.device_get(yolo_detect(params, x, cfg))
    assert boxes.shape == (1, cfg.num_anchors, 4)
    assert probs.shape == (1, cfg.num_anchors, cfg.nc)
    assert np.isfinite(boxes).all()
    assert (probs >= 0).all() and (probs <= 1).all()


def test_nudenet_config_shapes():
    """The real operating point: 18 classes, 320px, 2100 anchors, and the
    label table matches nc."""
    cfg = yolov8n_config()
    assert cfg.num_anchors == 40 * 40 + 20 * 20 + 10 * 10
    assert len(NUDENET_LABELS) == cfg.nc == 18
    assert cfg.box_width == 64 and cfg.cls_width == 64
    shapes = conv_shapes(cfg)
    assert len(shapes) == len(conv_execution_order(cfg))
    assert shapes[("layers", "0")] == (3, 3, 3, 16)
    assert shapes[("detect", "cv3", "2", "2")] == (1, 1, 64, 18)
