"""Device mesh + sharding rules.

The reference has no first-class parallelism (SURVEY.md §5.8): training is Accelerate
DDP + partial ZeRO-3, everything else single-GPU. Here the equivalents are native
jax.sharding over a ('dp', 'tp') mesh:

  dp — batch (data parallel; replaces Accelerate DDP, grads psum over ICI)
  tp — FF hidden dim + attention heads (tensor parallel; also shards each layer's
       expert score matmul: patterns columns follow the gate shard, scores
       reduce-scatter over ICI)

Rules are regex on flattened param paths, applied with NamedSharding.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
                tp: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None and tp is None:
        # favor dp for inference-style workloads; tp = largest pow2 <= 4 dividing n
        tp = 1
        for cand in (4, 2):
            if n % cand == 0:
                tp = cand
                break
        dp = n // tp
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, (dp, tp, n)
    return Mesh(np.asarray(devices[:n]).reshape(dp, tp), ("dp", "tp"))


# (regex on 'a/b/c' joined param path) -> PartitionSpec
_UNET_RULES = [
    # GEGLU proj (D, 2H) stays REPLICATED: P(None, 'tp') would split the
    # concatenated axis so the whole hidden half lands on one device and the
    # whole gate half on another — hidden*gelu(gate) then forces full H-wide
    # resharding every FF call. True Megatron-style GEGLU tp needs the halves
    # sharded congruently (an interleaved/(D,2,H) layout), which the ported
    # 2H-fused param cannot express; the out_proj contraction below still
    # gives row-parallel FF tp.
    (r".*/ff/proj/kernel$", P(None, None)),
    (r".*/ff/proj/bias$", P(None,)),
    (r".*/ff/out_proj_kernel$", P("tp", None)),      # (H, D): contract over tp
    (r".*/attn\d/to_[qkv]/kernel$", P(None, "tp")),  # shard heads
    (r".*/attn\d/to_out/kernel$", P("tp", None)),
    (r".*/(fc1|mlp/fc1)/kernel$", P(None, "tp")),
    (r".*/fc2_kernel$", P("tp", None)),
    # T5 encoder (PixArt conditioning): heads + gated-GELU hidden over tp
    (r".*/attn/[qkv]/kernel$", P(None, "tp")),
    (r".*/attn/o/kernel$", P("tp", None)),
    (r".*/wi_[01]/kernel$", P(None, "tp")),
    (r".*/wo/kernel$", P("tp", None)),
]


def _spec_for(path: str) -> P:
    for pat, spec in _UNET_RULES:
        if re.match(pat, path):
            return spec
    return P()  # replicated


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param tree (UNet/CLIP/VAE) under `mesh`."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(getattr(k, "key", str(k)) for k in kp)

    specs = {path_str(kp): _spec_for(path_str(kp)) for kp, _ in flat}

    def assign(kp, _):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)


def create_mesh_3d(n_devices: Optional[int] = None) -> Mesh:
    """('dp','ep','tp') mesh for expert-parallel MoE inference: batch over dp,
    expert pattern rows over ep (per-layer routing scores reduce over ICI),
    FF hidden over tp."""
    devices = jax.devices()
    n = n_devices or len(devices)
    dims = []
    rem = n
    for _ in range(2):
        f = 2 if rem % 2 == 0 and rem > 1 else 1
        dims.append(f)
        rem //= f
    dp, ep = dims
    tp = rem
    return Mesh(np.asarray(devices[:n]).reshape(dp, ep, tp),
                ("dp", "ep", "tp"))


def moe_intervention_shardings(ivs, mesh: Mesh):
    """Shard each layer's (E, H) expert patterns over 'ep' (rows) — the natural
    expert-parallel layout (SURVEY.md §5.8 EP row); other fields replicate."""
    def assign(kp, leaf):
        path = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                        for k in kp)
        if path.endswith("patterns") and leaf.ndim == 2:
            return NamedSharding(mesh, P("ep", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, ivs)


def state_shardings(state, mesh: Mesh):
    """Sharding pytree for a whole TrainState: param-shaped leaves anywhere in the
    tree (params, ema, optimizer mu/nu) pick up the same tp rules by path suffix;
    scalars and unmatched leaves replicate. This is the ZeRO-free analogue of the
    reference's partial ZeRO-3 (train_relufied_sd.py:646-665): optimizer moments
    follow the param sharding instead of being stage-3 partitioned."""
    def assign(kp, _):
        path = "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)
        return NamedSharding(mesh, _spec_for(path))

    return jax.tree_util.tree_map_with_path(assign, state)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'dp'."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())




# Megatron-style tensor parallel for the VLM judge LMs (models/llama.py —
# Llama/Vicuna for LLaVA, Qwen2 for Qwen2-VL). Column-parallel q/k/v and
# gate/up (heads / FF hidden over 'tp'), row-parallel o_proj/down_proj
# (contraction over 'tp'; XLA inserts the psum), vocab-sharded lm_head
# (argmax over a sharded axis is fine for greedy decode). Embedding table,
# norms, and the small vision tower/projector replicate. Constraint:
# num_kv_heads % tp == 0 (LLaVA-7/13B: 32/40; Qwen2-VL-7B: 4).
_LLAMA_RULES = [
    (r".*/self_attn/[qkv]_proj/kernel$", P(None, "tp")),
    (r".*/self_attn/[qkv]_proj/bias$", P("tp",)),
    (r".*/self_attn/o_proj/kernel$", P("tp", None)),
    (r".*/(gate_proj|up_proj)/kernel$", P(None, "tp")),
    (r".*/down_proj/kernel$", P("tp", None)),
    (r"(.*/)?lm_head/kernel$", P(None, "tp")),  # top-level in the LM tree
]


def llama_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a models/llama.py param tree (the 'language'
    subtree of a LLaVA/Qwen2-VL port, including the raw 'embed_tokens'
    array) under `mesh`."""
    def assign(kp, _):
        path = "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                        for k in kp)
        for pat, spec in _LLAMA_RULES:
            if re.match(pat, path):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)
