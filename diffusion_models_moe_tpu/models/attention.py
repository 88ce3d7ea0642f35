"""Transformer blocks with tappable GEGLU feed-forwards.

The FF layer here is the framework's load-bearing surface: all MoE routing, skill
attribution and erasure in the reference happen inside forward hooks on diffusers'
GEGLU modules (reference: neuron_receivers/base_receiver.py:40-77). Here the same
observation/intervention points are first-class functional arguments, so the whole
denoise loop stays inside one XLA trace.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusion_models_moe_tpu.taps import (LayerIntervention, TapSpec,
                                           routing_mask)


class QuantDense(nn.Module):
    """``nn.Dense``-compatible layer (same ``kernel``/``bias`` pytree and init)
    running the int8 W8A8 dot (`ops/quant.py`) — the opt-in serving mode."""
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from diffusion_models_moe_tpu.ops.quant import int8_dot
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        y = int8_dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def make_dense(features, *, use_bias=True, dtype=jnp.float32, quant=False,
               name=None):
    """nn.Dense, or its int8 twin when `quant` (identical param tree)."""
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class _PadHeadProj(nn.Module):
    """q/k/v projection emitting (B, S, heads, d_pad) directly, with the
    flash kernel's 128-lane head-dim zero-pad FOLDED INTO THE WEIGHTS
    (zero kernel columns per head). Param-compatible with
    ``nn.Dense(query_dim)`` (same 2D ``kernel``/``bias``); the pad is
    loop-invariant so XLA hoists it out of the denoise scan. Removes the
    pad_bitcast copies at the flash boundary (profiled 345ms/generate,
    docs/profiling.md) at the cost of 1.6-3.2x flops on the q/k/v dots
    (which are small next to the S^2 attention). Opt-in experiment:
    DMOE_PAD_PROJ=1, exact math either way (zeros contribute zero).

    `quant=True` is the int8 serving-mode twin: the symmetric scheme has
    zero-point 0, so the zero pad columns quantize to 0 and the int32
    accumulation is bit-identical to the unpadded QuantDense path (per-token
    activation scales ignore zero columns; per-output-channel weight scales
    of the pad columns clamp to eps and quantize the zeros to 0)."""
    query_dim: int
    heads: int
    d_pad: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.query_dim // self.heads
        x = x.astype(self.dtype)    # match nn.Dense's promote_dtype input cast
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.query_dim), jnp.float32)
        k3 = jnp.pad(kernel.reshape(x.shape[-1], self.heads, d),
                     ((0, 0), (0, 0), (0, self.d_pad - d))).astype(self.dtype)
        k2 = k3.reshape(x.shape[-1], self.heads * self.d_pad)
        if self.quant:
            from diffusion_models_moe_tpu.ops.quant import int8_dot
            y = int8_dot(x, k2)
        else:
            y = jax.lax.dot_general(x, k2, (((x.ndim - 1,), (0,)), ((), ())))
        y = y.reshape(*x.shape[:-1], self.heads, self.d_pad)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.query_dim,), jnp.float32)
            b3 = jnp.pad(bias.reshape(self.heads, d),
                         ((0, 0), (0, self.d_pad - d)))
            y = y + b3.astype(self.dtype)
        return y


class _RawPadProj(nn.Module):
    """``nn.Dense(query_dim)``-compatible q/k/v params (same 2D ``kernel``
    pytree as _PadHeadProj) returned as the lane-padded (C, heads*d_pad)
    weight — consumed by the absorbed-attention kernel
    (ops/attn_absorb_fused.py:ln_qkv_fused), which runs the dot itself."""
    query_dim: int
    heads: int
    d_pad: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_dim):
        d = self.query_dim // self.heads
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.query_dim), jnp.float32)
        k3 = jnp.pad(kernel.reshape(in_dim, self.heads, d),
                     ((0, 0), (0, 0), (0, self.d_pad - d))).astype(self.dtype)
        return k3.reshape(in_dim, self.heads * self.d_pad)


class _RawOutProj(nn.Module):
    """``nn.Dense``-compatible to_out params (same ``kernel``/``bias`` pytree
    as _DGOutProj) returned as the pad-row (heads*d_pad, C) weight + f32 bias
    for ops/attn_absorb_fused.py:attn_out_residual_fused."""
    features: int
    heads: int
    d_pad: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        d = self.features // self.heads
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.heads * d, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k3 = jnp.pad(kernel.reshape(self.heads, d, self.features),
                     ((0, 0), (0, self.d_pad - d), (0, 0)))
        return (k3.reshape(self.heads * self.d_pad, self.features
                           ).astype(self.dtype), bias)


class _DGOutProj(nn.Module):
    """Output projection consuming the 4D (B, S, heads, d) attention output via
    one `dot_general` contracting (heads, d) — param-compatible with
    ``nn.Dense(name='to_out')`` (same 2D ``kernel``/``bias``). Skips the
    reshape-to-(B,S,C) step whose relayout XLA otherwise has to schedule
    around the flash custom-call's (B, heads, S, d) layout. Measured on v5e
    (headline bench): 1.0553 -> 1.0705 img/s, so it defaults ON on TPU;
    DMOE_ATTN_DG=0 restores the Dense path (bitwise-identical params, outputs
    equal — tests/test_parallel_and_kernels.py).

    `quant=True` runs the contraction as the int8 W8A8 dot over the flattened
    (heads*d_in) axis — bit-identical to the unpadded QuantDense out
    projection (zero pad rows/columns are exact under the symmetric scheme,
    see _PadHeadProj) while still skipping the pre-projection reshape."""
    features: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, out4):
        b, s, h, d_in = out4.shape
        d = self.features // h      # param head dim (to_out is square C -> C)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (h * d, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k3 = kernel.reshape(h, d, self.features)
        if d_in != d:
            # padded-head-dim input (_PadHeadProj mode): the pad rows multiply
            # the attention output's zero pad columns — exact either way
            k3 = jnp.pad(k3, ((0, 0), (0, d_in - d), (0, 0)))
        k3 = k3.astype(self.dtype)
        if self.quant:
            from diffusion_models_moe_tpu.ops.quant import int8_dot
            y = int8_dot(out4.astype(self.dtype).reshape(b, s, h * d_in),
                         k3.reshape(h * d_in, self.features))
        else:
            y = jax.lax.dot_general(out4, k3, (((2, 3), (0, 1)), ((), ())))
        return y + bias.astype(self.dtype)


class Attention(nn.Module):
    """Multi-head (self or cross) attention.

    Long self-attention (the 4096-token UNet layers) lowers to the Pallas flash
    kernel on TPU, keeping the (S, S) score matrix in VMEM; cross-attention
    (kv = 77 text tokens) and small grids stay on XLA's fused SDPA."""
    query_dim: int
    heads: int = 8
    context_dim: Optional[int] = None
    dtype: Any = jnp.float32
    flash: bool = True
    qkv_bias: bool = False               # PixArt uses attention_bias=True
    quant: bool = False

    @nn.compact
    def __call__(self, x, context=None, ln=None):
        import os
        is_self = context is None
        context = x if context is None else context
        head_dim = self.query_dim // self.heads

        from diffusion_models_moe_tpu.ops.flash import (attention_dispatch,
                                                        round_up_lanes,
                                                        use_flash)
        d_pad = round_up_lanes(head_dim)
        # DMOE_ATTN_ABSORB (VERDICT r4 item 3): with `ln` (the delegated
        # norm1 params — BasicTransformerBlock keeps the pytree via
        # _LNParams), the whole  x + to_out(flash(qkv(LN(x))))  sub-block
        # runs as two Pallas kernels around the unmodified stock flash call:
        # LN+qkv emitting flash's (B, H, S, d_pad) operand layout directly,
        # and out-proj+bias+residual consuming it directly — the S-minor
        # projection layouts and transpose/pad materializations XLA schedules
        # around the custom-call (ROOFLINE.md §2) never exist. Exact-tier.
        if ln is not None:
            from diffusion_models_moe_tpu.ops.attn_absorb_fused import (
                absorbed_self_attention, attn_absorb_ok, ln_apply)
            g_ln, b_ln, eps_ln = ln
            interp = os.environ.get("DMOE_ATTN_ABSORB_INTERPRET", "0") == "1"
            if (is_self and not self.quant and not self.qkv_bias
                    and os.environ.get("DMOE_FLASH_IMPL", "jax")
                    in ("jax", "custom-cross")
                    and use_flash(x.shape[1], context.shape[1], self.flash)
                    and attn_absorb_ok(x.shape[1], self.query_dim,
                                       self.heads, d_pad)):
                wq = _RawPadProj(self.query_dim, self.heads, d_pad,
                                 dtype=self.dtype, name="to_q")(x.shape[-1])
                wk = _RawPadProj(self.query_dim, self.heads, d_pad,
                                 dtype=self.dtype, name="to_k")(x.shape[-1])
                wv = _RawPadProj(self.query_dim, self.heads, d_pad,
                                 dtype=self.dtype, name="to_v")(x.shape[-1])
                wo, bo = _RawOutProj(self.query_dim, self.heads, d_pad,
                                     dtype=self.dtype, name="to_out")()
                return absorbed_self_attention(
                    x, wq, wk, wv, wo, bo, self.heads,
                    1.0 / (head_dim ** 0.5), (g_ln, b_ln, eps_ln),
                    interpret=interp)
            # conditions not met (CPU, short seq, quant, cross impl): apply
            # the delegated LN here and fall through to the standard paths,
            # adding the residual at the end — semantics identical to the
            # un-absorbed block
            resid = x
            x = ln_apply(x, g_ln, b_ln, eps_ln).astype(self.dtype)
            context = x if is_self else context
        else:
            resid = None
        # DMOE_PAD_PROJ (default ON since r3): fold the flash head-dim pad
        # into the q/k/v weights (see _PadHeadProj) — only where the stock
        # flash SELF path will run ("custom-cross" diverts only
        # cross-attention, so it qualifies too; "custom"/"custom-self"/
        # "splash" replace the self kernel and don't). BIT-exact vs the
        # boundary-pad path (the flash kernel pads d to 128 lanes either way;
        # this only moves where the zeros are materialized) and measured
        # +4.4% end-to-end (bench_modes.json pad_proj 1.1221 vs plain 1.0748)
        # — hence the default. DMOE_PAD_PROJ=0 restores the boundary pad.
        # With quant, the int8 twins keep the same bit-exact-pad guarantee.
        if (os.environ.get("DMOE_PAD_PROJ", "1") == "1" and is_self
                and d_pad != head_dim
                and os.environ.get("DMOE_FLASH_IMPL", "jax")
                in ("jax", "custom-cross")
                and use_flash(x.shape[1], context.shape[1], self.flash)):
            q4 = _PadHeadProj(self.query_dim, self.heads, d_pad,
                              use_bias=self.qkv_bias, dtype=self.dtype,
                              quant=self.quant, name="to_q")(x)
            k4 = _PadHeadProj(self.query_dim, self.heads, d_pad,
                              use_bias=self.qkv_bias, dtype=self.dtype,
                              quant=self.quant, name="to_k")(context)
            v4 = _PadHeadProj(self.query_dim, self.heads, d_pad,
                              use_bias=self.qkv_bias, dtype=self.dtype,
                              quant=self.quant, name="to_v")(context)
            out = attention_dispatch(q4, k4, v4, is_self=True,
                                     sm_scale=1.0 / (head_dim ** 0.5),
                                     kv_valid=context.shape[1],
                                     enabled=self.flash)
            # _DGOutProj handles the padded head dim (zero kernel rows)
            y = _DGOutProj(self.query_dim, dtype=self.dtype,
                           quant=self.quant, name="to_out")(out)
            return y if resid is None else resid + y

        q = make_dense(self.query_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       quant=self.quant, name="to_q")(x)
        k = make_dense(self.query_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       quant=self.quant, name="to_k")(context)
        v = make_dense(self.query_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       quant=self.quant, name="to_v")(context)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, head_dim)

        out = attention_dispatch(split(q), split(k), split(v),
                                 is_self=is_self,
                                 sm_scale=1.0 / (head_dim ** 0.5),
                                 kv_valid=context.shape[1],
                                 enabled=self.flash)
        dg_default = "1" if jax.default_backend() == "tpu" else "0"
        if os.environ.get("DMOE_ATTN_DG", dg_default) == "1" and not self.quant:
            y = _DGOutProj(self.query_dim, dtype=self.dtype,
                           name="to_out")(out)
            return y if resid is None else resid + y
        out = out.reshape(x.shape[0], x.shape[1], self.query_dim)
        y = make_dense(self.query_dim, dtype=self.dtype, quant=self.quant,
                       name="to_out")(out)
        return y if resid is None else resid + y


class _GEGLUProj(nn.Module):
    """The GEGLU input projection, param-compatible with ``nn.Dense(2H, name='proj')``
    (same ``proj/kernel``+``proj/bias`` pytree, so ported diffusers checkpoints are
    unchanged) but optionally computed as two H-wide matmuls. The fused 2H-wide dot's
    output cannot epilogue-fuse the downstream ``gelu(gate)*hidden`` product, so XLA
    round-trips the 2H activation through HBM; two H-wide dots each keep their half
    fusable. Measured on v5e (batch 16), pre-layout-fixes: +12.7% FF time at
    d=320/s=4096, +6.5% at d=640/s=1024, -2.2% at d=1280/s=256 (hence the old
    dim<=640 heuristic); after the conv-barrier + dot_general layout changes the
    full-bench sweep read split-always 1.0747 vs heuristic 1.0705 vs never 1.0428
    img/s, so split is now the default everywhere (DMOE_SPLIT_PROJ=0 restores the
    fused dot)."""
    features: int            # 2 * hidden_dim
    split: bool = False
    dtype: Any = jnp.float32
    quant: bool = False
    raw: bool = False        # declare-and-return params (fused-FF kernel path)

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if self.raw:
            # fused-FF kernel path (ops/geglu_ff_fused.py): the parent needs
            # the raw f32 arrays but the SAME 'proj/kernel'+'proj/bias' tree
            return kernel, bias
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        h = self.features // 2
        if self.quant:
            # int8 serving path: always split (per-column weight scales make the
            # two halves independently scaled anyway).
            from diffusion_models_moe_tpu.ops.quant import int8_dot
            return (int8_dot(x, kernel[:, :h]) + bias[:h],
                    int8_dot(x, kernel[:, h:]) + bias[h:])
        if not self.split:
            hg = x @ kernel + bias
            hidden, gate = jnp.split(hg, 2, axis=-1)
            return hidden, gate
        # Column-sliced dots contract over the same axis, so results are bitwise
        # identical to the fused dot.
        return x @ kernel[:, :h] + bias[:h], x @ kernel[:, h:] + bias[h:]


class GEGLUFeedForward(nn.Module):
    """GEGLU (or GELU) FF with functional taps and interventions.

    Forward math matches diffusers' FeedForward(GEGLU): `proj` produces 2H features,
    split into (hidden, gate); gate is activated; output = W2 @ (hidden * gate)
    (reference routing math: neuron_receivers/moefy.py:10-27). `activation`:
      geglu       exact GELU gate (SD1.x default)
      geglu-relu  ReLUfied gate (reference: sparsity/relufy_model.py:28-40)
      gelu        non-gated exact-GELU FF
      gelu-tanh   non-gated tanh-approximate GELU (PixArt path — diffusers uses
                  activation_fn='gelu-approximate'; reference: utils.py:119-127)
    """
    dim: int
    mult: int = 4
    activation: str = "geglu"
    ff_index: int = 0
    dtype: Any = jnp.float32
    use_fused_routing: bool = True
    quant: bool = False

    @nn.compact
    def __call__(self, x, *, step_idx=None,
                 tap: Optional[TapSpec] = None,
                 iv: Optional[LayerIntervention] = None,
                 ln: Optional[tuple] = None):
        # ln=(scale, bias, eps): the caller delegates its pre-FF LayerNorm
        # and residual — this module returns  x + ff(layernorm(x)) , absorbed
        # into the fused kernel on the hot path (VERDICT r3 #7) and applied
        # with flax-identical ops on every fallback.
        resid = x if ln is not None else None
        hidden_dim = self.dim * self.mult
        gated = self.activation in ("geglu", "geglu-relu")
        t = 0 if step_idx is None else step_idx

        import os
        # DMOE_FF_2D experiment: run the FF dots on (B*S, C)-flattened
        # activations. Bitwise identical (dots contract the same last axis);
        # the hypothesis was that 2D operands steer XLA's layout assignment
        # away from the sequence-minor activation layouts it picks around the
        # flash custom-call (profiled: FF dots at ~36% MXU from in-fusion
        # transposes). Measured on v5e (driver bench): 1.0695 vs 1.0733 img/s
        # — no win (XLA keeps the same layouts and pays the reshapes), so the
        # default stays OFF. Only taken on the tap-free hot path — the stat
        # sows index (batch, seq) axes.
        collecting = tap is not None and (
            tap.any_gate_stat() or tap.any_expert_stat()
            or tap.ff_out_colnorm_sq)
        shape3 = x.shape

        # DMOE_FF_FUSED=1: the whole FF (proj dots + exact GELU + top-k
        # routing + masked product + out-proj) as ONE Pallas kernel
        # (ops/geglu_ff_fused.py) — no (B, S, 2H) HBM round-trips. Taken only
        # on the tap-free serving path with plain-MoE (or no) routing;
        # everything else falls back to the XLA path below. Trace-time knob,
        # identical param tree (the 'proj' child runs in raw mode).
        fused_interp = os.environ.get("DMOE_FF_FUSED_INTERPRET", "0") == "1"
        if (os.environ.get("DMOE_FF_FUSED", "0") == "1" and gated
                and not self.quant and not collecting
                and os.environ.get("DMOE_HOOK_SIM", "0") != "1"
                and (jax.default_backend() == "tpu" or fused_interp)
                and (iv is None
                     or (iv.neuron_mask is None and iv.out_weight_mask is None
                         and iv.expert_boost is None
                         and (iv.patterns is None or iv.k > 0)))):
            from diffusion_models_moe_tpu.ops.geglu_ff_fused import (
                fused_ff_ok, geglu_ff_fused)
            pat, kk = None, 0
            if iv is not None and iv.patterns is not None and iv.k > 0:
                pat = iv.patterns
                if iv.expert_remove is not None:
                    rm = iv.expert_remove[t].astype(pat.dtype)   # (E,)
                    pat = pat * (1.0 - rm)[:, None]
                kk = iv.k
            x2d = x.reshape(-1, shape3[-1])
            if fused_ff_ok(x2d.shape[0], self.dim, hidden_dim,
                           0 if pat is None else pat.shape[0]):
                k_raw, b_raw = _GEGLUProj(2 * hidden_dim, raw=True,
                                          name="proj")(x)
                out_k = self.param("out_proj_kernel",
                                   nn.initializers.lecun_normal(),
                                   (hidden_dim, self.dim), jnp.float32)
                out_b = self.param("out_proj_bias", nn.initializers.zeros,
                                   (self.dim,), jnp.float32)
                ln_kw = {} if ln is None else {
                    "ln_scale": ln[0], "ln_bias": ln[1], "eps": ln[2]}
                y = geglu_ff_fused(
                    x2d.astype(self.dtype), k_raw.astype(self.dtype),
                    b_raw.astype(self.dtype), out_k.astype(self.dtype),
                    out_b.astype(self.dtype), pat, kk,
                    relu=self.activation == "geglu-relu",
                    interpret=fused_interp, **ln_kw)
                return y.reshape(shape3)   # residual included when ln given

        if ln is not None:
            # fallback (taps collecting, shape-gated, or off-TPU): apply the
            # delegated LayerNorm here with flax-identical ops (fast
            # variance, rsqrt folded into scale — nn.LayerNorm order)
            xr = x.astype(jnp.float32)
            mu = xr.mean(-1, keepdims=True)
            var = jnp.maximum((xr * xr).mean(-1, keepdims=True) - mu * mu,
                              0.0)
            mul = jax.lax.rsqrt(var + ln[2]) * ln[0].astype(jnp.float32)
            x = ((xr - mu) * mul
                 + ln[1].astype(jnp.float32)).astype(self.dtype)

        flat2d = (os.environ.get("DMOE_FF_2D", "0") == "1"
                  and not collecting and x.ndim == 3)
        if flat2d:
            x = x.reshape(-1, shape3[-1])

        if gated:
            split = os.environ.get("DMOE_SPLIT_PROJ", "1") == "1"
            proj = _GEGLUProj(2 * hidden_dim, split=split,
                              dtype=self.dtype, quant=self.quant,
                              name="proj")
            hidden, gate = proj(x)
            if self.activation == "geglu-relu":
                gate = jax.nn.relu(gate)
            else:
                gate = jax.nn.gelu(gate, approximate=False)
            if os.environ.get("DMOE_HOOK_SIM", "0") == "1":
                # Reference-semantics simulation: a PyTorch forward hook
                # recomputes the whole proj->chunk->gelu on every call
                # (reference: neuron_receivers/moefy.py:10-27 re-derives the
                # gate from module.proj inside the hook, on top of the
                # module's own forward). Re-run the projection behind an
                # optimization barrier (so XLA cannot CSE it) and emit a
                # gate-dependent scalar so it survives DCE. Used only by
                # bench.py --hook-sim to measure, on the SAME chip, what the
                # reference's hook architecture costs vs the traced taps.
                # This UNDERSTATES the reference's overhead: its hooks also
                # copy the full (B, S, H) gate to host on all 16 layers x 51
                # steps, which has no in-jit equivalent. Measured on v5e:
                # 0.9335 vs 1.0733 img/s — the recompute alone costs 13% even
                # when XLA fuses everything on-device.
                if not self.is_mutable_collection("taps"):
                    # without a mutable 'taps' collection the sow below is a
                    # no-op and XLA DCEs the barriered recompute — the run
                    # would silently measure the NATIVE path while labeled
                    # hook-sim. bench.py passes a TapSpec; any other driver
                    # must too.
                    raise ValueError(
                        "DMOE_HOOK_SIM=1 requires running with taps "
                        "(mutable 'taps' collection); pass a TapSpec to "
                        "generate() or unset DMOE_HOOK_SIM")
                h2, g2 = proj(jax.lax.optimization_barrier(x))
                g2 = (jax.nn.relu(g2) if self.activation == "geglu-relu"
                      else jax.nn.gelu(g2, approximate=False))
                self.sow("taps", f"hook_sim_{self.ff_index:02d}",
                         jnp.sum(g2, dtype=jnp.float32)
                         + jnp.sum(h2, dtype=jnp.float32))
        else:
            hidden = None
            gate = make_dense(hidden_dim, dtype=self.dtype, quant=self.quant,
                              name="proj")(x)
            gate = jax.nn.gelu(gate,
                               approximate=self.activation == "gelu-tanh")

        if tap is not None and tap.any_gate_stat():
            self._sow_gate_stats(gate, tap, iv)

        # --- interventions on the activated gate ---------------------------------
        if iv is not None and iv.neuron_mask is not None:
            # RemoveNeurons: overwrite skilled neurons with the fill value
            # (reference: neuron_receivers/remove_skilled_neurons.py:36-51).
            m = iv.neuron_mask[t]                      # (H,) bool, broadcasts
            gate = jnp.where(m, jnp.asarray(iv.neuron_fill, gate.dtype), gate)

        routed_fused = False
        if iv is not None and iv.patterns is not None and iv.k > 0:
            patterns = iv.patterns
            if iv.expert_remove is not None:
                # RemoveExperts zeroes skilled experts' pattern rows before routing
                # (reference: neuron_receivers/remove_skilled_experts.py:30-37).
                rm = iv.expert_remove[t].astype(patterns.dtype)  # (E,)
                patterns = patterns * (1.0 - rm)[:, None]
            boost = None
            if iv.expert_boost is not None:
                boost = iv.expert_boost[t]
            need_sel = tap is not None and tap.any_expert_stat()
            if (self.use_fused_routing and gated and boost is None
                    and not need_sel and jax.default_backend() == "tpu"):
                # hot path: one Pallas kernel for score->topk->mask->multiply
                from diffusion_models_moe_tpu.ops.routing_kernel import (
                    fused_route_multiply)
                shape = gate.shape
                y2 = fused_route_multiply(
                    hidden.reshape(-1, hidden_dim), gate.reshape(-1, hidden_dim),
                    patterns.astype(gate.dtype), iv.k)
                gate = None
                hidden, routed_fused = y2.reshape(shape), True
            else:
                g2 = gate.reshape(-1, hidden_dim)
                mask2d, sel = routing_mask(g2, patterns, iv.k, expert_boost=boost)
                gate = gate * mask2d.reshape(gate.shape)
                if need_sel:
                    self._sow_expert_stats(g2, sel, gate.shape, tap, iv)
        elif tap is not None and tap.any_expert_stat() and iv is not None \
                and iv.patterns is not None:
            # Expert stats without masking (ExpertPredictivity / GetExperts on an
            # un-intervened run): compute scores/selection, leave the gate
            # untouched. k < 0 observes top-|k| (k == 0 defaults to top-1), so
            # top-k selection statistics can be collected without routing.
            g2 = gate.reshape(-1, hidden_dim)
            k = abs(iv.k) if iv.k != 0 else 1
            mask2d, sel = routing_mask(g2, iv.patterns, k)
            self._sow_expert_stats(g2, sel, gate.shape, tap, iv)

        y = hidden if routed_fused else (hidden * gate if gated else gate)

        if tap is not None and tap.ff_out_colnorm_sq:
            # Wanda stat: column norms of the row-normalized input to W2
            # (reference: neuron_receivers/wanda_receiver.py:46-56). Sow the squared
            # column sums so accumulation over steps/prompts is additive.
            y2 = y.reshape(-1, hidden_dim).astype(jnp.float32)
            y2 = y2 / jnp.maximum(
                jnp.linalg.norm(y2, axis=-1, keepdims=True), 1e-12)
            self.sow("taps", f"ff_out_colnorm_sq_{self.ff_index:02d}",
                     jnp.sum(y2 * y2, axis=0))

        kernel = self.param(
            "out_proj_kernel",
            nn.initializers.lecun_normal(), (hidden_dim, self.dim), jnp.float32)
        bias = self.param("out_proj_bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        kernel = kernel.astype(self.dtype)
        if iv is not None and iv.out_weight_mask is not None:
            # Wanda erasure: zero selected entries of the output projection
            # (reference: neuron_receivers/remove_wanda_neurons_fast.py:69-83).
            wm = iv.out_weight_mask
            wm = wm[t] if wm.ndim == 3 else wm      # (H, D)
            kernel = kernel * (1.0 - wm.astype(kernel.dtype))
        if self.quant:
            from diffusion_models_moe_tpu.ops.quant import int8_dot
            out = int8_dot(y, kernel) + bias.astype(self.dtype)
        else:
            out = y @ kernel + bias.astype(self.dtype)
        out = out.reshape(shape3[:-1] + out.shape[-1:]) if flat2d else out
        return out if resid is None else resid + out

    def _sow_gate_stats(self, gate, tap: TapSpec, iv):
        g = gate.reshape(-1, gate.shape[-1]).astype(jnp.float32)
        if iv is not None and iv.token_mask is not None:
            # Restrict stats to bounding-box tokens: replicate mask across batch
            # (reference: neuron_receivers/neuron_predictivity_bb.py:43-63).
            tm = jnp.tile(iv.token_mask, gate.shape[0]).astype(jnp.float32)[:, None]
        else:
            tm = None
        if tap.max_gate:
            gm = g if tm is None else jnp.where(tm > 0, g, -jnp.inf)
            self.sow("taps", f"max_gate_{self.ff_index:02d}", jnp.max(gm, axis=0))
        if tap.mean_gate:
            if tm is None:
                self.sow("taps", f"mean_gate_{self.ff_index:02d}", jnp.mean(g, axis=0))
            else:
                self.sow("taps", f"mean_gate_{self.ff_index:02d}",
                         jnp.sum(g * tm, axis=0) / jnp.maximum(jnp.sum(tm), 1.0))
        if tap.gate_sparsity:
            self.sow("taps", f"gate_sparsity_{self.ff_index:02d}",
                     jnp.mean((g == 0.0).astype(jnp.float32)))
        if tap.save_gate:
            self.sow("taps", f"save_gate_{self.ff_index:02d}", gate)

    def _sow_expert_stats(self, g2, sel, gate_shape, tap: TapSpec, iv):
        if tap.expert_scores_max:
            score = jax.lax.dot_general(
                g2, iv.patterns, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            self.sow("taps", f"expert_scores_max_{self.ff_index:02d}",
                     jnp.max(score, axis=0))
        if tap.expert_freq:
            # Batch element 0 only, weight 1/seq_len
            # (reference: neuron_receivers/frequency_measure.py:53-60).
            bsz, seq_len = gate_shape[0], gate_shape[1]
            sel_b = sel.reshape(bsz, seq_len, -1)
            self.sow("taps", f"expert_freq_{self.ff_index:02d}",
                     jnp.sum(sel_b[0], axis=0) / seq_len)
        if tap.expert_sel:
            self.sow("taps", f"expert_sel_{self.ff_index:02d}", jnp.sum(sel, axis=0))


class _LNParams(nn.Module):
    """``nn.LayerNorm``-compatible params (same ``scale``/``bias`` pytree and
    init) returned raw — consumed by GEGLUFeedForward's delegated-LN path."""
    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return scale, bias


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU-FF, residual each.

    LayerNorm epsilon is 1e-5 — torch's default, which diffusers'
    BasicTransformerBlock inherits (flax's default is 1e-6; parity pinned by
    tests/test_unet_torch_parity.py)."""
    dim: int
    heads: int
    context_dim: int
    ff_index: int
    ff_mult: int = 4
    ff_activation: str = "geglu"
    dtype: Any = jnp.float32
    use_fused_routing: bool = True
    flash_attention: bool = True
    norm_dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, context, *, step_idx=None, tap=None, iv=None):
        import os
        from diffusion_models_moe_tpu.models.layers import maybe_barrier
        if (os.environ.get("DMOE_ATTN_ABSORB", "0") not in ("0", "")
                and not self.quant):
            # delegate norm1 + the attn1 residual to the absorbed-attention
            # kernels (ops/attn_absorb_fused.py; _LNParams keeps the param
            # pytree identical to nn.LayerNorm — same pattern as the FF
            # absorb below)
            g1, b1 = _LNParams(name="norm1")(x.shape[-1])
            x = Attention(self.dim, self.heads, dtype=self.dtype,
                          flash=self.flash_attention, quant=self.quant,
                          name="attn1")(x, ln=(g1, b1, 1e-5))
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype,
                             name="norm1")(x).astype(self.dtype)
            x = x + Attention(self.dim, self.heads, dtype=self.dtype,
                              flash=self.flash_attention, quant=self.quant,
                              name="attn1")(maybe_barrier(h,
                                                          "DMOE_LN_BARRIER"))
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, name="norm2")(x).astype(self.dtype)
        x = x + Attention(self.dim, self.heads, context_dim=self.context_dim,
                          dtype=self.dtype, flash=self.flash_attention,
                          quant=self.quant,
                          name="attn2")(maybe_barrier(h, "DMOE_LN_BARRIER"),
                                        context)
        x = maybe_barrier(x, "DMOE_RESID_BARRIER")
        ff = GEGLUFeedForward(self.dim, self.ff_mult, self.ff_activation,
                              ff_index=self.ff_index, dtype=self.dtype,
                              use_fused_routing=self.use_fused_routing,
                              quant=self.quant, name="ff")
        import os
        if (os.environ.get("DMOE_FF_FUSED", "0") == "1"
                and os.environ.get("DMOE_FF_ABSORB", "1") == "1"
                and not self.quant):
            # delegate norm3 + residual to the FF (absorbed into the fused
            # kernel on the hot path — ops/geglu_ff_fused.py ln_scale/ln_bias;
            # _LNParams keeps the param pytree identical to nn.LayerNorm)
            g3, b3 = _LNParams(name="norm3")(x.shape[-1])
            return ff(x, step_idx=step_idx, tap=tap, iv=iv,
                      ln=(g3, b3, 1e-5))
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.norm_dtype, name="norm3")(x).astype(self.dtype)
        h = maybe_barrier(h, "DMOE_LN_BARRIER")
        x = x + ff(h, step_idx=step_idx, tap=tap, iv=iv)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> depth x blocks -> proj_out + residual.

    `depth` > 1 covers SDXL-style stacks (transformer_layers_per_block); each inner
    block owns one GEGLU FF with consecutive global indices starting at ff_index.
    """
    dim: int
    heads: int
    context_dim: int
    ff_index: int
    depth: int = 1
    norm_num_groups: int = 32
    ff_mult: int = 4
    ff_activation: str = "geglu"
    dtype: Any = jnp.float32
    use_fused_routing: bool = True
    flash_attention: bool = True
    norm_dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, context, *, step_idx=None, tap=None, ivs=None):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.norm_dtype, name="norm")(x).astype(self.dtype)
        y = make_dense(self.dim, dtype=self.dtype, quant=self.quant,
                       name="proj_in")(y)
        y = y.reshape(b, h * w, self.dim)
        for d in range(self.depth):
            ff_index = self.ff_index + d
            iv = None
            if ivs is not None and ff_index < len(ivs):
                iv = ivs[ff_index]
            y = BasicTransformerBlock(
                self.dim, self.heads, self.context_dim, ff_index=ff_index,
                ff_mult=self.ff_mult, ff_activation=self.ff_activation,
                dtype=self.dtype, use_fused_routing=self.use_fused_routing,
                flash_attention=self.flash_attention,
                norm_dtype=self.norm_dtype, quant=self.quant,
                name=f"transformer_blocks_{d}",
            )(y, context, step_idx=step_idx, tap=tap, iv=iv)
        y = y.reshape(b, h, w, self.dim)
        y = make_dense(self.dim, dtype=self.dtype, quant=self.quant,
                       name="proj_out")(y)
        return y + residual
