"""Analytic per-op-class FLOP accounting for the bench workload (ROOFLINE.md).

Counts logical FLOPs (2 per MAC) of one denoise UNet step at SD1.5 geometry,
CFG batch 2*8, 64x64 latents, split by op class — 3x3 convs, 1x1/shortcut
convs, attention projections, self-attention dots (logical AND MXU-padded:
d=40 heads pad to 128 lanes, a hardware requirement — heads cannot share
contraction lanes), cross-attention dots, GEGLU FF dots, time/embedding math.
Cross-checked against XLA's own count (jit(...).lower().compile()
.cost_analysis(): 12.7e12 logical flops for this step — run
`python roofline.py --check` on a beefy host to recompute).

The physical (padded) totals are what a v5e MXU must actually execute; the
roofline in ROOFLINE.md divides them by measured step time to get the MFU
the exact legs run at, and by the 197 TFLOP/s bf16 peak to get speed of
light. Winograd F(2x2,3x3) divides the stride-1 3x3 conv MACs by 2.25.
"""
from __future__ import annotations

import sys

B = 16             # CFG-doubled batch 8
LAT = 64           # latent side
PEAK_BF16 = 197e12  # v5e per-chip bf16 peak FLOP/s
CTX = 77           # text tokens
XDIM = 768         # cross-attention dim


def conv_flops(hw: int, cin: int, cout: int, k: int = 3) -> float:
    return 2.0 * B * hw * hw * k * k * cin * cout


def res_block(hw: int, cin: int, cout: int) -> dict:
    f = {"conv3x3": conv_flops(hw, cin, cout) + conv_flops(hw, cout, cout)}
    f["conv1x1"] = conv_flops(hw, cin, cout, 1) if cin != cout else 0.0
    # time-emb projection 1280->cout per block (2*B*1280*cout) — tiny
    f["embed"] = 2.0 * B * 1280 * cout
    return f


def transformer(hw: int, c: int, pad_d: int = 128) -> dict:
    s = hw * hw
    d = c // 8                      # 8 heads (SD1.x)
    pd = ((d + pad_d - 1) // pad_d) * pad_d
    f = {
        # proj_in/proj_out 1x1 convs + qkv/out projections + cross q/out
        "attn_proj": (2 * conv_flops(hw, c, c, 1)             # proj_in/out
                      + 2.0 * B * s * (4 * c * c)             # self qkv+out
                      + 2.0 * B * s * (2 * c * c)             # cross q+out
                      + 2.0 * B * CTX * (2 * XDIM * c)),      # cross k,v
        "self_dots_logical": 4.0 * B * s * s * c,
        "self_dots_padded": 4.0 * B * s * s * 8 * pd,
        "cross_dots": 4.0 * B * s * CTX * c,
        # GEGLU: in-proj c->8c (two 4c halves), out 4c->c
        "ff": 2.0 * B * s * (c * 8 * c + 4 * c * c),
    }
    return f


def accumulate() -> dict:
    total: dict[str, float] = {}

    def add(f: dict):
        for k, v in f.items():
            total[k] = total.get(k, 0.0) + v

    add({"conv3x3": conv_flops(LAT, 4, 320)})                    # conv_in
    chans = [320, 640, 1280, 1280]
    hw = LAT
    skips = [(320, hw)]
    # down path
    for i, c in enumerate(chans):
        cin = chans[i - 1] if i else 320
        for j in range(2):
            add(res_block(hw, cin if j == 0 else c, c))
            if i < 3:
                add(transformer(hw, c))
            skips.append((c, hw))
        if i < 3:
            add({"conv3x3": conv_flops(hw // 2, c, c)})          # downsample
            hw //= 2
            skips.append((c, hw))
    # mid
    add(res_block(hw, 1280, 1280))
    add(transformer(hw, 1280))
    add(res_block(hw, 1280, 1280))
    # up path
    for i, c in enumerate(reversed(chans)):
        blk = 3 - i
        nxt = chans[blk - 1] if blk else 320
        for j in range(3):
            skip_c, _ = skips.pop()
            cin = (c if j == 0 and i == 0 else
                   (c if j > 0 else chans[min(blk + 1, 3)])) + skip_c
            # simplification: cin = current features + skip channels
            add(res_block(hw, cin, c))
            if blk != 3:
                add(transformer(hw, c))
        if blk:
            hw *= 2
            add({"conv3x3": conv_flops(hw, c, c)})               # upsample
    add({"conv3x3": conv_flops(LAT, 320, 4)})                    # conv_out
    return total


def step_flops() -> tuple[float, float]:
    """(logical, MXU-padded-physical) FLOPs of one denoise step — importable
    (serving_modes_report.py derives per-leg MFU from the physical total)."""
    t = accumulate()
    logical = sum(v for k, v in t.items() if k != "self_dots_padded")
    physical = logical - t["self_dots_logical"] + t["self_dots_padded"]
    return logical, physical


def main(argv) -> int:
    t = accumulate()
    logical, physical = step_flops()
    print(f"UNet step @ CFG batch {B}, {LAT}x{LAT} latents (TFLOPs):")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<20} {v/1e12:7.3f}")
    print(f"  {'TOTAL logical':<20} {logical/1e12:7.3f}   (XLA cost_analysis:"
          " 12.70 — run --check)")
    print(f"  {'TOTAL MXU-padded':<20} {physical/1e12:7.3f}")
    wino = physical - t["conv3x3"] * (1 - 1 / 2.25)
    print(f"  {'padded w/ Winograd':<20} {wino/1e12:7.3f}")
    for name, tf in (("bf16 direct", physical), ("winograd", wino)):
        sol = tf * 50 / PEAK_BF16        # s per 8-image generation at peak
        print(f"  speed-of-light ({name}): {8 / sol:.2f} img/s")
    if "--check" in argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import dataclasses

        import jax.numpy as jnp
        import jax.tree_util as jtu

        from diffusion_models_moe_tpu.config import sd15_config
        from diffusion_models_moe_tpu.models.unet import UNet2DCondition
        cfg = dataclasses.replace(sd15_config(dtype=jnp.bfloat16).unet,
                                  flash_attention=False)
        unet = UNet2DCondition(cfg)
        lat = jnp.zeros((B, LAT, LAT, 4), jnp.bfloat16)
        tt = jnp.zeros((B,), jnp.float32)
        ctx = jnp.zeros((B, CTX, XDIM), jnp.bfloat16)
        p = jtu.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                         jax.eval_shape(lambda k: unet.init(k, lat, tt, ctx),
                                        jax.random.PRNGKey(0)))
        ca = (jax.jit(lambda p, l, t, c: unet.apply(p, l, t, c))
              .lower(p, lat, tt, ctx).compile().cost_analysis())
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(f"  XLA cost_analysis:   {ca['flops']/1e12:7.3f}  "
              f"(delta {(ca['flops']-logical)/logical*100:+.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
