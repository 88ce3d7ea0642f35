"""Text-to-image Stable Diffusion pipeline as one traced scan.

Architecture inversion vs the reference (SURVEY.md §7): the reference wraps an opaque
diffusers pipeline with stateful forward hooks and implicit (timestep, layer) counters
(reference: neuron_receivers/base_receiver.py:40-77, predictivity.py:25-39). Here the
denoise loop is a pure `lax.scan`; tap statistics come back as `(T, ...)` arrays in a
pytree, and interventions go in as arrays indexed by the scan counter. One jit, zero
host syncs in the loop.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_moe_tpu.config import PipelineConfig
from diffusion_models_moe_tpu.models.clip_text import CLIPTextEncoder
from diffusion_models_moe_tpu.models.unet import UNet2DCondition
from diffusion_models_moe_tpu.models.vae import VAEDecoder
from diffusion_models_moe_tpu.schedulers.ddim import DDIMScheduler
from diffusion_models_moe_tpu.schedulers.euler import EulerDiscreteScheduler
from diffusion_models_moe_tpu.schedulers.lcm import LCMScheduler
from diffusion_models_moe_tpu.schedulers.dpm import DPMSolverScheduler
from diffusion_models_moe_tpu.schedulers.pndm import PNDMScheduler
from diffusion_models_moe_tpu.taps import Interventions, TapSpec

SCHEDULERS = {
    "ddim": DDIMScheduler,
    "pndm": PNDMScheduler,
    "euler": EulerDiscreteScheduler,
    "dpm": DPMSolverScheduler,
    "lcm": LCMScheduler,
}


def flatten_taps(tree: dict) -> dict[str, dict[int, Any]]:
    """Flax 'taps' collection -> {stat_name: {ff_layer_index: array}}.

    Sown leaf names are f"{stat}_{index:02d}" (see models/attention.py); sow wraps
    each value in a 1-tuple.
    """
    out: dict[str, dict[int, Any]] = {}

    def walk(node):
        for key, val in node.items():
            if isinstance(val, dict):
                walk(val)
            else:
                stat, idx = key.rsplit("_", 1)
                arr = val[0] if isinstance(val, (tuple, list)) else val
                out.setdefault(stat, {})[int(idx)] = arr

    walk(tree)
    return out


class StableDiffusionPipeline:
    """Bundles the three Flax modules + a scheduler; all compute paths are pure."""

    def __init__(self, config: PipelineConfig):
        if (config.prediction_type == "v_prediction"
                and config.scheduler not in ("ddim", "dpm")):
            # the v->eps conversion in `denoise` uses the raw carried latent at
            # the CURRENT timestep, which is only correct for single-history
            # x_t-space schedulers. Euler carries sigma-space
            # sqrt(sigma^2+1)*x_t; PNDM's warm-up relabels timesteps and its
            # Adams-Bashforth combination must happen on raw model outputs
            # BEFORE conversion (diffusers converts the combined output once) —
            # both silently diverge, so both are rejected.
            raise ValueError(
                f"prediction_type='v_prediction' supports schedulers "
                f"ddim/dpm, not {config.scheduler!r}")
        if config.scheduler == "lcm" and config.unet.time_cond_proj_dim <= 0:
            # without the guidance embedding an LCM run would silently ignore
            # guidance_scale entirely (no CFG and no embedded guidance)
            raise ValueError(
                "scheduler='lcm' needs unet.time_cond_proj_dim > 0 (the "
                "distilled guidance embedding; reference LCM-SDXL loads it)")
        self.config = config
        self.unet = UNet2DCondition(config.unet)
        self.text_encoder = CLIPTextEncoder(config.text_encoder)
        self.vae_decoder = VAEDecoder(config.vae)
        self.scheduler = SCHEDULERS[config.scheduler].create()
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------ params
    def init_params(self, key: jax.Array) -> dict:
        # One jit for the whole init: eager per-op dispatch is pathologically slow
        # through remote-device tunnels (hundreds of tiny RPCs otherwise).
        cfg = self.config

        @jax.jit
        def init_all(key):
            k1, k2, k3 = jax.random.split(key, 3)
            s = cfg.sample_size
            lat = jnp.zeros((1, s, s, cfg.unet.sample_channels), jnp.float32)
            ids = jnp.zeros((1, cfg.text_encoder.max_length), jnp.int32)
            ctx = jnp.zeros((1, cfg.text_encoder.max_length,
                             cfg.unet.cross_attention_dim), jnp.float32)
            tc = None
            if cfg.unet.time_cond_proj_dim > 0:
                tc = jnp.zeros((1, cfg.unet.time_cond_proj_dim), jnp.float32)
            return {
                "unet": self.unet.init(k1, lat, jnp.zeros((1,), jnp.int32),
                                       ctx, timestep_cond=tc)["params"],
                "text_encoder": self.text_encoder.init(k2, ids)["params"],
                "vae": self.vae_decoder.init(k3, lat)["params"],
            }

        return init_all(key)

    # ------------------------------------------------------------------ text
    def encode_text(self, params, input_ids, tap: Optional[TapSpec] = None,
                    text_ivs: Optional[Interventions] = None):
        if tap is not None and tap.ff_out_colnorm_sq:
            emb, taps = self.text_encoder.apply(
                {"params": params["text_encoder"]}, input_ids,
                tap=tap, ivs=text_ivs, mutable=["taps"])
            return emb, flatten_taps(taps["taps"])
        emb = self.text_encoder.apply({"params": params["text_encoder"]},
                                      input_ids, ivs=text_ivs)
        return emb, None

    # ------------------------------------------------------------------ core
    def denoise(self, params, context, latents, num_steps: int,
                guidance_scale: float, tap: Optional[TapSpec] = None,
                ivs: Optional[Interventions] = None, key=None):
        """Scanned CFG denoise. context: (2B, S, D) with uncond first
        (diffusers convention); latents: (B, h, w, c) ~ N(0,1) pre-scaled.
        Returns (final latents, taps pytree with (T,...) leaves or None)."""
        timesteps, coeffs, state = self._setup_scheduler(
            num_steps, latents.shape, key=key)
        is_lcm = isinstance(self.scheduler, LCMScheduler)
        # LCM embeds the guidance scale as conditioning instead of CFG
        do_cfg = guidance_scale > 1.0 and not is_lcm
        timestep_cond = None
        if is_lcm and self.config.unet.time_cond_proj_dim > 0:
            from diffusion_models_moe_tpu.models.layers import timestep_embedding
            w = jnp.full((latents.shape[0],), (guidance_scale - 1.0) * 1000.0)
            timestep_cond = timestep_embedding(
                w, self.config.unet.time_cond_proj_dim,
                flip_sin_to_cos=False, downscale_freq_shift=1.0)
        collect = tap is not None and any(
            getattr(tap, f.name) for f in tap.__dataclass_fields__.values())
        v_pred = self.config.prediction_type == "v_prediction"
        if v_pred:
            # v -> eps conversion tables (SD2.1-768; eps = sqrt(a)v + sqrt(1-a)x)
            acp = jnp.asarray(self.scheduler.tables.alphas_cumprod,
                              jnp.float32)[timesteps]
            v_sqrt_a, v_sqrt_1ma = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)

        # DeepCache serving mode (config.deep_cache_interval; see
        # models/unet.py deep_feature docstring): the scan carries the deep
        # feature; a lax.cond picks the full forward (refreshing it) on every
        # interval-th step and the shallow forward otherwise. Both branches
        # compile once; at runtime only one executes per step. Step 0 is
        # always full (0 % interval == 0), so the zeros init is never used.
        dc = self.config.deep_cache_interval
        if dc > 0 and tap is not None:
            raise ValueError(
                "deep_cache_interval > 0 does not support taps: shallow "
                "steps skip the deep layers, so the tap pytree structure "
                "would differ between the lax.cond branches")

        def body(carry, i):
            lat, sched_state, deep = carry
            lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            lat_in = self.scheduler.scale_model_input(coeffs, i, lat_in)
            t = timesteps[i]
            if collect:
                eps, tap_tree = self.unet.apply(
                    {"params": params["unet"]}, lat_in, t, context,
                    timestep_cond=timestep_cond, step_idx=i, tap=tap, ivs=ivs,
                    mutable=["taps"])
                ys = flatten_taps(tap_tree.get("taps", {}))
            elif dc > 0:
                def full_step(args):
                    lat_in, _deep = args
                    return self.unet.apply(
                        {"params": params["unet"]}, lat_in, t, context,
                        timestep_cond=timestep_cond, step_idx=i, ivs=ivs,
                        return_deep=True)

                def shallow_step(args):
                    lat_in, deep = args
                    eps = self.unet.apply(
                        {"params": params["unet"]}, lat_in, t, context,
                        timestep_cond=timestep_cond, step_idx=i, ivs=ivs,
                        deep_feature=deep)
                    return eps, deep

                eps, deep = jax.lax.cond(i % dc == 0, full_step, shallow_step,
                                         (lat_in, deep))
                ys = 0
            else:
                eps = self.unet.apply({"params": params["unet"]}, lat_in, t,
                                      context, timestep_cond=timestep_cond,
                                      step_idx=i, ivs=ivs)
                ys = 0
            if do_cfg:
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            if v_pred:
                eps = v_sqrt_a[i] * eps + v_sqrt_1ma[i] * lat
            if tap is not None and tap.save_eps:
                # whole-UNet output capture (reference: base_unet_receiver.py:25-45)
                ys = ys if isinstance(ys, dict) else {}
                ys["eps"] = {0: eps}
            sched_state, lat = self.scheduler.step(sched_state, coeffs, eps, i, lat)
            return (lat, sched_state, deep), ys

        if dc > 0:
            ucfg = self.config.unet
            deep0 = jnp.zeros(
                (context.shape[0], latents.shape[1], latents.shape[2],
                 ucfg.block_out_channels[1]), ucfg.dtype)
        else:
            deep0 = jnp.zeros((), jnp.float32)  # unused carry slot
        (latents, _, _), taps = jax.lax.scan(
            body, (latents, state, deep0), jnp.arange(timesteps.shape[0]))
        return latents, (taps if collect else None)

    def _setup_scheduler(self, num_steps: int, sample_shape, key=None):
        out = self.scheduler.set_timesteps(num_steps)
        timesteps, coeffs, state = out
        if state is None:  # multistep/stochastic schedulers carry state
            if isinstance(self.scheduler, LCMScheduler):
                state = self.scheduler.init_state(sample_shape, key=key)
            else:
                state = self.scheduler.init_state(sample_shape)
        return timesteps, coeffs, state

    # ------------------------------------------------------------------ full
    def generate(self, params, cond_ids, uncond_ids, key, *,
                 num_steps: Optional[int] = None,
                 guidance_scale: Optional[float] = None,
                 tap: Optional[TapSpec] = None,
                 ivs: Optional[Interventions] = None,
                 text_ivs: Optional[Interventions] = None,
                 decode: bool = True,
                 mesh=None,
                 seeds=None):
        """End-to-end generation: ids -> images in [0, 1] (B, 8s, 8s, 3), plus taps.

        Matches the reference flow of `observe_activation` (hooked full pipeline
        call; reference: neuron_receivers/base_receiver.py:40-77) but returns the
        per-(t, l) statistics as stacked arrays.

        With `mesh` (a Mesh containing a 'dp' axis), the prompt batch is sharded
        over 'dp' — data-parallel inference over ICI, the TPU-native replacement
        for the reference's batch<=4 single-GPU eval loop (SURVEY.md §5.8
        inference row). Batch must be divisible by the 'dp' axis size. If the
        mesh also has a 'tp' axis > 1, params shard tensor-parallel (FF hidden +
        attention heads, parallel/mesh.py rules) and XLA GSPMD inserts the ICI
        reduces; otherwise params replicate. Both modes are parity-tested
        against single-device output.

        With `seeds` (a (B,) int array), each sample's initial noise is derived
        from its own seed instead of the shared `key` — a request's output is
        then independent of whatever it was co-batched with (the serving
        engine's determinism contract, serving.py).
        """
        cfg = self.config
        num_steps = num_steps or cfg.num_inference_steps
        g = cfg.guidance_scale if guidance_scale is None else guidance_scale
        if seeds is not None:
            seeds = jnp.asarray(seeds, jnp.uint32)
        if mesh is not None:
            from diffusion_models_moe_tpu.parallel.mesh import (batch_sharding,
                                                                param_shardings,
                                                                replicated)
            cond_ids = jax.device_put(jnp.asarray(cond_ids),
                                      batch_sharding(mesh, cond_ids.ndim))
            uncond_ids = jax.device_put(jnp.asarray(uncond_ids),
                                        batch_sharding(mesh, uncond_ids.ndim))
            rep = replicated(mesh)
            if "tp" in mesh.axis_names and mesh.shape["tp"] > 1:
                # tensor-parallel inference: FF hidden + attention heads shard
                # over 'tp' (parallel/mesh.py rules); XLA GSPMD inserts the
                # reduce over ICI at each out-projection. Composes with 'dp'
                # batch sharding on the ids above.
                params = jax.device_put(params, param_shardings(params, mesh))
            else:
                params = jax.device_put(params, rep)
            key = jax.device_put(key, rep)
            if seeds is not None:
                seeds = jax.device_put(seeds, batch_sharding(mesh, 1))
            if ivs is not None:
                ivs = jax.device_put(ivs, rep)
            if text_ivs is not None:
                text_ivs = jax.device_put(text_ivs, rep)
        fn = self._jitted_generate(num_steps, g, tap, decode,
                                   ivs is not None, text_ivs is not None,
                                   seeds is not None)
        return fn(params, cond_ids, uncond_ids, key, ivs, text_ivs, seeds)

    def _jitted_generate(self, num_steps, guidance_scale, tap, decode,
                         has_ivs, has_text_ivs, has_seeds=False):
        # per-INSTANCE executable cache: a class-level lru_cache would key on
        # self and pin every pipeline object (plus its compiled executables)
        # for the process lifetime
        cache_key = (num_steps, guidance_scale, tap, decode, has_ivs,
                     has_text_ivs, has_seeds)
        cached = self._jit_cache.get(cache_key)
        if cached is not None:
            return cached

        def run(params, cond_ids, uncond_ids, key, ivs, text_ivs, seeds):
            cfg = self.config
            b = cond_ids.shape[0]
            # text taps accumulate over BOTH encode passes: the reference's text
            # hooks fire on the prompt and the negative encode alike, and the
            # concept signal lives in the cond pass (squared column sums are
            # additive across calls; reference: wanda_receiver.py:37-72)
            cond_emb, cond_taps = self.encode_text(params, cond_ids, tap,
                                                   text_ivs)
            uncond_emb, text_taps = self.encode_text(params, uncond_ids, tap,
                                                     text_ivs)
            if cond_taps and text_taps:
                text_taps = jax.tree_util.tree_map(jnp.add, cond_taps,
                                                   text_taps)
            elif cond_taps:
                text_taps = cond_taps
            if isinstance(self.scheduler, LCMScheduler) or guidance_scale <= 1.0:
                # LCM embeds guidance; guidance_scale <= 1.0 disables CFG —
                # either way denoise runs batch-B, so the context must too
                context = cond_emb
            else:
                context = jnp.concatenate([uncond_emb, cond_emb], axis=0)
            s = cfg.sample_size
            if seeds is not None:
                # per-request noise: sample i depends only on seeds[i]
                latents = jax.vmap(
                    lambda sd: jax.random.normal(
                        jax.random.PRNGKey(sd),
                        (s, s, cfg.unet.sample_channels), jnp.float32))(seeds)
            else:
                latents = jax.random.normal(
                    key, (b, s, s, cfg.unet.sample_channels), jnp.float32)
            ins = getattr(self.scheduler, "init_noise_sigma_for", None)
            latents = latents * (ins(num_steps) if ins is not None
                                 else self.scheduler.init_noise_sigma)
            if seeds is not None:
                # per-request LCM noise: each sample's injected noise derives
                # from its own seed, so co-batching can't change its image
                key_lcm = jax.vmap(
                    lambda sd: jax.random.fold_in(jax.random.PRNGKey(sd),
                                                  1))(seeds)
            else:
                key_lcm = jax.random.fold_in(key, 1)
            latents, taps = self.denoise(params, context, latents, num_steps,
                                         guidance_scale, tap, ivs, key=key_lcm)
            if text_taps:
                taps = dict(taps or {}, **text_taps)
            if not decode:
                return latents, taps
            images = self.vae_decoder.apply({"params": params["vae"]}, latents)
            images = jnp.clip(images / 2.0 + 0.5, 0.0, 1.0)
            return images, taps

        # DMOE_XLA_OPTS="k=v;k2=v2" forwards XLA/TPU compiler options to this
        # jit (perf experiments, e.g. xla_tpu_scoped_vmem_limit_kib). Empty
        # (the default) compiles exactly as before.
        import os
        opts_spec = os.environ.get("DMOE_XLA_OPTS", "")
        opts = (dict(kv.split("=", 1) for kv in opts_spec.split(";") if kv)
                or None) if opts_spec else None
        fn = jax.jit(run, compiler_options=opts)
        if len(self._jit_cache) >= 32:
            self._jit_cache.pop(next(iter(self._jit_cache)))
        self._jit_cache[cache_key] = fn
        return fn


@jax.jit
def _to_uint8(images: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(images * 255.0), 0, 255).astype(jnp.uint8)


def to_pil(images: jax.Array):
    """(B, H, W, 3) floats in [0,1] -> list of PIL images.

    The uint8 conversion happens ON DEVICE so the host copy is 4x smaller —
    through this environment's remote tunnel (~25MB/s) that is the difference
    between ~1s and ~4s per eval batch."""
    from PIL import Image
    arr = np.asarray(jax.device_get(_to_uint8(jnp.asarray(images))))
    return [Image.fromarray(a) for a in arr]


def blur_images(images: jax.Array, sigma: float = 7.0) -> jax.Array:
    """Gaussian blur, reproducing the reference's blur-if-nsfw output policy
    (reference: modularity/remove_experts.py:17-22) as an explicit utility."""
    size = int(2 * round(3 * sigma) + 1)
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    k1d = jnp.exp(-0.5 * (x / sigma) ** 2)
    k1d = k1d / jnp.sum(k1d)
    img = jnp.moveaxis(images, -1, 1)  # (B, C, H, W)
    b, c, h, w = img.shape
    flat = img.reshape(b * c, 1, h, w)
    kh = k1d.reshape(1, 1, size, 1)
    kw = k1d.reshape(1, 1, 1, size)
    for k in (kh, kw):
        flat = jax.lax.conv_general_dilated(
            flat, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.moveaxis(flat.reshape(b, c, h, w), 1, -1)


def stitch_side_by_side(images_a, images_b):
    """Horizontally stitched before/after pairs, the reference's removal
    comparison artifact (reference: modularity/remove_experts.py:47-69)."""
    from PIL import Image
    out = []
    for a, b in zip(to_pil(images_a), to_pil(images_b)):
        canvas = Image.new("RGB", (a.width + b.width, a.height))
        canvas.paste(a, (0, 0))
        canvas.paste(b, (a.width, 0))
        out.append(canvas)
    return out
