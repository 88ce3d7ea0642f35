"""TPU-native rebuild of `ruchikachavhan/diffusion-models-moe` (see SURVEY.md)."""
from diffusion_models_moe_tpu.config import (PipelineConfig, UNetConfig,
                                             CLIPTextConfig, VAEConfig,
                                             sd15_config, sd21_config, tiny_config)
from diffusion_models_moe_tpu.taps import (TapSpec, LayerIntervention,
                                           Interventions, no_interventions,
                                           routing_mask, patterns_from_labels,
                                           GEGLU_REMOVAL_FILL)
from diffusion_models_moe_tpu.pipelines.stable_diffusion import (
    StableDiffusionPipeline, flatten_taps, to_pil, blur_images)
from diffusion_models_moe_tpu.pipelines.pixart import (
    PixArtPipeline, PixArtPipelineConfig, pixart_512_config,
    tiny_pixart_pipeline_config)
from diffusion_models_moe_tpu.serving import ServingEngine, ServingStats
