"""diffusers_tpu — a TPU-native diffusion framework (JAX/XLA/Pallas/pjit).

Brand-new implementation with the capability surface of huggingface/diffusers
(reference mounted at /root/reference), re-architected for TPU: pure-functional
models over parameter pytrees, schedulers as scan-able state machines, fused
denoise loops under a single jit, Pallas kernels for the hot attention paths,
and GSPMD sharding for multi-chip scale.

Top-level imports are LAZY (reference `__init__.py:29-120` `_LazyModule`):
symbols resolve on first attribute access, so `import diffusers_tpu` stays
cheap as the model zoo grows.
"""

import sys

from .utils.lazy_module import _LazyModule

__version__ = "0.2.0"

_import_structure = {
    "configuration_utils": ['ConfigMixin', 'FrozenDict', 'register_to_config'],
    "utils": ['BaseOutput', 'logging'],
    "models.attention": ['Attention'],
    "models.autoencoders.autoencoder_kl": ['AutoencoderKL'],
    "models.modeling_utils": ['ModelMixin'],
    "models.text_encoders.clip": ['CLIPTextModel', 'CLIPTextModelWithProjection'],
    "models.text_encoders.t5": ['T5EncoderModel', 'UMT5EncoderModel'],
    "models.transformers.transformer_flux": ['FluxTransformer2DModel'],
    "models.transformers.dit_transformer_2d": ['DiTTransformer2DModel'],
    "models.transformers.transformer_sd3": ['SD3Transformer2DModel'],
    "models.unets.unet_2d": ['UNet2DModel'],
    "models.unets.unet_2d_condition": ['UNet2DConditionModel'],
    "schedulers": ['DDIMScheduler', 'DDPMScheduler', 'DPMSolverMultistepScheduler', 'EulerAncestralDiscreteScheduler', 'EulerDiscreteScheduler', 'FlowMatchEulerDiscreteScheduler', 'HeunDiscreteScheduler', 'KarrasDiffusionSchedulers', 'LCMScheduler', 'LMSDiscreteScheduler', 'PNDMScheduler', 'SchedulerMixin', 'CogVideoXDDIMScheduler', 'CMStochasticIterativeScheduler', 'DDIMInverseScheduler', 'DEISMultistepScheduler', 'DPMSolverSinglestepScheduler', 'EDMEulerScheduler', 'KDPM2DiscreteScheduler', 'TCDScheduler', 'UniPCMultistepScheduler'],
    "pipelines.auto_pipeline": ['AutoPipelineForImage2Image', 'AutoPipelineForInpainting', 'AutoPipelineForText2Image'],
    "pipelines.ddpm.pipeline_ddpm": ['DDPMPipeline'],
    "pipelines.pixart_alpha.pipeline_pixart_alpha": ['PixArtAlphaPipeline', 'PixArtSigmaPipeline'],
    "pipelines.dit.pipeline_dit": ['DiTPipeline'],
    "pipelines.consistency_models.pipeline_consistency_models": ['ConsistencyModelPipeline'],
    "pipelines.flux.pipeline_flux": ['FluxPipeline'],
    "pipelines.flux.pipeline_flux_controlnet": ['FluxControlNetPipeline'],
    "pipelines.pipeline_utils": ['DiffusionPipeline'],
    "pipelines.stable_diffusion.pipeline_stable_diffusion": ['StableDiffusionPipeline'],
    "pipelines.flux.pipeline_flux_img2img": ['FluxImg2ImgPipeline'],
    "pipelines.flux.pipeline_flux_fill": ['FluxFillPipeline'],
    "pipelines.flux.pipeline_flux_kontext": ['FluxKontextPipeline'],
    "pipelines.latent_consistency_models": ['LatentConsistencyModelPipeline'],
    "pipelines.sana": ['SanaPipeline'],
    "pipelines.tcd": ['TCDPipeline'],
    "pipelines.pag.pipeline_pag_sd": ['StableDiffusionPAGPipeline'],
    "pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl": ['StableDiffusionXLPipeline'],
    "pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl_img2img": ['StableDiffusionXLImg2ImgPipeline'],
    "pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl_inpaint": ['StableDiffusionXLInpaintPipeline'],
    "guiders": ['AdaptiveProjectedGuidance', 'ClassifierFreeGuidance', 'ClassifierFreeZeroStarGuidance', 'PerturbedAttentionGuidance', 'SkipLayerGuidance'],
    "image_processor": ['VaeImageProcessor'],
    "models.autoencoders.autoencoder_kl_wan": ['AutoencoderKLWan'],
    "models.autoencoders.autoencoder_tiny": ['AutoencoderTiny'],
    "models.autoencoders.autoencoder_dc": ['AutoencoderDC'],
    "models.autoencoders.vq_model": ['VQModel'],
    "models.transformers.sana_transformer": ['SanaTransformer2DModel'],
    "models.controlnets.controlnet": ['ControlNetModel'],
    "models.controlnets.controlnet_flux": ['FluxControlNetModel', 'FluxMultiControlNetModel'],
    "models.controlnets.controlnet_sd3": ['SD3ControlNetModel', 'SD3MultiControlNetModel'],
    "models.transformers.transformer_wan": ['WanTransformer3DModel'],
    "models.transformers.transformer_hunyuan_video": ['HunyuanVideoTransformer3DModel'],
    "models.autoencoders.autoencoder_kl_hunyuan_video": ['AutoencoderKLHunyuanVideo'],
    "models.text_encoders.llama": ['LlamaModel'],
    "pipelines.hunyuan_video": ['HunyuanVideoPipeline'],
    "pipelines.controlnet.pipeline_controlnet": ['StableDiffusionControlNetPipeline'],
    "pipelines.controlnet.pipeline_controlnet_sd_xl": ['StableDiffusionXLControlNetPipeline'],
    "pipelines.controlnet_sd3.pipeline_stable_diffusion_3_controlnet": ['StableDiffusion3ControlNetPipeline'],
    "pipelines.stable_diffusion.pipeline_stable_diffusion_img2img": ['StableDiffusionImg2ImgPipeline'],
    "pipelines.stable_diffusion.pipeline_stable_diffusion_inpaint": ['StableDiffusionInpaintPipeline'],
    "pipelines.stable_diffusion.pipeline_stable_diffusion_instruct_pix2pix": ['StableDiffusionInstructPix2PixPipeline'],
    "pipelines.stable_diffusion.pipeline_stable_diffusion_upscale": ['StableDiffusionUpscalePipeline'],
    "models.adapter": ['MultiAdapter', 'T2IAdapter'],
    "pipelines.t2i_adapter": ['StableDiffusionAdapterPipeline'],
    "pipelines.stable_diffusion_3.pipeline_stable_diffusion_3": ['StableDiffusion3Pipeline'],
    "pipelines.wan.pipeline_wan": ['WanPipeline'],
    "models.unets.unet_motion_model": ['MotionAdapter', 'UNetMotionModel'],
    "pipelines.animatediff": ['AnimateDiffPipeline'],
    "models.unets.unet_spatio_temporal_condition": ['UNetSpatioTemporalConditionModel'],
    "models.autoencoders.autoencoder_kl_temporal_decoder": ['AutoencoderKLTemporalDecoder'],
    "pipelines.stable_video_diffusion": ['StableVideoDiffusionPipeline'],
    "models.transformers.transformer_mochi": ['MochiTransformer3DModel'],
    "models.autoencoders.autoencoder_kl_mochi": ['AutoencoderKLMochi'],
    "pipelines.mochi": ['MochiPipeline'],
    "models.transformers.auraflow_transformer_2d": ['AuraFlowTransformer2DModel'],
    "pipelines.aura_flow": ['AuraFlowPipeline'],
    "models.transformers.transformer_lumina2": ['Lumina2Transformer2DModel'],
    "pipelines.lumina2": ['Lumina2Pipeline'],
    "models.transformers.transformer_chroma": ['ChromaTransformer2DModel'],
    "pipelines.chroma": ['ChromaPipeline'],
    "models.transformers.hunyuan_transformer_2d": ['HunyuanDiT2DModel'],
    "pipelines.hunyuandit": ['HunyuanDiTPipeline'],
    "models.transformers.transformer_cogview4": ['CogView4Transformer2DModel'],
    "pipelines.cogview4": ['CogView4Pipeline'],
    "models.autoencoders.autoencoder_asym_kl": ['AsymmetricAutoencoderKL'],
    "models.transformers.latte_transformer_3d": ['LatteTransformer3DModel'],
    "pipelines.latte": ['LattePipeline'],
    "models.transformers.transformer_skyreels_v2": ['SkyReelsV2Transformer3DModel'],
    "pipelines.skyreels_v2": ['SkyReelsV2Pipeline'],
    "models.transformers.transformer_qwenimage": ['QwenImageTransformer2DModel'],
    "pipelines.qwenimage": ['QwenImagePipeline'],
    "pipelines.ltx.pipeline_ltx": ['LTXPipeline'],
    "pipelines.cogvideo": ['CogVideoXPipeline'],
    "models.transformers.cogvideox_transformer_3d": ['CogVideoXTransformer3DModel'],
    "models.autoencoders.autoencoder_kl_cogvideox": ['AutoencoderKLCogVideoX'],
    "quantizers": ['Fp8WeightOnlyConfig', 'Int8DynamicActConfig', 'Int8WeightOnlyConfig', 'quantize_params'],
    "video_processor": ['VideoProcessor'],
}

sys.modules[__name__] = _LazyModule(
    __name__,
    globals()["__file__"],
    _import_structure,
    module_spec=__spec__,
    extra_objects={"__version__": __version__},
)
