"""DiffusionPipeline: component container + orchestration.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/pipelines/pipeline_utils.py:198` DiffusionPipeline,
from_pretrained `:632`, model_index.json parse `:915`, register_modules `:224`,
save_pretrained `:254`). Reads the reference's exact serialized-pipeline layout
(`model_index.json` + per-component subfolders). Components that hold weights
load as ``(module, params)`` pairs; the pipeline stores params per component
so the whole inference graph stays functional.

The denoise loop of every pipeline here compiles to a single `lax.scan` under
jit — zero host sync per step (the reference pays a Python loop iteration +
`xm.mark_step()` per step on XLA; see SURVEY §3.2).
"""

from __future__ import annotations

import importlib
import inspect
import json
import os
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, FrozenDict
from ..loaders.lora import PipelineLoraMixin
from ..utils import logging
from ..version_info import __version__

logger = logging.get_logger(__name__)

PIPELINE_CONFIG_NAME = "model_index.json"

# plan-less components above this size trigger a replication warning under TP
_TP_REPLICATE_WARN_PARAMS = 100_000_000

# Maps (library, class_name) from model_index.json → our loader.
# The reference dispatches through LOADABLE_CLASSES (pipeline_loading_utils.py:86).
_DIFFUSERS_CLASS_REGISTRY: Dict[str, str] = {
    # model/scheduler class name -> import path inside diffusers_tpu
    "UNet2DModel": "diffusers_tpu.models.unets.unet_2d.UNet2DModel",
    "UNet2DConditionModel": "diffusers_tpu.models.unets.unet_2d_condition.UNet2DConditionModel",
    "AutoencoderKL": "diffusers_tpu.models.autoencoders.autoencoder_kl.AutoencoderKL",
    "ConsistencyDecoderVAE": "diffusers_tpu.models.autoencoders.consistency_decoder_vae.ConsistencyDecoderVAE",
    "UNet3DConditionModel": "diffusers_tpu.models.unets.unet_3d_condition.UNet3DConditionModel",
    "I2VGenXLUNet": "diffusers_tpu.models.unets.unet_i2vgen_xl.I2VGenXLUNet",
    "UVit2DModel": "diffusers_tpu.models.unets.uvit_2d.UVit2DModel",
    "QwenImageControlNetModel": "diffusers_tpu.models.controlnets.controlnet_qwenimage.QwenImageControlNetModel",
    "SanaControlNetModel": "diffusers_tpu.models.controlnets.controlnet_sana.SanaControlNetModel",
    "SparseControlNetModel": "diffusers_tpu.models.controlnets.controlnet_sparsectrl.SparseControlNetModel",
    "Transformer2DModel": "diffusers_tpu.models.transformers.transformer_2d.Transformer2DModel",
    "LearnedClassifierFreeSamplingEmbeddings": "diffusers_tpu.pipelines.deprecated.vq_diffusion.pipeline_vq_diffusion.LearnedClassifierFreeSamplingEmbeddings",
    "FluxTransformer2DModel": "diffusers_tpu.models.transformers.transformer_flux.FluxTransformer2DModel",
    "SD3Transformer2DModel": "diffusers_tpu.models.transformers.transformer_sd3.SD3Transformer2DModel",
    "DDPMScheduler": "diffusers_tpu.schedulers.scheduling_ddpm.DDPMScheduler",
    "DDIMScheduler": "diffusers_tpu.schedulers.scheduling_ddim.DDIMScheduler",
    "EulerDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_euler_discrete.EulerDiscreteScheduler",
    "EulerAncestralDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_euler_ancestral_discrete.EulerAncestralDiscreteScheduler",
    "PNDMScheduler": "diffusers_tpu.schedulers.scheduling_pndm.PNDMScheduler",
    "LMSDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_lms_discrete.LMSDiscreteScheduler",
    "DPMSolverMultistepScheduler": "diffusers_tpu.schedulers.scheduling_dpmsolver_multistep.DPMSolverMultistepScheduler",
    "UniPCMultistepScheduler": "diffusers_tpu.schedulers.scheduling_unipc_multistep.UniPCMultistepScheduler",
    "HeunDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_heun_discrete.HeunDiscreteScheduler",
    "FlowMatchEulerDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete.FlowMatchEulerDiscreteScheduler",
    "LCMScheduler": "diffusers_tpu.schedulers.scheduling_lcm.LCMScheduler",
    "TCDScheduler": "diffusers_tpu.schedulers.scheduling_tcd.TCDScheduler",
    "DEISMultistepScheduler": "diffusers_tpu.schedulers.scheduling_deis_multistep.DEISMultistepScheduler",
    "KDPM2DiscreteScheduler": "diffusers_tpu.schedulers.scheduling_k_dpm_2_discrete.KDPM2DiscreteScheduler",
    "DPMSolverSinglestepScheduler": "diffusers_tpu.schedulers.scheduling_dpmsolver_singlestep.DPMSolverSinglestepScheduler",
    "KDPM2AncestralDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_k_dpm_2_ancestral_discrete.KDPM2AncestralDiscreteScheduler",
    "IPNDMScheduler": "diffusers_tpu.schedulers.scheduling_ipndm.IPNDMScheduler",
    "CMStochasticIterativeScheduler": "diffusers_tpu.schedulers.scheduling_consistency_models.CMStochasticIterativeScheduler",
    "EDMDPMSolverMultistepScheduler": "diffusers_tpu.schedulers.scheduling_edm_dpmsolver_multistep.EDMDPMSolverMultistepScheduler",
    "RePaintScheduler": "diffusers_tpu.schedulers.scheduling_repaint.RePaintScheduler",
    "BlockRefinementScheduler": "diffusers_tpu.schedulers.scheduling_block_refinement.BlockRefinementScheduler",
    "DiscreteDDIMScheduler": "diffusers_tpu.schedulers.scheduling_discrete_ddim.DiscreteDDIMScheduler",
    "EntropyBoundScheduler": "diffusers_tpu.schedulers.scheduling_entropy_bound.EntropyBoundScheduler",
    "CogVideoXDDIMScheduler": "diffusers_tpu.schedulers.scheduling_ddim_cogvideox.CogVideoXDDIMScheduler",
    "UnCLIPScheduler": "diffusers_tpu.schedulers.scheduling_unclip.UnCLIPScheduler",
    "SASolverScheduler": "diffusers_tpu.schedulers.scheduling_sasolver.SASolverScheduler",
    "DDIMInverseScheduler": "diffusers_tpu.schedulers.scheduling_ddim_inverse.DDIMInverseScheduler",
    "EDMEulerScheduler": "diffusers_tpu.schedulers.scheduling_edm_euler.EDMEulerScheduler",
    "FlowMatchHeunDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_flow_match_heun_discrete.FlowMatchHeunDiscreteScheduler",
    "SCMScheduler": "diffusers_tpu.schedulers.scheduling_scm.SCMScheduler",
    "DPMSolverSDEScheduler": "diffusers_tpu.schedulers.scheduling_dpmsolver_sde.DPMSolverSDEScheduler",
    "ScoreSdeVeScheduler": "diffusers_tpu.schedulers.scheduling_sde_ve.ScoreSdeVeScheduler",
    "AmusedScheduler": "diffusers_tpu.schedulers.scheduling_amused.AmusedScheduler",
    "CosineDPMSolverMultistepScheduler": "diffusers_tpu.schedulers.scheduling_cosine_dpmsolver_multistep.CosineDPMSolverMultistepScheduler",
    "FlowMatchLCMScheduler": "diffusers_tpu.schedulers.scheduling_flow_match_lcm.FlowMatchLCMScheduler",
    "ConsistencyDecoderScheduler": "diffusers_tpu.schedulers.scheduling_consistency_decoder.ConsistencyDecoderScheduler",
    "SD3Transformer2DModel": "diffusers_tpu.models.transformers.transformer_sd3.SD3Transformer2DModel",
    "WanTransformer3DModel": "diffusers_tpu.models.transformers.transformer_wan.WanTransformer3DModel",
    "AutoencoderKLWan": "diffusers_tpu.models.autoencoders.autoencoder_kl_wan.AutoencoderKLWan",
    "AutoencoderTiny": "diffusers_tpu.models.autoencoders.autoencoder_tiny.AutoencoderTiny",
    "VQModel": "diffusers_tpu.models.autoencoders.vq_model.VQModel",
    "AutoencoderDC": "diffusers_tpu.models.autoencoders.autoencoder_dc.AutoencoderDC",
    "SanaTransformer2DModel": "diffusers_tpu.models.transformers.sana_transformer.SanaTransformer2DModel",
    "ControlNetModel": "diffusers_tpu.models.controlnets.controlnet.ControlNetModel",
    "ControlNetUnionModel": "diffusers_tpu.models.controlnets.controlnet_union.ControlNetUnionModel",
    "PixArtTransformer2DModel": "diffusers_tpu.models.transformers.pixart_transformer_2d.PixArtTransformer2DModel",
    "LTXVideoTransformer3DModel": "diffusers_tpu.models.transformers.transformer_ltx.LTXVideoTransformer3DModel",
    "AutoencoderKLLTXVideo": "diffusers_tpu.models.autoencoders.autoencoder_kl_ltx.AutoencoderKLLTXVideo",
    "UNetMotionModel": "diffusers_tpu.models.unets.unet_motion_model.UNetMotionModel",
    "UNetSpatioTemporalConditionModel": "diffusers_tpu.models.unets.unet_spatio_temporal_condition.UNetSpatioTemporalConditionModel",
    "AutoencoderKLTemporalDecoder": "diffusers_tpu.models.autoencoders.autoencoder_kl_temporal_decoder.AutoencoderKLTemporalDecoder",
    "MochiTransformer3DModel": "diffusers_tpu.models.transformers.transformer_mochi.MochiTransformer3DModel",
    "AutoencoderKLMochi": "diffusers_tpu.models.autoencoders.autoencoder_kl_mochi.AutoencoderKLMochi",
    "StableAudioDiTModel": "diffusers_tpu.models.transformers.stable_audio_transformer.StableAudioDiTModel",
    "AutoencoderOobleck": "diffusers_tpu.models.autoencoders.autoencoder_oobleck.AutoencoderOobleck",
    "StableAudioProjectionModel": "diffusers_tpu.pipelines.stable_audio.modeling_stable_audio.StableAudioProjectionModel",
    "ChatGLMModel": "diffusers_tpu.pipelines.kolors.text_encoder.ChatGLMModel",
    "CogView3PlusTransformer2DModel": "diffusers_tpu.models.transformers.transformer_cogview3plus.CogView3PlusTransformer2DModel",
    "LuminaNextDiT2DModel": "diffusers_tpu.models.transformers.lumina_nextdit2d.LuminaNextDiT2DModel",
    "Kandinsky3UNet": "diffusers_tpu.models.unets.unet_kandinsky3.Kandinsky3UNet",
    "OmniGenTransformer2DModel": "diffusers_tpu.models.transformers.transformer_omnigen.OmniGenTransformer2DModel",
    "StableCascadeUNet": "diffusers_tpu.models.unets.unet_stable_cascade.StableCascadeUNet",
    "PaellaVQModel": "diffusers_tpu.models.autoencoders.paella_vq_model.PaellaVQModel",
    "AllegroTransformer3DModel": "diffusers_tpu.models.transformers.transformer_allegro.AllegroTransformer3DModel",
    "EasyAnimateTransformer3DModel": "diffusers_tpu.models.transformers.transformer_easyanimate.EasyAnimateTransformer3DModel",
    "HiDreamImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_hidream_image.HiDreamImageTransformer2DModel",
    "WanVACETransformer3DModel": "diffusers_tpu.models.transformers.transformer_wan_vace.WanVACETransformer3DModel",
    "SanaVideoTransformer3DModel": "diffusers_tpu.models.transformers.transformer_sana_video.SanaVideoTransformer3DModel",
    "Flux2Transformer2DModel": "diffusers_tpu.models.transformers.transformer_flux2.Flux2Transformer2DModel",
    "BriaTransformer2DModel": "diffusers_tpu.models.transformers.transformer_bria.BriaTransformer2DModel",
    "CosmosTransformer3DModel": "diffusers_tpu.models.transformers.transformer_cosmos.CosmosTransformer3DModel",
    "LDMBertModel": "diffusers_tpu.pipelines.latent_diffusion.pipeline_latent_diffusion.LDMBertModel",
    "AuraFlowTransformer2DModel": "diffusers_tpu.models.transformers.auraflow_transformer_2d.AuraFlowTransformer2DModel",
    "Lumina2Transformer2DModel": "diffusers_tpu.models.transformers.transformer_lumina2.Lumina2Transformer2DModel",
    "ChromaTransformer2DModel": "diffusers_tpu.models.transformers.transformer_chroma.ChromaTransformer2DModel",
    "HunyuanDiT2DModel": "diffusers_tpu.models.transformers.hunyuan_transformer_2d.HunyuanDiT2DModel",
    "CogView4Transformer2DModel": "diffusers_tpu.models.transformers.transformer_cogview4.CogView4Transformer2DModel",
    "AsymmetricAutoencoderKL": "diffusers_tpu.models.autoencoders.autoencoder_asym_kl.AsymmetricAutoencoderKL",
    "LatteTransformer3DModel": "diffusers_tpu.models.transformers.latte_transformer_3d.LatteTransformer3DModel",
    "SkyReelsV2Transformer3DModel": "diffusers_tpu.models.transformers.transformer_skyreels_v2.SkyReelsV2Transformer3DModel",
    "QwenImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_qwenimage.QwenImageTransformer2DModel",
    "PriorTransformer": "diffusers_tpu.models.transformers.prior_transformer.PriorTransformer",
    "MotionAdapter": "diffusers_tpu.models.unets.unet_motion_model.MotionAdapter",
    "AutoencoderKLQwenImage": "diffusers_tpu.models.autoencoders.autoencoder_kl_qwenimage.AutoencoderKLQwenImage",
    "AutoencoderKLFlux2": "diffusers_tpu.models.autoencoders.autoencoder_kl_flux2.AutoencoderKLFlux2",
    "AutoencoderKLMagvit": "diffusers_tpu.models.autoencoders.autoencoder_kl_magvit.AutoencoderKLMagvit",
    "AutoencoderKLAllegro": "diffusers_tpu.models.autoencoders.autoencoder_kl_allegro.AutoencoderKLAllegro",
    "AutoencoderKLCosmos": "diffusers_tpu.models.autoencoders.autoencoder_kl_cosmos.AutoencoderKLCosmos",
    "LTX2VideoTransformer3DModel": "diffusers_tpu.models.transformers.transformer_ltx2.LTX2VideoTransformer3DModel",
    "AutoencoderKLLTX2Video": "diffusers_tpu.models.autoencoders.autoencoder_kl_ltx2.AutoencoderKLLTX2Video",
    "AutoencoderKLLTX2Audio": "diffusers_tpu.models.autoencoders.autoencoder_kl_ltx2_audio.AutoencoderKLLTX2Audio",
    "LTX2TextConnectors": "diffusers_tpu.pipelines.ltx2.connectors.LTX2TextConnectors",
    "Kandinsky5Transformer3DModel": "diffusers_tpu.models.transformers.transformer_kandinsky.Kandinsky5Transformer3DModel",
    "ZImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_z_image.ZImageTransformer2DModel",
    "ZImageControlNetModel": "diffusers_tpu.models.controlnets.controlnet_z_image.ZImageControlNetModel",
    "HunyuanImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_hunyuanimage.HunyuanImageTransformer2DModel",
    "AutoencoderKLHunyuanImage": "diffusers_tpu.models.autoencoders.autoencoder_kl_hunyuanimage.AutoencoderKLHunyuanImage",
    "AdaptiveProjectedMixGuidance": "diffusers_tpu.guiders.adaptive_projected_guidance_mix.AdaptiveProjectedMixGuidance",
    "ShapERenderer": "diffusers_tpu.pipelines.shap_e.renderer.ShapERenderer",
    "PRXTransformer2DModel": "diffusers_tpu.models.transformers.transformer_prx.PRXTransformer2DModel",
    "ChronoEditTransformer3DModel": "diffusers_tpu.models.transformers.transformer_chronoedit.ChronoEditTransformer3DModel",
    "LongCatImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_longcat_image.LongCatImageTransformer2DModel",
    "Krea2Transformer2DModel": "diffusers_tpu.models.transformers.transformer_krea2.Krea2Transformer2DModel",
    "LongCatAudioDiTTransformer": "diffusers_tpu.models.transformers.transformer_longcat_audio_dit.LongCatAudioDiTTransformer",
    "LongCatAudioDiTVae": "diffusers_tpu.models.autoencoders.autoencoder_longcat_audio_dit.LongCatAudioDiTVae",
    "ErnieImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_ernie_image.ErnieImageTransformer2DModel",
    "DiffusionGemmaDenoiser": "diffusers_tpu.pipelines.diffusion_gemma.pipeline_diffusion_gemma.DiffusionGemmaDenoiser",
    "LLaDA2Denoiser": "diffusers_tpu.pipelines.llada2.pipeline_llada2.LLaDA2Denoiser",
    "NucleusMoEImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_nucleusmoe_image.NucleusMoEImageTransformer2DModel",
    "OvisImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_ovis_image.OvisImageTransformer2DModel",
    "Ideogram4Transformer2DModel": "diffusers_tpu.models.transformers.transformer_ideogram4.Ideogram4Transformer2DModel",
    "HunyuanDiT2DControlNetModel": "diffusers_tpu.models.controlnets.controlnet_hunyuan.HunyuanDiT2DControlNetModel",
    "DreamLiteUNetModel": "diffusers_tpu.models.unets.unet_dreamlite.DreamLiteUNetModel",
    "ConsisIDTransformer3DModel": "diffusers_tpu.models.transformers.consisid_transformer_3d.ConsisIDTransformer3DModel",
    "CogVideoXDPMScheduler": "diffusers_tpu.schedulers.scheduling_dpm_cogvideox.CogVideoXDPMScheduler",
    "AnyFlowTransformer3DModel": "diffusers_tpu.models.transformers.transformer_anyflow.AnyFlowTransformer3DModel",
    "FlowMapEulerDiscreteScheduler": "diffusers_tpu.schedulers.scheduling_flow_map_euler_discrete.FlowMapEulerDiscreteScheduler",
    "MotifVideoTransformer3DModel": "diffusers_tpu.models.transformers.transformer_motif_video.MotifVideoTransformer3DModel",
    "JoyImageEditTransformer3DModel": "diffusers_tpu.models.transformers.transformer_joyimage.JoyImageEditTransformer3DModel",
    "BriaFiboTransformer2DModel": "diffusers_tpu.models.transformers.transformer_bria_fibo.BriaFiboTransformer2DModel",
    "AudioLDM2ProjectionModel": "diffusers_tpu.pipelines.audioldm2.modeling_audioldm2.AudioLDM2ProjectionModel",
    "AudioLDM2UNet2DConditionModel": "diffusers_tpu.pipelines.audioldm2.modeling_audioldm2.AudioLDM2UNet2DConditionModel",
    "GlmImageTransformer2DModel": "diffusers_tpu.models.transformers.transformer_glm_image.GlmImageTransformer2DModel",
    "HeliosTransformer3DModel": "diffusers_tpu.models.transformers.transformer_helios.HeliosTransformer3DModel",
    "KarrasVeScheduler": "diffusers_tpu.schedulers.deprecated.scheduling_karras_ve.KarrasVeScheduler",
    "ScoreSdeVpScheduler": "diffusers_tpu.schedulers.deprecated.scheduling_sde_vp.ScoreSdeVpScheduler",
    "LTXEulerAncestralRFScheduler": "diffusers_tpu.schedulers.scheduling_ltx_euler_ancestral_rf.LTXEulerAncestralRFScheduler",
    "MiniMaxH3Scheduler": "diffusers_tpu.schedulers.scheduling_minimax_h3.MiniMaxH3Scheduler",
    "MiniMaxH3Transformer3DModel": "diffusers_tpu.models.transformers.transformer_minimax_h3.MiniMaxH3Transformer3DModel",
    "AutoencoderKLMiniMaxH3": "diffusers_tpu.models.autoencoders.autoencoder_kl_minimax_h3.AutoencoderKLMiniMaxH3",
    "AutoencoderKLMiniMaxH3Audio": "diffusers_tpu.models.autoencoders.autoencoder_kl_minimax_h3_audio.AutoencoderKLMiniMaxH3Audio",
    "VQDiffusionScheduler": "diffusers_tpu.schedulers.scheduling_vq_diffusion.VQDiffusionScheduler",
    "DPMSolverMultistepInverseScheduler": "diffusers_tpu.schedulers.scheduling_dpmsolver_multistep_inverse.DPMSolverMultistepInverseScheduler",
    "HeliosScheduler": "diffusers_tpu.schedulers.scheduling_helios.HeliosScheduler",
    "HeliosDMDScheduler": "diffusers_tpu.schedulers.scheduling_helios_dmd.HeliosDMDScheduler",
    "HunyuanVideo15Transformer3DModel": "diffusers_tpu.models.transformers.transformer_hunyuan_video15.HunyuanVideo15Transformer3DModel",
    "AutoencoderKLHunyuanVideo15": "diffusers_tpu.models.autoencoders.autoencoder_kl_hunyuanvideo15.AutoencoderKLHunyuanVideo15",
    "AceStepTransformer1DModel": "diffusers_tpu.models.transformers.transformer_ace_step.AceStepTransformer1DModel",
    "CogVideoXTransformer3DModel": "diffusers_tpu.models.transformers.cogvideox_transformer_3d.CogVideoXTransformer3DModel",
    "AutoencoderKLCogVideoX": "diffusers_tpu.models.autoencoders.autoencoder_kl_cogvideox.AutoencoderKLCogVideoX",
    "AceStepConditionEncoder": "diffusers_tpu.pipelines.ace_step.modeling_ace_step.AceStepConditionEncoder",
    "AceStepAudioTokenizer": "diffusers_tpu.pipelines.ace_step.modeling_ace_step.AceStepAudioTokenizer",
    "AceStepAudioTokenDetokenizer": "diffusers_tpu.pipelines.ace_step.modeling_ace_step.AceStepAudioTokenDetokenizer",
    "AceStepLyricEncoder": "diffusers_tpu.pipelines.ace_step.modeling_ace_step.AceStepLyricEncoder",
    "AceStepTimbreEncoder": "diffusers_tpu.pipelines.ace_step.modeling_ace_step.AceStepTimbreEncoder",
    "ClassifierFreeGuidance": "diffusers_tpu.guiders.classifier_free_guidance.ClassifierFreeGuidance",
    "HunyuanVideoTransformer3DModel": "diffusers_tpu.models.transformers.transformer_hunyuan_video.HunyuanVideoTransformer3DModel",
    "AutoencoderKLHunyuanVideo": "diffusers_tpu.models.autoencoders.autoencoder_kl_hunyuan_video.AutoencoderKLHunyuanVideo",
    "LTX2Vocoder": "diffusers_tpu.pipelines.ltx2.vocoder.LTX2Vocoder",
    "LTX2VocoderWithBWE": "diffusers_tpu.pipelines.ltx2.vocoder.LTX2VocoderWithBWE",
}

_TRANSFORMERS_CLASS_REGISTRY: Dict[str, str] = {
    "CLIPTextModel": "diffusers_tpu.models.text_encoders.clip.CLIPTextModel",
    "CLIPTextModelWithProjection": "diffusers_tpu.models.text_encoders.clip.CLIPTextModelWithProjection",
    "CLIPVisionModel": "diffusers_tpu.models.text_encoders.clip.CLIPVisionModel",
    "CLIPVisionModelWithProjection": "diffusers_tpu.models.text_encoders.clip.CLIPVisionModelWithProjection",
    "SiglipVisionModel": "diffusers_tpu.models.text_encoders.siglip.SiglipVisionModel",
    "HunyuanVideoFramepackTransformer3DModel": "diffusers_tpu.models.transformers.transformer_hunyuan_video_framepack.HunyuanVideoFramepackTransformer3DModel",
    "T5EncoderModel": "diffusers_tpu.models.text_encoders.t5.T5EncoderModel",
    "UMT5EncoderModel": "diffusers_tpu.models.text_encoders.t5.UMT5EncoderModel",
    "Gemma2Model": "diffusers_tpu.models.text_encoders.gemma.Gemma2Model",
    "Gemma2ForCausalLM": "diffusers_tpu.models.text_encoders.gemma.Gemma2Model",
    "Qwen2_5_VLForConditionalGeneration": "diffusers_tpu.models.text_encoders.qwen2_vl.Qwen2_5_VLTextEncoder",
    "Qwen2VLForConditionalGeneration": "diffusers_tpu.models.text_encoders.qwen2_vl.Qwen2_5_VLTextEncoder",
    "Mistral3ForConditionalGeneration": "diffusers_tpu.models.text_encoders.llama.LlamaModel",
    "LlamaModel": "diffusers_tpu.models.text_encoders.llama.LlamaModel",
    "Qwen3Model": "diffusers_tpu.models.text_encoders.llama.LlamaModel",
    "T5GemmaEncoderModel": "diffusers_tpu.models.text_encoders.gemma.T5GemmaEncoderModel",
    "Qwen3ForCausalLM": "diffusers_tpu.models.text_encoders.llama.LlamaModel",
    "Qwen3VLModel": "diffusers_tpu.models.text_encoders.llama.LlamaModel",
    "Qwen3VLForConditionalGeneration": "diffusers_tpu.models.text_encoders.llama.LlamaModel",
    "Gemma3ForConditionalGeneration": "diffusers_tpu.models.text_encoders.gemma.Gemma3ForConditionalGeneration",
    "Gemma3TextModel": "diffusers_tpu.models.text_encoders.gemma.Gemma3TextModel",
    "MultilingualCLIP": "diffusers_tpu.models.text_encoders.xlm_roberta.MultilingualCLIP",
    "XLMRobertaModel": "diffusers_tpu.models.text_encoders.xlm_roberta.MultilingualCLIP",
    "ClapModel": "diffusers_tpu.models.text_encoders.clap.ClapTextModelWithProjection",
    "ClapTextModelWithProjection": "diffusers_tpu.models.text_encoders.clap.ClapTextModelWithProjection",
    "GPT2Model": "diffusers_tpu.models.text_encoders.gpt2.GPT2Model",
    "GPT2LMHeadModel": "diffusers_tpu.models.text_encoders.gpt2.GPT2Model",
    "SpeechT5HifiGan": "diffusers_tpu.pipelines.audioldm2.vocoder.SpeechT5HifiGan",
}

# loaded via transformers' own from_pretrained (pure-host preprocessing)
_TOKENIZER_CLASSES = {
    "CLIPTokenizer", "CLIPTokenizerFast", "T5Tokenizer", "T5TokenizerFast", "AutoTokenizer",
    "GemmaTokenizer", "GemmaTokenizerFast", "Qwen2Tokenizer", "Qwen2TokenizerFast",
    "CLIPImageProcessor", "CLIPFeatureExtractor", "Gemma3Processor", "Qwen2VLProcessor",
    "ByT5Tokenizer", "XLMRobertaTokenizer", "XLMRobertaTokenizerFast",
}


def _import_class(path: str):
    module_name, cls_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), cls_name)


def resolve_component_class(library: str, class_name: str):
    """Map a model_index.json (library, class) entry to our implementation."""
    if class_name in _DIFFUSERS_CLASS_REGISTRY:
        return _import_class(_DIFFUSERS_CLASS_REGISTRY[class_name]), "diffusers_tpu"
    if class_name in _TRANSFORMERS_CLASS_REGISTRY:
        return _import_class(_TRANSFORMERS_CLASS_REGISTRY[class_name]), "diffusers_tpu"
    if class_name in _TOKENIZER_CLASSES:
        import transformers

        return getattr(transformers, class_name), "tokenizer"
    raise ValueError(f"No TPU-native implementation registered for component class {class_name!r} ({library})")


class DiffusionPipeline(ConfigMixin, PipelineLoraMixin):
    """Base pipeline. Subclasses declare components via `register_modules` in
    __init__ and implement `__call__`."""

    config_name = PIPELINE_CONFIG_NAME
    _optional_components: list = []

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            if module is None:
                register_dict = {name: (None, None)}
            else:
                obj = module[0] if isinstance(module, tuple) else module
                library = "diffusers_tpu"
                cls_name = obj.__class__.__name__
                if cls_name.endswith("Tokenizer") or cls_name.endswith("TokenizerFast"):
                    library = "transformers"
                register_dict = {name: (library, cls_name)}
            self.register_to_config(**register_dict)
            setattr(self, name, module)

    @property
    def components(self) -> Dict[str, Any]:
        return {k: getattr(self, k) for k in self.config.keys() if not k.startswith("_")}

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: Union[str, os.PathLike],
        dtype=None,
        variant: Optional[str] = None,
        quantization_config=None,
        mesh=None,
        custom_pipeline: Optional[str] = None,
        trust_remote_code: bool = False,
        **kwargs,
    ):
        """`quantization_config` may be a `PipelineQuantizationConfig` (maps
        component name → quant config, reference `pipe_quant_config.py:34`)
        or a single model-level config applied to every weight-bearing
        component.

        `mesh` streams every weighted component's leaves straight onto the
        given `jax.sharding.Mesh` with its registered TP plan (replicated when
        none) — sharded inference WITHOUT single-device staging (contrast
        `enable_parallelism`, which re-shards already-loaded params).

        `custom_pipeline` loads the pipeline class from custom code — a .py
        file, a folder containing pipeline.py, or the name of a .py inside
        the checkpoint folder — gated by `trust_remote_code=True` (reference
        `pipeline_loading_utils.py:496` + `dynamic_modules_utils.py:460`)."""
        from ..utils.hub_utils import snapshot_download_repo

        root = str(pretrained_model_name_or_path)
        if root.endswith(".dduf") and os.path.isfile(root):
            from ..utils.dduf import extract_dduf

            root = extract_dduf(root)
        elif not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)

        if custom_pipeline is not None:
            from ..utils.dynamic_modules_utils import get_class_from_dynamic_module

            if os.path.isdir(custom_pipeline) or custom_pipeline.endswith(".py"):
                location, module_file = custom_pipeline, "pipeline.py"
            else:  # a module name inside the checkpoint folder
                location, module_file = root, f"{custom_pipeline.removesuffix('.py')}.py"
            target = get_class_from_dynamic_module(
                location, module_file=module_file, trust_remote_code=trust_remote_code,
                base_class=DiffusionPipeline,
            )
            return target.from_pretrained(
                root, dtype=dtype, variant=variant,
                quantization_config=quantization_config, mesh=mesh, **kwargs,
            )

        expected = set(inspect.signature(cls.__init__).parameters.keys()) - {"self"}
        # components passed directly override loading (reference
        # pipeline_utils.py:632 `passed_class_obj` semantics)
        passed_components = {k: kwargs.pop(k) for k in list(kwargs) if k in expected}

        with open(os.path.join(root, PIPELINE_CONFIG_NAME)) as f:
            config_dict = json.load(f)

        init_kwargs = dict(passed_components)
        for name, value in config_dict.items():
            if name.startswith("_") or name not in expected or name in init_kwargs:
                continue
            if not isinstance(value, (list, tuple)) or len(value) != 2:
                init_kwargs[name] = value  # plain config flag (e.g. requires_safety_checker)
                continue
            if value[0] is None:
                init_kwargs[name] = None
                continue
            library, class_name = value
            component_path = os.path.join(root, name)
            component_cls, kind = resolve_component_class(library, class_name)
            if kind == "tokenizer":
                init_kwargs[name] = component_cls.from_pretrained(component_path)
            elif hasattr(component_cls, "from_pretrained") and hasattr(component_cls, "init_params"):
                component_quant = None
                if quantization_config is not None:
                    from ..quantizers.auto import PipelineQuantizationConfig

                    if isinstance(quantization_config, PipelineQuantizationConfig):
                        component_quant = quantization_config.config_for(name)
                    else:
                        component_quant = quantization_config
                model, params = component_cls.from_pretrained(
                    root, subfolder=name, dtype=dtype, variant=variant,
                    quantization_config=component_quant, mesh=mesh,
                )
                init_kwargs[name] = (model, params)
            else:  # config-only components (schedulers, guiders)
                init_kwargs[name] = component_cls.from_pretrained(component_path)

        # any expected components not in config (e.g. optional) default to None
        for name in expected - set(init_kwargs):
            if name in cls._optional_components:
                init_kwargs[name] = None

        pipe = cls(**init_kwargs)
        if mesh is not None:
            # activate the ambient ParallelEnv so traced calls pick up the
            # mesh (CP routing, sharded jit) — weights are already placed
            from ..parallel.env import ParallelEnv
            from ..parallel.mesh import ParallelConfig

            shape = dict(zip(mesh.axis_names, mesh.devices.shape))
            config = ParallelConfig(
                data_degree=shape.get("data", 1),
                tensor_degree=shape.get("tensor", 1),
                sequence_degree=shape.get("sequence", 1),
            )
            pipe._parallel_env = ParallelEnv(mesh=mesh, config=config, cp_backend=None)
        return pipe

    @classmethod
    def from_pipe(cls, pipeline: "DiffusionPipeline", **overrides):
        """Re-bind an existing pipeline's components into a sibling task
        pipeline with zero extra memory (reference `pipeline_utils.py:2122`
        from_pipe): components are shared by reference; `overrides` replaces
        or adds components by name."""
        expected = set(inspect.signature(cls.__init__).parameters.keys()) - {"self"}
        kwargs = {}
        for name in expected:
            if name in overrides:
                kwargs[name] = overrides.pop(name)
                continue
            comp = getattr(pipeline, name, None)
            if comp is not None:
                kwargs[name] = comp
            elif name in pipeline.config and not isinstance(pipeline.config[name], (list, tuple)):
                kwargs[name] = pipeline.config[name]  # plain config flag
            elif name in cls._optional_components:
                kwargs[name] = None
        if overrides:
            raise ValueError(f"from_pipe got components {list(overrides)} not accepted by {cls.__name__}")
        return cls(**kwargs)

    def save_pretrained(self, save_directory: Union[str, os.PathLike], **kwargs):
        os.makedirs(save_directory, exist_ok=True)
        config = dict(self.config)
        for name in list(config.keys()):
            if name.startswith("_"):
                continue
            component = getattr(self, name, None)
            if component is None:
                continue
            sub_dir = os.path.join(save_directory, name)
            if isinstance(component, tuple):  # (model, params)
                model, params = component
                model.save_pretrained(sub_dir, params)
            elif hasattr(component, "save_pretrained"):
                component.save_pretrained(sub_dir)
        config["_class_name"] = self.__class__.__name__
        config["_diffusers_version"] = __version__
        with open(os.path.join(save_directory, PIPELINE_CONFIG_NAME), "w") as f:
            json.dump({k: list(v) if isinstance(v, tuple) else v for k, v in config.items()}, f, indent=2)
        logger.info(f"Pipeline saved to {save_directory}")

    # ------------------------------------------------------------ parallelism
    def enable_parallelism(self, config=None, mesh=None, cp_backend: Optional[str] = None):
        """Shard this pipeline's weights over a device mesh for sharded inference.

        TPU-native analogue of the reference's
        ``ModelMixin.enable_parallelism`` (`modeling_utils.py:1601`) +
        ``apply_context_parallel`` (`hooks/context_parallel.py:80`): components
        with a registered TP plan (parallel/plans.py) get their params sharded
        per-leaf by PartitionSpec; all other weighted components are replicated
        onto the mesh; and during every traced call attention dispatch
        auto-routes self-attention through the ring/ulysses sequence-parallel
        backends when ``sequence_degree > 1``.

        Args:
            config: ParallelConfig with data/tensor/sequence degrees (defaults
                to all devices on the data axis).
            mesh: pre-built jax.sharding.Mesh (overrides config-based creation).
            cp_backend: force "ring" or "ulysses" (default: auto per call).
        Returns the active mesh.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.env import ParallelEnv
        from ..parallel.mesh import DEFAULT_AXES, ParallelConfig, create_mesh
        from ..parallel.plans import MODEL_TP_PLANS, shard_params

        if mesh is None:
            mesh = create_mesh(config)
        if config is None:
            shape = dict(zip(mesh.axis_names, mesh.devices.shape))
            config = ParallelConfig(
                data_degree=shape.get("data", 1),
                tensor_degree=shape.get("tensor", 1),
                sequence_degree=shape.get("sequence", 1),
            )
        env = ParallelEnv(mesh=mesh, config=config, cp_backend=cp_backend)
        replicated = NamedSharding(mesh, PartitionSpec())
        for name in list(self.config.keys()):
            if name.startswith("_"):
                continue
            comp = getattr(self, name, None)
            if not (isinstance(comp, tuple) and len(comp) == 2):
                continue
            model, params = comp
            if params is None or not isinstance(params, dict):
                continue
            plan = MODEL_TP_PLANS.get(type(model).__name__)
            if plan is not None:
                params = shard_params(mesh, params, plan)
            else:
                if config.tensor_degree > 1:
                    n_params = sum(
                        int(np.prod(x.shape)) for x in jax.tree.leaves(params) if hasattr(x, "shape")
                    )
                    if n_params > _TP_REPLICATE_WARN_PARAMS:
                        logger.warning(
                            f"enable_parallelism: component '{name}' ({type(model).__name__}, "
                            f"{n_params/1e9:.2f}B params) has no TP plan and will be fully "
                            f"REPLICATED on every device — at scale this is an OOM, not "
                            f"parallelism. Register a plan in parallel/plans.py."
                        )
                params = jax.tree.map(lambda x: jax.device_put(x, replicated), params)
            setattr(self, name, (model, params))
        self._parallel_env = env
        self.clear_jit_cache()
        return mesh

    def disable_parallelism(self):
        """Clear the parallel env; weights stay where they are until reloaded."""
        self._parallel_env = None
        self.clear_jit_cache()

    # ---------------------------------------------------------------- FreeU
    def enable_freeu(self, s1: float, s2: float, b1: float, b2: float):
        """FreeU on the UNet's up blocks (reference StableDiffusionMixin.
        enable_freeu, pipeline_utils.py:2288). SD1.5 suggested: s1=0.9,
        s2=0.2, b1=1.2, b2=1.4; SDXL: s1=0.6, s2=0.4, b1=1.1, b2=1.2."""
        unet = getattr(self, "unet", None)
        if unet is None or not hasattr(unet[0], "enable_freeu"):
            raise AttributeError(f"{self.__class__.__name__} has no FreeU-capable unet")
        unet[0].enable_freeu(s1, s2, b1, b2)
        self.clear_jit_cache()

    def disable_freeu(self):
        unet = getattr(self, "unet", None)
        if unet is not None and hasattr(unet[0], "disable_freeu"):
            unet[0].disable_freeu()
        self.clear_jit_cache()

    # ---------------------------------------------------------------- caches
    # cache-config class names this pipeline's denoise loop honors; pipelines
    # using hooks.generic_cache.denoise_scan get the model-agnostic trio.
    _supported_cache_configs: tuple = ()

    def enable_cache(self, config):
        """Enable a timestep cache for the denoise loop (CacheMixin analogue,
        reference `models/cache_utils.py:23` enable_cache). `config` is one of
        the frozen configs from `diffusers_tpu.hooks` (FirstBlockCacheConfig,
        TaylorSeerCacheConfig, FasterCacheConfig, PyramidAttentionBroadcastConfig,
        MagCacheConfig, TextKVCacheConfig); pipelines consult it when tracing
        their scanned denoise loops.

        Raises TypeError when this pipeline's denoise loop does not honor the
        given config (VERDICT r2 #5: silently no-oping is worse than failing)."""
        name = type(config).__name__
        if name not in self._supported_cache_configs:
            raise TypeError(
                f"{type(self).__name__} does not support cache config {name}; "
                f"supported here: {list(self._supported_cache_configs) or 'none'}"
            )
        self._cache_config = config
        self.clear_jit_cache()

    def disable_cache(self):
        self._cache_config = None
        self.clear_jit_cache()

    # ------------------------------------------------------------- callbacks
    # Set while a callback-bearing denoise runs; hooks.generic_cache.denoise_scan
    # consults it (via its `pipe` arg) to switch from the fused lax.scan to a
    # per-step loop that fires `callback_on_step_end` (reference semantics:
    # every pipeline honors the argument, `pipelines/flux/pipeline_flux.py:938`).
    _active_callback = None

    def _denoise_entry(self, name: str, fn, callback=None, cb_extras=None, *,
                       static: tuple = (), **jit_kwargs):
        """Return the denoise callable: jitted via :meth:`_jit` when no
        callback is given (the fused-scan fast path), or an eager wrapper that
        exposes ``callback`` to ``denoise_scan(pipe=self)`` so the loop runs
        one jitted step per iteration and fires the callback between steps.

        The generic tier supports callbacks that observe/replace ``latents``
        (+ read-only extras); pipelines with tensor-mutation support (CFG
        cutoff swapping prompt_embeds) keep their explicit
        `denoise_loop_with_callback` paths (SD/SDXL/Flux/Wan).
        """
        if callback is None:
            return self._jit(name, fn, static=static, **jit_kwargs)

        def run(*args, **kwargs):
            self._active_callback = (callback, dict(cb_extras or {}))
            try:
                return fn(*args, **kwargs)
            finally:
                self._active_callback = None

        return run

    # ---------------------------------------------------------------- jit cache
    def _jit(self, name: str, fn=None, *, static: tuple = (), **jit_kwargs):
        """Per-instance cache of jitted callables.

        ``jax.jit(self._denoise)`` inside ``__call__`` builds a fresh wrapper
        — and therefore a fresh trace cache — on every invocation, so a user
        calling a pipeline twice pays full retrace + compile twice. Caching
        the wrapper on the instance keyed by ``(name, static)`` lets repeat
        calls hit jit's own signature cache; ``static`` must carry any Python
        value the traced closure bakes in (guidance flags, step counts, ...).

        Mutating trace-time module attributes (IP-Adapter scale, PAG identity
        flags, fused LoRA swaps) must call :meth:`clear_jit_cache`.
        """
        cache = self.__dict__.setdefault("_jit_cache", {})
        env = getattr(self, "_parallel_env", None)
        key = (name, static, id(env) if env is not None else None, getattr(self, "_cache_config", None))
        wrapped = cache.get(key)
        if wrapped is None:
            inner = jax.jit(fn if fn is not None else getattr(self, name), **jit_kwargs)
            if env is None:
                wrapped = inner
            else:
                # activate the ambient ParallelEnv for the trace (attention
                # dispatch reads it to route ring/ulysses inside shard_map)
                from ..parallel.env import parallel_env

                def wrapped(*args, __inner=inner, __env=env, **kwargs):
                    with parallel_env(__env):
                        return __inner(*args, **kwargs)

            cache[key] = wrapped
        return wrapped

    def clear_jit_cache(self):
        """Drop cached jitted callables (call after trace-time mutations)."""
        self.__dict__.pop("_jit_cache", None)

    def progress_bar(self, iterable=None, total=None):
        try:
            from tqdm.auto import tqdm

            return tqdm(iterable, total=total)
        except Exception:
            return iterable
