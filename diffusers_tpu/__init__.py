"""diffusers_tpu — a TPU-native diffusion framework (JAX/XLA/Pallas/pjit).

Brand-new implementation with the capability surface of huggingface/diffusers
(reference mounted at /root/reference), re-architected for TPU: pure-functional
models over parameter pytrees, schedulers as scan-able state machines, fused
denoise loops under a single jit, Pallas kernels for the hot attention paths,
and GSPMD sharding for multi-chip scale.
"""

__version__ = "0.1.0"

from .configuration_utils import ConfigMixin, FrozenDict, register_to_config
from .utils import BaseOutput, logging

# models
from .models.attention import Attention
from .models.autoencoders.autoencoder_kl import AutoencoderKL
from .models.modeling_utils import ModelMixin
from .models.text_encoders.clip import CLIPTextModel, CLIPTextModelWithProjection
from .models.text_encoders.t5 import T5EncoderModel
from .models.transformers.transformer_flux import FluxTransformer2DModel
from .models.transformers.dit_transformer_2d import DiTTransformer2DModel
from .models.transformers.transformer_sd3 import SD3Transformer2DModel
from .models.unets.unet_2d import UNet2DModel
from .models.unets.unet_2d_condition import UNet2DConditionModel

# schedulers
from .schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
    FlowMatchEulerDiscreteScheduler,
    HeunDiscreteScheduler,
    KarrasDiffusionSchedulers,
    LCMScheduler,
    LMSDiscreteScheduler,
    PNDMScheduler,
    SchedulerMixin,
)

# pipelines
from .pipelines.auto_pipeline import (
    AutoPipelineForImage2Image,
    AutoPipelineForInpainting,
    AutoPipelineForText2Image,
)
from .pipelines.ddpm.pipeline_ddpm import DDPMPipeline
from .pipelines.pixart_alpha.pipeline_pixart_alpha import PixArtAlphaPipeline, PixArtSigmaPipeline
from .pipelines.dit.pipeline_dit import DiTPipeline
from .pipelines.consistency_models.pipeline_consistency_models import ConsistencyModelPipeline
from .pipelines.flux.pipeline_flux import FluxPipeline
from .pipelines.flux.pipeline_flux_controlnet import FluxControlNetPipeline
from .pipelines.pipeline_utils import DiffusionPipeline
from .pipelines.stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline
from .pipelines.flux.pipeline_flux_img2img import FluxImg2ImgPipeline
from .pipelines.flux.pipeline_flux_fill import FluxFillPipeline
from .pipelines.flux.pipeline_flux_kontext import FluxKontextPipeline
from .pipelines.latent_consistency_models import LatentConsistencyModelPipeline
from .pipelines.sana import SanaPipeline
from .pipelines.tcd import TCDPipeline
from .pipelines.pag.pipeline_pag_sd import StableDiffusionPAGPipeline
from .pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl import StableDiffusionXLPipeline
from .pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl_img2img import StableDiffusionXLImg2ImgPipeline
from .pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl_inpaint import StableDiffusionXLInpaintPipeline

# guiders
from .guiders import (
    AdaptiveProjectedGuidance,
    ClassifierFreeGuidance,
    ClassifierFreeZeroStarGuidance,
    PerturbedAttentionGuidance,
    SkipLayerGuidance,
)

# processors
from .image_processor import VaeImageProcessor

# additional models / pipelines / subsystems
from .models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
from .models.autoencoders.autoencoder_tiny import AutoencoderTiny
from .models.autoencoders.autoencoder_dc import AutoencoderDC
from .models.autoencoders.vq_model import VQModel
from .models.transformers.sana_transformer import SanaTransformer2DModel
from .models.controlnets.controlnet import ControlNetModel
from .models.controlnets.controlnet_flux import FluxControlNetModel, FluxMultiControlNetModel
from .models.controlnets.controlnet_sd3 import SD3ControlNetModel, SD3MultiControlNetModel
from .models.transformers.transformer_wan import WanTransformer3DModel
from .models.transformers.transformer_hunyuan_video import HunyuanVideoTransformer3DModel
from .models.autoencoders.autoencoder_kl_hunyuan_video import AutoencoderKLHunyuanVideo
from .models.text_encoders.llama import LlamaModel
from .pipelines.hunyuan_video import HunyuanVideoPipeline
from .pipelines.controlnet.pipeline_controlnet import StableDiffusionControlNetPipeline
from .pipelines.controlnet.pipeline_controlnet_sd_xl import StableDiffusionXLControlNetPipeline
from .pipelines.controlnet_sd3.pipeline_stable_diffusion_3_controlnet import StableDiffusion3ControlNetPipeline
from .pipelines.stable_diffusion.pipeline_stable_diffusion_img2img import StableDiffusionImg2ImgPipeline
from .pipelines.stable_diffusion.pipeline_stable_diffusion_inpaint import StableDiffusionInpaintPipeline
from .pipelines.stable_diffusion.pipeline_stable_diffusion_instruct_pix2pix import (
    StableDiffusionInstructPix2PixPipeline,
)
from .pipelines.stable_diffusion.pipeline_stable_diffusion_upscale import StableDiffusionUpscalePipeline
from .models.adapter import MultiAdapter, T2IAdapter
from .pipelines.t2i_adapter import StableDiffusionAdapterPipeline
from .pipelines.stable_diffusion_3.pipeline_stable_diffusion_3 import StableDiffusion3Pipeline
from .pipelines.wan.pipeline_wan import WanPipeline
from .models.unets.unet_motion_model import MotionAdapter, UNetMotionModel
from .pipelines.animatediff import AnimateDiffPipeline
from .pipelines.ltx.pipeline_ltx import LTXPipeline
from .pipelines.cogvideo import CogVideoXPipeline
from .models.transformers.cogvideox_transformer_3d import CogVideoXTransformer3DModel
from .models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
from .schedulers import CogVideoXDDIMScheduler
from .quantizers import Fp8WeightOnlyConfig, Int8DynamicActConfig, Int8WeightOnlyConfig, quantize_params
from .schedulers import (
    CMStochasticIterativeScheduler,
    DDIMInverseScheduler,
    DEISMultistepScheduler,
    DPMSolverSinglestepScheduler,
    EDMEulerScheduler,
    KDPM2DiscreteScheduler,
    TCDScheduler,
    UniPCMultistepScheduler,
)
from .video_processor import VideoProcessor
