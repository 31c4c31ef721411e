from .audioldm import AudioLDMPipeline
from .latent_diffusion_uncond import LDMPipeline
from .musicldm import MusicLDMPipeline
from .pndm import PNDMPipeline
from .repaint import RePaintPipeline
from .score_sde_ve import ScoreSdeVePipeline
from .stochastic_karras_ve import KarrasVePipeline
from .text_to_video_synthesis import TextToVideoSDPipeline, TextToVideoSDPipelineOutput
from .i2vgen_xl import I2VGenXLPipeline, I2VGenXLPipelineOutput
from .amused import AmusedPipeline, AmusedPipelineOutput
from .vq_diffusion import LearnedClassifierFreeSamplingEmbeddings, VQDiffusionPipeline
from .stable_diffusion_panorama import StableDiffusionPanoramaPipeline
from .stable_diffusion_safe import SafetyConfig, StableDiffusionPipelineSafe
from .stable_diffusion_ldm3d import LDM3DPipelineOutput, StableDiffusionLDM3DPipeline
from .stable_diffusion_variants import (
    StableDiffusionInpaintPipelineLegacy,
    StableDiffusionParadigmsPipeline,
)
from .semantic_stable_diffusion import SemanticStableDiffusionPipeline
from .audio_diffusion import AudioDiffusionPipeline, Mel
from .stable_diffusion_variants import CycleDiffusionPipeline, StableDiffusionModelEditingPipeline
from .alt_diffusion import (
    AltDiffusionImg2ImgPipeline,
    AltDiffusionPipeline,
    RobertaSeriesModelWithTransformation,
)
from .paint_by_example import PaintByExampleImageEncoder, PaintByExamplePipeline
from .unclip import UnCLIPPipeline, UnCLIPTextProjModel
from .stable_diffusion_diffedit import DiffEditInversionPipelineOutput, StableDiffusionDiffEditPipeline
from .pia import PIAPipeline, PIAPipelineOutput
