from .ddpm.pipeline_ddpm import DDPMPipeline, ImagePipelineOutput
from .pipeline_utils import DiffusionPipeline
