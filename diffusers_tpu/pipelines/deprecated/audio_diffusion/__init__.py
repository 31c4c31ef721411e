from .mel import Mel
from .pipeline_audio_diffusion import AudioDiffusionPipeline, AudioDiffusionPipelineOutput
