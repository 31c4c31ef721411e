from .modeling_stable_audio import StableAudioProjectionModel, StableAudioProjectionModelOutput
from .pipeline_stable_audio import AudioPipelineOutput, StableAudioPipeline

__all__ = [
    "AudioPipelineOutput",
    "StableAudioPipeline",
    "StableAudioProjectionModel",
    "StableAudioProjectionModelOutput",
]
