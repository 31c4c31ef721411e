from .pipeline_stable_cascade import ImagePipelineOutput, StableCascadeDecoderPipeline
from .pipeline_stable_cascade_prior import (
    StableCascadePriorPipeline,
    StableCascadePriorPipelineOutput,
)

__all__ = [
    "ImagePipelineOutput",
    "StableCascadeDecoderPipeline",
    "StableCascadePriorPipeline",
    "StableCascadePriorPipelineOutput",
]
