from .pipeline_stable_video_diffusion import (
    StableVideoDiffusionPipeline,
    StableVideoDiffusionPipelineOutput,
)

__all__ = ["StableVideoDiffusionPipeline", "StableVideoDiffusionPipelineOutput"]
