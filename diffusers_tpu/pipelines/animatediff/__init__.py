from .pipeline_animatediff import AnimateDiffPipeline, AnimateDiffPipelineOutput

__all__ = ["AnimateDiffPipeline", "AnimateDiffPipelineOutput"]
