from .pipeline_mochi import MochiPipeline, MochiPipelineOutput

__all__ = ["MochiPipeline", "MochiPipelineOutput"]
