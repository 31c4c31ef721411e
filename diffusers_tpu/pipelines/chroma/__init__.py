from .pipeline_chroma import ChromaPipeline, ChromaPipelineOutput

__all__ = ["ChromaPipeline", "ChromaPipelineOutput"]
