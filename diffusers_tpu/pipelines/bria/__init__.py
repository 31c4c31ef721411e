from .pipeline_bria import BriaPipeline, BriaPipelineOutput

__all__ = ["BriaPipeline", "BriaPipelineOutput"]
