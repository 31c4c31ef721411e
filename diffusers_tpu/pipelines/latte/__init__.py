from .pipeline_latte import LattePipeline, LattePipelineOutput

__all__ = ["LattePipeline", "LattePipelineOutput"]
