from .pipeline_cogview4 import CogView4Pipeline, CogView4PipelineOutput

__all__ = ["CogView4Pipeline", "CogView4PipelineOutput"]
