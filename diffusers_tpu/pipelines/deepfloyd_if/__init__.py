from .pipeline_if import IFPipeline, IFPipelineOutput
from .pipeline_if_superresolution import IFSuperResolutionPipeline

__all__ = ["IFPipeline", "IFPipelineOutput", "IFSuperResolutionPipeline"]
