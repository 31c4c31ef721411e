from .pipeline_kandinsky2_2 import KandinskyV22Pipeline, KandinskyV22PipelineOutput
from .pipeline_kandinsky2_2_prior import KandinskyV22PriorPipeline, KandinskyV22PriorPipelineOutput

__all__ = [
    "KandinskyV22Pipeline",
    "KandinskyV22PipelineOutput",
    "KandinskyV22PriorPipeline",
    "KandinskyV22PriorPipelineOutput",
]
