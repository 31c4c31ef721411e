from .pipeline_prx import PRXPipeline
