from .pipeline_ddim import DDIMPipeline
