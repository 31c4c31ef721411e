from .pipeline_amused import AmusedPipeline, AmusedPipelineOutput
