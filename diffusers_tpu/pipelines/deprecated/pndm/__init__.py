from .pipeline_pndm import ImagePipelineOutput, PNDMPipeline
