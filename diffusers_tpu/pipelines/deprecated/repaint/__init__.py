from .pipeline_repaint import ImagePipelineOutput, RePaintPipeline
