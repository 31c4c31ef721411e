from .pipeline_z_image import ZImagePipeline
