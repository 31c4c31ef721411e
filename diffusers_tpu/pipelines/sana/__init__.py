from .pipeline_sana import SanaPipeline
