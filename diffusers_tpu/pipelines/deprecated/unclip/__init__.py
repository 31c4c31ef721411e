from .pipeline_unclip import UnCLIPPipeline
from .text_proj import UnCLIPTextProjModel
