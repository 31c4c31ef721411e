from .pipeline_musicldm import MusicLDMPipeline
