from .pipeline_lumina2 import Lumina2Pipeline, Lumina2PipelineOutput

__all__ = ["Lumina2Pipeline", "Lumina2PipelineOutput"]
