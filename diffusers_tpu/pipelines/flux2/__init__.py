from .pipeline_flux2 import Flux2Pipeline, Flux2PipelineOutput

__all__ = ["Flux2Pipeline", "Flux2PipelineOutput"]
