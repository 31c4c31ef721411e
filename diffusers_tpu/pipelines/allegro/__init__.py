from .pipeline_allegro import AllegroPipeline, AllegroPipelineOutput

__all__ = ["AllegroPipeline", "AllegroPipelineOutput"]
