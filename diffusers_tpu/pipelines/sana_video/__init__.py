from .pipeline_sana_video import SanaVideoPipeline, SanaVideoPipelineOutput

__all__ = ["SanaVideoPipeline", "SanaVideoPipelineOutput"]
