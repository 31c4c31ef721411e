from .pipeline_hidream_image import HiDreamImagePipeline, HiDreamImagePipelineOutput

__all__ = ["HiDreamImagePipeline", "HiDreamImagePipelineOutput"]
