from .pipeline_qwenimage import QwenImagePipeline, QwenImagePipelineOutput

__all__ = ["QwenImagePipeline", "QwenImagePipelineOutput"]
