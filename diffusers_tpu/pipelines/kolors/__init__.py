from .pipeline_kolors import KolorsPipeline, KolorsPipelineOutput
from .text_encoder import ChatGLMModel, ChatGLMModelOutput

__all__ = ["ChatGLMModel", "ChatGLMModelOutput", "KolorsPipeline", "KolorsPipelineOutput"]
