from .pipeline_hunyuandit import HunyuanDiTPipeline, HunyuanDiTPipelineOutput

__all__ = ["HunyuanDiTPipeline", "HunyuanDiTPipelineOutput"]
