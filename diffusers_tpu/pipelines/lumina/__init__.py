from .pipeline_lumina import LuminaPipeline, LuminaPipelineOutput, LuminaText2ImgPipeline

__all__ = ["LuminaPipeline", "LuminaPipelineOutput", "LuminaText2ImgPipeline"]
