from .pipeline_cogview3plus import CogView3PipelineOutput, CogView3PlusPipeline

__all__ = ["CogView3PipelineOutput", "CogView3PlusPipeline"]
