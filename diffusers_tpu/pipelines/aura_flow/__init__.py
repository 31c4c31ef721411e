from .pipeline_aura_flow import AuraFlowPipeline

__all__ = ["AuraFlowPipeline"]
