from .pipeline_omnigen import ImagePipelineOutput, OmniGenPipeline
from .processor_omnigen import OmniGenCollator, OmniGenMultiModalProcessor

__all__ = ["ImagePipelineOutput", "OmniGenCollator", "OmniGenMultiModalProcessor", "OmniGenPipeline"]
