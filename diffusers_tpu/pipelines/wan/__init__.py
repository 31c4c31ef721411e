from .pipeline_wan import WanPipeline
from .pipeline_wan_vace import WanVACEPipeline

__all__ = ["WanPipeline", "WanVACEPipeline"]
