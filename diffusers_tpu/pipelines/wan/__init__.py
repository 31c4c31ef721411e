from .pipeline_wan import WanPipeline
from .pipeline_wan_i2v import WanImageToVideoPipeline
from .pipeline_wan_vace import WanVACEPipeline

__all__ = ["WanPipeline", "WanImageToVideoPipeline", "WanVACEPipeline"]
