from .pipeline_wan import WanPipeline
from .pipeline_wan_animate import WanAnimatePipeline
from .pipeline_wan_i2v import WanImageToVideoPipeline
from .pipeline_wan_vace import WanVACEPipeline
from .pipeline_wan_video2video import WanVideoToVideoPipeline

__all__ = ["WanPipeline", "WanAnimatePipeline", "WanImageToVideoPipeline", "WanVACEPipeline",
           "WanVideoToVideoPipeline"]
