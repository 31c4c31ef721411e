from .marigold_image_processing import MarigoldImageProcessor
from .pipeline_marigold_depth import MarigoldDepthOutput, MarigoldDepthPipeline
from .pipeline_marigold_normals import MarigoldNormalsOutput, MarigoldNormalsPipeline

__all__ = [
    "MarigoldDepthOutput",
    "MarigoldDepthPipeline",
    "MarigoldImageProcessor",
    "MarigoldNormalsOutput",
    "MarigoldNormalsPipeline",
]
