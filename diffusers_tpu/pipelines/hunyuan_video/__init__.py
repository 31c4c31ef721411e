from .pipeline_hunyuan_video import HunyuanVideoPipeline, HunyuanVideoPipelineOutput
from .pipeline_hunyuan_video_framepack import (
    FramepackSamplingType,
    HunyuanVideoFramepackPipeline,
)
