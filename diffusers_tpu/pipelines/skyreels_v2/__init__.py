from .pipeline_skyreels_v2 import SkyReelsV2Pipeline, SkyReelsV2PipelineOutput

__all__ = ["SkyReelsV2Pipeline", "SkyReelsV2PipelineOutput"]
