from .pipeline_leditspp_stable_diffusion import (
    LEditsPPDiffusionPipelineOutput,
    LEditsPPInversionPipelineOutput,
    LEditsPPPipelineStableDiffusion,
)
