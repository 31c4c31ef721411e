from .pipeline_diffusion_gemma import (
    DiffusionGemmaDenoiser,
    DiffusionGemmaPipeline,
    DiffusionGemmaPipelineOutput,
)
