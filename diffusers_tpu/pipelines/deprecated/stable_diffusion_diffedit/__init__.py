from .pipeline_stable_diffusion_diffedit import (
    DiffEditInversionPipelineOutput,
    StableDiffusionDiffEditPipeline,
)
