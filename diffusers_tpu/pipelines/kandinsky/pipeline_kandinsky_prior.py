"""Kandinsky 2.1 diffusion-prior pipeline.

The reference's 2.1 prior (`/root/reference/src/diffusers/pipelines/kandinsky/
pipeline_kandinsky_prior.py`) is the same CLIP-conditioned UnCLIP prior loop
as 2.2's — only the output container differs. Reuse the 2.2 implementation.
"""

from __future__ import annotations

from ..kandinsky2_2.pipeline_kandinsky2_2_prior import (
    KandinskyV22PriorPipeline,
    KandinskyV22PriorPipelineOutput,
)

KandinskyPriorPipelineOutput = KandinskyV22PriorPipelineOutput


class KandinskyPriorPipeline(KandinskyV22PriorPipeline):
    pass
