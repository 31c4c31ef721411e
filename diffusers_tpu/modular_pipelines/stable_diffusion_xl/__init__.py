from .blocks import (
    SDXL_BLOCKS,
    StableDiffusionXLBeforeDenoiseStep,
    StableDiffusionXLDecodeStep,
    StableDiffusionXLDenoiseLoopStep,
    StableDiffusionXLModularBlocks,
    StableDiffusionXLPrepareAdditionalConditioningStep,
    StableDiffusionXLPrepareLatentsStep,
    StableDiffusionXLSetTimestepsStep,
    StableDiffusionXLTextEncoderStep,
)
