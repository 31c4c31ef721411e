from .blocks import (
    FLUX_BLOCKS,
    FluxBeforeDenoiseStep,
    FluxDecodeStep,
    FluxDenoiseLoopStep,
    FluxModularBlocks,
    FluxPrepareLatentsStep,
    FluxSetTimestepsStep,
    FluxTextEncoderStep,
)
