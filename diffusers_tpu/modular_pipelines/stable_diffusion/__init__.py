from .blocks import (
    SD_BLOCKS,
    StableDiffusionDecodeBlock,
    StableDiffusionDenoiseLoopBlock,
    StableDiffusionModularBlocks,
    StableDiffusionPrepareLatentsBlock,
    StableDiffusionTextEncoderBlock,
)
