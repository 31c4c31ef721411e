from .blocks import SD3_BLOCKS, SD3ModularBlocks
