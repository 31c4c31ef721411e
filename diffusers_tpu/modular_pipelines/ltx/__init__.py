from .blocks import LTX_BLOCKS, LTXModularBlocks
