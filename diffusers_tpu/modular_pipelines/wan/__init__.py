from .blocks import WAN_BLOCKS, WanModularBlocks
