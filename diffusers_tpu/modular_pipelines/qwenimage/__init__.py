from .blocks import QWENIMAGE_BLOCKS, QwenImageModularBlocks
