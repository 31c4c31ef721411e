from .components_manager import ComponentsManager
from .modular_pipeline import (
    AutoPipelineBlocks,
    BlockState,
    ComponentsBundle,
    InputParam,
    LoopSequentialPipelineBlocks,
    ModularPipeline,
    ModularPipelineBlocks,
    OutputParam,
    PipelineState,
    SequentialPipelineBlocks,
)
