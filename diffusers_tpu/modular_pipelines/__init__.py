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
from .node_utils import block_to_node_spec, export_node_specs, pack_to_node_specs
