"""Modular pipelines: a composable block-graph runtime.

TPU-native counterpart of the reference's modular subsystem
(`/root/reference/src/diffusers/modular_pipelines/modular_pipeline.py`:
PipelineState `:160`, BlockState `:250`, ModularPipelineBlocks `:321`,
AutoPipelineBlocks `:615`, SequentialPipelineBlocks `:963`,
LoopSequentialPipelineBlocks `:1325`, ModularPipeline `:1623`). The reference
is a 58.7k-LoC torch runtime whose denoise loop is Python-driven per step;
this redesign keeps the same composition surface (declared inputs /
intermediate inputs / outputs, sequential chaining, trigger-based auto
dispatch, loop blocks) but blocks are pure functions over a functional
PipelineState, and loop blocks compile their per-step body to ONE
`jax.lax.scan` — the whole denoise loop is a single XLA program, not N
Python iterations.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax

from ..utils import logging

logger = logging.get_logger(__name__)


@dataclass
class InputParam:
    """Declared block input (reference modular_pipeline.py InputParam)."""

    name: str
    default: Any = None
    required: bool = False
    description: str = ""

    def __repr__(self):
        return f"<{self.name}: {'required' if self.required else self.default!r}>"


@dataclass
class OutputParam:
    name: str
    description: str = ""


class PipelineState:
    """Flat value store threaded through the block graph (reference `:160`):
    user inputs + block intermediates, last-write-wins."""

    def __init__(self):
        self.values: Dict[str, Any] = {}

    def set(self, key: str, value: Any):
        self.values[key] = value

    def get(self, keys, default: Any = None):
        if isinstance(keys, str):
            return self.values.get(keys, default)
        return {k: self.values.get(k, default) for k in keys}

    def __contains__(self, key):
        return key in self.values

    def __repr__(self):
        return f"PipelineState({list(self.values)})"


class BlockState:
    """Per-block attribute view over the state slice a block declared
    (reference `:250`)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def as_dict(self):
        return dict(self.__dict__)

    def __repr__(self):
        return f"BlockState({list(self.__dict__)})"


class ModularPipelineBlocks:
    """Base block: declares inputs/intermediate inputs/outputs and a
    `__call__(components, state) -> state` (reference `:321`).

    Subclasses set:
      * ``inputs``: list[InputParam] — user-facing inputs (defaults applied)
      * ``intermediate_inputs``: list[InputParam] — values produced upstream
      * ``intermediate_outputs``: list[OutputParam] — values this block adds
      * ``expected_components``: list[str] — component names read off the
        bound components object
    """

    inputs: List[InputParam] = []
    intermediate_inputs: List[InputParam] = []
    intermediate_outputs: List[OutputParam] = []
    expected_components: List[str] = []
    description: str = ""

    def get_block_state(self, state: PipelineState) -> BlockState:
        data = {}
        for param in list(self.inputs) + list(self.intermediate_inputs):
            if param.name in state:
                data[param.name] = state.get(param.name)
            elif param.required:
                raise ValueError(f"block {type(self).__name__} missing required input {param.name!r}")
            else:
                data[param.name] = param.default
        return BlockState(**data)

    def set_block_state(self, state: PipelineState, block_state: BlockState):
        declared = {p.name for p in self.intermediate_outputs}
        for k, v in block_state.as_dict().items():
            if k in declared or k in state:
                state.set(k, v)

    def __call__(self, components, state: PipelineState) -> PipelineState:
        raise NotImplementedError

    # ----------------------------------------------------------- composition
    def init_pipeline(self, components=None) -> "ModularPipeline":
        return ModularPipeline(self, components)

    @property
    def input_names(self):
        return [p.name for p in self.inputs]


class SequentialPipelineBlocks(ModularPipelineBlocks):
    """Run sub-blocks in declaration order (reference `:963`)."""

    block_classes: List[type] = []
    block_names: List[str] = []

    def __init__(self, sub_blocks: Optional[Dict[str, ModularPipelineBlocks]] = None):
        if sub_blocks is None:
            sub_blocks = {name: cls() for name, cls in zip(self.block_names, self.block_classes)}
        self.sub_blocks = dict(sub_blocks)

    @classmethod
    def from_blocks_dict(cls, blocks: Dict[str, ModularPipelineBlocks]) -> "SequentialPipelineBlocks":
        return cls(sub_blocks=blocks)

    @property
    def inputs(self):
        # union of sub-block inputs minus intermediates produced upstream
        produced = set()
        out, seen = [], set()
        for block in self.sub_blocks.values():
            for p in block.inputs:
                if p.name not in seen and p.name not in produced:
                    seen.add(p.name)
                    out.append(p)
            produced.update(o.name for o in block.intermediate_outputs)
        return out

    @property
    def intermediate_outputs(self):
        out, seen = [], set()
        for block in self.sub_blocks.values():
            for o in block.intermediate_outputs:
                if o.name not in seen:
                    seen.add(o.name)
                    out.append(o)
        return out

    def __call__(self, components, state: PipelineState) -> PipelineState:
        for name, block in self.sub_blocks.items():
            state = block(components, state)
        return state


class AutoPipelineBlocks(ModularPipelineBlocks):
    """Trigger-input dispatch: the first sub-block whose trigger input is
    present in the state runs; otherwise the default (reference `:615`)."""

    block_classes: List[type] = []
    block_names: List[str] = []
    block_trigger_inputs: List[Optional[str]] = []

    def __init__(self, sub_blocks: Optional[Dict[str, ModularPipelineBlocks]] = None):
        if sub_blocks is None:
            sub_blocks = {name: cls() for name, cls in zip(self.block_names, self.block_classes)}
        self.sub_blocks = dict(sub_blocks)

    @property
    def inputs(self):
        out, seen = [], set()
        for block in self.sub_blocks.values():
            for p in block.inputs:
                if p.name not in seen:
                    seen.add(p.name)
                    out.append(InputParam(p.name, p.default, required=False, description=p.description))
        return out

    @property
    def intermediate_outputs(self):
        out, seen = [], set()
        for block in self.sub_blocks.values():
            for o in block.intermediate_outputs:
                if o.name not in seen:
                    seen.add(o.name)
                    out.append(o)
        return out

    def select_block(self, state: PipelineState) -> Optional[ModularPipelineBlocks]:
        default = None
        for name, trigger in zip(self.block_names, self.block_trigger_inputs):
            if trigger is None:
                default = self.sub_blocks[name]
            elif trigger in state and state.get(trigger) is not None:
                return self.sub_blocks[name]
        return default

    def __call__(self, components, state: PipelineState) -> PipelineState:
        block = self.select_block(state)
        if block is None:
            return state  # skippable auto block with no default
        return block(components, state)


class LoopSequentialPipelineBlocks(ModularPipelineBlocks):
    """Denoise-loop block (reference `:1325`): sub-blocks define ONE
    iteration; here the iteration is traced once and driven by
    `jax.lax.scan`, so the loop is a single compiled program.

    Subclasses implement:
      * ``loop_inputs``/``loop_intermediate_outputs`` declarations
      * ``loop_carry(components, state) -> carry`` — initial carry pytree
      * ``loop_xs(components, state)`` — per-step scanned values (e.g.
        timesteps)
      * ``loop_step(components, carry, x) -> carry`` — one iteration, built
        from the sub-blocks
      * ``loop_finalize(components, state, carry) -> None`` — write results
    """

    def __init__(self, sub_blocks: Optional[Dict[str, ModularPipelineBlocks]] = None):
        self.sub_blocks = dict(sub_blocks or {})

    def loop_carry(self, components, state: PipelineState):
        raise NotImplementedError

    def loop_xs(self, components, state: PipelineState):
        raise NotImplementedError

    def loop_step(self, components, carry, x):
        raise NotImplementedError

    def loop_finalize(self, components, state: PipelineState, carry):
        raise NotImplementedError

    def __call__(self, components, state: PipelineState) -> PipelineState:
        carry = self.loop_carry(components, state)
        xs = self.loop_xs(components, state)

        def body(carry, x):
            return self.loop_step(components, carry, x), None

        final_carry, _ = jax.lax.scan(body, carry, xs)
        self.loop_finalize(components, state, final_carry)
        return state


class ComponentsBundle:
    """Attribute container binding component names → (module, params) pairs
    or plain objects (schedulers, tokenizers)."""

    def __init__(self, **components):
        self.__dict__.update(components)

    def __repr__(self):
        return f"ComponentsBundle({list(self.__dict__)})"


_BLOCK_PACKS = {
    # pipeline _class_name prefix -> block-pack import path
    "StableDiffusionXL": "diffusers_tpu.modular_pipelines.stable_diffusion_xl:SDXL_BLOCKS",
    "StableDiffusion3": "diffusers_tpu.modular_pipelines.stable_diffusion_3:SD3_BLOCKS",
    "Flux": "diffusers_tpu.modular_pipelines.flux:FLUX_BLOCKS",
    "StableDiffusion": "diffusers_tpu.modular_pipelines.stable_diffusion:SD_BLOCKS",
    "Wan": "diffusers_tpu.modular_pipelines.wan:WAN_BLOCKS",
    "QwenImage": "diffusers_tpu.modular_pipelines.qwenimage:QWENIMAGE_BLOCKS",
    "LTX": "diffusers_tpu.modular_pipelines.ltx:LTX_BLOCKS",
}


def _resolve_block_pack(class_name: str):
    import importlib

    for prefix in sorted(_BLOCK_PACKS, key=len, reverse=True):
        if class_name.startswith(prefix):
            module_path, attr = _BLOCK_PACKS[prefix].split(":")
            return getattr(importlib.import_module(module_path), attr)
    raise ValueError(
        f"no modular block pack registered for pipeline class {class_name!r}; "
        f"pass `blocks=` explicitly (registered: {list(_BLOCK_PACKS)})"
    )


class ModularPipeline:
    """Executable binding of a block (graph) to components (reference
    `:1623`). Call with user inputs; returns the PipelineState."""

    def __init__(self, blocks: ModularPipelineBlocks, components=None):
        self.blocks = blocks
        self.components = components if components is not None else ComponentsBundle()

    def update_components(self, **components):
        for k, v in components.items():
            setattr(self.components, k, v)

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path,
        blocks: Optional[ModularPipelineBlocks] = None,
        dtype=None,
        variant: Optional[str] = None,
        components_manager=None,
        collection: Optional[str] = None,
        **kwargs,
    ) -> "ModularPipeline":
        """Load every component of a saved (monolithic-layout) pipeline repo
        into a ComponentsBundle and bind it to a block graph (reference
        `modular_pipeline.py:1623` ModularPipeline.from_pretrained).

        `blocks=None` resolves the block pack from the repo's
        `model_index.json` `_class_name` (SDXL/Flux/SD registered). With a
        `components_manager`, each loaded component is registered (content
        dedup applies) under `collection`. Components passed as kwargs
        override loading (reference `passed_class_obj` semantics).
        """
        import json
        import os

        from ..pipelines.pipeline_utils import PIPELINE_CONFIG_NAME, resolve_component_class
        from ..utils.hub_utils import snapshot_download_repo

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        with open(os.path.join(root, PIPELINE_CONFIG_NAME)) as f:
            config_dict = json.load(f)

        if blocks is None:
            blocks = _resolve_block_pack(config_dict.get("_class_name", ""))
        if isinstance(blocks, type):
            blocks = blocks()

        passed = {k: kwargs.pop(k) for k in list(kwargs) if k in config_dict}
        components = dict(passed)
        for name, value in config_dict.items():
            if name.startswith("_") or not isinstance(value, (list, tuple)) or len(value) != 2:
                continue
            if value[0] is None or name in passed:
                continue
            library, class_name = value
            component_path = os.path.join(root, name)
            component_cls, kind = resolve_component_class(library, class_name)
            if kind == "tokenizer":
                component = component_cls.from_pretrained(component_path)
            elif hasattr(component_cls, "from_pretrained") and hasattr(component_cls, "init_params"):
                model, params = component_cls.from_pretrained(
                    root, subfolder=name, dtype=dtype, variant=variant
                )
                component = (model, params)
            else:  # config-only components (schedulers, guiders)
                component = component_cls.from_pretrained(component_path)
            if components_manager is not None:
                canonical = components_manager.add(name, component, collection=collection)
                component = components_manager.get(canonical)
            components[name] = component
        return cls(blocks, ComponentsBundle(**components))

    def __call__(self, output: Optional[str] = None, **inputs):
        state = PipelineState()
        for p in self.blocks.inputs:
            state.set(p.name, inputs.pop(p.name, p.default))
        for k, v in inputs.items():  # extra inputs pass straight through
            state.set(k, v)
        state = self.blocks(self.components, state)
        if output is not None:
            return state.get(output)
        return state
