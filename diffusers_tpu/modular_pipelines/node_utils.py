"""Node-UI schema export for modular block packs.

TPU-native counterpart of the reference's Mellon node utilities
(`/root/reference/src/diffusers/modular_pipelines/mellon_node_utils.py`):
turns a block pack's declared ``inputs``/``intermediate_inputs``/
``intermediate_outputs`` into JSON node specs a visual node editor can
render — one node per block, typed ports, UI hints (textarea for prompts,
sliders for step counts / guidance, image ports for pixel data).

Differences from the reference by design: no Hub upload (zero-egress
environment — specs are written to local JSON), and the param-template
table is keyed by name *pattern* rather than a fixed list so new packs get
sensible port types without registration.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional

from .modular_pipeline import ModularPipelineBlocks, SequentialPipelineBlocks

# (regex over param name, port spec) — first match wins; mirrors the intent
# of the reference's MELLON_PARAM_TEMPLATES (`mellon_node_utils.py:31`).
_PARAM_TEMPLATES = [
    (r"^(prompt|negative_prompt)(_\d+)?$",
     {"type": "string", "display": "textarea", "default": ""}),
    (r"(^|_)mask(_image)?$", {"type": "image", "display": "input"}),
    (r"(^|_)(control_)?image(s)?$", {"type": "image", "display": "input"}),
    (r"^videos?$", {"type": "video", "display": "input"}),
    (r"latents$|^latents?", {"type": "latents", "display": "input"}),
    (r"_embeds$|_embeddings$|embeds$", {"type": "embeddings", "display": "input"}),
    (r"_mask$", {"type": "embeddings", "display": "input"}),
    (r"^num_inference_steps$",
     {"type": "int", "display": "slider", "min": 1, "max": 200}),
    (r"^(guidance_scale|guidance_rescale|true_cfg_scale)$",
     {"type": "float", "display": "slider", "min": 0.0, "max": 20.0}),
    (r"^(height|width|num_frames|frame_rate|max_sequence_length)$",
     {"type": "int", "display": "number"}),
    (r"^(strength|denoise_strength|decode_timestep|decode_noise_scale)$",
     {"type": "float", "display": "slider", "min": 0.0, "max": 1.0}),
    (r"^key$", {"type": "seed", "display": "random"}),
    (r"^output_type$",
     {"type": "string", "display": "select", "options": ["np", "pil", "latent"]}),
    (r"^do_cfg$", {"type": "bool", "display": "checkbox"}),
    (r"state$", {"type": "scheduler_state", "display": "input"}),
    (r"^(rope_cos|rope_sin|latent_grid|decode_key|video_coords)$",
     {"type": "tensor", "display": "input"}),
]


def _name_to_label(name: str) -> str:
    return name.replace("_", " ").title()


def _port_spec(name: str, *, default: Any = None, required: bool = False,
               is_output: bool = False) -> Dict[str, Any]:
    spec: Dict[str, Any] = {"name": name, "label": _name_to_label(name)}
    for pattern, tmpl in _PARAM_TEMPLATES:
        if re.search(pattern, name):
            spec.update(tmpl)
            break
    else:
        spec["type"] = "any"
    spec["display"] = "output" if is_output else spec.get("display", "input")
    if not is_output:
        spec["required"] = bool(required)
        if default is not None:
            try:
                json.dumps(default)
                spec["default"] = default
            except TypeError:
                pass  # non-serializable defaults (PRNG keys, arrays) are omitted
    return spec


def block_to_node_spec(block: ModularPipelineBlocks) -> Dict[str, Any]:
    """One node spec for one block: typed input/output ports + components."""
    cls = type(block)
    params = [
        _port_spec(p.name, default=p.default, required=p.required)
        for p in (getattr(block, "inputs", None) or [])
    ]
    links_in = [
        _port_spec(p.name, required=p.required)
        for p in (getattr(block, "intermediate_inputs", None) or [])
    ]
    links_out = [
        _port_spec(p.name, is_output=True)
        for p in (getattr(block, "intermediate_outputs", None) or [])
    ]
    return {
        "node": cls.__name__,
        "label": _name_to_label(re.sub(r"(?<!^)(?=[A-Z])", "_", cls.__name__).lower()),
        "category": "diffusers_tpu",
        "params": params,
        "inputs": links_in,
        "outputs": links_out,
        "components": list(getattr(block, "expected_components", None) or []),
        "doc": (cls.__doc__ or "").strip().split("\n")[0],
    }


def pack_to_node_specs(blocks) -> List[Dict[str, Any]]:
    """Node specs for a whole pack (SequentialPipelineBlocks or a block list),
    wired: each node records which upstream node feeds each linked input."""
    if isinstance(blocks, type):
        blocks = blocks()
    if isinstance(blocks, SequentialPipelineBlocks):
        names = list(blocks.sub_blocks)
        subs = list(blocks.sub_blocks.values())
    else:
        subs = list(blocks)
        names = [type(b).__name__ for b in subs]

    specs, producers = [], {}
    for name, block in zip(names, subs):
        spec = block_to_node_spec(block)
        spec["id"] = name
        for port in spec["inputs"]:
            if port["name"] in producers:
                port["source"] = producers[port["name"]]
        for port in spec["outputs"]:
            producers[port["name"]] = spec["id"]
        specs.append(spec)
    return specs


def export_node_specs(blocks, path: str, *, graph_name: Optional[str] = None) -> str:
    """Write a pack's node specs to a JSON file; returns the path."""
    specs = pack_to_node_specs(blocks)
    doc = {
        "format": "diffusers-tpu-node-graph/v1",
        "graph": graph_name or (type(blocks).__name__ if not isinstance(blocks, type)
                                else blocks.__name__),
        "nodes": specs,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    return path
