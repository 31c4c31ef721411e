"""Node-UI schema export (reference `modular_pipelines/mellon_node_utils.py`)."""

import json

from diffusers_tpu.modular_pipelines.node_utils import (
    block_to_node_spec,
    export_node_specs,
    pack_to_node_specs,
)


def test_block_spec_types_and_ports():
    from diffusers_tpu.modular_pipelines.ltx import LTXModularBlocks

    pack = LTXModularBlocks()
    spec = block_to_node_spec(pack.sub_blocks["text_encoder"])
    params = {p["name"]: p for p in spec["params"]}
    assert params["prompt"]["type"] == "string"
    assert params["prompt"]["display"] == "textarea"
    assert params["prompt"]["required"] is True
    assert params["guidance_scale"]["type"] == "float"
    outs = {p["name"] for p in spec["outputs"]}
    assert {"prompt_embeds", "prompt_mask", "do_cfg"} <= outs
    assert "text_encoder" in spec["components"]


def test_pack_specs_are_wired_and_json_serializable(tmp_path):
    from diffusers_tpu.modular_pipelines.wan import WAN_BLOCKS

    specs = pack_to_node_specs(WAN_BLOCKS)
    assert [s["id"] for s in specs] == [
        "text_encoder", "prepare_latents", "set_timesteps", "denoise", "decode"]
    denoise = next(s for s in specs if s["id"] == "denoise")
    latents_in = next(p for p in denoise["inputs"] if p["name"] == "latents")
    # latents flows from prepare_latents into denoise
    assert latents_in["source"] == "prepare_latents"
    embeds_in = next(p for p in denoise["inputs"] if p["name"] == "prompt_embeds")
    assert embeds_in["source"] == "text_encoder"

    path = export_node_specs(WAN_BLOCKS, str(tmp_path / "wan_nodes.json"))
    doc = json.loads(open(path).read())
    assert doc["format"].startswith("diffusers-tpu-node-graph")
    assert len(doc["nodes"]) == 5


def test_all_registered_packs_export():
    import importlib

    from diffusers_tpu.modular_pipelines.modular_pipeline import _BLOCK_PACKS

    for target in _BLOCK_PACKS.values():
        module_path, attr = target.split(":")
        pack = getattr(importlib.import_module(module_path), attr)
        specs = pack_to_node_specs(pack)
        assert specs, target
        json.dumps(specs)  # fully serializable
