"""Single-file (LDM-layout) checkpoint loading for SD1.x / SD2.x / SDXL.

Compact TPU-native counterpart of the reference's single-file stack
(`/root/reference/src/diffusers/loaders/single_file.py:266` FromSingleFileMixin,
key remaps in `single_file_utils.py`): converts a monolithic
``.safetensors``/LDM state dict (``model.diffusion_model.*`` /
``first_stage_model.*`` / ``cond_stage_model.*``) into our per-component
parameter pytrees.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)


# ---------------------------------------------------------------------------
# UNet LDM → diffusers key conversion (reference single_file_utils.py
# convert_ldm_unet_checkpoint, re-derived)
# ---------------------------------------------------------------------------


def _shave(d: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in d.items() if k.startswith(prefix)}


def convert_ldm_unet_state_dict(sd: Dict[str, np.ndarray], config: dict) -> Dict[str, np.ndarray]:
    unet = _shave(sd, "model.diffusion_model.")
    out: Dict[str, np.ndarray] = {}

    # time/label embeddings
    rename_static = {
        "time_embed.0.weight": "time_embedding.linear_1.weight",
        "time_embed.0.bias": "time_embedding.linear_1.bias",
        "time_embed.2.weight": "time_embedding.linear_2.weight",
        "time_embed.2.bias": "time_embedding.linear_2.bias",
        "input_blocks.0.0.weight": "conv_in.weight",
        "input_blocks.0.0.bias": "conv_in.bias",
        "out.0.weight": "conv_norm_out.weight",
        "out.0.bias": "conv_norm_out.bias",
        "out.2.weight": "conv_out.weight",
        "out.2.bias": "conv_out.bias",
        "label_emb.0.0.weight": "add_embedding.linear_1.weight",
        "label_emb.0.0.bias": "add_embedding.linear_1.bias",
        "label_emb.0.2.weight": "add_embedding.linear_2.weight",
        "label_emb.0.2.bias": "add_embedding.linear_2.bias",
    }
    for old, new in rename_static.items():
        if old in unet:
            out[new] = unet.pop(old)

    layers_per_block = config.get("layers_per_block", 2)
    n_blocks = len(config["block_out_channels"])

    def convert_resnet(src: str, dst: str):
        pairs = {
            "in_layers.0": "norm1", "in_layers.2": "conv1",
            "emb_layers.1": "time_emb_proj",
            "out_layers.0": "norm2", "out_layers.3": "conv2",
            "skip_connection": "conv_shortcut",
        }
        for o, n in pairs.items():
            for suffix in ("weight", "bias"):
                k = f"{src}.{o}.{suffix}"
                if k in unet:
                    out[f"{dst}.{n}.{suffix}"] = unet.pop(k)

    def convert_attention(src: str, dst: str):
        for k in list(unet.keys()):
            if k.startswith(src + "."):
                out[dst + k[len(src):]] = unet.pop(k)

    # down blocks: input_blocks index i = 1 + block*(lpb+1) + layer
    per = layers_per_block + 1
    for i in range(1, n_blocks * per + 1):
        block_id = (i - 1) // per
        layer = (i - 1) % per
        if layer < layers_per_block:
            convert_resnet(f"input_blocks.{i}.0", f"down_blocks.{block_id}.resnets.{layer}")
            convert_attention(f"input_blocks.{i}.1", f"down_blocks.{block_id}.attentions.{layer}")
        else:  # downsampler
            for suffix in ("weight", "bias"):
                k = f"input_blocks.{i}.0.op.{suffix}"
                if k in unet:
                    out[f"down_blocks.{block_id}.downsamplers.0.conv.{suffix}"] = unet.pop(k)

    # mid
    convert_resnet("middle_block.0", "mid_block.resnets.0")
    convert_attention("middle_block.1", "mid_block.attentions.0")
    convert_resnet("middle_block.2", "mid_block.resnets.1")

    # up blocks: output_blocks index i = block*(lpb+1+1?) — layers_per_block+1 resnets per up block
    per_up = layers_per_block + 1
    for i in range(n_blocks * per_up):
        block_id = i // per_up
        layer = i % per_up
        convert_resnet(f"output_blocks.{i}.0", f"up_blocks.{block_id}.resnets.{layer}")
        # attention may be at .1; upsampler conv may be at .1 or .2
        attn_prefix = f"output_blocks.{i}.1"
        has_attn = any(k.startswith(attn_prefix + ".transformer_blocks") or k.startswith(attn_prefix + ".norm")
                       or k.startswith(attn_prefix + ".proj_in") for k in unet)
        if has_attn:
            convert_attention(attn_prefix, f"up_blocks.{block_id}.attentions.{layer}")
            ups_prefix = f"output_blocks.{i}.2.conv"
        else:
            ups_prefix = f"output_blocks.{i}.1.conv"
        for suffix in ("weight", "bias"):
            k = f"{ups_prefix}.{suffix}"
            if k in unet:
                out[f"up_blocks.{block_id}.upsamplers.0.conv.{suffix}"] = unet.pop(k)

    leftover = [k for k in unet if not k.startswith("label_emb")]
    if leftover:
        logger.warning(f"{len(leftover)} unconverted unet keys, e.g. {leftover[:5]}")
    return out


def convert_ldm_vae_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    vae = _shave(sd, "first_stage_model.")
    if not vae:
        vae = dict(sd)
    out: Dict[str, np.ndarray] = {}
    mapping = [
        ("encoder.conv_in", "encoder.conv_in"),
        ("encoder.norm_out", "encoder.conv_norm_out"),
        ("encoder.conv_out", "encoder.conv_out"),
        ("decoder.conv_in", "decoder.conv_in"),
        ("decoder.norm_out", "decoder.conv_norm_out"),
        ("decoder.conv_out", "decoder.conv_out"),
        ("quant_conv", "quant_conv"),
        ("post_quant_conv", "post_quant_conv"),
    ]
    for old, new in mapping:
        for suffix in ("weight", "bias"):
            k = f"{old}.{suffix}"
            if k in vae:
                out[f"{new}.{suffix}"] = vae.pop(k)

    def convert_vae_resnet(src, dst):
        pairs = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2", "conv2": "conv2",
                 "nin_shortcut": "conv_shortcut"}
        for o, n in pairs.items():
            for suffix in ("weight", "bias"):
                k = f"{src}.{o}.{suffix}"
                if k in vae:
                    out[f"{dst}.{n}.{suffix}"] = vae.pop(k)

    def convert_vae_attn(src, dst):
        pairs = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0"}
        for o, n in pairs.items():
            for suffix in ("weight", "bias"):
                k = f"{src}.{o}.{suffix}"
                if k in vae:
                    w = vae.pop(k)
                    if n in ("to_q", "to_k", "to_v", "to_out.0") and w.ndim == 4:
                        w = w[:, :, 0, 0]  # 1x1 conv → linear
                    out[f"{dst}.{n}.{suffix}"] = w

    # encoder down blocks
    i = 0
    while any(k.startswith(f"encoder.down.{i}.") for k in vae):
        j = 0
        while any(k.startswith(f"encoder.down.{i}.block.{j}.") for k in vae):
            convert_vae_resnet(f"encoder.down.{i}.block.{j}", f"encoder.down_blocks.{i}.resnets.{j}")
            j += 1
        for suffix in ("weight", "bias"):
            k = f"encoder.down.{i}.downsample.conv.{suffix}"
            if k in vae:
                out[f"encoder.down_blocks.{i}.downsamplers.0.conv.{suffix}"] = vae.pop(k)
        i += 1
    # decoder up blocks: LDM order is reversed relative to diffusers
    n_up = 0
    while any(k.startswith(f"decoder.up.{n_up}.") for k in vae):
        n_up += 1
    for i in range(n_up):
        dst_i = n_up - 1 - i
        j = 0
        while any(k.startswith(f"decoder.up.{i}.block.{j}.") for k in vae):
            convert_vae_resnet(f"decoder.up.{i}.block.{j}", f"decoder.up_blocks.{dst_i}.resnets.{j}")
            j += 1
        for suffix in ("weight", "bias"):
            k = f"decoder.up.{i}.upsample.conv.{suffix}"
            if k in vae:
                out[f"decoder.up_blocks.{dst_i}.upsamplers.0.conv.{suffix}"] = vae.pop(k)
    # mid blocks
    for who in ("encoder", "decoder"):
        convert_vae_resnet(f"{who}.mid.block_1", f"{who}.mid_block.resnets.0")
        convert_vae_resnet(f"{who}.mid.block_2", f"{who}.mid_block.resnets.1")
        convert_vae_attn(f"{who}.mid.attn_1", f"{who}.mid_block.attentions.0")

    leftover = list(vae.keys())
    if leftover:
        logger.warning(f"{len(leftover)} unconverted vae keys, e.g. {leftover[:5]}")
    return out


def convert_ldm_clip_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """cond_stage_model.transformer.* → transformers CLIPTextModel keys."""
    out = {}
    for prefix in ("cond_stage_model.transformer.", "conditioner.embedders.0.transformer."):
        sub = _shave(sd, prefix)
        if sub:
            for k, v in sub.items():
                if k.endswith("position_ids"):
                    continue
                out[k] = v
            return out
    return out


def load_single_file_checkpoint(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    raise ValueError("only .safetensors single-file checkpoints are supported (no pickle)")
