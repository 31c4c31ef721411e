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


# ---------------------------------------------------------------------------
# Flux original (BFL) layout → diffusers keys (reference single_file_utils.py
# convert_flux_transformer_checkpoint_to_diffusers, :2255)
# ---------------------------------------------------------------------------


def convert_flux_transformer_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """BFL Flux keys (double_blocks/single_blocks/img_in/txt_in/time_in/
    vector_in/guidance_in/final_layer) → diffusers FluxTransformer2DModel keys."""
    ckpt = {k.replace("model.diffusion_model.", ""): v for k, v in sd.items()}
    out: Dict[str, np.ndarray] = {}
    num_layers = max((int(k.split(".", 2)[1]) for k in ckpt if k.startswith("double_blocks.")), default=-1) + 1
    num_single = max((int(k.split(".", 2)[1]) for k in ckpt if k.startswith("single_blocks.")), default=-1) + 1
    inner_dim = ckpt["img_in.weight"].shape[0]
    mlp_hidden = int(inner_dim * 4.0)

    def swap_scale_shift(w):
        shift, scale = np.split(w, 2, axis=0)
        return np.concatenate([scale, shift], axis=0)

    simple = {
        "time_text_embed.timestep_embedder.linear_1": "time_in.in_layer",
        "time_text_embed.timestep_embedder.linear_2": "time_in.out_layer",
        "time_text_embed.text_embedder.linear_1": "vector_in.in_layer",
        "time_text_embed.text_embedder.linear_2": "vector_in.out_layer",
        "context_embedder": "txt_in",
        "x_embedder": "img_in",
        "proj_out": "final_layer.linear",
    }
    if any("guidance_in" in k for k in ckpt):
        simple["time_text_embed.guidance_embedder.linear_1"] = "guidance_in.in_layer"
        simple["time_text_embed.guidance_embedder.linear_2"] = "guidance_in.out_layer"
    for dst, src in simple.items():
        out[f"{dst}.weight"] = ckpt.pop(f"{src}.weight")
        out[f"{dst}.bias"] = ckpt.pop(f"{src}.bias")
    out["norm_out.linear.weight"] = swap_scale_shift(ckpt.pop("final_layer.adaLN_modulation.1.weight"))
    out["norm_out.linear.bias"] = swap_scale_shift(ckpt.pop("final_layer.adaLN_modulation.1.bias"))

    for i in range(num_layers):
        p = f"transformer_blocks.{i}."
        s = f"double_blocks.{i}."
        out[f"{p}norm1.linear.weight"] = ckpt.pop(f"{s}img_mod.lin.weight")
        out[f"{p}norm1.linear.bias"] = ckpt.pop(f"{s}img_mod.lin.bias")
        out[f"{p}norm1_context.linear.weight"] = ckpt.pop(f"{s}txt_mod.lin.weight")
        out[f"{p}norm1_context.linear.bias"] = ckpt.pop(f"{s}txt_mod.lin.bias")
        for kind, names in (
            ("img_attn", ("to_q", "to_k", "to_v")),
            ("txt_attn", ("add_q_proj", "add_k_proj", "add_v_proj")),
        ):
            qkv_w = np.split(ckpt.pop(f"{s}{kind}.qkv.weight"), 3, axis=0)
            qkv_b = np.split(ckpt.pop(f"{s}{kind}.qkv.bias"), 3, axis=0)
            for j, n in enumerate(names):
                out[f"{p}attn.{n}.weight"] = qkv_w[j]
                out[f"{p}attn.{n}.bias"] = qkv_b[j]
        out[f"{p}attn.norm_q.weight"] = ckpt.pop(f"{s}img_attn.norm.query_norm.scale")
        out[f"{p}attn.norm_k.weight"] = ckpt.pop(f"{s}img_attn.norm.key_norm.scale")
        out[f"{p}attn.norm_added_q.weight"] = ckpt.pop(f"{s}txt_attn.norm.query_norm.scale")
        out[f"{p}attn.norm_added_k.weight"] = ckpt.pop(f"{s}txt_attn.norm.key_norm.scale")
        out[f"{p}ff.net.0.proj.weight"] = ckpt.pop(f"{s}img_mlp.0.weight")
        out[f"{p}ff.net.0.proj.bias"] = ckpt.pop(f"{s}img_mlp.0.bias")
        out[f"{p}ff.net.2.weight"] = ckpt.pop(f"{s}img_mlp.2.weight")
        out[f"{p}ff.net.2.bias"] = ckpt.pop(f"{s}img_mlp.2.bias")
        out[f"{p}ff_context.net.0.proj.weight"] = ckpt.pop(f"{s}txt_mlp.0.weight")
        out[f"{p}ff_context.net.0.proj.bias"] = ckpt.pop(f"{s}txt_mlp.0.bias")
        out[f"{p}ff_context.net.2.weight"] = ckpt.pop(f"{s}txt_mlp.2.weight")
        out[f"{p}ff_context.net.2.bias"] = ckpt.pop(f"{s}txt_mlp.2.bias")
        out[f"{p}attn.to_out.0.weight"] = ckpt.pop(f"{s}img_attn.proj.weight")
        out[f"{p}attn.to_out.0.bias"] = ckpt.pop(f"{s}img_attn.proj.bias")
        out[f"{p}attn.to_add_out.weight"] = ckpt.pop(f"{s}txt_attn.proj.weight")
        out[f"{p}attn.to_add_out.bias"] = ckpt.pop(f"{s}txt_attn.proj.bias")

    for i in range(num_single):
        p = f"single_transformer_blocks.{i}."
        s = f"single_blocks.{i}."
        out[f"{p}norm.linear.weight"] = ckpt.pop(f"{s}modulation.lin.weight")
        out[f"{p}norm.linear.bias"] = ckpt.pop(f"{s}modulation.lin.bias")
        splits = [inner_dim, 2 * inner_dim, 3 * inner_dim]
        q, k, v, mlp = np.split(ckpt.pop(f"{s}linear1.weight"), splits, axis=0)
        qb, kb, vb, mlpb = np.split(ckpt.pop(f"{s}linear1.bias"), splits, axis=0)
        out[f"{p}attn.to_q.weight"], out[f"{p}attn.to_q.bias"] = q, qb
        out[f"{p}attn.to_k.weight"], out[f"{p}attn.to_k.bias"] = k, kb
        out[f"{p}attn.to_v.weight"], out[f"{p}attn.to_v.bias"] = v, vb
        out[f"{p}proj_mlp.weight"], out[f"{p}proj_mlp.bias"] = mlp, mlpb
        out[f"{p}attn.norm_q.weight"] = ckpt.pop(f"{s}norm.query_norm.scale")
        out[f"{p}attn.norm_k.weight"] = ckpt.pop(f"{s}norm.key_norm.scale")
        out[f"{p}proj_out.weight"] = ckpt.pop(f"{s}linear2.weight")
        out[f"{p}proj_out.bias"] = ckpt.pop(f"{s}linear2.bias")
    return out


def is_flux_single_file(sd: Dict[str, np.ndarray]) -> bool:
    return any(k.startswith(("double_blocks.", "model.diffusion_model.double_blocks.")) for k in sd)


def load_flux_transformer_single_file(path_or_state_dict, config_overrides: Optional[dict] = None,
                                      dtype=None):
    """Load a BFL-layout Flux single-file checkpoint into a
    (FluxTransformer2DModel, params) pair (reference FromOriginalModelMixin,
    `loaders/single_file_model.py`; key map `single_file_utils.py:2255`).
    Config (layer counts, dims, guidance) is inferred from the state dict."""
    from ..models.modeling_utils import convert_torch_state_dict
    from ..models.transformers.transformer_flux import FluxTransformer2DModel
    from ..utils.jax_utils import resolve_dtype

    sd = path_or_state_dict
    if not isinstance(sd, dict):
        sd = load_single_file_checkpoint(str(sd))
    converted = convert_flux_transformer_state_dict(sd)

    inner_dim = converted["x_embedder.weight"].shape[0]
    in_channels = converted["x_embedder.weight"].shape[1]
    joint_dim = converted["context_embedder.weight"].shape[1]
    pooled_dim = converted["time_text_embed.text_embedder.linear_1.weight"].shape[1]
    num_layers = max((int(k.split(".")[1]) for k in converted if k.startswith("transformer_blocks.")), default=-1) + 1
    num_single = max(
        (int(k.split(".")[1]) for k in converted if k.startswith("single_transformer_blocks.")), default=-1) + 1
    head_dim = converted["transformer_blocks.0.attn.norm_q.weight"].shape[0] if num_layers else 128
    cfg = dict(
        patch_size=1,
        in_channels=in_channels,
        num_layers=num_layers,
        num_single_layers=num_single,
        attention_head_dim=head_dim,
        num_attention_heads=inner_dim // head_dim,
        joint_attention_dim=joint_dim,
        pooled_projection_dim=pooled_dim,
        guidance_embeds=any(k.startswith("time_text_embed.guidance_embedder") for k in converted),
    )
    cfg.update(config_overrides or {})
    model = FluxTransformer2DModel(**cfg)
    from ..utils.jax_utils import resolve_dtype as _rd

    params = convert_torch_state_dict(model, converted, dtype=resolve_dtype(dtype, default=None))
    return model, params


# ---------------------------------------------------------------------------
# SD3 / SD3.5 MMDiT single-file (reference single_file_utils.py:1979
# convert_sd3_transformer_checkpoint_to_diffusers, numpy re-derivation)
# ---------------------------------------------------------------------------


def is_sd3_single_file(sd: Dict[str, np.ndarray]) -> bool:
    return any(
        k.startswith(("joint_blocks.", "model.diffusion_model.joint_blocks.")) for k in sd
    )


def _swap_scale_shift(w: np.ndarray) -> np.ndarray:
    shift, scale = np.split(w, 2, axis=0)
    return np.concatenate([scale, shift], axis=0)


def convert_sd3_transformer_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """SAI MMDiT layout (`joint_blocks.N.{x_block,context_block}`) →
    diffusers SD3Transformer2DModel keys. Fused qkv split into to_q/k/v;
    final-layer AdaLN swapped shift<->scale like the reference."""
    sd = {k.replace("model.diffusion_model.", ""): v for k, v in sd.items()}
    out: Dict[str, np.ndarray] = {}
    num_layers = max(int(k.split(".", 2)[1]) for k in sd if k.startswith("joint_blocks.")) + 1
    dual_layers = {
        int(k.split(".", 2)[1]) for k in sd if ".x_block.attn2.qkv.weight" in k
    }
    has_qk_norm = any("ln_q" in k for k in sd)
    caption_dim = sd["context_embedder.weight"].shape[0]

    out["pos_embed.pos_embed"] = sd["pos_embed"]
    out["pos_embed.proj.weight"] = sd["x_embedder.proj.weight"]
    out["pos_embed.proj.bias"] = sd["x_embedder.proj.bias"]
    for ours, theirs in [
        ("time_text_embed.timestep_embedder.linear_1", "t_embedder.mlp.0"),
        ("time_text_embed.timestep_embedder.linear_2", "t_embedder.mlp.2"),
        ("time_text_embed.text_embedder.linear_1", "y_embedder.mlp.0"),
        ("time_text_embed.text_embedder.linear_2", "y_embedder.mlp.2"),
        ("context_embedder", "context_embedder"),
    ]:
        out[f"{ours}.weight"] = sd[f"{theirs}.weight"]
        out[f"{ours}.bias"] = sd[f"{theirs}.bias"]

    for i in range(num_layers):
        blk, last = f"transformer_blocks.{i}", i == num_layers - 1
        for theirs_blk, q, k, v in [
            (f"joint_blocks.{i}.x_block.attn", f"{blk}.attn.to_q", f"{blk}.attn.to_k", f"{blk}.attn.to_v"),
            (f"joint_blocks.{i}.context_block.attn", f"{blk}.attn.add_q_proj", f"{blk}.attn.add_k_proj", f"{blk}.attn.add_v_proj"),
        ]:
            for suffix in ("weight", "bias"):
                qw, kw, vw = np.split(sd[f"{theirs_blk}.qkv.{suffix}"], 3, axis=0)
                out[f"{q}.{suffix}"], out[f"{k}.{suffix}"], out[f"{v}.{suffix}"] = qw, kw, vw
        if has_qk_norm:
            out[f"{blk}.attn.norm_q.weight"] = sd[f"joint_blocks.{i}.x_block.attn.ln_q.weight"]
            out[f"{blk}.attn.norm_k.weight"] = sd[f"joint_blocks.{i}.x_block.attn.ln_k.weight"]
            out[f"{blk}.attn.norm_added_q.weight"] = sd[f"joint_blocks.{i}.context_block.attn.ln_q.weight"]
            out[f"{blk}.attn.norm_added_k.weight"] = sd[f"joint_blocks.{i}.context_block.attn.ln_k.weight"]
        out[f"{blk}.attn.to_out.0.weight"] = sd[f"joint_blocks.{i}.x_block.attn.proj.weight"]
        out[f"{blk}.attn.to_out.0.bias"] = sd[f"joint_blocks.{i}.x_block.attn.proj.bias"]
        if not last:
            out[f"{blk}.attn.to_add_out.weight"] = sd[f"joint_blocks.{i}.context_block.attn.proj.weight"]
            out[f"{blk}.attn.to_add_out.bias"] = sd[f"joint_blocks.{i}.context_block.attn.proj.bias"]

        if i in dual_layers:
            for suffix in ("weight", "bias"):
                qw, kw, vw = np.split(sd[f"joint_blocks.{i}.x_block.attn2.qkv.{suffix}"], 3, axis=0)
                out[f"{blk}.attn2.to_q.{suffix}"] = qw
                out[f"{blk}.attn2.to_k.{suffix}"] = kw
                out[f"{blk}.attn2.to_v.{suffix}"] = vw
            if has_qk_norm:
                out[f"{blk}.attn2.norm_q.weight"] = sd[f"joint_blocks.{i}.x_block.attn2.ln_q.weight"]
                out[f"{blk}.attn2.norm_k.weight"] = sd[f"joint_blocks.{i}.x_block.attn2.ln_k.weight"]
            out[f"{blk}.attn2.to_out.0.weight"] = sd[f"joint_blocks.{i}.x_block.attn2.proj.weight"]
            out[f"{blk}.attn2.to_out.0.bias"] = sd[f"joint_blocks.{i}.x_block.attn2.proj.bias"]

        out[f"{blk}.norm1.linear.weight"] = sd[f"joint_blocks.{i}.x_block.adaLN_modulation.1.weight"]
        out[f"{blk}.norm1.linear.bias"] = sd[f"joint_blocks.{i}.x_block.adaLN_modulation.1.bias"]
        ctx_w = sd[f"joint_blocks.{i}.context_block.adaLN_modulation.1.weight"]
        ctx_b = sd[f"joint_blocks.{i}.context_block.adaLN_modulation.1.bias"]
        if last:
            ctx_w, ctx_b = _swap_scale_shift(ctx_w), _swap_scale_shift(ctx_b)
        out[f"{blk}.norm1_context.linear.weight"] = ctx_w
        out[f"{blk}.norm1_context.linear.bias"] = ctx_b

        out[f"{blk}.ff.net.0.proj.weight"] = sd[f"joint_blocks.{i}.x_block.mlp.fc1.weight"]
        out[f"{blk}.ff.net.0.proj.bias"] = sd[f"joint_blocks.{i}.x_block.mlp.fc1.bias"]
        out[f"{blk}.ff.net.2.weight"] = sd[f"joint_blocks.{i}.x_block.mlp.fc2.weight"]
        out[f"{blk}.ff.net.2.bias"] = sd[f"joint_blocks.{i}.x_block.mlp.fc2.bias"]
        if not last:
            out[f"{blk}.ff_context.net.0.proj.weight"] = sd[f"joint_blocks.{i}.context_block.mlp.fc1.weight"]
            out[f"{blk}.ff_context.net.0.proj.bias"] = sd[f"joint_blocks.{i}.context_block.mlp.fc1.bias"]
            out[f"{blk}.ff_context.net.2.weight"] = sd[f"joint_blocks.{i}.context_block.mlp.fc2.weight"]
            out[f"{blk}.ff_context.net.2.bias"] = sd[f"joint_blocks.{i}.context_block.mlp.fc2.bias"]

    out["proj_out.weight"] = sd["final_layer.linear.weight"]
    out["proj_out.bias"] = sd["final_layer.linear.bias"]
    out["norm_out.linear.weight"] = _swap_scale_shift(sd["final_layer.adaLN_modulation.1.weight"])
    out["norm_out.linear.bias"] = _swap_scale_shift(sd["final_layer.adaLN_modulation.1.bias"])
    return out


def load_sd3_transformer_single_file(path_or_state_dict, config_overrides: Optional[dict] = None,
                                     dtype=None):
    """SAI-layout SD3/SD3.5 single file → (SD3Transformer2DModel, params);
    config inferred from the state dict (layer count, dual-attn layers,
    qk_norm, pos_embed grid)."""
    from ..models.modeling_utils import convert_torch_state_dict
    from ..models.transformers.transformer_sd3 import SD3Transformer2DModel
    from ..utils.jax_utils import resolve_dtype

    sd = path_or_state_dict
    if not isinstance(sd, dict):
        sd = load_single_file_checkpoint(str(sd))
    converted = convert_sd3_transformer_state_dict(sd)

    inner_dim = converted["pos_embed.proj.weight"].shape[0]
    num_layers = max(int(k.split(".")[1]) for k in converted if k.startswith("transformer_blocks.")) + 1
    dual_layers = tuple(sorted(
        int(k.split(".")[1]) for k in converted if k.endswith(".attn2.to_q.weight")
    ))
    head_dim = 64
    cfg = dict(
        sample_size=128,
        patch_size=converted["pos_embed.proj.weight"].shape[-1],
        in_channels=converted["pos_embed.proj.weight"].shape[1],
        num_layers=num_layers,
        attention_head_dim=head_dim,
        num_attention_heads=inner_dim // head_dim,
        joint_attention_dim=converted["context_embedder.weight"].shape[1],
        caption_projection_dim=converted["context_embedder.weight"].shape[0],
        pooled_projection_dim=converted["time_text_embed.text_embedder.linear_1.weight"].shape[1],
        out_channels=converted["proj_out.weight"].shape[0] // (converted["pos_embed.proj.weight"].shape[-1] ** 2),
        pos_embed_max_size=int(round(converted["pos_embed.pos_embed"].shape[1] ** 0.5)),
        qk_norm="rms_norm" if any(".norm_q." in k for k in converted) else None,
        dual_attention_layers=dual_layers,
    )
    cfg.update(config_overrides or {})
    model = SD3Transformer2DModel(**cfg)
    params = convert_torch_state_dict(model, converted, dtype=resolve_dtype(dtype, default=None))
    return model, params


# ---------------------------------------------------------------------------
# Wan single-file (reference single_file_utils.py:3172
# convert_wan_transformer_to_diffusers — base + I2V + VACE rename table;
# face-adapter/motion-encoder specials are Wan-Animate-only and omitted)
# ---------------------------------------------------------------------------

_WAN_RENAME = [
    ("model.diffusion_model.", ""),
    ("time_embedding.0", "condition_embedder.time_embedder.linear_1"),
    ("time_embedding.2", "condition_embedder.time_embedder.linear_2"),
    ("text_embedding.0", "condition_embedder.text_embedder.linear_1"),
    ("text_embedding.2", "condition_embedder.text_embedder.linear_2"),
    ("time_projection.1", "condition_embedder.time_proj"),
    ("cross_attn", "attn2"),
    ("self_attn", "attn1"),
    (".o.", ".to_out.0."),
    (".q.", ".to_q."),
    (".k.", ".to_k."),
    (".v.", ".to_v."),
    (".k_img.", ".add_k_proj."),
    (".v_img.", ".add_v_proj."),
    (".norm_k_img.", ".norm_added_k."),
    ("head.modulation", "scale_shift_table"),
    ("head.head", "proj_out"),
    ("modulation", "scale_shift_table"),
    ("ffn.0", "ffn.net.0.proj"),
    ("ffn.2", "ffn.net.2"),
    # norm2 <-> norm3 swap (reference comment "Hack to swap the layer names")
    ("norm2", "norm__placeholder"),
    ("norm3", "norm2"),
    ("norm__placeholder", "norm3"),
    # I2V
    ("img_emb.proj.0", "condition_embedder.image_embedder.norm1"),
    ("img_emb.proj.1", "condition_embedder.image_embedder.ff.net.0.proj"),
    ("img_emb.proj.3", "condition_embedder.image_embedder.ff.net.2"),
    ("img_emb.proj.4", "condition_embedder.image_embedder.norm2"),
    # VACE
    ("before_proj", "proj_in"),
    ("after_proj", "proj_out"),
]


def convert_wan_transformer_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for key, v in sd.items():
        new_key = key
        for old, new in _WAN_RENAME:
            new_key = new_key.replace(old, new)
        out[new_key] = v
    return out


def load_wan_transformer_single_file(path_or_state_dict, config_overrides: Optional[dict] = None,
                                     dtype=None):
    """Community Wan single-file checkpoint → (WanTransformer3DModel, params);
    config inferred from the state dict (reference `single_file_utils.py:3172`)."""
    from ..models.modeling_utils import convert_torch_state_dict
    from ..models.transformers.transformer_wan import WanTransformer3DModel
    from ..utils.jax_utils import resolve_dtype

    sd = path_or_state_dict
    if not isinstance(sd, dict):
        sd = load_single_file_checkpoint(str(sd))
    converted = convert_wan_transformer_state_dict(sd)
    inner_dim = converted["patch_embedding.weight"].shape[0]
    in_channels = converted["patch_embedding.weight"].shape[1]
    num_layers = max((int(k.split(".")[1]) for k in converted if k.startswith("blocks.")), default=-1) + 1
    # qk-norm is across heads ([inner_dim]) so head_dim is not inferable from
    # the state dict; Wan ships 128 everywhere (override for other configs)
    head_dim = (config_overrides or {}).get("attention_head_dim", 128)
    ffn_dim = converted["blocks.0.ffn.net.0.proj.weight"].shape[0]
    text_dim = converted["condition_embedder.text_embedder.linear_1.weight"].shape[1]
    out_channels = converted["proj_out.weight"].shape[0] // 4  # patch 1x2x2
    cfg = dict(
        in_channels=in_channels,
        out_channels=out_channels,
        num_layers=num_layers,
        attention_head_dim=head_dim,
        num_attention_heads=inner_dim // head_dim,
        ffn_dim=ffn_dim,
        text_dim=text_dim,
        image_dim=(converted["condition_embedder.image_embedder.ff.net.0.proj.weight"].shape[1]
                   if any(k.startswith("condition_embedder.image_embedder") for k in converted) else None),
        added_kv_proj_dim=(inner_dim
                           if any(".add_k_proj." in k for k in converted) else None),
    )
    cfg.update(config_overrides or {})
    model = WanTransformer3DModel(**cfg)
    params = convert_torch_state_dict(model, converted, dtype=resolve_dtype(dtype, default=None))
    return model, params


# ---------------------------------------------------------------------------
# LTX-Video single-file (reference single_file_utils.py:2452)
# ---------------------------------------------------------------------------

_LTX_RENAME = [
    ("model.diffusion_model.", ""),
    ("patchify_proj", "proj_in"),
    ("adaln_single", "time_embed"),
    ("q_norm", "norm_q"),
    ("k_norm", "norm_k"),
]


def convert_ltx_transformer_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for key, v in sd.items():
        if "vae" in key:
            continue
        new_key = key
        for old, new in _LTX_RENAME:
            new_key = new_key.replace(old, new)
        out[new_key] = v
    return out


def load_ltx_transformer_single_file(path_or_state_dict, config_overrides: Optional[dict] = None,
                                     dtype=None):
    """Community LTX-Video single-file checkpoint → (LTXVideoTransformer3DModel,
    params) (reference `single_file_utils.py:2452`)."""
    from ..models.modeling_utils import convert_torch_state_dict
    from ..models.transformers.transformer_ltx import LTXVideoTransformer3DModel
    from ..utils.jax_utils import resolve_dtype

    sd = path_or_state_dict
    if not isinstance(sd, dict):
        sd = load_single_file_checkpoint(str(sd))
    converted = convert_ltx_transformer_state_dict(sd)
    inner_dim = converted["proj_in.weight"].shape[0]
    in_channels = converted["proj_in.weight"].shape[1]
    num_layers = max((int(k.split(".")[1]) for k in converted
                      if k.startswith("transformer_blocks.")), default=-1) + 1
    # qk-norm is across heads; LTX ships head_dim 64 (override otherwise)
    head_dim = (config_overrides or {}).get("attention_head_dim", 64)
    caption_channels = converted["caption_projection.linear_1.weight"].shape[1]
    cross_dim = converted["transformer_blocks.0.attn2.to_k.weight"].shape[1]
    cfg = dict(
        in_channels=in_channels,
        out_channels=in_channels,
        num_layers=num_layers,
        attention_head_dim=head_dim,
        num_attention_heads=inner_dim // head_dim,
        cross_attention_dim=cross_dim,
        caption_channels=caption_channels,
    )
    cfg.update(config_overrides or {})
    model = LTXVideoTransformer3DModel(**cfg)
    params = convert_torch_state_dict(model, converted, dtype=resolve_dtype(dtype, default=None))
    return model, params


# ---------------------------------------------------------------------------
# checkpoint-type inference (reference single_file_utils.py:62
# CHECKPOINT_KEY_NAMES + infer_diffusers_model_type, practical subset)
# ---------------------------------------------------------------------------

def _has_any(*keys):
    return lambda sd: any(k in sd for k in keys)


_CHECKPOINT_SNIFF_KEYS = [
    # (type, any-of key predicates) — ordered most-specific first, mirroring
    # the reference's CHECKPOINT_KEY_NAMES (`single_file_utils.py:62-157`)
    ("flux2", _has_any("model.diffusion_model.single_stream_modulation.lin.weight",
                       "single_stream_modulation.lin.weight")),
    ("flux", lambda sd: any(k.startswith(("double_blocks.", "model.diffusion_model.double_blocks.")) for k in sd)),
    ("sd3", lambda sd: any(k.startswith(("joint_blocks.", "model.diffusion_model.joint_blocks.")) for k in sd)),
    ("sdxl_refiner", _has_any("conditioner.embedders.0.model.transformer.resblocks.9.mlp.c_proj.bias")),
    ("sdxl", _has_any("conditioner.embedders.1.model.transformer.resblocks.9.mlp.c_proj.bias")),
    ("sd2", lambda sd: "model.diffusion_model.input_blocks.2.1.transformer_blocks.0.attn2.to_k.weight" in sd
        and sd["model.diffusion_model.input_blocks.2.1.transformer_blocks.0.attn2.to_k.weight"].shape[-1] == 1024),
    ("animatediff", _has_any(
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.attention_blocks.0.pos_encoder.pe",
        "mid_block.motion_modules.0.temporal_transformer.norm.bias")),
    ("controlnet", lambda sd: any(k.startswith("control_model.") for k in sd)),
    ("auraflow", _has_any("double_layers.0.attn.w2q.weight", "cond_seq_linear.weight")),
    ("ltx2", _has_any(
        "model.diffusion_model.av_ca_a2v_gate_adaln_single.emb.timestep_embedder.linear_1.weight",
        "audio_vae.per_channel_statistics.mean-of-means")),
    ("ltx_video", _has_any("model.diffusion_model.patchify_proj.weight", "patchify_proj.weight",
                           "vae.decoder.last_scale_shift_table")),
    ("hunyuan_video", _has_any("txt_in.individual_token_refiner.blocks.0.adaLN_modulation.1.bias")),
    ("mochi", _has_any("model.diffusion_model.blocks.0.attn.qkv_x.weight", "blocks.0.attn.qkv_x.weight")),
    ("lumina2", _has_any("model.diffusion_model.cap_embedder.0.weight", "cap_embedder.0.weight")),
    ("wan_vace", _has_any("vace_blocks.0.after_proj.bias")),
    ("wan_animate", _has_any("motion_encoder.dec.direction.weight")),
    ("wan", _has_any("model.diffusion_model.head.modulation", "head.modulation")),
    ("wan_vae", _has_any("decoder.middle.0.residual.0.gamma")),
    ("z_image", _has_any("model.diffusion_model.layers.0.adaLN_modulation.0.weight",
                         "layers.0.adaLN_modulation.0.weight")),
    ("hidream", _has_any("double_stream_blocks.0.block.adaLN_modulation.1.bias")),
    ("sana", _has_any("blocks.0.cross_attn.q_linear.weight", "blocks.0.cross_attn.kv_linear.weight")),
    ("cosmos", _has_any("net.x_embedder.proj.1.weight")),
    ("autoencoder_dc", _has_any("decoder.stages.1.op_list.0.main.conv.conv.bias",
                                "encoder.project_in.conv.bias")),
    ("instruct_pix2pix", lambda sd: "model.diffusion_model.input_blocks.0.0.weight" in sd
        and sd["model.diffusion_model.input_blocks.0.0.weight"].shape[1] == 8),
    ("sd1", lambda sd: any(k.startswith("model.diffusion_model.") for k in sd)),
]


def infer_single_file_checkpoint_type(sd: Dict[str, np.ndarray]) -> str:
    """Sniff which model family a monolithic state dict belongs to."""
    for name, predicate in _CHECKPOINT_SNIFF_KEYS:
        try:
            if predicate(sd):
                return name
        except Exception:
            continue
    raise ValueError(
        "could not infer the checkpoint type from the state dict keys; "
        f"sample keys: {sorted(sd)[:5]}"
    )
