"""LoRA loading & fusing.

TPU-native counterpart of the reference LoRA stack
(`/root/reference/src/diffusers/loaders/peft.py:57` PeftAdapterMixin,
`lora_base.py:478`, format converters in `lora_conversion_utils.py`).

Design: with pure-functional params there is no module surgery — a LoRA is
fused as a weight delta: ``W' = W + scale * (α/r) · (B·A)ᵀ`` (transposed into
our [in, out] Linear layout). Fusing is a one-time pytree map, so the hot
path is untouched (the reference's runtime-hooked LoRA costs a second matmul
per layer). `unfuse` is the caller keeping the original params pytree.

Supported checkpoint formats (auto-detected in `group_lora_weights`):
  * diffusers/PEFT: ``<path>.lora_A.weight`` / ``<path>.lora_B.weight``
    (optionally prefixed ``transformer.``/``unet.``/``text_encoder.``)
  * kohya-ss: ``lora_unet_<path with _>.lora_up/lora_down.weight`` + ``alpha``
  * xlabs Flux (``.processor.`` down/up pairs)
  * Wan trainers (``diffusion_model.blocks.N.self_attn...``)
  * musubi-tuner Wan (``lora_unet_blocks_N_<module>``)
  * QwenImage kohya-flattened (``lora_unet_transformer_blocks_N_...``)
  * HunyuanVideo original layout (fused ``img_attn_qkv``/``linear1`` splits)
  * generic ``diffusion_model.``-prefix (LTX-Video, HiDream, ComfyUI trainers)

Runtime surface: `PipelineLoraMixin` — named adapters, per-adapter scales,
`hotswap_lora_weights` (same-shape weight swap that keeps jitted graphs).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)

_COMPONENT_PREFIXES = ("transformer.", "unet.", "text_encoder.", "text_encoder_2.")


def _strip_prefix(key: str) -> str:
    for p in _COMPONENT_PREFIXES:
        if key.startswith(p):
            return key[len(p):]
    return key


def convert_kohya_lora(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """kohya-ss naming → diffusers naming (subset: unet + text encoder linears).

    kohya: ``lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q.lora_down.weight``
    """
    out = {}
    for key, value in state_dict.items():
        if ".alpha" in key or key.endswith("alpha"):
            base = key.replace(".alpha", "")
            out[_kohya_path(base) + ".alpha"] = value
            continue
        if ".lora_down.weight" in key:
            base = key.replace(".lora_down.weight", "")
            out[_kohya_path(base) + ".lora_A.weight"] = value
        elif ".lora_up.weight" in key:
            base = key.replace(".lora_up.weight", "")
            out[_kohya_path(base) + ".lora_B.weight"] = value
        else:
            out[key] = value
    return out


def _kohya_path(base: str) -> str:
    if base.startswith("lora_unet_"):
        prefix, rest = "unet.", base[len("lora_unet_"):]
    elif base.startswith("lora_te_"):
        prefix, rest = "text_encoder.", base[len("lora_te_"):]
    elif base.startswith("lora_te1_"):
        prefix, rest = "text_encoder.", base[len("lora_te1_"):]
    elif base.startswith("lora_te2_"):
        prefix, rest = "text_encoder_2.", base[len("lora_te2_"):]
    else:
        return base
    # underscores between path segments become dots except inside known
    # multi-word module names
    rest = rest.replace("_", ".")
    words = [
        "single.transformer.blocks", "transformer.blocks", "down.blocks", "up.blocks", "mid.block",
        "attentions", "resnets", "to.add.out", "to.q", "to.k", "to.v", "to.out", "proj.in", "proj.out",
        "ff.net", "text.model", "self.attn", "q.proj", "k.proj", "v.proj", "out.proj", "encoder.layers",
        "conv.shortcut", "time.emb.proj", "conv.in", "conv.out", "proj.mlp", "x.embedder",
        "context.embedder", "add.q.proj", "add.k.proj", "add.v.proj",
    ]
    # longest-first so nested names (single.transformer.blocks) win
    for word in sorted(words, key=len, reverse=True):
        rest = rest.replace(word, word.replace(".", "_"))
    return prefix + rest


def convert_xlabs_flux_lora(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """xlabs Flux LoRA naming → diffusers/peft naming (reference
    `loaders/lora_conversion_utils.py:951` _convert_xlabs_flux_lora_to_diffusers).

    xlabs keys: ``double_blocks.<i>.processor.{qkv_lora1,qkv_lora2,proj_lora1,
    proj_lora2}.{down,up}.weight`` (+ ``single_blocks.<i>.processor.
    {qkv_lora,proj_lora}``). Fused qkv LoRAs are split: the shared down (A)
    weight is copied to q/k/v; the up (B) weight is row-split."""
    sd = dict(state_dict)
    out: Dict[str, np.ndarray] = {}

    def handle_qkv(down_key, targets):
        down = sd.pop(down_key)
        up = sd.pop(down_key.replace(".down.weight", ".up.weight"))
        dims = up.shape[0] // len(targets)
        for j, tgt in enumerate(targets):
            out[tgt + ".lora_A.weight"] = down
            out[tgt + ".lora_B.weight"] = up[j * dims:(j + 1) * dims]

    for key in list(sd.keys()):
        if key not in sd:
            continue
        k = key.removeprefix("diffusion_model.")
        m = re.search(r"double_blocks\.(\d+)", k)
        ms = re.search(r"single_blocks\.(\d+)", k)
        if m:
            blk = f"transformer.transformer_blocks.{m.group(1)}"
            if "processor.qkv_lora1" in k:
                if k.endswith(".down.weight"):
                    handle_qkv(key, [f"{blk}.attn.to_q", f"{blk}.attn.to_k", f"{blk}.attn.to_v"])
                continue
            if "processor.qkv_lora2" in k:
                if k.endswith(".down.weight"):
                    handle_qkv(key, [f"{blk}.attn.add_q_proj", f"{blk}.attn.add_k_proj", f"{blk}.attn.add_v_proj"])
                continue
            if "processor.proj_lora1" in k:
                tgt = f"{blk}.attn.to_out.0"
            elif "processor.proj_lora2" in k:
                tgt = f"{blk}.attn.to_add_out"
            else:
                out[key] = sd.pop(key)
                continue
            suffix = ".lora_A.weight" if k.endswith(".down.weight") else ".lora_B.weight"
            out[tgt + suffix] = sd.pop(key)
        elif ms:
            blk = f"transformer.single_transformer_blocks.{ms.group(1)}"
            if "qkv_lora" in k:
                if k.endswith(".down.weight"):
                    handle_qkv(key, [f"{blk}.attn.to_q", f"{blk}.attn.to_k", f"{blk}.attn.to_v"])
                continue
            if "proj_lora" in k:
                suffix = ".lora_A.weight" if k.endswith(".down.weight") else ".lora_B.weight"
                out[f"{blk}.proj_out" + suffix] = sd.pop(key)
            else:
                out[key] = sd.pop(key)
        else:
            out[key] = sd.pop(key)
    return out


def convert_wan_lora(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Wan trainer naming (``diffusion_model.blocks.N.self_attn...``) →
    diffusers naming (reference `lora_conversion_utils.py:1845`
    _convert_non_diffusers_wan_lora_to_diffusers, re-expressed as one
    table-driven substitution pass + alpha folding).

    Handles lora_down/lora_up OR lora_A/lora_B spellings, folds ``alpha``
    into the A/B weights (balanced power-of-two split like the reference),
    maps ``diff_b`` bias deltas to ``lora_B.bias``, and drops norm ``.diff``
    keys (zero-valued in known checkpoints)."""
    sd = {k[len("diffusion_model."):]: v for k, v in state_dict.items() if k.startswith("diffusion_model.")}
    down_key = "lora_A" if any(".lora_A." in k for k in sd) else "lora_down"
    up_key = "lora_B" if any(".lora_B." in k for k in sd) else "lora_up"

    # module-path substitutions (theirs -> diffusers); applied longest-first
    subs = [
        ("self_attn.q", "attn1.to_q"), ("self_attn.k", "attn1.to_k"),
        ("self_attn.v", "attn1.to_v"), ("self_attn.o", "attn1.to_out.0"),
        ("cross_attn.k_img", "attn2.add_k_proj"), ("cross_attn.v_img", "attn2.add_v_proj"),
        ("cross_attn.q", "attn2.to_q"), ("cross_attn.k", "attn2.to_k"),
        ("cross_attn.v", "attn2.to_v"), ("cross_attn.o", "attn2.to_out.0"),
        ("ffn.0", "ffn.net.0.proj"), ("ffn.2", "ffn.net.2"),
        ("time_projection.1", "condition_embedder.time_proj"),
        ("text_embedding.0", "condition_embedder.text_embedder.linear_1"),
        ("text_embedding.2", "condition_embedder.text_embedder.linear_2"),
        ("time_embedding.0", "condition_embedder.time_embedder.linear_1"),
        ("time_embedding.2", "condition_embedder.time_embedder.linear_2"),
        ("img_emb.proj.1", "condition_embedder.image_embedder.ff.net.0.proj"),
        ("img_emb.proj.3", "condition_embedder.image_embedder.ff.net.2"),
        ("head.head", "proj_out"),
    ]

    def map_path(path: str) -> str:
        for theirs, ours in sorted(subs, key=lambda s: len(s[0]), reverse=True):
            if f".{theirs}" in f".{path}":
                return f".{path}".replace(f".{theirs}", f".{ours}")[1:]
        return path

    out: Dict[str, np.ndarray] = {}
    alphas: Dict[str, float] = {}
    for key, value in sd.items():
        if key.endswith(".alpha"):
            alphas[map_path(key[: -len(".alpha")])] = float(np.asarray(value))
        elif key.endswith(f".{down_key}.weight"):
            out[map_path(key[: -len(f".{down_key}.weight")]) + ".lora_A.weight"] = value
        elif key.endswith(f".{up_key}.weight"):
            out[map_path(key[: -len(f".{up_key}.weight")]) + ".lora_B.weight"] = value
        elif key.endswith(".diff_b"):
            out[map_path(key[: -len(".diff_b")]) + ".lora_B.bias"] = value
        elif key.endswith(".diff"):
            logger.debug(f"dropping norm diff key {key} (zero-valued in known Wan LoRAs)")
        else:
            logger.warning(f"unhandled Wan LoRA key {key}; skipping")

    # fold alpha like the reference: scale split between A and B in balanced
    # powers of two (keeps both matrices in a sane fp16 range)
    for path, alpha in alphas.items():
        a_key, b_key = path + ".lora_A.weight", path + ".lora_B.weight"
        if a_key not in out or b_key not in out:
            continue
        rank = out[a_key].shape[0]
        scale = alpha / rank
        scale_down, scale_up = scale, 1.0
        while scale_down * 2 < scale_up:
            scale_down *= 2
            scale_up /= 2
        out[a_key] = out[a_key] * scale_down
        out[b_key] = out[b_key] * scale_up
    return {f"transformer.{k}": v for k, v in out.items()}


def convert_diffusion_model_prefix_lora(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Generic ``diffusion_model.``-prefixed LoRA whose inner names already
    match diffusers module paths (LTX-Video, HiDream, many ComfyUI trainers;
    reference `lora_conversion_utils.py:2159,2167`)."""
    return {
        "transformer." + k[len("diffusion_model."):]: v
        for k, v in state_dict.items()
        if k.startswith("diffusion_model.")
    }


_QWEN_PROTECTED = [
    # flattened n-grams that keep their underscores when unflattening
    "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
    "to_q", "to_k", "to_v", "to_out",
    "txt_mlp", "img_mlp", "txt_mod", "img_mod",
]
_QWEN_TOP_LEVEL = {
    "img_in": "img_in",
    "txt_in": "txt_in",
    "proj_out": "proj_out",
    "norm_out_linear": "norm_out.linear",
    "time_text_embed_timestep_embedder_linear_1": "time_text_embed.timestep_embedder.linear_1",
    "time_text_embed_timestep_embedder_linear_2": "time_text_embed.timestep_embedder.linear_2",
}


def convert_qwen_lora(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """QwenImage kohya-flattened naming (``lora_unet_transformer_blocks_N_...``)
    → diffusers naming (reference `lora_conversion_utils.py:2226`
    _convert_non_diffusers_qwen_lora_to_diffusers, lora_unet branch).

    Underscore-unflattening with protected n-grams (to_q, img_mod, ...);
    alpha is folded into the A/B pair with the reference's balanced
    power-of-two split."""
    sd = {k[len("lora_unet_"):]: v for k, v in state_dict.items() if k.startswith("lora_unet_")}

    def convert_base(base: str) -> str:
        for flat, dotted in _QWEN_TOP_LEVEL.items():
            if base == flat or base.startswith(flat + "."):
                return dotted + base[len(flat):]
        rest = base[len("transformer_blocks_"):]
        head, tail = (rest.split(".", 1) + [""])[:2]
        tail = ("." + tail) if tail else ""
        parts = head.split("_")
        merged, i = [], 0
        while i < len(parts):
            for prot in sorted(_QWEN_PROTECTED, key=lambda p: -p.count("_")):
                pw = prot.split("_")
                if parts[i: i + len(pw)] == pw:
                    merged.append(prot)
                    i += len(pw)
                    break
            else:
                merged.append(parts[i])
                i += 1
        return "transformer_blocks." + ".".join(merged) + tail

    out, alphas = {}, {}
    for key, value in sd.items():
        if key.endswith(".alpha"):
            alphas["transformer." + convert_base(key[: -len(".alpha")])] = float(np.asarray(value))
            continue
        for suffix, ours in ((".lora_down.weight", ".lora_A.weight"),
                             (".lora_up.weight", ".lora_B.weight")):
            if key.endswith(suffix):
                out["transformer." + convert_base(key[: -len(suffix)]) + ours] = value
                break
        else:
            logger.warning(f"unhandled Qwen LoRA key {key}; skipping")
    for path, alpha in alphas.items():
        a_key, b_key = path + ".lora_A.weight", path + ".lora_B.weight"
        if a_key not in out or b_key not in out:
            continue
        scale = alpha / out[a_key].shape[0]
        scale_down, scale_up = scale, 1.0
        while scale_down * 2 < scale_up:
            scale_down *= 2
            scale_up /= 2
        out[a_key] = out[a_key] * scale_down
        out[b_key] = out[b_key] * scale_up
    return out


_HUNYUAN_RENAMES = [
    # (theirs, diffusers) — longest-first substitution table mirroring the
    # reference TRANSFORMER_KEYS_RENAME_DICT
    # (`lora_conversion_utils.py:1704-1739`), restricted to linear modules a
    # LoRA can target.
    ("final_layer.adaLN_modulation.1", "norm_out.linear"),
    ("time_in.mlp.0", "time_text_embed.timestep_embedder.linear_1"),
    ("time_in.mlp.2", "time_text_embed.timestep_embedder.linear_2"),
    ("guidance_in.mlp.0", "time_text_embed.guidance_embedder.linear_1"),
    ("guidance_in.mlp.2", "time_text_embed.guidance_embedder.linear_2"),
    ("vector_in.in_layer", "time_text_embed.text_embedder.linear_1"),
    ("vector_in.out_layer", "time_text_embed.text_embedder.linear_2"),
    ("img_attn_proj", "attn.to_out.0"),
    ("txt_attn_proj", "attn.to_add_out"),
    ("img_mod.linear", "norm1.linear"),
    ("txt_mod.linear", "norm1_context.linear"),
    ("modulation.linear", "norm.linear"),
    ("final_layer.linear", "proj_out"),
    ("img_mlp", "ff"),
    ("txt_mlp", "ff_context"),
    ("img_in", "x_embedder"),
    ("fc1", "net.0.proj"),
    ("fc2", "net.2"),
]


def convert_hunyuan_video_lora(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HunyuanVideo original-layout LoRA (``double_blocks.N.img_attn_qkv``,
    ``single_blocks.N.linear1``, …) → diffusers naming.

    Re-expression of the reference
    `_convert_hunyuan_video_lora_to_diffusers` (`lora_conversion_utils.py:1599`)
    as a table-substitution pass + two fused-projection splitters:

    * fused ``img_attn_qkv``/``txt_attn_qkv``: ``lora_A`` is shared
      (duplicated) across q/k/v, ``lora_B`` is row-split in thirds;
    * single-block ``linear1`` (qkv‖mlp fused): ``lora_A`` duplicated across
      to_q/to_k/to_v/proj_mlp, ``lora_B`` row-split at 3×hidden.
    """
    sd = {}
    for k, v in state_dict.items():
        for p in ("transformer.", "diffusion_model."):
            if k.startswith(p):
                k = k[len(p):]
        sd[k] = v

    out: Dict[str, np.ndarray] = {}

    def rename(key: str) -> str:
        key = key.replace("double_blocks", "transformer_blocks")
        key = key.replace("single_blocks", "single_transformer_blocks")
        if key.startswith("txt_in."):
            # token-refiner tree (reference remap_txt_in_, `:1608-1627`)
            key = key.replace("individual_token_refiner.blocks", "token_refiner.refiner_blocks")
            key = key.replace("adaLN_modulation.1", "norm_out.linear")
            key = key.replace("txt_in", "context_embedder", 1)
            key = key.replace("t_embedder.mlp.0", "time_text_embed.timestep_embedder.linear_1")
            key = key.replace("t_embedder.mlp.2", "time_text_embed.timestep_embedder.linear_2")
            key = key.replace("c_embedder", "time_text_embed.text_embedder")
            key = key.replace("mlp", "ff")
            return key
        for theirs, ours in _HUNYUAN_RENAMES:
            key = key.replace(theirs, ours)
        key = key.replace("linear2", "proj_out")
        return key

    hidden = None
    for key, value in sd.items():
        value = np.asarray(value)
        is_A = ".lora_A." in key or ".lora_down." in key
        key = key.replace(".lora_down.weight", ".lora_A.weight").replace(
            ".lora_up.weight", ".lora_B.weight")
        fused = None
        if "img_attn_qkv" in key or "txt_attn_qkv" in key or "self_attn_qkv" in key:
            which = "img_attn_qkv" if "img_attn_qkv" in key else (
                "txt_attn_qkv" if "txt_attn_qkv" in key else "self_attn_qkv")
            heads = (("attn.to_q", "attn.to_k", "attn.to_v") if which != "txt_attn_qkv"
                     else ("attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj"))
            if is_A or key.endswith(".alpha"):
                for h in heads:
                    out[rename(key.replace(which, h))] = value
            else:
                for h, part in zip(heads, np.split(value, 3, axis=0)):
                    out[rename(key.replace(which, h))] = part
            fused = True
        elif "single_blocks" in key and ".linear1." in key:
            targets = ("attn.to_q", "attn.to_k", "attn.to_v", "proj_mlp")
            if is_A or key.endswith(".alpha"):
                for t in targets:
                    out[rename(key.replace("linear1", t))] = value
            else:
                if hidden is None:
                    hidden = value.shape[0] * 3 // 13 if value.shape[0] % 13 == 0 else 3072
                splits = np.split(value, [hidden, 2 * hidden, 3 * hidden], axis=0)
                for t, part in zip(targets, splits):
                    out[rename(key.replace("linear1", t))] = part
            fused = True
        if not fused:
            out[rename(key)] = value
    return {f"transformer.{k}": v for k, v in out.items()}


_MUSUBI_WAN_SUBS = [
    # flattened musubi-tuner names → diffusers Wan module paths (reference
    # `_convert_musubi_wan_lora_to_diffusers`, `lora_conversion_utils.py:2098`)
    ("self_attn_q", "attn1.to_q"), ("self_attn_k", "attn1.to_k"),
    ("self_attn_v", "attn1.to_v"), ("self_attn_o", "attn1.to_out.0"),
    ("cross_attn_k_img", "attn2.add_k_proj"), ("cross_attn_v_img", "attn2.add_v_proj"),
    ("cross_attn_q", "attn2.to_q"), ("cross_attn_k", "attn2.to_k"),
    ("cross_attn_v", "attn2.to_v"), ("cross_attn_o", "attn2.to_out.0"),
    ("ffn_0", "ffn.net.0.proj"), ("ffn_2", "ffn.net.2"),
]


def convert_musubi_wan_lora(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """musubi-tuner Wan LoRA (``lora_unet_blocks_N_<module>``) → diffusers
    naming, with alpha folded into the A/B pair using the reference's
    balanced power-of-two split (`lora_conversion_utils.py:2098-2155`)."""
    sd = {k[len("lora_unet_"):]: np.asarray(v) for k, v in state_dict.items()
          if k.startswith("lora_unet_blocks_")}

    def map_base(base: str) -> Optional[str]:
        # base: "blocks_3_cross_attn_k_img"
        m = re.match(r"blocks_(\d+)_(.+)$", base)
        if m is None:
            return None
        idx, rest = m.group(1), m.group(2)
        for theirs, ours in sorted(_MUSUBI_WAN_SUBS, key=lambda s: -len(s[0])):
            if rest == theirs:
                return f"blocks.{idx}.{ours}"
        return None

    out: Dict[str, np.ndarray] = {}
    alphas: Dict[str, float] = {}
    for key, value in sd.items():
        if key.endswith(".alpha"):
            path = map_base(key[: -len(".alpha")])
            if path is not None:
                alphas[path] = float(value)
            continue
        for suffix, ours in ((".lora_down.weight", ".lora_A.weight"),
                             (".lora_up.weight", ".lora_B.weight")):
            if key.endswith(suffix):
                path = map_base(key[: -len(suffix)])
                if path is None:
                    logger.warning(f"unhandled musubi Wan LoRA key {key}; skipping")
                else:
                    out[path + ours] = value
                break

    for path, alpha in alphas.items():
        a_key, b_key = path + ".lora_A.weight", path + ".lora_B.weight"
        if a_key not in out or b_key not in out:
            continue
        scale = alpha / out[a_key].shape[0]
        scale_down, scale_up = scale, 1.0
        while scale_down * 2 < scale_up:
            scale_down *= 2
            scale_up /= 2
        out[a_key] = out[a_key] * scale_down
        out[b_key] = out[b_key] * scale_up
    return {f"transformer.{k}": v for k, v in out.items()}


def _is_hunyuan_video_lora(state_dict) -> bool:
    return any(
        "img_attn_qkv" in k or "txt_attn_qkv" in k
        or (".linear1." in k and "single_blocks" in k)
        for k in state_dict
    )


def _is_musubi_wan_lora(state_dict) -> bool:
    return any(k.startswith("lora_unet_blocks_") for k in state_dict)


def _is_wan_lora(state_dict) -> bool:
    return any(
        k.startswith("diffusion_model.") and (".self_attn." in k or ".cross_attn." in k)
        for k in state_dict
    )


def _is_qwen_kohya_lora(state_dict) -> bool:
    return any(k.startswith("lora_unet_transformer_blocks_") for k in state_dict)


def _is_xlabs_lora(state_dict) -> bool:
    return any(".processor." in k and (".down.weight" in k or ".up.weight" in k) for k in state_dict)


def group_lora_weights(
    state_dict: Dict[str, np.ndarray], component: Optional[str] = None
) -> Dict[str, Tuple[np.ndarray, np.ndarray, Optional[float]]]:
    """Group flat lora keys into {module_path: (A, B, alpha, bias)}; filters to the
    given component prefix (e.g. 'unet', 'transformer')."""
    if _is_xlabs_lora(state_dict):
        state_dict = convert_xlabs_flux_lora(state_dict)
    elif _is_hunyuan_video_lora(state_dict):
        state_dict = convert_hunyuan_video_lora(state_dict)
    elif _is_musubi_wan_lora(state_dict):
        state_dict = convert_musubi_wan_lora(state_dict)
    elif _is_wan_lora(state_dict):
        state_dict = convert_wan_lora(state_dict)
    elif _is_qwen_kohya_lora(state_dict):
        state_dict = convert_qwen_lora(state_dict)
    elif any(k.startswith("diffusion_model.") for k in state_dict):
        state_dict = convert_diffusion_model_prefix_lora(state_dict)
    elif any(".lora_down." in k or ".lora_up." in k for k in state_dict):
        state_dict = convert_kohya_lora(state_dict)

    grouped: Dict[str, dict] = {}
    for key, value in state_dict.items():
        if key.endswith(".alpha"):
            path, leaf = key[: -len(".alpha")], "alpha"
        elif key.endswith(".lora_A.weight") or key.endswith(".lora_A.default.weight"):
            path, leaf = re.sub(r"\.lora_A(\.default)?\.weight$", "", key), "A"
        elif key.endswith(".lora_B.weight") or key.endswith(".lora_B.default.weight"):
            path, leaf = re.sub(r"\.lora_B(\.default)?\.weight$", "", key), "B"
        elif key.endswith(".lora_B.bias"):
            path, leaf = key[: -len(".lora_B.bias")], "B_bias"
        else:
            continue
        if component is not None:
            if not path.startswith(component + "."):
                continue
            path = path[len(component) + 1:]
        else:
            path = _strip_prefix(path)
        grouped.setdefault(path, {})[leaf] = value

    out = {}
    for path, parts in grouped.items():
        if "A" not in parts or "B" not in parts:
            logger.warning(f"incomplete LoRA pair at {path}; skipping")
            continue
        alpha = float(parts["alpha"]) if "alpha" in parts else None
        bias = np.asarray(parts["B_bias"]) if "B_bias" in parts else None
        out[path] = (np.asarray(parts["A"]), np.asarray(parts["B"]), alpha, bias)
    return out


def _get_nested(tree, path_parts):
    node = tree
    for p in path_parts:
        if isinstance(node, dict) and p in node:
            node = node[p]
        elif isinstance(node, dict) and p.isdigit() and int(p) in node:
            node = node[int(p)]
        else:
            return None
    return node


def _set_nested_inplace(tree, path_parts, value):
    node = tree
    for p in path_parts[:-1]:
        node = node[p] if not (isinstance(p, str) and p.isdigit() and p not in node) else node[int(p)]
        # normalize digit keys
    last = path_parts[-1]
    if isinstance(last, str) and last.isdigit() and last not in node:
        last = int(last)
    node[last] = value


def fuse_lora(
    params,
    lora_weights: Dict[str, Tuple[np.ndarray, np.ndarray, Optional[float]]],
    scale: float = 1.0,
):
    """Return a new params pytree with LoRA deltas fused into Linear kernels.

    A: [r, in] (torch layout), B: [out, r]; ours is kernel [in, out], so the
    fused delta is ``scale * (α/r) * (B @ A).T``.
    """
    import copy

    new_params = jax.tree.map(lambda x: x, params)  # shallow-copy tree structure
    # deep-copy dict structure so in-place set doesn't alias the input
    def deep_copy_dicts(d):
        if isinstance(d, dict):
            return {k: deep_copy_dicts(v) for k, v in d.items()}
        return d

    new_params = deep_copy_dicts(new_params)

    fused, missed = 0, []
    for path, entry in lora_weights.items():
        A, B, alpha = entry[0], entry[1], entry[2]
        bias = entry[3] if len(entry) > 3 else None
        parts = [int(p) if p.isdigit() else p for p in path.split(".")]
        leaf_tree = _get_nested(new_params, parts)
        if leaf_tree is None or "kernel" not in leaf_tree:
            missed.append(path)
            continue
        r = A.shape[0]
        eff_scale = scale * ((alpha / r) if alpha is not None else 1.0)
        delta = (B.astype(np.float32) @ A.astype(np.float32)).T * eff_scale
        kernel = leaf_tree["kernel"]
        leaf_tree["kernel"] = (kernel.astype(jnp.float32) + jnp.asarray(delta)).astype(kernel.dtype)
        if bias is not None and "bias" in leaf_tree:
            # diff_b bias delta (reference treats it as lora_bias)
            old = leaf_tree["bias"]
            leaf_tree["bias"] = (old.astype(jnp.float32) + scale * jnp.asarray(bias, jnp.float32)).astype(old.dtype)
        fused += 1
    if missed:
        logger.warning(f"{len(missed)} LoRA modules had no matching param path, e.g. {missed[:5]}")
    logger.info(f"fused {fused} LoRA modules at scale {scale}")
    return new_params


def load_lora_weights(path_or_state_dict, params, component: Optional[str] = None, scale: float = 1.0):
    """Load a LoRA safetensors file (or state dict) and fuse into `params`."""
    if isinstance(path_or_state_dict, (str,)):
        from safetensors import safe_open

        sd = {}
        with safe_open(path_or_state_dict, framework="numpy") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    else:
        sd = path_or_state_dict
    grouped = group_lora_weights(sd, component=component)
    return fuse_lora(params, grouped, scale=scale)


def fuse_lora_multi(params, adapters):
    """Fuse several adapters at once: ``W' = W + Σ_i scale_i · Δ_i``.

    adapters: list of (grouped_weights, scale). One pytree pass; unaffected
    leaves alias the input (no copy). Reference analogue: PEFT's multi-adapter
    merge under set_adapters (loaders/peft.py:661)."""
    # collect per-path summed deltas
    deltas: Dict[str, np.ndarray] = {}
    for grouped, scale in adapters:
        for path, entry in grouped.items():
            A, B, alpha = entry[0], entry[1], entry[2]
            r = A.shape[0]
            eff = scale * ((alpha / r) if alpha is not None else 1.0)
            d = (B.astype(np.float32) @ A.astype(np.float32)).T * eff
            deltas[path] = deltas[path] + d if path in deltas else d

    def deep_copy_dicts(d):
        if isinstance(d, dict):
            return {k: deep_copy_dicts(v) for k, v in d.items()}
        return d

    new_params = deep_copy_dicts(params)
    missed = []
    for path, delta in deltas.items():
        parts = [int(p) if p.isdigit() else p for p in path.split(".")]
        leaf_tree = _get_nested(new_params, parts)
        if leaf_tree is None or "kernel" not in leaf_tree:
            missed.append(path)
            continue
        kernel = leaf_tree["kernel"]
        leaf_tree["kernel"] = (kernel.astype(jnp.float32) + jnp.asarray(delta)).astype(kernel.dtype)
    if missed:
        logger.warning(f"{len(missed)} LoRA modules had no matching param path, e.g. {missed[:5]}")
    return new_params


def _load_state_dict(source) -> Dict[str, np.ndarray]:
    if isinstance(source, str):
        from safetensors import safe_open

        sd = {}
        with safe_open(source, framework="numpy") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    return dict(source)


_LORA_COMPONENT_NAMES = ("transformer", "unet", "text_encoder", "text_encoder_2")


class PipelineLoraMixin:
    """Pipeline-level LoRA runtime: named adapters, per-adapter scales,
    activation without reloading base weights.

    TPU-native counterpart of the reference's PeftAdapterMixin +
    LoraBaseMixin runtime surface (`loaders/peft.py:57,661` load/fuse/unfuse/
    set_adapters, `lora_base.py:478`): adapters are stored as grouped
    (A, B, alpha) deltas; activation builds fresh fused params from the
    pristine base in one pytree pass (unaffected leaves alias the base — no
    duplicate HBM), so the per-step hot path stays a single matmul per layer
    where the reference pays a second LoRA matmul.
    """

    def load_lora_weights(self, source, adapter_name: str = "default", scale: float = 1.0):
        """Load and activate a LoRA (reference load_lora_weights semantics:
        newly loaded adapters become the active set)."""
        sd = _load_state_dict(source)
        adapter = {}
        for name in _LORA_COMPONENT_NAMES:
            comp = getattr(self, name, None)
            if not (isinstance(comp, tuple) and len(comp) == 2 and comp[1] is not None):
                continue
            grouped = group_lora_weights(sd, component=name)
            if grouped:
                adapter[name] = grouped
        if not adapter:
            # prefix-less checkpoints: attribute everything to the denoiser
            for name in ("transformer", "unet"):
                comp = getattr(self, name, None)
                if isinstance(comp, tuple) and comp[1] is not None:
                    grouped = group_lora_weights(sd, component=None)
                    if grouped:
                        adapter[name] = grouped
                    break
        if not adapter:
            raise ValueError("no LoRA weights matched any pipeline component")

        if not hasattr(self, "_lora_adapters"):
            self._lora_adapters = {}
            self._lora_base = {}
        for name in adapter:
            if name not in self._lora_base:
                self._lora_base[name] = getattr(self, name)[1]
        self._lora_adapters[adapter_name] = adapter
        self.set_adapters([adapter_name], [scale])

    def hotswap_lora_weights(self, source, adapter_name: str = "default"):
        """Replace an already-loaded adapter's weights in place WITHOUT
        invalidating compiled graphs (reference hotswap:
        `loaders/peft.py load_lora_adapter(..., hotswap=True)`).

        TPU-native semantics: adapters here are fused weight deltas, so a
        hotswap is re-fusing from the pristine base with the new (A, B)
        pairs. Since the fused params keep identical shapes/dtypes/shardings,
        every jitted denoise graph stays valid — the jit cache is deliberately
        NOT cleared (the torch analogue needs PEFT module surgery + a
        torch.compile recompile guard; here it is one pytree rebuild)."""
        if adapter_name not in getattr(self, "_lora_adapters", {}):
            raise ValueError(
                f"hotswap requires adapter '{adapter_name}' to be loaded first; "
                f"loaded: {list(getattr(self, '_lora_adapters', {}))}"
            )
        sd = _load_state_dict(source)
        old = self._lora_adapters[adapter_name]
        adapter = {}
        for name in old:
            grouped = group_lora_weights(sd, component=name)
            if not grouped:
                grouped = group_lora_weights(sd, component=None)
            if set(grouped) != set(old[name]):
                raise ValueError(
                    f"hotswap module-path mismatch for component '{name}': the new "
                    f"checkpoint targets {len(grouped)} modules, the loaded adapter "
                    f"{len(old[name])} — load it as a new adapter instead"
                )
            adapter[name] = grouped
        self._lora_adapters[adapter_name] = adapter
        active = dict(getattr(self, "_active_adapters", {})) or {adapter_name: 1.0}
        for comp_name, base_params in self._lora_base.items():
            selected = [
                (self._lora_adapters[n][comp_name], w)
                for n, w in active.items()
                if comp_name in self._lora_adapters[n]
            ]
            module = getattr(self, comp_name)[0]
            if selected:
                setattr(self, comp_name, (module, fuse_lora_multi(base_params, selected)))
        self._active_adapters = active

    def set_adapters(self, adapter_names, adapter_weights=None):
        """Activate adapters at per-adapter scales (reference
        `lora_base.py set_adapters`): rebuilds fused params from the base."""
        if isinstance(adapter_names, str):
            adapter_names = [adapter_names]
        if adapter_weights is None:
            adapter_weights = [1.0] * len(adapter_names)
        elif not isinstance(adapter_weights, (list, tuple)):
            adapter_weights = [adapter_weights] * len(adapter_names)
        unknown = [n for n in adapter_names if n not in getattr(self, "_lora_adapters", {})]
        if unknown:
            raise ValueError(f"unknown adapter(s) {unknown}; loaded: {list(self._lora_adapters)}")

        for comp_name, base_params in self._lora_base.items():
            selected = [
                (self._lora_adapters[n][comp_name], w)
                for n, w in zip(adapter_names, adapter_weights)
                if comp_name in self._lora_adapters[n]
            ]
            module = getattr(self, comp_name)[0]
            if selected:
                setattr(self, comp_name, (module, fuse_lora_multi(base_params, selected)))
            else:
                setattr(self, comp_name, (module, base_params))
        self._active_adapters = dict(zip(adapter_names, adapter_weights))
        if hasattr(self, "clear_jit_cache"):
            self.clear_jit_cache()

    def get_active_adapters(self):
        return dict(getattr(self, "_active_adapters", {}))

    def disable_lora(self):
        """Restore pristine base params (reference unfuse_lora/disable_lora)."""
        for comp_name, base_params in getattr(self, "_lora_base", {}).items():
            module = getattr(self, comp_name)[0]
            setattr(self, comp_name, (module, base_params))
        self._active_adapters = {}
        if hasattr(self, "clear_jit_cache"):
            self.clear_jit_cache()

    # reference naming alias
    unfuse_lora = disable_lora

    def delete_adapters(self, adapter_names):
        if isinstance(adapter_names, str):
            adapter_names = [adapter_names]
        for n in adapter_names:
            self._lora_adapters.pop(n, None)
            if n in getattr(self, "_active_adapters", {}):
                self._active_adapters.pop(n)
        # re-apply remaining active set (or base if none)
        if getattr(self, "_active_adapters", None):
            self.set_adapters(list(self._active_adapters), list(self._active_adapters.values()))
        else:
            self.disable_lora()
