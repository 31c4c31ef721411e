"""IP-Adapter loading.

TPU-native counterpart of the reference `loaders/ip_adapter.py` +
`loaders/unet.py:379/_convert_ip_adapter_image_proj_to_diffusers` and
`:598/_convert_ip_adapter_attn_to_diffusers`. Instead of swapping attention
*processor objects*, the per-layer image K/V projections are grafted into the
UNet's parameter pytree (``attn2 → to_k_ip/to_v_ip``) — the functional
`Attention` module applies them when present — and the image-projection head
becomes `unet.encoder_hid_proj` (MultiIPAdapterImageProjection) with its
params under ``params["encoder_hid_proj"]``. Everything stays a pure pytree:
jit/scan/shard as usual.

Checkpoint format (reference ip_adapter.py:214): a safetensors file whose keys
split into ``image_proj.*`` (projection head, variant detected by key shape)
and ``ip_adapter.{2n+1}.to_{k,v}_ip.weight`` (n = cross-attn index in
named-module order: down_blocks → mid_block → up_blocks).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..models.ip_adapter import (
    ImageProjection,
    IPAdapterFaceIDImageProjection,
    IPAdapterFullImageProjection,
    IPAdapterPlusImageProjection,
    MultiIPAdapterImageProjection,
)
from ..models.modeling_utils import convert_torch_state_dict
from ..utils import logging

logger = logging.get_logger(__name__)


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()  # torch tensor
    except AttributeError:
        return np.asarray(t)


def _read_checkpoint(src) -> Dict[str, Dict[str, np.ndarray]]:
    """→ {"image_proj": {...}, "ip_adapter": {...}} with numpy values."""
    if isinstance(src, dict) and "image_proj" in src and "ip_adapter" in src:
        return {
            "image_proj": {k: _to_numpy(v) for k, v in src["image_proj"].items()},
            "ip_adapter": {k: _to_numpy(v) for k, v in src["ip_adapter"].items()},
        }
    if isinstance(src, (str, os.PathLike)):
        from safetensors import safe_open

        out = {"image_proj": {}, "ip_adapter": {}}
        with safe_open(str(src), framework="numpy") as f:
            for key in f.keys():
                group, sub = key.split(".", 1)
                if group not in out:
                    raise ValueError(f"unexpected IP-Adapter checkpoint key {key!r}")
                out[group][sub] = f.get_tensor(key)
        return out
    raise ValueError("IP-Adapter source must be a safetensors path or a {'image_proj','ip_adapter'} dict")


# ---------------------------------------------------------------------------
# image projection head
# ---------------------------------------------------------------------------


def _convert_image_proj(state: Dict[str, np.ndarray]):
    """checkpoint-format head → (module, params). Rename tables mirror the
    reference loaders/unet.py:379."""
    if "proj.weight" in state:  # base IP-Adapter
        num_tokens = 4
        clip_dim = state["proj.weight"].shape[-1]
        cross_dim = state["proj.weight"].shape[0] // num_tokens
        module = ImageProjection(
            image_embed_dim=clip_dim, cross_attention_dim=cross_dim, num_image_text_embeds=num_tokens
        )
        renamed = {k.replace("proj", "image_embeds"): v for k, v in state.items()}
        return module, convert_torch_state_dict(module, renamed), num_tokens
    if "proj.3.weight" in state:  # IP-Adapter "full"
        clip_dim = state["proj.0.weight"].shape[0]
        cross_dim = state["proj.3.weight"].shape[0]
        module = IPAdapterFullImageProjection(image_embed_dim=clip_dim, cross_attention_dim=cross_dim)
        renamed = {}
        for k, v in state.items():
            k = k.replace("proj.0", "ff.net.0.proj").replace("proj.2", "ff.net.2").replace("proj.3", "norm")
            renamed[k] = v
        return module, convert_torch_state_dict(module, renamed), 257
    if "norm.weight" in state and "proj.0.weight" in state and "proj.3.weight" not in state:
        # IP-Adapter FaceID: FeedForward over the InsightFace id embedding
        # (reference loaders/unet.py:498-521)
        id_dim_in = state["proj.0.weight"].shape[1]
        id_dim_out = state["proj.0.weight"].shape[0]
        mult = id_dim_out // id_dim_in
        cross_dim = state["norm.weight"].shape[0]
        num_tokens = state["proj.2.weight"].shape[0] // cross_dim
        module = IPAdapterFaceIDImageProjection(
            image_embed_dim=id_dim_in, cross_attention_dim=cross_dim, mult=mult,
            num_tokens=num_tokens,
        )
        renamed = {
            k.replace("proj.0", "ff.net.0.proj").replace("proj.2", "ff.net.2"): v
            for k, v in state.items()
        }
        return module, convert_torch_state_dict(module, renamed), num_tokens
    if "latents" in state:  # IP-Adapter Plus (perceiver resampler)
        num_tokens = state["latents"].shape[1]
        embed_dims = state["proj_in.weight"].shape[1]
        output_dims = state["proj_out.weight"].shape[0]
        hidden_dims = state["latents"].shape[2]
        depth = 1 + max(int(k.split(".")[1]) for k in state if k.startswith("layers."))
        q_key = "layers.0.0.to_q.weight" if "layers.0.0.to_q.weight" in state else "layers.0.attn.to_q.weight"
        heads = state[q_key].shape[0] // 64
        module = IPAdapterPlusImageProjection(
            embed_dims=embed_dims, output_dims=output_dims, hidden_dims=hidden_dims,
            depth=depth, heads=heads, num_queries=num_tokens,
        )
        renamed = {}
        for k, v in state.items():
            name = k
            for n in range(depth):  # layers.N.0.normX → layers.N.lnX
                name = name.replace(f"{n}.0.norm1", f"{n}.ln0").replace(f"{n}.0.norm2", f"{n}.ln1")
            if "to_kv" in name:
                parts = name.replace("0.to", "attn.to").split(".")
                base = ".".join(parts)
                half = v.shape[0] // 2
                renamed[base.replace("to_kv", "to_k")] = v[:half]
                renamed[base.replace("to_kv", "to_v")] = v[half:]
                continue
            if "to_q" in name:
                name = name.replace("0.to_q", "attn.to_q")
            elif "to_out" in name:
                name = name.replace("0.to_out", "attn.to_out.0")
            else:
                for n in range(depth):  # layers.N.1.{0,1,3} = (ln, ff) sequential
                    name = (
                        name.replace(f"{n}.1.0", f"{n}.ff.0")
                        .replace(f"{n}.1.1", f"{n}.ff.1.net.0.proj")
                        .replace(f"{n}.1.3", f"{n}.ff.1.net.2")
                    )
            renamed[name] = v
        return module, convert_torch_state_dict(module, renamed), num_tokens
    raise ValueError(f"unrecognized IP-Adapter image_proj format (keys: {sorted(state)[:6]} …)")


# ---------------------------------------------------------------------------
# UNet grafting
# ---------------------------------------------------------------------------


def _iter_cross_attention_paths(unet):
    """Yield (params_path, attn_module) for every cross-attention, in the
    reference's attn_processors enumeration order. NOTE: the reference
    registers the (empty) up_blocks ModuleList before mid_block
    (unet_2d_condition.py:326-397), so named-module order — and therefore the
    checkpoint's key_id numbering — is down → up → mid."""
    blocks = [(["down_blocks", i], b) for i, b in enumerate(unet.down_blocks)]
    blocks += [(["up_blocks", i], b) for i, b in enumerate(unet.up_blocks)]
    blocks.append((["mid_block"], unet.mid_block))
    for path, block in blocks:
        for j, t2d in enumerate(getattr(block, "attentions", None) or []):
            for k, tb in enumerate(t2d.transformer_blocks):
                if getattr(tb, "attn2", None) is not None:
                    yield path + ["attentions", j, "transformer_blocks", k, "attn2"], tb.attn2


def _get_node(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def load_ip_adapter(
    unet,
    params,
    sources: Union[str, dict, List[Union[str, dict]]],
    dtype=None,
):
    """Load one or more IP-Adapters into a UNet2DConditionModel.

    Returns the new parameter pytree (input tree is not mutated at the leaf
    level; attn2 subtrees gain to_k_ip/to_v_ip, and an ``encoder_hid_proj``
    subtree is added). Side effects on `unet` (structure only): sets
    ``unet.encoder_hid_proj`` and a default per-adapter scale of 1.0.
    """
    if not isinstance(sources, (list, tuple)):
        sources = [sources]
    checkpoints = [_read_checkpoint(s) for s in sources]
    n_adapters = len(checkpoints)

    cast = (lambda a: jnp.asarray(a, dtype=dtype)) if dtype is not None else jnp.asarray

    import jax

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-copy containers

    proj_layers, proj_params = [], {}
    for i, ckpt in enumerate(checkpoints):
        module, p, _ = _convert_image_proj(ckpt["image_proj"])
        proj_layers.append(module)
        proj_params[i] = jax.tree_util.tree_map(cast, p)

    for n, (path, attn) in enumerate(_iter_cross_attention_paths(unet)):
        node = _get_node(params, path)
        key_id = 2 * n + 1
        node["to_k_ip"] = {
            i: {"kernel": cast(np.ascontiguousarray(ckpt["ip_adapter"][f"{key_id}.to_k_ip.weight"].T))}
            for i, ckpt in enumerate(checkpoints)
        }
        node["to_v_ip"] = {
            i: {"kernel": cast(np.ascontiguousarray(ckpt["ip_adapter"][f"{key_id}.to_v_ip.weight"].T))}
            for i, ckpt in enumerate(checkpoints)
        }
        attn.ip_adapter_scale = [1.0] * n_adapters

    unet.encoder_hid_proj = MultiIPAdapterImageProjection(proj_layers)
    params["encoder_hid_proj"] = {"image_projection_layers": proj_params}
    logger.info(f"Loaded {n_adapters} IP-Adapter(s) into UNet")
    return params


def set_ip_adapter_scale(unet, scale: Union[float, List[float]]):
    """Set the image-attention weight(s). Float or one-per-adapter list.
    Changing the scale retraces jit'd callers (it is a trace-time constant —
    zero per-step overhead, like the reference's processor attribute)."""
    for _, attn in _iter_cross_attention_paths(unet):
        if attn.ip_adapter_scale is None:
            continue
        s = scale if isinstance(scale, (list, tuple)) else [scale] * len(attn.ip_adapter_scale)
        attn.ip_adapter_scale = list(s)


def unload_ip_adapter(unet, params):
    """Remove IP-Adapter weights/modules; returns the cleaned params tree."""
    for path, attn in _iter_cross_attention_paths(unet):
        node = _get_node(params, path)
        node.pop("to_k_ip", None)
        node.pop("to_v_ip", None)
        attn.ip_adapter_scale = None
    params.pop("encoder_hid_proj", None)
    unet.encoder_hid_proj = None
    unet._children.pop("encoder_hid_proj", None)
    return params


class IPAdapterPipelineMixin:
    """Pipeline-level IP-Adapter surface (reference
    loaders/ip_adapter.py:IPAdapterMixin), shared by the SD / SDXL / PAG
    pipelines. Expects `self.unet = (module, params)` and optional
    `self.image_encoder = (module, params)` / `self.feature_extractor`."""

    def load_ip_adapter(self, source, dtype=None):
        unet, unet_params = self.unet
        self.unet = (unet, load_ip_adapter(unet, unet_params, source, dtype=dtype))
        self._drop_jit_cache()

    def set_ip_adapter_scale(self, scale):
        set_ip_adapter_scale(self.unet[0], scale)
        # scale is baked into traces at trace time; cached jits are stale now
        self._drop_jit_cache()

    def unload_ip_adapter(self):
        unet, unet_params = self.unet
        self.unet = (unet, unload_ip_adapter(unet, unet_params))
        self._drop_jit_cache()

    def _drop_jit_cache(self):
        clear = getattr(self, "clear_jit_cache", None)
        if clear is not None:
            clear()

    def prepare_ip_adapter_image_embeds(self, ip_adapter_image, batch_size: int, do_cfg: bool):
        """Encode image(s) → per-adapter embeds [2B|B, num_images, ...]; the
        CFG negative is the zero-image embedding (plus-variants re-encode a
        black image for penultimate hidden states, like the reference)."""
        import jax.numpy as jnp

        from ..models.ip_adapter import IPAdapterPlusImageProjection

        unet = self.unet[0]
        image_encoder = getattr(self, "image_encoder", None)
        if image_encoder is None or unet.encoder_hid_proj is None:
            raise ValueError("load_ip_adapter() first, and register an image_encoder to pass raw images")
        encoder, enc_params = image_encoder
        if not isinstance(ip_adapter_image, (list, tuple)):
            ip_adapter_image = [ip_adapter_image]

        embeds = []
        for layer, image in zip(unet.encoder_hid_proj.image_projection_layers, ip_adapter_image):
            use_hidden = isinstance(layer, IPAdapterPlusImageProjection)
            fe = getattr(self, "feature_extractor", None)
            if fe is not None and not isinstance(image, (np.ndarray, jnp.ndarray)):
                image = fe(image, return_tensors="np").pixel_values
            pixels = jnp.asarray(image, dtype=jnp.float32)
            if use_hidden:
                pos = encoder(enc_params, pixels, output_hidden_states=True).hidden_states[-2]
                neg = encoder(enc_params, jnp.zeros_like(pixels), output_hidden_states=True).hidden_states[-2]
            else:
                pos = encoder(enc_params, pixels).image_embeds
                neg = jnp.zeros_like(pos)
            pos = jnp.broadcast_to(pos[0][None], (batch_size,) + pos.shape[1:])
            neg = jnp.broadcast_to(neg[0][None], (batch_size,) + neg.shape[1:])
            e = jnp.concatenate([neg, pos], axis=0) if do_cfg else pos
            embeds.append(e[:, None] if e.ndim == 2 else e[:, None, :, :])
        return embeds
