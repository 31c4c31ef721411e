"""Z-Image ControlNet.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_z_image.py:432`
ZImageControlNetModel; ZImageControlTransformerBlock `:337` — a standard
Z-Image sandwich-norm block with zero-init `before_proj` (block 0 only) and
zero-init `after_proj` skip taps; forward `:654` — the control context is
patch-embedded with its own embedder, refined alongside the shared
noise/context refiners, then run through the control blocks against the
unified [image, caption] stream, emitting one residual per
`control_layers_places` entry that the base transformer adds after the
matching layer).

TPU-first: the reference's ragged list-of-tensors batching is replaced by the
same dense `[B, S]` layout as `transformer_z_image.py` (masked dense batching
is exactly equivalent); shared-module reuse (`from_transformer`,
reference `:520`) passes the base transformer's param tree explicitly —
functional params instead of mutated module attributes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from ..transformers.transformer_z_image import (
    ZImageTransformerBlock,
    _ModuleDict,
    _pad32,
)


@dataclass
class ZImageControlNetOutput(BaseOutput):
    controlnet_block_samples: Dict[int, jax.Array]


class ZImageControlTransformerBlock(ZImageTransformerBlock):
    """Z-Image block + zero-init control projections (reference `:337`)."""

    def __init__(self, dim: int, n_heads: int, norm_eps: float, qk_norm: bool,
                 modulation: bool = True, block_id: int = 0):
        super().__init__(dim, n_heads, norm_eps, qk_norm, modulation)
        self.block_id = block_id
        if block_id == 0:
            self.before_proj = Linear(dim, dim, use_bias=True)
        self.after_proj = Linear(dim, dim, use_bias=True)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        # zero_module(...) in the reference: residual taps start as no-ops
        if self.block_id == 0:
            params["before_proj"]["kernel"] = jnp.zeros_like(params["before_proj"]["kernel"])
            params["before_proj"]["bias"] = jnp.zeros_like(params["before_proj"]["bias"])
        params["after_proj"]["kernel"] = jnp.zeros_like(params["after_proj"]["kernel"])
        params["after_proj"]["bias"] = jnp.zeros_like(params["after_proj"]["bias"])
        return params

    def __call__(self, params: Params, c: jax.Array, x: Optional[jax.Array], attn_mask,
                 freqs, adaln_input=None) -> Tuple[jax.Array, jax.Array]:
        if self.block_id == 0:
            c = self.before_proj(params["before_proj"], c) + x
        c = super().__call__(params, c, attn_mask, freqs, adaln_input)
        c_skip = self.after_proj(params["after_proj"], c)
        return c, c_skip


class ZImageControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        control_layers_places: Tuple[int, ...] = (0, 5, 10, 15, 20, 25),
        control_refiner_layers_places: Tuple[int, ...] = (0, 1),
        control_in_dim: int = 16,
        add_control_noise_refiner: Optional[str] = None,  # None | "control_layers" | "control_noise_refiner"
        all_patch_size: Tuple[int, ...] = (2,),
        all_f_patch_size: Tuple[int, ...] = (1,),
        dim: int = 3840,
        n_refiner_layers: int = 2,
        n_heads: int = 30,
        n_kv_heads: int = 30,
        norm_eps: float = 1e-5,
        qk_norm: bool = True,
    ):
        super().__init__()
        if 0 not in tuple(control_layers_places):
            raise ValueError("control_layers_places must include layer 0 (holds before_proj)")
        self.dim = dim
        self.control_layers = ModuleList(
            [ZImageControlTransformerBlock(dim, n_heads, norm_eps, qk_norm, block_id=i)
             for i in control_layers_places]
        )
        self.control_all_x_embedder = _ModuleDict({
            f"{p}-{fp}": Linear(fp * p * p * control_in_dim, dim, use_bias=True)
            for p, fp in zip(all_patch_size, all_f_patch_size)
        })
        if add_control_noise_refiner == "control_layers":
            self.control_noise_refiner = None
        elif add_control_noise_refiner == "control_noise_refiner":
            self.control_noise_refiner = ModuleList(
                [ZImageControlTransformerBlock(dim, n_heads, norm_eps, qk_norm,
                                               modulation=True, block_id=layer_id)
                 for layer_id in range(n_refiner_layers)]
            )
        else:
            self.control_noise_refiner = ModuleList(
                [ZImageTransformerBlock(dim, n_heads, norm_eps, qk_norm, modulation=True)
                 for _ in range(n_refiner_layers)]
            )
        # shared base-transformer modules (reference from_transformer `:520`)
        self.transformer = None

    @classmethod
    def from_transformer(cls, controlnet, transformer):
        controlnet.transformer = transformer
        return controlnet

    def __call__(
        self,
        params: Params,
        t_params: Params,  # base transformer params (shared embedders/refiners)
        x: jax.Array,  # [B, C, F, H, W]
        t: jax.Array,  # [B], (1000 - timestep)/1000 domain
        cap_feats: jax.Array,  # [B, S_cap, cap_feat_dim]
        control_context: jax.Array,  # [B, C_ctrl, F, H, W]
        cap_attn_mask: Optional[jax.Array] = None,
        cap_inner_pad_mask: Optional[jax.Array] = None,
        x_freqs: Optional[Tuple[jax.Array, jax.Array]] = None,
        cap_freqs: Optional[Tuple[jax.Array, jax.Array]] = None,
        conditioning_scale: float = 1.0,
        patch_size: int = 2,
        f_patch_size: int = 1,
        return_dict: bool = True,
    ):
        tr = self.transformer
        if tr is None:
            raise ValueError("Call ZImageControlNetModel.from_transformer(controlnet, transformer) first.")
        cfg = self.config
        b, c, f, h, w = x.shape
        pf, p = f_patch_size, patch_size
        ft, ht, wt = f // pf, h // p, w // p
        n_img = ft * ht * wt
        n_img_pad = _pad32(n_img)
        key = f"{patch_size}-{f_patch_size}"

        if x_freqs is None or cap_freqs is None:
            import numpy as np

            if cap_attn_mask is not None:
                cap_lens = tuple(int(v) for v in np.asarray(jnp.sum(cap_attn_mask, axis=1)))
            else:
                cap_lens = (cap_feats.shape[1],) * b
            x_freqs, cap_freqs = tr.compute_freqs(cap_lens, (ft, ht, wt), cap_feats.shape[1])

        adaln_input = tr.t_embedder(t_params["t_embedder"], t * tr.config.t_scale).astype(x.dtype)

        def patchify_embed(img, embedder, embed_params):
            ci = img.shape[1]
            xt = img.reshape(b, ci, ft, pf, ht, p, wt, p)
            xt = jnp.einsum("bcfihjwk->bfhwijkc", xt).reshape(b, n_img, pf * p * p * ci)
            xt = embedder(embed_params, xt)
            if n_img_pad > n_img:
                pad = jnp.broadcast_to(t_params["x_pad_token"].astype(xt.dtype),
                                       (b, n_img_pad - n_img, xt.shape[-1]))
                xt = jnp.concatenate([xt, pad], axis=1)
            return xt

        xt = patchify_embed(x, tr.all_x_embedder[key], t_params["all_x_embedder"][key])
        cc = patchify_embed(control_context, self.control_all_x_embedder[key],
                            params["control_all_x_embedder"][key])

        # --- refiner stage (reference `:748-768`) --------------------------
        refiner_hints = None
        if cfg.add_control_noise_refiner:
            if cfg.add_control_noise_refiner == "control_layers":
                layers, layer_params = self.control_layers, params["control_layers"]
            else:
                layers, layer_params = self.control_noise_refiner, params["control_noise_refiner"]
            skips = []
            for i, layer in enumerate(layers):
                cc, skip = layer(layer_params[i], cc, xt if layer.block_id == 0 else None,
                                 None, x_freqs, adaln_input)
                skips.append(skip)
            refiner_hints = {
                place: skips[idx] * conditioning_scale
                for idx, place in enumerate(cfg.control_refiner_layers_places)
            }

        for i, layer in enumerate(tr.noise_refiner):
            xt = layer(t_params["noise_refiner"][i], xt, None, x_freqs, adaln_input)
            if refiner_hints is not None and i in refiner_hints:
                xt = xt + refiner_hints[i]

        # --- caption refine (shared modules) -------------------------------
        cap = tr.cap_embedder[1](t_params["cap_embedder"][1],
                                 tr.cap_embedder[0](t_params["cap_embedder"][0], cap_feats))
        if cap_inner_pad_mask is not None:
            cap = jnp.where(cap_inner_pad_mask[..., None], t_params["cap_pad_token"].astype(cap.dtype), cap)
        for i, layer in enumerate(tr.context_refiner):
            cap = layer(t_params["context_refiner"][i], cap, cap_attn_mask, cap_freqs)

        unified = jnp.concatenate([xt, cap], axis=1)
        u_cos = jnp.concatenate([x_freqs[0], cap_freqs[0]], axis=1)
        u_sin = jnp.concatenate([x_freqs[1], cap_freqs[1]], axis=1)
        u_mask = None
        if cap_attn_mask is not None:
            img_valid = jnp.ones((b, n_img_pad), dtype=bool)
            u_mask = jnp.concatenate([img_valid, cap_attn_mask.astype(bool)], axis=1)

        # plain control refiner when no refiner hints were requested (`:831`)
        if not cfg.add_control_noise_refiner:
            for i, layer in enumerate(self.control_noise_refiner):
                cc = layer(params["control_noise_refiner"][i], cc, None, x_freqs, adaln_input)

        cu = jnp.concatenate([cc, cap], axis=1)
        samples = {}
        for idx, layer in enumerate(self.control_layers):
            cu, skip = layer(params["control_layers"][idx], cu,
                             unified if layer.block_id == 0 else None,
                             u_mask, (u_cos, u_sin), adaln_input)
            samples[int(self.config.control_layers_places[idx])] = skip * conditioning_scale

        if not return_dict:
            return (samples,)
        return ZImageControlNetOutput(controlnet_block_samples=samples)
