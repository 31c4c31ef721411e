"""Sana ControlNet — block-sample residuals for the Sana linear-attention DiT.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_sana.py:41`):
a prefix of SanaTransformerBlocks; the patch-embedded condition passes a
zero-init input projection and adds onto the patch-embedded sample, and
per-block zero-init linears emit residuals the main transformer applies
after blocks 1..N.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import PatchEmbed, PixArtAlphaTextProjection
from ..modeling_utils import ModelMixin
from ..transformers.pixart_transformer_2d import AdaLayerNormSingle
from ..transformers.sana_transformer import SanaTransformerBlock
from .controlnet_flux import _zero_tree


@dataclass
class SanaControlNetOutput(BaseOutput):
    controlnet_block_samples: Tuple[jax.Array, ...]


class SanaControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 32,
        out_channels: Optional[int] = 32,
        num_attention_heads: int = 70,
        attention_head_dim: int = 32,
        num_layers: int = 7,
        num_cross_attention_heads: Optional[int] = 20,
        cross_attention_head_dim: Optional[int] = 112,
        cross_attention_dim: Optional[int] = 2240,
        caption_channels: int = 2304,
        mlp_ratio: float = 2.5,
        attention_bias: bool = False,
        sample_size: int = 32,
        patch_size: int = 1,
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        interpolation_scale: Optional[int] = None,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.patch_embed = PatchEmbed(
            height=sample_size, width=sample_size, patch_size=patch_size,
            in_channels=in_channels, embed_dim=inner_dim,
            interpolation_scale=interpolation_scale,
            pos_embed_type="sincos" if interpolation_scale is not None else None,
        )
        self.time_embed = AdaLayerNormSingle(inner_dim)
        self.caption_projection = PixArtAlphaTextProjection(in_features=caption_channels,
                                                            hidden_size=inner_dim)
        self.caption_norm = RMSNorm(inner_dim, eps=1e-5)
        self.transformer_blocks = ModuleList([
            SanaTransformerBlock(
                inner_dim, num_attention_heads, attention_head_dim,
                num_cross_attention_heads=num_cross_attention_heads,
                cross_attention_head_dim=cross_attention_head_dim,
                cross_attention_dim=cross_attention_dim,
                attention_bias=attention_bias,
                norm_elementwise_affine=norm_elementwise_affine,
                norm_eps=norm_eps, mlp_ratio=mlp_ratio,
            )
            for _ in range(num_layers)
        ])
        self.input_block = Linear(inner_dim, inner_dim)
        self.controlnet_blocks = ModuleList([
            Linear(inner_dim, inner_dim) for _ in range(num_layers)
        ])

    def init_params(self, key: Optional[jax.Array] = None, dtype=jnp.float32) -> Params:
        params = super().init_params(key, dtype=dtype)
        params["input_block"] = _zero_tree(params["input_block"])
        params["controlnet_blocks"] = _zero_tree(params["controlnet_blocks"])
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,  # [B, S, caption_channels]
        timestep: jax.Array,  # [B]
        controlnet_cond: jax.Array,  # [B, C, H, W]
        conditioning_scale: float = 1.0,
        encoder_attention_mask: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[SanaControlNetOutput, tuple]:
        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            encoder_attention_mask = ((1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]

        b, _, height, width = hidden_states.shape
        p = self.config.patch_size
        ph, pw = height // p, width // p

        hidden = self.patch_embed(params["patch_embed"], hidden_states)
        cond = self.patch_embed(params["patch_embed"], controlnet_cond.astype(hidden.dtype))
        hidden = hidden + self.input_block(params["input_block"], cond)

        timestep_mod, _ = self.time_embed(params["time_embed"], timestep, batch_size=b,
                                          dtype=hidden.dtype)

        ehs = self.caption_projection(params["caption_projection"], encoder_hidden_states)
        ehs = ehs.reshape(b, -1, hidden.shape[-1])
        ehs = self.caption_norm(params["caption_norm"], ehs)

        block_samples = ()
        for i, block in enumerate(self.transformer_blocks):
            hidden = block(
                params["transformer_blocks"][i], hidden, ehs, timestep_mod,
                encoder_attention_mask=encoder_attention_mask, height=ph, width=pw,
            )
            block_samples += (hidden,)

        out = tuple(
            self.controlnet_blocks[i](params["controlnet_blocks"][i], s) * conditioning_scale
            for i, s in enumerate(block_samples)
        )
        if not return_dict:
            return (out,)
        return SanaControlNetOutput(controlnet_block_samples=out)
