"""LatteTransformer3DModel — factorised spatial/temporal video DiT.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/latte_transformer_3d.py`
(PixArt-style ada_norm_single blocks alternating per-frame spatial attention
with per-pixel temporal attention; sinusoidal temporal position table added
before the first temporal block; model `:20`, forward `:163`).

TPU design: frames fold into the batch for spatial blocks and into the token
axis for temporal blocks — both stay dense MXU matmuls with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import PatchEmbed, PixArtAlphaTextProjection, get_1d_sincos_pos_embed_from_grid_np
from ..modeling_utils import ModelMixin
from .pixart_transformer_2d import AdaLayerNormSingle, PixArtTransformerBlock


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class LatteTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 16,
        attention_head_dim: int = 88,
        in_channels: Optional[int] = None,
        out_channels: Optional[int] = None,
        num_layers: int = 1,
        cross_attention_dim: Optional[int] = None,
        attention_bias: bool = False,
        sample_size: int = 64,
        patch_size: Optional[int] = None,
        activation_fn: str = "geglu",
        norm_type: str = "ada_norm_single",
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        caption_channels: int = None,
        video_length: int = 16,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels_ = in_channels if out_channels is None else out_channels

        interpolation_scale = max(sample_size // 64, 1)
        self.pos_embed = PatchEmbed(
            height=sample_size, width=sample_size, patch_size=patch_size,
            in_channels=in_channels, embed_dim=inner_dim,
            interpolation_scale=interpolation_scale,
        )
        self.transformer_blocks = ModuleList(
            [
                PixArtTransformerBlock(
                    inner_dim, num_attention_heads, attention_head_dim,
                    cross_attention_dim, activation_fn=activation_fn,
                    attention_bias=attention_bias,
                )
                for _ in range(num_layers)
            ]
        )
        self.temporal_transformer_blocks = ModuleList(
            [
                PixArtTransformerBlock(
                    inner_dim, num_attention_heads, attention_head_dim,
                    None, activation_fn=activation_fn,
                    attention_bias=attention_bias,
                )
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, patch_size * patch_size * self.out_channels_)
        self.adaln_single = AdaLayerNormSingle(inner_dim, use_additional_conditions=False)
        self.caption_projection = PixArtAlphaTextProjection(caption_channels, inner_dim)

        self._temp_pos_embed = get_1d_sincos_pos_embed_from_grid_np(
            inner_dim, np.arange(video_length, dtype=np.float64)
        )[None]  # [1, F, D]

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["scale_shift_table"] = (
            jax.random.normal(key, (2, self.inner_dim)) / self.inner_dim**0.5
        ).astype(jnp.float32)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_attention_mask: Optional[jax.Array] = None,
        enable_temporal_attentions: bool = True,
        return_dict: bool = True,
    ):
        b, c, num_frame, height, width = hidden_states.shape
        p = self.config.patch_size
        ph, pw = height // p, width // p
        num_patches = ph * pw

        h = jnp.transpose(hidden_states, (0, 2, 1, 3, 4)).reshape(b * num_frame, c, height, width)
        h = self.pos_embed(params["pos_embed"], h)  # [B*F, N, D]

        timestep_mod, embedded_timestep = self.adaln_single(
            params["adaln_single"], timestep, batch_size=b, dtype=h.dtype
        )

        ctx = self.caption_projection(params["caption_projection"], encoder_hidden_states)
        ctx_spatial = jnp.repeat(ctx, num_frame, axis=0)
        mask_spatial = None
        if encoder_attention_mask is not None:
            if encoder_attention_mask.ndim == 2:
                bias = (1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0
                bias = bias[:, None, :]
            else:
                bias = encoder_attention_mask.astype(jnp.float32)
            mask_spatial = jnp.repeat(bias, num_frame, axis=0)[:, None]  # [B*F,1,1,S]

        ts_spatial = jnp.repeat(timestep_mod, num_frame, axis=0)
        ts_temp = jnp.repeat(timestep_mod, num_patches, axis=0)

        for i in range(len(self.transformer_blocks)):
            h = self.transformer_blocks[i](
                params["transformer_blocks"][i], h, ctx_spatial, ts_spatial,
                encoder_attention_mask=mask_spatial,
            )
            if enable_temporal_attentions:
                # [(B F), N, D] -> [(B N), F, D]
                h = h.reshape(b, num_frame, num_patches, self.inner_dim)
                h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b * num_patches, num_frame, self.inner_dim)
                if i == 0 and num_frame > 1:
                    h = h + jnp.asarray(self._temp_pos_embed[:, :num_frame], h.dtype)
                h = self.temporal_transformer_blocks[i](
                    params["temporal_transformer_blocks"][i], h, None, ts_temp
                )
                h = h.reshape(b, num_patches, num_frame, self.inner_dim)
                h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b * num_frame, num_patches, self.inner_dim)

        embedded = jnp.repeat(embedded_timestep, num_frame, axis=0)
        mods = params["scale_shift_table"][None].astype(jnp.float32) + embedded[:, None].astype(jnp.float32)
        shift, scale = jnp.split(mods, 2, axis=1)
        h = self.norm_out({}, h).astype(jnp.float32)
        h = (h * (1 + scale) + shift).astype(hidden_states.dtype)
        h = self.proj_out(params["proj_out"], h)

        h = h.reshape(b * num_frame, ph, pw, p, p, self.out_channels_)
        h = jnp.einsum("nhwpqc->nchpwq", h)
        out = h.reshape(b * num_frame, self.out_channels_, ph * p, pw * p)
        out = out.reshape(b, num_frame, self.out_channels_, height, width)
        output = jnp.transpose(out, (0, 2, 1, 3, 4))

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
