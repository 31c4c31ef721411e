"""AnyFlowTransformer3DModel — flow-map-distilled Wan 3D DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_anyflow.py:507`):
the Wan2.1 backbone with the timestep embedder replaced by a DUAL-timestep
embedding — source `t` and a delta derived from the target `r`
(`deltatime_type` 'r' or 't-r') mixed by a fixed gate
`(1−g)·temb + g·delta_emb` (`:225`), with per-FRAME timesteps broadcast to
per-token modulation. Blocks, attention, and rope reuse our Wan modules
(identical structure; per-token [B,6,N,D] modulation path).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import PixArtAlphaTextProjection, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from .transformer_wan import (
    Transformer3DModelOutput,
    WanImageEmbedding,
    WanRotaryPosEmbed,
    WanTransformerBlock,
)


class AnyFlowDualTimestepTextImageEmbedding(Module):
    """Dual (t, delta) timestep + text/image conditioning (reference :225)."""

    def __init__(self, dim: int, gate_value: float, deltatime_type: str,
                 time_freq_dim: int, time_proj_dim: int, text_embed_dim: int,
                 image_embed_dim: Optional[int] = None):
        super().__init__()
        self.gate_value = gate_value
        self.deltatime_type = deltatime_type
        self.timesteps_proj = Timesteps(num_channels=time_freq_dim, flip_sin_to_cos=True,
                                        downscale_freq_shift=0)
        self.time_embedder = TimestepEmbedding(time_freq_dim, dim)
        self.delta_embedder = TimestepEmbedding(time_freq_dim, dim)
        self.time_proj = Linear(dim, time_proj_dim)
        self.text_embedder = PixArtAlphaTextProjection(text_embed_dim, dim, act_fn="gelu_tanh")
        self.image_embedder = None
        if image_embed_dim is not None:
            self.image_embedder = WanImageEmbedding(image_embed_dim, dim)

    def __call__(self, params: Params, timestep: jax.Array, r_timestep: jax.Array,
                 encoder_hidden_states: jax.Array, encoder_hidden_states_image=None,
                 token_per_frame: int = 1):
        if self.deltatime_type == "r":
            delta = r_timestep
        elif self.deltatime_type == "t-r":
            delta = timestep - r_timestep
        else:
            raise NotImplementedError(self.deltatime_type)

        b, f = timestep.shape
        t_flat = timestep.reshape(-1)
        d_flat = delta.reshape(-1)
        dtype = encoder_hidden_states.dtype
        temb = self.time_embedder(params["time_embedder"],
                                  self.timesteps_proj({}, t_flat).astype(dtype))
        delta_emb = self.delta_embedder(params["delta_embedder"],
                                        self.timesteps_proj({}, d_flat).astype(dtype))
        g = self.gate_value
        rt_emb = (1 - g) * temb + g * delta_emb
        timestep_proj = self.time_proj(params["time_proj"], jax.nn.silu(rt_emb))

        rt_emb = jnp.repeat(rt_emb.reshape(b, f, -1), token_per_frame, axis=1)
        timestep_proj = jnp.repeat(timestep_proj.reshape(b, f, -1), token_per_frame, axis=1)

        ehs = self.text_embedder(params["text_embedder"], encoder_hidden_states)
        img = None
        if encoder_hidden_states_image is not None and self.image_embedder is not None:
            img = self.image_embedder(params["image_embedder"], encoder_hidden_states_image)
        return rt_emb, timestep_proj, ehs, img


class AnyFlowTransformer3DModel(Module, ModelMixin, ConfigMixin):
    """Bidirectional AnyFlow DiT (reference :507)."""

    @register_to_config
    def __init__(
        self,
        patch_size: Tuple[int, int, int] = (1, 2, 2),
        num_attention_heads: int = 40,
        attention_head_dim: int = 128,
        in_channels: int = 16,
        out_channels: int = 16,
        text_dim: int = 4096,
        freq_dim: int = 256,
        ffn_dim: int = 13824,
        num_layers: int = 40,
        cross_attn_norm: bool = True,
        eps: float = 1e-6,
        image_dim: Optional[int] = None,
        rope_max_seq_len: int = 1024,
        gate_value: float = 0.25,
        deltatime_type: str = "r",
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.rope = WanRotaryPosEmbed(attention_head_dim, patch_size, rope_max_seq_len)
        self.patch_embedding = Conv3d(in_channels, inner_dim, kernel_size=patch_size,
                                      stride=patch_size)
        self.condition_embedder = AnyFlowDualTimestepTextImageEmbedding(
            dim=inner_dim, gate_value=gate_value, deltatime_type=deltatime_type,
            time_freq_dim=freq_dim, time_proj_dim=inner_dim * 6,
            text_embed_dim=text_dim, image_embed_dim=image_dim)
        self.blocks = ModuleList([
            WanTransformerBlock(inner_dim, ffn_dim, num_attention_heads,
                                qk_norm="rms_norm_across_heads",
                                cross_attn_norm=cross_attn_norm, eps=eps)
            for _ in range(num_layers)
        ])
        self.norm_out = LayerNorm(inner_dim, eps=eps, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, out_channels * math.prod(patch_size))

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 47)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        ).astype(dtype)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, F, C, H, W]
        timestep: jax.Array,  # [B, F]
        r_timestep: jax.Array,  # [B, F]
        encoder_hidden_states: jax.Array,
        encoder_hidden_states_image: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        hidden_states = jnp.transpose(hidden_states, (0, 2, 1, 3, 4))  # [B, C, F, H, W]
        b, c, f, h, w = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size
        token_per_frame = (h * w) // (p_h * p_w)

        rope = self.rope(f, h, w)  # tables over the (f/p_t, h/p_h, w/p_w) grid

        # Conv3d is NDHWC in our ops; transpose in/out
        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.patch_embedding(params["patch_embedding"], x)
        x = x.reshape(b, -1, x.shape[-1])

        temb, timestep_proj, ehs, img = self.condition_embedder(
            params["condition_embedder"], timestep, r_timestep, encoder_hidden_states,
            encoder_hidden_states_image, token_per_frame=token_per_frame)
        # [B, N, 6, D] -> [B, 6, N, D] (our Wan block's per-token modulation path)
        timestep_proj = jnp.swapaxes(
            timestep_proj.reshape(b, timestep_proj.shape[1], 6, -1), 1, 2)

        if img is not None:
            ehs = jnp.concatenate([img, ehs], axis=1)

        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][i], x, ehs, timestep_proj, rope)

        # per-token output modulation (reference `:704`)
        shift, scale = [
            m[:, 0] for m in jnp.split(
                params["scale_shift_table"].astype(jnp.float32)[:, :, None]
                + temb.astype(jnp.float32)[:, None], 2, axis=1)
        ]
        x = (self.norm_out({}, x.astype(jnp.float32)) * (1 + scale) + shift).astype(x.dtype)
        x = self.proj_out(params["proj_out"], x)

        # unpatchify (p_t == 1 for all released checkpoints)
        out_c = self.config.out_channels
        output = x.reshape(b * f, h // p_h, w // p_w, p_h, p_w, out_c)
        output = jnp.transpose(output, (0, 5, 1, 3, 2, 4)).reshape(b, f, out_c, h, w)
        if not return_dict:
            return (output,)
        return Transformer3DModelOutput(sample=output)
