"""SkyReelsV2Transformer3DModel — Skywork's Wan-derived video DiT with
diffusion forcing.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/transformer_skyreels_v2.py`
(block `:439`, model `:518`, forward `:634`): Wan blocks plus
(a) per-frame-block causal attention masking (`num_frame_per_block`),
(b) fps conditioning (`inject_sample_info`), and (c) diffusion forcing —
per-latent-frame timesteps expanded to per-token modulations.

TPU design: reuses our Wan attention/blocks (extended with masks and
per-token temb); the causal block mask is a static boolean built host-side.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, Embedding, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..modeling_utils import ModelMixin
from .transformer_wan import (
    WanRotaryPosEmbed,
    WanTimeTextImageEmbedding,
    WanTransformerBlock,
)


@dataclass
class Transformer3DModelOutput(BaseOutput):
    sample: jax.Array


class SkyReelsV2Transformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: Tuple[int, ...] = (1, 2, 2),
        num_attention_heads: int = 16,
        attention_head_dim: int = 128,
        in_channels: int = 16,
        out_channels: int = 16,
        text_dim: int = 4096,
        freq_dim: int = 256,
        ffn_dim: int = 8192,
        num_layers: int = 32,
        cross_attn_norm: bool = True,
        qk_norm: Optional[str] = "rms_norm_across_heads",
        eps: float = 1e-6,
        image_dim: Optional[int] = None,
        added_kv_proj_dim: Optional[int] = None,
        rope_max_seq_len: int = 1024,
        pos_embed_seq_len: Optional[int] = None,
        inject_sample_info: bool = False,
        num_frame_per_block: int = 1,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels = out_channels or in_channels

        self.rope = WanRotaryPosEmbed(attention_head_dim, patch_size, rope_max_seq_len)
        self.patch_embedding = Conv3d(in_channels, inner_dim, kernel_size=tuple(patch_size),
                                      stride=tuple(patch_size), padding=0)
        self.condition_embedder = WanTimeTextImageEmbedding(
            dim=inner_dim,
            time_freq_dim=freq_dim,
            time_proj_dim=inner_dim * 6,
            text_embed_dim=text_dim,
            image_embed_dim=image_dim,
            pos_embed_seq_len=pos_embed_seq_len,
        )
        self.blocks = ModuleList(
            [
                WanTransformerBlock(inner_dim, ffn_dim, num_attention_heads, qk_norm,
                                    cross_attn_norm, eps, added_kv_proj_dim)
                for _ in range(num_layers)
            ]
        )
        self.norm_out = LayerNorm(inner_dim, eps=eps, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, self.out_channels * math.prod(patch_size))
        if inject_sample_info:
            self.fps_embedding = Embedding(2, inner_dim)
            self.fps_projection = FeedForward(inner_dim, inner_dim * 6, mult=1, activation_fn="linear-silu")

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 7)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 2, self.inner_dim), jnp.float32) / self.inner_dim**0.5
        ).astype(jnp.float32)
        return params

    def _causal_mask(self, ppf: int, pph: int, ppw: int) -> Optional[np.ndarray]:
        nfb = self.config.num_frame_per_block
        if nfb <= 1:
            return None
        block_num = ppf // nfb
        range_tensor = np.repeat(np.arange(block_num), nfb)
        causal = range_tensor[None, :] <= range_tensor[:, None]  # [f, f]
        mask = np.broadcast_to(
            causal[:, None, None, :, None, None],
            (ppf, pph, ppw, ppf, pph, ppw),
        ).reshape(ppf * pph * ppw, ppf * pph * ppw)
        return mask[None, None]  # [1, 1, N, N] boolean keep-mask

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, F, H, W]
        timestep: jax.Array,  # [B] or [B, F_latent] (diffusion forcing)
        encoder_hidden_states: jax.Array,
        encoder_hidden_states_image: Optional[jax.Array] = None,
        enable_diffusion_forcing: bool = False,
        fps: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[Transformer3DModelOutput, tuple]:
        b, c, f, h, w = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size
        ppf, pph, ppw = f // p_t, h // p_h, w // p_w

        rotary_emb = self.rope(f, h, w)

        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.patch_embedding(params["patch_embedding"], x)
        x = x.reshape(b, ppf * pph * ppw, -1)

        mask = self._causal_mask(ppf, pph, ppw)
        attention_mask = jnp.asarray(mask) if mask is not None else None

        ts_flat = timestep.reshape(-1) if enable_diffusion_forcing else timestep
        temb, timestep_proj, encoder_hidden_states, encoder_hidden_states_image = self.condition_embedder(
            params["condition_embedder"], ts_flat, encoder_hidden_states, encoder_hidden_states_image
        )
        timestep_proj = timestep_proj.reshape(timestep_proj.shape[0], 6, -1)

        if encoder_hidden_states_image is not None:
            encoder_hidden_states = jnp.concatenate([encoder_hidden_states_image, encoder_hidden_states], axis=1)

        if self.config.inject_sample_info:
            fps = jnp.asarray(fps, jnp.int32).reshape(-1)
            fps_emb = self.fps_embedding(params["fps_embedding"], fps)  # [1, D]
            fps_proj = self.fps_projection(params["fps_projection"], fps_emb).reshape(-1, 6, self.inner_dim)
            if enable_diffusion_forcing:
                timestep_proj = timestep_proj + jnp.tile(fps_proj, (timestep.shape[1], 1, 1))
            else:
                timestep_proj = timestep_proj + fps_proj

        if enable_diffusion_forcing:
            # per-frame → per-token modulation: [B*F, 6, D] -> [B, 6, N, D]
            fl = timestep.shape[1]
            temb = temb.reshape(b, fl, 1, 1, -1)
            temb = jnp.broadcast_to(temb, (b, fl, pph, ppw, temb.shape[-1])).reshape(b, fl * pph * ppw, -1)
            tp = timestep_proj.reshape(b, fl, 1, 1, 6, -1)
            tp = jnp.broadcast_to(tp, (b, fl, pph, ppw, 6, tp.shape[-1]))
            timestep_proj = jnp.transpose(tp.reshape(b, fl * pph * ppw, 6, -1), (0, 2, 1, 3))  # [B,6,N,D]

        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][i], x, encoder_hidden_states, timestep_proj, rotary_emb,
                      attention_mask=attention_mask)

        sst = params["scale_shift_table"].astype(jnp.float32)
        if temb.ndim == 2:
            shift, scale = [m.squeeze(1)[:, None] for m in jnp.split(sst + temb.astype(jnp.float32)[:, None], 2, axis=1)]
        else:  # [B, N, D] diffusion forcing
            shift, scale = [m.squeeze(1) for m in jnp.split(sst[:, :, None] + temb.astype(jnp.float32)[:, None], 2, axis=1)]
        x = (self.norm_out({}, x.astype(jnp.float32)) * (1 + scale) + shift).astype(x.dtype)
        x = self.proj_out(params["proj_out"], x)

        x = x.reshape(b, ppf, pph, ppw, p_t, p_h, p_w, self.out_channels)
        x = jnp.einsum("bfhwpqrc->bcfphqwr", x)
        output = x.reshape(b, self.out_channels, ppf * p_t, pph * p_h, ppw * p_w)

        if not return_dict:
            return (output,)
        return Transformer3DModelOutput(sample=output)
