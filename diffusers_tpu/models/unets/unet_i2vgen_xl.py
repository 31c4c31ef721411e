"""I2VGenXLUNet — image-to-video 3D UNet.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/unets/unet_i2vgen_xl.py:96`): the
3D block stack from unet_3d_blocks plus image conditioning — VAE image
latents pass a conv stack + per-pixel temporal encoder and concat onto the
sample channels, the first-frame latents feed a context-embedding conv
pyramid (AdaptiveAvgPool2d expressed as one exact separable interval-matrix
matmul — static shapes, MXU-friendly), and CLIP image embeddings project to
extra context tokens. fps is a micro-conditioning timestep embedding.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import (
    Conv2d,
    GroupNorm,
    Identity,
    LayerNorm,
    Linear,
    Module,
    ModuleList,
    Params,
    get_activation,
)
from ..attention import Attention
from ..attention_blocks import FeedForward
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from .unet_3d_blocks import UNetMidBlock3DCrossAttn, get_down_block_3d, get_up_block_3d
from .unet_3d_condition import UNet3DConditionOutput


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Row-normalized interval indicator [out, in] — torch AdaptiveAvgPool2d
    windows are products of per-axis intervals, so pooling is W_h @ X @ W_w^T."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        r1 = (i * in_size) // out_size
        r2 = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, r1:r2] = 1.0 / (r2 - r1)
    return m


class I2VGenXLTransformerTemporalEncoder(Module):
    """norm→self-attn + norm→ff over per-pixel frame sequences (reference
    `unet_i2vgen_xl.py:47`)."""

    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 ff_inner_dim: int, activation_fn: str = "gelu"):
        super().__init__()
        self.norm1 = LayerNorm(dim, eps=1e-5)
        self.attn1 = Attention(query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
                               bias=False, out_bias=True)
        self.ff = FeedForward(dim, inner_dim=ff_inner_dim, activation_fn=activation_fn, bias=True)

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        norm_h = self.norm1(params["norm1"], hidden_states)
        attn = self.attn1(params["attn1"], norm_h, None)
        hidden_states = attn + hidden_states
        ff_out = self.ff(params["ff"], hidden_states)
        return jnp.clip(ff_out + hidden_states, -65504, 65504)


class I2VGenXLUNet(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = None,
        in_channels: int = 4,
        out_channels: int = 4,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlock3D", "CrossAttnDownBlock3D", "CrossAttnDownBlock3D", "DownBlock3D",
        ),
        up_block_types: Tuple[str, ...] = (
            "UpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
        ),
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: int = 2,
        norm_num_groups: Optional[int] = 32,
        cross_attention_dim: int = 1024,
        attention_head_dim: Union[int, Tuple[int, ...]] = 64,
        num_attention_heads: Optional[Union[int, Tuple[int, ...]]] = None,
    ):
        super().__init__()
        # reference `:153`: attention_head_dim is the per-head dim here
        heads = attention_head_dim
        if isinstance(heads, int):
            heads = (heads,) * len(down_block_types)

        self.conv_in = Conv2d(in_channels + in_channels, block_out_channels[0], kernel_size=3, padding=1)
        from ..transformers.transformer_temporal import TransformerTemporalModel

        self.transformer_in = TransformerTemporalModel(
            num_attention_heads=8, attention_head_dim=heads[0],
            in_channels=block_out_channels[0], num_layers=1, norm_num_groups=norm_num_groups,
        )

        # image embedding stacks (torch Sequential indices kept for 1:1 keys)
        self.image_latents_proj_in = ModuleList([
            Conv2d(4, in_channels * 4, 3, padding=1), Identity(),
            Conv2d(in_channels * 4, in_channels * 4, 3, padding=1), Identity(),
            Conv2d(in_channels * 4, in_channels, 3, padding=1),
        ])
        self.image_latents_temporal_encoder = I2VGenXLTransformerTemporalEncoder(
            dim=in_channels, num_attention_heads=2, ff_inner_dim=in_channels * 4,
            attention_head_dim=in_channels, activation_fn="gelu",
        )
        self.image_latents_context_embedding = ModuleList([
            Conv2d(4, in_channels * 8, 3, padding=1), Identity(), Identity(),  # 2 = pool (no params)
            Conv2d(in_channels * 8, in_channels * 16, 3, stride=2, padding=1), Identity(),
            Conv2d(in_channels * 16, cross_attention_dim, 3, stride=2, padding=1),
        ])

        time_embed_dim = block_out_channels[0] * 4
        self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos=True, downscale_freq_shift=0)
        self.time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim, act_fn="silu")
        self.context_embedding = ModuleList([
            Linear(cross_attention_dim, time_embed_dim), Identity(),
            Linear(time_embed_dim, cross_attention_dim * in_channels),
        ])
        self.fps_embedding = ModuleList([
            Linear(block_out_channels[0], time_embed_dim), Identity(),
            Linear(time_embed_dim, time_embed_dim),
        ])

        down_blocks, up_blocks = [], []
        output_channel = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            down_blocks.append(get_down_block_3d(
                block_type, in_channels=input_channel, out_channels=output_channel,
                temb_channels=time_embed_dim, num_layers=layers_per_block,
                resnet_eps=1e-05, resnet_groups=norm_num_groups,
                num_attention_heads=heads[i], cross_attention_dim=cross_attention_dim,
                downsample_padding=1, add_downsample=not is_final, use_linear_projection=True,
            ))
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = UNetMidBlock3DCrossAttn(
            in_channels=block_out_channels[-1], temb_channels=time_embed_dim,
            resnet_eps=1e-05, resnet_groups=norm_num_groups,
            num_attention_heads=heads[-1], cross_attention_dim=cross_attention_dim,
            use_linear_projection=True,
        )

        reversed_channels = list(reversed(block_out_channels))
        reversed_heads = list(reversed(heads))
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, len(block_out_channels) - 1)]
            is_final = i == len(block_out_channels) - 1
            up_blocks.append(get_up_block_3d(
                block_type, in_channels=input_channel, out_channels=output_channel,
                prev_output_channel=prev_output_channel, temb_channels=time_embed_dim,
                num_layers=layers_per_block + 1, resnet_eps=1e-05, resnet_groups=norm_num_groups,
                num_attention_heads=reversed_heads[i], cross_attention_dim=cross_attention_dim,
                add_upsample=not is_final, use_linear_projection=True,
            ))
        self.up_blocks = ModuleList(up_blocks)

        self.conv_norm_out = GroupNorm(num_groups=norm_num_groups, num_channels=block_out_channels[0],
                                       eps=1e-05)
        self.conv_act = get_activation("silu")
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    # --------------------------------------------------------------- helpers
    def _image_context_embs(self, params, image_latents_first):
        """first-frame latents [B, C, H, W] → context tokens [B, 32*32/16, D]."""
        silu = get_activation("silu")
        x = jnp.transpose(image_latents_first, (0, 2, 3, 1))  # NHWC
        p = params["image_latents_context_embedding"]
        x = self.image_latents_context_embedding[0](p[0], x)
        x = silu(x)
        # AdaptiveAvgPool2d((32,32)) as separable interval matmuls
        wh = jnp.asarray(_adaptive_pool_matrix(x.shape[1], 32), x.dtype)
        ww = jnp.asarray(_adaptive_pool_matrix(x.shape[2], 32), x.dtype)
        x = jnp.einsum("oh,bhwc->bowc", wh, x)
        x = jnp.einsum("ow,bhwc->bhoc", ww, x)
        x = self.image_latents_context_embedding[3](p[3], x)
        x = silu(x)
        x = self.image_latents_context_embedding[5](p[5], x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, F, H, W]
        timestep: Union[jax.Array, float, int],
        fps: jax.Array,
        image_latents: jax.Array,  # [B, C, F, H, W]
        image_embeddings: Optional[jax.Array] = None,  # [B, D]
        encoder_hidden_states: Optional[jax.Array] = None,  # [B, S, D]
        timestep_cond: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[UNet3DConditionOutput, tuple]:
        b, c, num_frames, h, w = sample.shape
        silu = get_activation("silu")

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (b,))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        t_emb = self.time_embedding(params["time_embedding"], t_emb, timestep_cond)

        fps = jnp.broadcast_to(jnp.asarray(fps), (b,))
        fps_proj = self.time_proj({}, fps).astype(sample.dtype)
        fps_emb = self.fps_embedding[0](params["fps_embedding"][0], fps_proj)
        fps_emb = self.fps_embedding[2](params["fps_embedding"][2], silu(fps_emb))

        emb = t_emb + fps_emb
        emb = jnp.repeat(emb, num_frames, axis=0)

        # context: text tokens + first-frame latent tokens + CLIP image tokens
        context_emb = encoder_hidden_states
        image_ctx = self._image_context_embs(params, image_latents[:, :, 0])
        context_emb = jnp.concatenate([context_emb, image_ctx], axis=1)
        image_emb = self.context_embedding[0](params["context_embedding"][0], image_embeddings)
        image_emb = self.context_embedding[2](params["context_embedding"][2], silu(image_emb))
        image_emb = image_emb.reshape(-1, self.config.in_channels, self.config.cross_attention_dim)
        context_emb = jnp.concatenate([context_emb, image_emb], axis=1)
        context_emb = jnp.repeat(context_emb, num_frames, axis=0)

        # image latents: per-frame conv stack + per-pixel temporal encoder
        il = jnp.transpose(image_latents, (0, 2, 3, 4, 1)).reshape(b * num_frames, h, w, -1)
        pl = params["image_latents_proj_in"]
        il = self.image_latents_proj_in[0](pl[0], il)
        il = self.image_latents_proj_in[2](pl[2], silu(il))
        il = self.image_latents_proj_in[4](pl[4], silu(il))
        il = il.reshape(b, num_frames, h, w, c)
        il = jnp.transpose(il, (0, 2, 3, 1, 4)).reshape(b * h * w, num_frames, c)
        il = self.image_latents_temporal_encoder(params["image_latents_temporal_encoder"], il)
        il = il.reshape(b, h, w, num_frames, c)

        # [B, C, F, H, W] -> NHWC, concat conditioning channels
        x = jnp.transpose(sample, (0, 2, 3, 4, 1)).reshape(b * num_frames, h, w, c)
        il = jnp.transpose(il, (0, 3, 1, 2, 4)).reshape(b * num_frames, h, w, c)
        x = jnp.concatenate([x, il], axis=-1)
        x = self.conv_in(params["conv_in"], x)
        x = self.transformer_in(params["transformer_in"], x, num_frames=num_frames)

        res_samples = (x,)
        for i, block in enumerate(self.down_blocks):
            if block.has_cross_attention:
                x, res = block(params["down_blocks"][i], x, emb, context_emb, num_frames)
            else:
                x, res = block(params["down_blocks"][i], x, emb, num_frames=num_frames)
            res_samples += res

        x = self.mid_block(params["mid_block"], x, emb, context_emb, num_frames)

        for i, block in enumerate(self.up_blocks):
            skips = res_samples[-len(block.resnets):]
            res_samples = res_samples[: -len(block.resnets)]
            if block.has_cross_attention:
                x = block(params["up_blocks"][i], x, skips, emb, context_emb, num_frames)
            else:
                x = block(params["up_blocks"][i], x, skips, emb, num_frames=num_frames)

        x = self.conv_norm_out(params["conv_norm_out"], x)
        x = self.conv_act(x)
        x = self.conv_out(params["conv_out"], x)

        x = x.reshape(b, num_frames, *x.shape[1:])
        output = jnp.transpose(x, (0, 4, 1, 2, 3))
        if not return_dict:
            return (output,)
        return UNet3DConditionOutput(sample=output)
