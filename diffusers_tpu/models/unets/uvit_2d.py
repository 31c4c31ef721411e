"""UVit2DModel — the aMUSEd masked-image-modeling U-ViT.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/unets/uvit_2d.py:38`): token-id conv
embed → ConvNext+SkipFF down block → flattened ada-norm-continuous
transformer trunk → up block → conv MLM head over the VQ codebook. NHWC
internals; the depthwise conv is a grouped Conv2d (XLA lowers it to the
fused depthwise path); the ada-norm conditioning is the pooled text
embedding + sinusoidal micro-conds through one TimestepEmbedding.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import (
    Conv2d,
    ConvTranspose2d,
    Embedding,
    Linear,
    Module,
    ModuleList,
    Params,
    RMSNorm,
)
from ..attention import Attention
from ..attention_blocks import FeedForward
from ..embeddings import TimestepEmbedding, get_timestep_embedding
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous


class GlobalResponseNorm(Module):
    """ConvNeXt-v2 GRN over NHWC (reference normalization.py:600)."""

    def __init__(self, dim: int):
        super().__init__()
        self.dim = dim

    def init(self, key, dtype=jnp.float32) -> Params:
        return {
            "gamma": jnp.zeros((1, 1, 1, self.dim), dtype),
            "beta": jnp.zeros((1, 1, 1, self.dim), dtype),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return params["gamma"] * (x * nx) + params["beta"] + x


class UVit2DConvEmbed(Module):
    def __init__(self, in_channels, block_out_channels, vocab_size, elementwise_affine, eps, bias):
        super().__init__()
        self.embeddings = Embedding(vocab_size, in_channels)
        self.layer_norm = RMSNorm(in_channels, eps=eps, use_scale=elementwise_affine)
        self.conv = Conv2d(in_channels, block_out_channels, kernel_size=1, use_bias=bias)

    def __call__(self, params: Params, input_ids: jax.Array) -> jax.Array:
        """input_ids: [B, H, W] int → NHWC features."""
        x = self.embeddings(params["embeddings"], input_ids)
        x = self.layer_norm(params["layer_norm"], x)
        return self.conv(params["conv"], x)


class ConvNextBlock(Module):
    def __init__(self, channels, layer_norm_eps, ln_elementwise_affine, use_bias,
                 hidden_size, res_ffn_factor: float = 4):
        super().__init__()
        inner = int(channels * res_ffn_factor)
        self.depthwise = Conv2d(channels, channels, kernel_size=3, padding=1, groups=channels,
                                use_bias=use_bias)
        self.norm = RMSNorm(channels, eps=layer_norm_eps, use_scale=ln_elementwise_affine)
        self.channelwise_linear_1 = Linear(channels, inner, use_bias=use_bias)
        self.channelwise_norm = GlobalResponseNorm(inner)
        self.channelwise_linear_2 = Linear(inner, channels, use_bias=use_bias)
        self.cond_embeds_mapper = Linear(hidden_size, channels * 2, use_bias=use_bias)

    def __call__(self, params: Params, x: jax.Array, cond_embeds: jax.Array) -> jax.Array:
        x_res = x
        x = self.depthwise(params["depthwise"], x)
        x = self.norm(params["norm"], x)
        x = self.channelwise_linear_1(params["channelwise_linear_1"], x)
        x = jax.nn.gelu(x, approximate=False)
        x = self.channelwise_norm(params["channelwise_norm"], x)
        x = self.channelwise_linear_2(params["channelwise_linear_2"], x)
        x = x + x_res
        scale_shift = self.cond_embeds_mapper(params["cond_embeds_mapper"], jax.nn.silu(cond_embeds))
        scale, shift = jnp.split(scale_shift, 2, axis=-1)
        return x * (1 + scale[:, None, None, :]) + shift[:, None, None, :]


class SkipFFTransformerBlock(Module):
    """Two attention sublayers (self-ish + cross) with RMS pre-norms, no FF
    (reference models/attention.py:1262)."""

    def __init__(self, dim, num_attention_heads, attention_head_dim, kv_input_dim,
                 kv_input_dim_proj_use_bias, cross_attention_dim,
                 attention_bias=False, attention_out_bias=True):
        super().__init__()
        self.kv_mapper = Linear(kv_input_dim, dim, use_bias=kv_input_dim_proj_use_bias) if kv_input_dim != dim else None
        self.norm1 = RMSNorm(dim, eps=1e-06)
        self.attn1 = Attention(query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
                               bias=attention_bias, cross_attention_dim=cross_attention_dim,
                               out_bias=attention_out_bias)
        self.norm2 = RMSNorm(dim, eps=1e-06)
        self.attn2 = Attention(query_dim=dim, heads=num_attention_heads, dim_head=attention_head_dim,
                               bias=attention_bias, cross_attention_dim=cross_attention_dim,
                               out_bias=attention_out_bias)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states):
        if self.kv_mapper is not None:
            encoder_hidden_states = self.kv_mapper(params["kv_mapper"], jax.nn.silu(encoder_hidden_states))
        attn = self.attn1(params["attn1"], self.norm1(params["norm1"], hidden_states), encoder_hidden_states)
        hidden_states = attn + hidden_states
        attn = self.attn2(params["attn2"], self.norm2(params["norm2"], hidden_states), encoder_hidden_states)
        return attn + hidden_states


class UVitDownsample(Module):
    """RMSNorm + k2 s2 conv (reference Downsample2D norm_type='rms_norm')."""

    def __init__(self, channels, eps, elementwise_affine, bias):
        super().__init__()
        self.norm = RMSNorm(channels, eps=eps, use_scale=elementwise_affine)
        self.conv = Conv2d(channels, channels, kernel_size=2, stride=2, padding=0, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.conv(params["conv"], self.norm(params["norm"], x))


class UVitUpsample(Module):
    """RMSNorm + k2 s2 conv-transpose (reference Upsample2D use_conv_transpose)."""

    def __init__(self, channels, eps, elementwise_affine, bias):
        super().__init__()
        self.norm = RMSNorm(channels, eps=eps, use_scale=elementwise_affine)
        self.conv = ConvTranspose2d(channels, channels, kernel_size=2, stride=2, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.conv(params["conv"], self.norm(params["norm"], x))


class UVitBlock(Module):
    def __init__(self, channels, num_res_blocks, hidden_size, ln_elementwise_affine,
                 layer_norm_eps, use_bias, block_num_heads, downsample: bool, upsample: bool):
        super().__init__()
        self.downsample = UVitDownsample(channels, layer_norm_eps, ln_elementwise_affine, use_bias) if downsample else None
        self.res_blocks = ModuleList([
            ConvNextBlock(channels, layer_norm_eps, ln_elementwise_affine, use_bias, hidden_size)
            for _ in range(num_res_blocks)
        ])
        self.attention_blocks = ModuleList([
            SkipFFTransformerBlock(channels, block_num_heads, channels // block_num_heads,
                                   hidden_size, use_bias, channels,
                                   attention_bias=use_bias, attention_out_bias=use_bias)
            for _ in range(num_res_blocks)
        ])
        self.upsample = UVitUpsample(channels, layer_norm_eps, ln_elementwise_affine, use_bias) if upsample else None

    def __call__(self, params: Params, x, pooled_text_emb, encoder_hidden_states):
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x)
        for i in range(len(self.res_blocks)):
            x = self.res_blocks[i](params["res_blocks"][i], x, pooled_text_emb)
            b, h, w, c = x.shape
            flat = x.reshape(b, h * w, c)
            flat = self.attention_blocks[i](params["attention_blocks"][i], flat, encoder_hidden_states)
            x = flat.reshape(b, h, w, c)
        if self.upsample is not None:
            x = self.upsample(params["upsample"], x)
        return x


class UVitTransformerLayer(Module):
    """BasicTransformerBlock with norm_type='ada_norm_continuous' (rms)
    conditioned on the pooled text embedding (reference attention.py:859)."""

    def __init__(self, dim, num_attention_heads, cross_attention_dim, cond_dim,
                 norm_elementwise_affine, norm_eps, use_bias, ff_inner_dim):
        super().__init__()
        kwargs = dict(elementwise_affine=norm_elementwise_affine, eps=norm_eps,
                      bias=use_bias, norm_type="rms_norm")
        self.norm1 = AdaLayerNormContinuous(dim, cond_dim, **kwargs)
        self.attn1 = Attention(query_dim=dim, heads=num_attention_heads,
                               dim_head=dim // num_attention_heads, bias=use_bias, out_bias=use_bias)
        self.norm2 = AdaLayerNormContinuous(dim, cond_dim, **kwargs)
        self.attn2 = Attention(query_dim=dim, cross_attention_dim=cross_attention_dim,
                               heads=num_attention_heads, dim_head=dim // num_attention_heads,
                               bias=use_bias, out_bias=use_bias)
        # norm3 is the one LAYER-norm ada norm in the block (reference
        # attention.py:919 passes "layer_norm" there, rms elsewhere)
        self.norm3 = AdaLayerNormContinuous(dim, cond_dim, elementwise_affine=norm_elementwise_affine,
                                            eps=norm_eps, bias=use_bias, norm_type="layer_norm")
        self.ff = FeedForward(dim, inner_dim=ff_inner_dim, activation_fn="geglu", bias=use_bias)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, pooled_text_emb):
        norm_h = self.norm1(params["norm1"], hidden_states, pooled_text_emb)
        hidden_states = self.attn1(params["attn1"], norm_h, None) + hidden_states
        norm_h = self.norm2(params["norm2"], hidden_states, pooled_text_emb)
        hidden_states = self.attn2(params["attn2"], norm_h, encoder_hidden_states) + hidden_states
        norm_h = self.norm3(params["norm3"], hidden_states, pooled_text_emb)
        return self.ff(params["ff"], norm_h) + hidden_states


class ConvMlmLayer(Module):
    def __init__(self, block_out_channels, in_channels, use_bias, ln_elementwise_affine,
                 layer_norm_eps, codebook_size):
        super().__init__()
        self.conv1 = Conv2d(block_out_channels, in_channels, kernel_size=1, use_bias=use_bias)
        self.layer_norm = RMSNorm(in_channels, eps=layer_norm_eps, use_scale=ln_elementwise_affine)
        self.conv2 = Conv2d(in_channels, codebook_size, kernel_size=1, use_bias=use_bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv1(params["conv1"], x)
        x = self.layer_norm(params["layer_norm"], x)
        return self.conv2(params["conv2"], x)


class UVit2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        hidden_size: int = 1024,
        use_bias: bool = False,
        hidden_dropout: float = 0.0,
        cond_embed_dim: int = 768,
        micro_cond_encode_dim: int = 256,
        micro_cond_embed_dim: int = 1280,
        encoder_hidden_size: int = 768,
        vocab_size: int = 8256,
        codebook_size: int = 8192,
        in_channels: int = 768,
        block_out_channels: int = 768,
        num_res_blocks: int = 3,
        downsample: bool = False,
        upsample: bool = False,
        block_num_heads: int = 12,
        num_hidden_layers: int = 22,
        num_attention_heads: int = 16,
        attention_dropout: float = 0.0,
        intermediate_size: int = 2816,
        layer_norm_eps: float = 1e-6,
        ln_elementwise_affine: bool = True,
        sample_size: int = 64,
    ):
        super().__init__()
        self.encoder_proj = Linear(encoder_hidden_size, hidden_size, use_bias=use_bias)
        self.encoder_proj_layer_norm = RMSNorm(hidden_size, eps=layer_norm_eps,
                                               use_scale=ln_elementwise_affine)
        self.embed = UVit2DConvEmbed(in_channels, block_out_channels, vocab_size,
                                     ln_elementwise_affine, layer_norm_eps, use_bias)
        self.cond_embed = TimestepEmbedding(micro_cond_embed_dim + cond_embed_dim, hidden_size,
                                            sample_proj_bias=use_bias)
        self.down_block = UVitBlock(block_out_channels, num_res_blocks, hidden_size,
                                    ln_elementwise_affine, layer_norm_eps, use_bias,
                                    block_num_heads, downsample, False)
        self.project_to_hidden_norm = RMSNorm(block_out_channels, eps=layer_norm_eps,
                                              use_scale=ln_elementwise_affine)
        self.project_to_hidden = Linear(block_out_channels, hidden_size, use_bias=use_bias)
        self.transformer_layers = ModuleList([
            UVitTransformerLayer(
                hidden_size, num_attention_heads, hidden_size, hidden_size,
                ln_elementwise_affine, layer_norm_eps, use_bias, intermediate_size,
            )
            for _ in range(num_hidden_layers)
        ])
        self.project_from_hidden_norm = RMSNorm(hidden_size, eps=layer_norm_eps,
                                                use_scale=ln_elementwise_affine)
        self.project_from_hidden = Linear(hidden_size, block_out_channels, use_bias=use_bias)
        self.up_block = UVitBlock(block_out_channels, num_res_blocks, hidden_size,
                                  ln_elementwise_affine, layer_norm_eps, use_bias,
                                  block_num_heads, False, upsample)
        self.mlm_layer = ConvMlmLayer(block_out_channels, in_channels, use_bias,
                                      ln_elementwise_affine, layer_norm_eps, codebook_size)

    def __call__(
        self,
        params: Params,
        input_ids: jax.Array,  # [B, H, W] int token ids
        encoder_hidden_states: jax.Array,  # [B, S, D]
        pooled_text_emb: jax.Array,  # [B, cond_embed_dim]
        micro_conds: jax.Array,  # [B, 5]
    ) -> jax.Array:
        """Returns codebook logits [B, codebook_size, H, W] (reference layout)."""
        encoder_hidden_states = self.encoder_proj(params["encoder_proj"], encoder_hidden_states)
        encoder_hidden_states = self.encoder_proj_layer_norm(
            params["encoder_proj_layer_norm"], encoder_hidden_states
        )

        micro = get_timestep_embedding(
            micro_conds.reshape(-1), self.config.micro_cond_encode_dim,
            flip_sin_to_cos=True, downscale_freq_shift=0,
        )
        micro = micro.reshape(input_ids.shape[0], -1)
        pooled = jnp.concatenate([pooled_text_emb, micro.astype(pooled_text_emb.dtype)], axis=1)
        pooled = self.cond_embed(params["cond_embed"], pooled)

        x = self.embed(params["embed"], input_ids)
        x = self.down_block(params["down_block"], x, pooled, encoder_hidden_states)

        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        flat = self.project_to_hidden_norm(params["project_to_hidden_norm"], flat)
        flat = self.project_to_hidden(params["project_to_hidden"], flat)
        for i, layer in enumerate(self.transformer_layers):
            flat = layer(params["transformer_layers"][i], flat, encoder_hidden_states, pooled)
        flat = self.project_from_hidden_norm(params["project_from_hidden_norm"], flat)
        flat = self.project_from_hidden(params["project_from_hidden"], flat)
        x = flat.reshape(b, h, w, c)

        x = self.up_block(params["up_block"], x, pooled, encoder_hidden_states)
        logits = self.mlm_layer(params["mlm_layer"], x)
        return jnp.transpose(logits, (0, 3, 1, 2))
