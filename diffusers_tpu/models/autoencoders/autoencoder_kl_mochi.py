"""AutoencoderKLMochi — the Mochi-1 3D causal video VAE.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_mochi.py`
(MochiChunkedGroupNorm3D `:35`, MochiResnetBlock3D `:69`, MochiDownBlock3D
`:127`, MochiMidBlock3D `:245`, MochiUpBlock3D `:329`, FourierFeatures `:408`,
MochiEncoder3D `:437`, MochiDecoder3D `:548`, AutoencoderKLMochi `:655`) and
the causal per-pixel frame attention at
`models/attention_processor.py:2906` (L2 qk norm, causal over frames).

TPU design: full-sequence causal convs (temporal replicate left-pad folded
into one NDHWC conv — no chunked conv-cache recursion), activations
[B, T, H, W, C]; the per-frame group norm reduces over (H, W, C/G) only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv3d, GroupNorm, Linear, Module, ModuleList, Params, get_activation
from ..modeling_utils import ModelMixin
from .autoencoder_kl_cogvideox import CogCausalConv3d
from .vae import DecoderOutput, DiagonalGaussianDistribution


class MochiChunkedGroupNorm3D(Module):
    """Per-frame group norm: stats over (H, W, C/G) for each frame
    independently (reference `:35`). Input [B, T, H, W, C]."""

    def __init__(self, num_channels: int, num_groups: int = 32, affine: bool = True):
        super().__init__()
        self.norm_layer = GroupNorm(num_groups=num_groups, num_channels=num_channels, affine=affine)

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"norm_layer": self.norm_layer.init(key, dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        out = self.norm_layer(params["norm_layer"], x.reshape(b * t, h, w, c))
        return out.reshape(b, t, h, w, c)


class MochiResnetBlock3D(Module):
    def __init__(self, in_channels: int, out_channels: Optional[int] = None, act_fn: str = "swish"):
        super().__init__()
        out_channels = out_channels or in_channels
        self.nonlinearity = get_activation(act_fn)
        self.norm1 = MochiChunkedGroupNorm3D(in_channels)
        self.conv1 = CogCausalConv3d(in_channels, out_channels, kernel_size=3, stride=1, pad_mode="replicate")
        self.norm2 = MochiChunkedGroupNorm3D(out_channels)
        self.conv2 = CogCausalConv3d(out_channels, out_channels, kernel_size=3, stride=1, pad_mode="replicate")

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        h = self.norm1(params["norm1"], x)
        h = self.nonlinearity(h)
        h = self.conv1(params["conv1"], h)
        h = self.norm2(params["norm2"], h)
        h = self.nonlinearity(h)
        h = self.conv2(params["conv2"], h)
        return h + x


class _MochiVaeAttention(Module):
    """Causal per-pixel attention over frames with L2 qk norm (reference
    attention_processor.py:2906). Param names match the reference Attention
    module (to_q/to_k/to_v/to_out.0)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int = 32):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        # reference Attention defaults: qkv bias=False, out bias=True
        self.to_q = Linear(query_dim, inner, use_bias=False)
        self.to_k = Linear(query_dim, inner, use_bias=False)
        self.to_v = Linear(query_dim, inner, use_bias=False)
        self.to_out = ModuleList([Linear(inner, query_dim)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [N, T, C]; single-frame inputs short-circuit to value+out proj
        n, t, c = x.shape
        if t == 1:
            h = self.to_v(params["to_v"], x)
            return self.to_out[0](params["to_out"][0], h)
        q = self.to_q(params["to_q"], x).reshape(n, t, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], x).reshape(n, t, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], x).reshape(n, t, self.heads, self.dim_head)
        # l2 qk norm in fp32
        q = (q / jnp.clip(jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)).astype(x.dtype)
        k = (k / jnp.clip(jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)).astype(x.dtype)
        out = dispatch_attention_fn(q, k, v, is_causal=True)
        out = out.reshape(n, t, self.heads * self.dim_head)
        return self.to_out[0](params["to_out"][0], out)


def _spatial_to_tokens(x: jax.Array):
    b, t, h, w, c = x.shape
    tokens = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b * h * w, t, c)
    return tokens, (b, t, h, w, c)


def _tokens_to_spatial(tokens: jax.Array, shape) -> jax.Array:
    b, t, h, w, c = shape
    x = tokens.reshape(b, h, w, t, c)
    return jnp.transpose(x, (0, 3, 1, 2, 4))


class MochiMidBlock3D(Module):
    def __init__(self, in_channels: int, num_layers: int = 3, add_attention: bool = True):
        super().__init__()
        self.resnets = ModuleList([MochiResnetBlock3D(in_channels) for _ in range(num_layers)])
        self.add_attention = add_attention
        if add_attention:
            self.norms = ModuleList([MochiChunkedGroupNorm3D(in_channels) for _ in range(num_layers)])
            self.attentions = ModuleList(
                [_MochiVaeAttention(in_channels, heads=in_channels // 32) for _ in range(num_layers)]
            )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
            if self.add_attention:
                residual = x
                normed = self.norms[i](params["norms"][i], x)
                tokens, shape = _spatial_to_tokens(normed)
                tokens = self.attentions[i](params["attentions"][i], tokens)
                x = residual + _tokens_to_spatial(tokens, shape)
        return x


class MochiDownBlock3D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1,
                 temporal_expansion: int = 2, spatial_expansion: int = 2,
                 add_attention: bool = True):
        super().__init__()
        self.conv_in = CogCausalConv3d(
            in_channels, out_channels,
            kernel_size=(temporal_expansion, spatial_expansion, spatial_expansion),
            stride=(temporal_expansion, spatial_expansion, spatial_expansion),
            pad_mode="replicate",
        )
        self.resnets = ModuleList([MochiResnetBlock3D(out_channels) for _ in range(num_layers)])
        self.add_attention = add_attention
        if add_attention:
            self.norms = ModuleList([MochiChunkedGroupNorm3D(out_channels) for _ in range(num_layers)])
            self.attentions = ModuleList(
                [_MochiVaeAttention(out_channels, heads=out_channels // 32) for _ in range(num_layers)]
            )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
            if self.add_attention:
                residual = x
                normed = self.norms[i](params["norms"][i], x)
                tokens, shape = _spatial_to_tokens(normed)
                tokens = self.attentions[i](params["attentions"][i], tokens)
                x = residual + _tokens_to_spatial(tokens, shape)
        return x


class MochiUpBlock3D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1,
                 temporal_expansion: int = 2, spatial_expansion: int = 2):
        super().__init__()
        self.temporal_expansion = temporal_expansion
        self.spatial_expansion = spatial_expansion
        self.out_channels = out_channels
        self.resnets = ModuleList([MochiResnetBlock3D(in_channels) for _ in range(num_layers)])
        self.proj = Linear(in_channels, out_channels * temporal_expansion * spatial_expansion**2)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            x = resnet(params["resnets"][i], x)
        x = self.proj(params["proj"], x)  # [B, T, H, W, out*st*sh*sw]
        b, t, h, w, _ = x.shape
        st, s = self.temporal_expansion, self.spatial_expansion
        # unpatchify: channel-major layout matches the reference's NCTHW view
        # (B, out, st, sh, sw, T, H, W) -> (B, out, T*st, H*sh, W*sw)
        x = x.reshape(b, t, h, w, self.out_channels, st, s, s)
        x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4))  # [B, T, st, H, sh, W, sw, out]
        return x.reshape(b, t * st, h * s, w * s, self.out_channels)


def fourier_features(x: jax.Array, start: int = 6, stop: int = 8, step: int = 1) -> jax.Array:
    """Append sin/cos features at octave frequencies (reference `:408`).
    x: [B, T, H, W, C] → [B, T, H, W, C*(1+2*num_freqs)] with the reference's
    channel-interleaved frequency layout."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    num_freqs = (stop - start) // step
    freqs = jnp.arange(start, stop, step, dtype=jnp.float32)
    w = jnp.power(2.0, freqs) * (2 * jnp.pi)  # [F]
    # reference: channels repeat-interleaved to match tile(w, C)
    h = jnp.repeat(xf, num_freqs, axis=-1)  # [..., C*F] (c0 f0..fF, c1 f0..)
    wfull = jnp.tile(w, x.shape[-1])  # matches repeat() of w over channels
    # NOTE reference uses w.repeat(C) (tile) with h repeat_interleave → pairs
    # (c_i, f_j) align as h[..., i*F+j] * w[j]
    wfull = jnp.reshape(jnp.broadcast_to(w[None, :], (x.shape[-1], num_freqs)), (-1,))
    h = h * wfull
    return jnp.concatenate([xf, jnp.sin(h), jnp.cos(h)], axis=-1).astype(orig_dtype)


class MochiEncoder3D(Module):
    def __init__(self, in_channels: int, out_channels: int,
                 block_out_channels: Tuple[int, ...] = (128, 256, 512, 768),
                 layers_per_block: Tuple[int, ...] = (3, 3, 4, 6, 3),
                 temporal_expansions: Tuple[int, ...] = (1, 2, 3),
                 spatial_expansions: Tuple[int, ...] = (2, 2, 2),
                 add_attention_block: Tuple[bool, ...] = (False, True, True, True, True),
                 act_fn: str = "swish"):
        super().__init__()
        self.nonlinearity = get_activation(act_fn)
        self.proj_in = Linear(in_channels, block_out_channels[0])
        self.block_in = MochiMidBlock3D(block_out_channels[0], layers_per_block[0], add_attention_block[0])
        self.down_blocks = ModuleList(
            [
                MochiDownBlock3D(
                    block_out_channels[i], block_out_channels[i + 1], layers_per_block[i + 1],
                    temporal_expansions[i], spatial_expansions[i], add_attention_block[i + 1],
                )
                for i in range(len(block_out_channels) - 1)
            ]
        )
        self.block_out = MochiMidBlock3D(block_out_channels[-1], layers_per_block[-1], add_attention_block[-1])
        self.norm_out = MochiChunkedGroupNorm3D(block_out_channels[-1])
        self.proj_out = Linear(block_out_channels[-1], 2 * out_channels, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = fourier_features(x)
        x = self.proj_in(params["proj_in"], x)
        x = self.block_in(params["block_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.block_out(params["block_out"], x)
        x = self.norm_out(params["norm_out"], x)
        x = self.nonlinearity(x)
        return self.proj_out(params["proj_out"], x)


class MochiDecoder3D(Module):
    def __init__(self, in_channels: int, out_channels: int,
                 block_out_channels: Tuple[int, ...] = (128, 256, 512, 768),
                 layers_per_block: Tuple[int, ...] = (3, 3, 4, 6, 3),
                 temporal_expansions: Tuple[int, ...] = (1, 2, 3),
                 spatial_expansions: Tuple[int, ...] = (2, 2, 2),
                 act_fn: str = "swish"):
        super().__init__()
        self.nonlinearity = get_activation(act_fn)
        self.conv_in = Conv3d(in_channels, block_out_channels[-1], kernel_size=1)
        self.block_in = MochiMidBlock3D(block_out_channels[-1], layers_per_block[-1], add_attention=False)
        self.up_blocks = ModuleList(
            [
                MochiUpBlock3D(
                    block_out_channels[-i - 1], block_out_channels[-i - 2], layers_per_block[-i - 2],
                    temporal_expansions[-i - 1], spatial_expansions[-i - 1],
                )
                for i in range(len(block_out_channels) - 1)
            ]
        )
        self.block_out = MochiMidBlock3D(block_out_channels[0], layers_per_block[0], add_attention=False)
        self.proj_out = Linear(block_out_channels[0], out_channels)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        x = self.block_in(params["block_in"], x)
        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x)
        x = self.block_out(params["block_out"], x)
        x = self.nonlinearity(x)
        return self.proj_out(params["proj_out"], x)


class AutoencoderKLMochi(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 15,
        out_channels: int = 3,
        encoder_block_out_channels: Tuple[int, ...] = (64, 128, 256, 384),
        decoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 768),
        latent_channels: int = 12,
        layers_per_block: Tuple[int, ...] = (3, 3, 4, 6, 3),
        act_fn: str = "silu",
        temporal_expansions: Tuple[int, ...] = (1, 2, 3),
        spatial_expansions: Tuple[int, ...] = (2, 2, 2),
        add_attention_block: Tuple[bool, ...] = (False, True, True, True, True),
        latents_mean: Tuple[float, ...] = None,
        latents_std: Tuple[float, ...] = None,
        scaling_factor: float = 1.0,
    ):
        super().__init__()
        self.encoder = MochiEncoder3D(
            in_channels=in_channels,
            out_channels=latent_channels,
            block_out_channels=encoder_block_out_channels,
            layers_per_block=layers_per_block,
            temporal_expansions=temporal_expansions,
            spatial_expansions=spatial_expansions,
            add_attention_block=add_attention_block,
            act_fn=act_fn,
        )
        self.decoder = MochiDecoder3D(
            in_channels=latent_channels,
            out_channels=out_channels,
            block_out_channels=decoder_block_out_channels,
            layers_per_block=layers_per_block,
            temporal_expansions=temporal_expansions,
            spatial_expansions=spatial_expansions,
            act_fn=act_fn,
        )
        scr = 1
        for s in spatial_expansions:
            scr *= s
        tcr = 1
        for t in temporal_expansions:
            tcr *= t
        self.spatial_compression_ratio = scr
        self.temporal_compression_ratio = tcr
        self.drop_last_temporal_frames = True

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, T, H, W] → DiagonalGaussianDistribution (NCTHW moments)."""
        h = jnp.transpose(x, (0, 2, 3, 4, 1))  # [B, T, H, W, C]
        moments = self.encoder(params["encoder"], h)
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return posterior

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        """z: [B, latent_C, T, h, w] → sample [B, C, T_out, H, W]."""
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        dec = self.decoder(params["decoder"], h)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if self.drop_last_temporal_frames and dec.shape[2] >= self.temporal_compression_ratio:
            dec = dec[:, :, self.temporal_compression_ratio - 1 :]
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)
