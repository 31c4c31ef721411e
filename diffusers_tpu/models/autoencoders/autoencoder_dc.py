"""Deep-Compression Autoencoder (DC-AE, the Sana VAE).

Functional mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_dc.py:380`
AutoencoderDC; `attention_processor.py:866` SanaMultiscaleLinearAttention).
NHWC internals; pixel (un)shuffle helpers reproduce torch's channel ordering
exactly so checkpoints load mechanically. The multiscale linear attention is
two MXU matmuls over [heads, d+1, N] — O(N) in sequence length, ideal for the
32x-downsampling DC-AE which runs attention on large token grids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Linear, Module, ModuleList, Params, RMSNorm, get_activation
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput


@dataclass
class EncoderOutput(BaseOutput):
    latent: jax.Array


def pixel_unshuffle_nhwc(x: jax.Array, f: int) -> jax.Array:
    """[B, H·f, W·f, C] → [B, H, W, C·f²] with torch channel order
    (c·f² + fy·f + fx)."""
    b, hf, wf, c = x.shape
    x = x.reshape(b, hf // f, f, wf // f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # [B, H, W, C, fy, fx]
    return x.reshape(b, hf // f, wf // f, c * f * f)


def pixel_shuffle_nhwc(x: jax.Array, f: int) -> jax.Array:
    """[B, H, W, C·f²] → [B, H·f, W·f, C] (inverse of the above)."""
    b, h, w, cf2 = x.shape
    c = cf2 // (f * f)
    x = x.reshape(b, h, w, c, f, f)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # [B, H, fy, W, fx, C]
    return x.reshape(b, h * f, w * f, c)


class GLUMBConv(Module):
    """Gated inverted-bottleneck conv (reference sana_transformer.py:38)."""

    def __init__(self, in_channels: int, out_channels: int, expand_ratio: float = 4,
                 norm_type: Optional[str] = None, residual_connection: bool = True):
        super().__init__()
        hidden = int(expand_ratio * in_channels)
        self.norm_type = norm_type
        self.residual_connection = residual_connection
        self.conv_inverted = Conv2d(in_channels, hidden * 2, kernel_size=1, padding=0)
        self.conv_depth = Conv2d(hidden * 2, hidden * 2, kernel_size=3, padding=1, groups=hidden * 2)
        self.conv_point = Conv2d(hidden, out_channels, kernel_size=1, padding=0, use_bias=False)
        self.norm = RMSNorm(out_channels, eps=1e-5, use_bias=True) if norm_type == "rms_norm" else None

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        x = jax.nn.silu(self.conv_inverted(params["conv_inverted"], x))
        x = self.conv_depth(params["conv_depth"], x)
        x, gate = jnp.split(x, 2, axis=-1)
        x = x * jax.nn.silu(gate)
        x = self.conv_point(params["conv_point"], x)
        if self.norm is not None:
            x = self.norm(params["norm"], x)
        return x + residual if self.residual_connection else x


class SanaMultiscaleAttentionProjection(Module):
    def __init__(self, in_channels: int, num_attention_heads: int, kernel_size: int):
        super().__init__()
        channels = 3 * in_channels
        self.proj_in = Conv2d(channels, channels, kernel_size=kernel_size, padding=kernel_size // 2,
                              groups=channels, use_bias=False)
        self.proj_out = Conv2d(channels, channels, kernel_size=1, padding=0,
                               groups=3 * num_attention_heads, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.proj_out(params["proj_out"], self.proj_in(params["proj_in"], x))


class SanaMultiscaleLinearAttention(Module):
    """O(N) multiscale linear attention over spatial grids (NHWC)."""

    def __init__(self, in_channels: int, out_channels: int, num_attention_heads: Optional[int] = None,
                 attention_head_dim: int = 8, mult: float = 1.0, norm_type: str = "rms_norm",
                 kernel_sizes: Tuple[int, ...] = (5,), eps: float = 1e-15, residual_connection: bool = False):
        super().__init__()
        self.eps = eps
        self.attention_head_dim = attention_head_dim
        self.norm_type = norm_type
        self.residual_connection = residual_connection
        num_attention_heads = (
            int(in_channels // attention_head_dim * mult) if num_attention_heads is None else num_attention_heads
        )
        inner_dim = num_attention_heads * attention_head_dim
        self.to_q = Linear(in_channels, inner_dim, use_bias=False)
        self.to_k = Linear(in_channels, inner_dim, use_bias=False)
        self.to_v = Linear(in_channels, inner_dim, use_bias=False)
        self.to_qkv_multiscale = ModuleList(
            [SanaMultiscaleAttentionProjection(inner_dim, num_attention_heads, k) for k in kernel_sizes]
        )
        self.to_out = Linear(inner_dim * (1 + len(kernel_sizes)), out_channels, use_bias=False)
        if norm_type == "rms_norm":
            self.norm_out = RMSNorm(out_channels, eps=1e-5, use_bias=True)
        else:
            raise NotImplementedError(f"norm_type {norm_type} (DC-AE checkpoints use rms_norm)")

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        b, h, w, _ = hidden_states.shape
        residual = hidden_states
        use_linear = h * w > self.attention_head_dim

        q = self.to_q(params["to_q"], hidden_states)
        k = self.to_k(params["to_k"], hidden_states)
        v = self.to_v(params["to_v"], hidden_states)
        qkv = jnp.concatenate([q, k, v], axis=-1)

        multi_scale = [qkv]
        for i, block in enumerate(self.to_qkv_multiscale):
            multi_scale.append(block(params["to_qkv_multiscale"][i], qkv))
        x = jnp.concatenate(multi_scale, axis=-1)

        if use_linear:
            x = x.astype(jnp.float32)
        # torch layout: [B, C, N] → [B, groups, 3·hd, N]; channel-major NCHW
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1, 3 * self.attention_head_dim, h * w)
        query, key, value = jnp.split(x, 3, axis=2)
        query = jax.nn.relu(query)
        key = jax.nn.relu(key)

        if use_linear:
            value = jnp.pad(value, ((0, 0), (0, 0), (0, 1), (0, 0)), constant_values=1.0)
            scores = value @ jnp.swapaxes(key, -1, -2)  # [B, g, hd+1, hd]
            out = (scores @ query).astype(jnp.float32)  # [B, g, hd+1, N]
            out = out[:, :, :-1] / (out[:, :, -1:] + self.eps)
        else:
            scores = (jnp.swapaxes(key, -1, -2) @ query).astype(jnp.float32)  # [B, g, N, N]
            scores = scores / (jnp.sum(scores, axis=2, keepdims=True) + self.eps)
            out = value @ scores.astype(value.dtype)

        out = out.reshape(b, -1, h, w).astype(residual.dtype)
        out = jnp.transpose(out, (0, 2, 3, 1))  # back to NHWC
        out = self.to_out(params["to_out"], out)
        out = self.norm_out(params["norm_out"], out)
        if self.residual_connection:
            out = out + residual
        return out


class ResBlock(Module):
    def __init__(self, in_channels: int, out_channels: int, norm_type: str = "rms_norm", act_fn: str = "silu"):
        super().__init__()
        if norm_type != "rms_norm":
            raise NotImplementedError("DC-AE checkpoints use rms_norm")
        self.nonlinearity = get_activation(act_fn) if act_fn is not None else (lambda x: x)
        self.conv1 = Conv2d(in_channels, in_channels, kernel_size=3, padding=1)
        self.conv2 = Conv2d(in_channels, out_channels, kernel_size=3, padding=1, use_bias=False)
        self.norm = RMSNorm(out_channels, eps=1e-5, use_bias=True)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = x
        x = self.nonlinearity(self.conv1(params["conv1"], x))
        x = self.conv2(params["conv2"], x)
        x = self.norm(params["norm"], x)
        return x + residual


class EfficientViTBlock(Module):
    def __init__(self, in_channels: int, mult: float = 1.0, attention_head_dim: int = 32,
                 qkv_multiscales: Tuple[int, ...] = (5,), norm_type: str = "rms_norm"):
        super().__init__()
        self.attn = SanaMultiscaleLinearAttention(
            in_channels=in_channels, out_channels=in_channels, mult=mult,
            attention_head_dim=attention_head_dim, norm_type=norm_type,
            kernel_sizes=qkv_multiscales, residual_connection=True,
        )
        self.conv_out = GLUMBConv(in_channels, in_channels, norm_type="rms_norm")

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.attn(params["attn"], x)
        return self.conv_out(params["conv_out"], x)


def _get_block(block_type, in_channels, out_channels, attention_head_dim, norm_type, act_fn, qkv_multiscales):
    if block_type == "ResBlock":
        return ResBlock(in_channels, out_channels, norm_type, act_fn)
    if block_type == "EfficientViTBlock":
        return EfficientViTBlock(
            in_channels, attention_head_dim=attention_head_dim, norm_type=norm_type, qkv_multiscales=qkv_multiscales
        )
    raise ValueError(f"unsupported block_type {block_type}")


class DCDownBlock2d(Module):
    def __init__(self, in_channels: int, out_channels: int, downsample: bool = False, shortcut: bool = True):
        super().__init__()
        self.downsample = downsample
        self.factor = 2
        stride = 1 if downsample else 2
        self.group_size = in_channels * self.factor**2 // out_channels
        self.shortcut = shortcut
        conv_out = out_channels // self.factor**2 if downsample else out_channels
        self.conv = Conv2d(in_channels, conv_out, kernel_size=3, stride=stride, padding=1)

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        x = self.conv(params["conv"], hidden_states)
        if self.downsample:
            x = pixel_unshuffle_nhwc(x, self.factor)
        if self.shortcut:
            y = pixel_unshuffle_nhwc(hidden_states, self.factor)
            y = y.reshape(*y.shape[:-1], -1, self.group_size).mean(axis=-1)
            return x + y
        return x


class DCUpBlock2d(Module):
    def __init__(self, in_channels: int, out_channels: int, interpolate: bool = False, shortcut: bool = True):
        super().__init__()
        self.interpolate = interpolate
        self.shortcut = shortcut
        self.factor = 2
        self.repeats = out_channels * self.factor**2 // in_channels
        conv_out = out_channels if interpolate else out_channels * self.factor**2
        self.conv = Conv2d(in_channels, conv_out, kernel_size=3, padding=1)

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        if self.interpolate:
            b, h, w, c = hidden_states.shape
            x = jax.image.resize(hidden_states, (b, h * self.factor, w * self.factor, c), method="nearest")
            x = self.conv(params["conv"], x)
        else:
            x = self.conv(params["conv"], hidden_states)
            x = pixel_shuffle_nhwc(x, self.factor)
        if self.shortcut:
            y = jnp.repeat(hidden_states, self.repeats, axis=-1)
            y = pixel_shuffle_nhwc(y, self.factor)
            return x + y
        return x


class _Sequential(ModuleList):
    """nn.Sequential analogue: children keyed by bare index (checkpoint keys
    like down_blocks.0.0.conv1.weight resolve directly)."""

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i, block in enumerate(self):
            x = block(params[i], x)
        return x


class DCEncoder(Module):
    def __init__(self, in_channels, latent_channels, attention_head_dim=32, block_type="ResBlock",
                 block_out_channels=(128, 256, 512, 512, 1024, 1024), layers_per_block=(2, 2, 2, 2, 2, 2),
                 qkv_multiscales=((), (), (), (5,), (5,), (5,)), downsample_block_type="pixel_unshuffle",
                 out_shortcut=True):
        super().__init__()
        num_blocks = len(block_out_channels)
        if isinstance(block_type, str):
            block_type = (block_type,) * num_blocks

        first_out = block_out_channels[0] if layers_per_block[0] > 0 else block_out_channels[1]
        if layers_per_block[0] > 0:
            self.conv_in = Conv2d(in_channels, first_out, kernel_size=3, padding=1)
        else:
            self.conv_in = DCDownBlock2d(in_channels, first_out,
                                         downsample=downsample_block_type == "pixel_unshuffle", shortcut=False)

        down_blocks = []
        for i, (out_channel, num_layers) in enumerate(zip(block_out_channels, layers_per_block)):
            block_list = [
                _get_block(block_type[i], out_channel, out_channel, attention_head_dim, "rms_norm", "silu",
                           qkv_multiscales[i])
                for _ in range(num_layers)
            ]
            if i < num_blocks - 1 and num_layers > 0:
                block_list.append(
                    DCDownBlock2d(out_channel, block_out_channels[i + 1],
                                  downsample=downsample_block_type == "pixel_unshuffle", shortcut=True)
                )
            down_blocks.append(_Sequential(block_list))
        self.down_blocks = ModuleList(down_blocks)

        self.conv_out = Conv2d(block_out_channels[-1], latent_channels, kernel_size=3, padding=1)
        self.out_shortcut = out_shortcut
        self.out_shortcut_average_group_size = block_out_channels[-1] // latent_channels

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        if self.out_shortcut:
            y = x.reshape(*x.shape[:-1], -1, self.out_shortcut_average_group_size).mean(axis=-1)
            return self.conv_out(params["conv_out"], x) + y
        return self.conv_out(params["conv_out"], x)


class DCDecoder(Module):
    def __init__(self, in_channels, latent_channels, attention_head_dim=32, block_type="ResBlock",
                 block_out_channels=(128, 256, 512, 512, 1024, 1024), layers_per_block=(2, 2, 2, 2, 2, 2),
                 qkv_multiscales=((), (), (), (5,), (5,), (5,)), norm_type="rms_norm", act_fn="silu",
                 upsample_block_type="pixel_shuffle", in_shortcut=True, conv_act_fn="relu"):
        super().__init__()
        num_blocks = len(block_out_channels)
        if isinstance(block_type, str):
            block_type = (block_type,) * num_blocks
        if isinstance(norm_type, str):
            norm_type = (norm_type,) * num_blocks
        if isinstance(act_fn, str):
            act_fn = (act_fn,) * num_blocks

        self.conv_in = Conv2d(latent_channels, block_out_channels[-1], kernel_size=3, padding=1)
        self.in_shortcut = in_shortcut
        self.in_shortcut_repeats = block_out_channels[-1] // latent_channels

        up_blocks = []
        for i, (out_channel, num_layers) in reversed(list(enumerate(zip(block_out_channels, layers_per_block)))):
            block_list = []
            if i < num_blocks - 1 and num_layers > 0:
                block_list.append(
                    DCUpBlock2d(block_out_channels[i + 1], out_channel,
                                interpolate=upsample_block_type == "interpolate", shortcut=True)
                )
            block_list += [
                _get_block(block_type[i], out_channel, out_channel, attention_head_dim, norm_type[i], act_fn[i],
                           qkv_multiscales[i])
                for _ in range(num_layers)
            ]
            up_blocks.insert(0, _Sequential(block_list))
        self.up_blocks = ModuleList(up_blocks)

        channels = block_out_channels[0] if layers_per_block[0] > 0 else block_out_channels[1]
        self.norm_out = RMSNorm(channels, eps=1e-5, use_bias=True)
        self.conv_act = get_activation(conv_act_fn)
        if layers_per_block[0] > 0:
            self.conv_out = Conv2d(channels, in_channels, kernel_size=3, padding=1)
        else:
            self.conv_out = DCUpBlock2d(channels, in_channels,
                                        interpolate=upsample_block_type == "interpolate", shortcut=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.in_shortcut:
            y = jnp.repeat(x, self.in_shortcut_repeats, axis=-1)
            x = self.conv_in(params["conv_in"], x) + y
        else:
            x = self.conv_in(params["conv_in"], x)
        for i in reversed(range(len(self.up_blocks))):
            x = self.up_blocks[i](params["up_blocks"][i], x)
        x = self.norm_out(params["norm_out"], x)
        x = self.conv_act(x)
        return self.conv_out(params["conv_out"], x)


class AutoencoderDC(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        latent_channels: int = 32,
        attention_head_dim: int = 32,
        encoder_block_types: Union[str, Tuple[str, ...]] = "ResBlock",
        decoder_block_types: Union[str, Tuple[str, ...]] = "ResBlock",
        encoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512, 1024, 1024),
        decoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512, 1024, 1024),
        encoder_layers_per_block: Tuple[int, ...] = (2, 2, 2, 3, 3, 3),
        decoder_layers_per_block: Tuple[int, ...] = (3, 3, 3, 3, 3, 3),
        encoder_qkv_multiscales: Tuple[Tuple[int, ...], ...] = ((), (), (), (5,), (5,), (5,)),
        decoder_qkv_multiscales: Tuple[Tuple[int, ...], ...] = ((), (), (), (5,), (5,), (5,)),
        upsample_block_type: str = "pixel_shuffle",
        downsample_block_type: str = "pixel_unshuffle",
        decoder_norm_types: Union[str, Tuple[str, ...]] = "rms_norm",
        decoder_act_fns: Union[str, Tuple[str, ...]] = "silu",
        encoder_out_shortcut: bool = True,
        decoder_in_shortcut: bool = True,
        decoder_conv_act_fn: str = "relu",
        scaling_factor: float = 1.0,
    ):
        super().__init__()
        self.encoder = DCEncoder(
            in_channels=in_channels, latent_channels=latent_channels, attention_head_dim=attention_head_dim,
            block_type=encoder_block_types, block_out_channels=encoder_block_out_channels,
            layers_per_block=encoder_layers_per_block, qkv_multiscales=encoder_qkv_multiscales,
            downsample_block_type=downsample_block_type, out_shortcut=encoder_out_shortcut,
        )
        self.decoder = DCDecoder(
            in_channels=in_channels, latent_channels=latent_channels, attention_head_dim=attention_head_dim,
            block_type=decoder_block_types, block_out_channels=decoder_block_out_channels,
            layers_per_block=decoder_layers_per_block, qkv_multiscales=decoder_qkv_multiscales,
            norm_type=decoder_norm_types, act_fn=decoder_act_fns, upsample_block_type=upsample_block_type,
            in_shortcut=decoder_in_shortcut, conv_act_fn=decoder_conv_act_fn,
        )
        self.spatial_compression_ratio = 2 ** (len(encoder_block_out_channels) - 1)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, H, W] → latent [B, latent_C, h, w]."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder(params["encoder"], h)
        latent = jnp.transpose(h, (0, 3, 1, 2))
        if not return_dict:
            return (latent,)
        return EncoderOutput(latent=latent)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        h = jnp.transpose(z, (0, 2, 3, 1))
        h = self.decoder(params["decoder"], h)
        dec = jnp.transpose(h, (0, 3, 1, 2))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)

    def __call__(self, params: Params, sample: jax.Array, return_dict: bool = True):
        z = self.encode(params, sample).latent
        return self.decode(params, z, return_dict=return_dict)
