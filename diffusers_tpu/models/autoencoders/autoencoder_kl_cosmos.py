"""AutoencoderKLCosmos — NVIDIA Cosmos causal video tokenizer.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_cosmos.py:883`
AutoencoderKLCosmos; CosmosCausalConv3d `:46`, wavelet patcher `:107` /
unpatcher `:187`, ConvProjection `:266`, ResnetBlock `:279`, Down/Upsample
`:318,368`, causal spatial/temporal attention `:416-522`, Encoder `:710`,
Decoder `:794`).

Distinctives vs the other video VAEs here:
  * input patching is a separable 3-axis **Haar DWT** (log2(patch_size)
    levels, reflect padding, first frame replicated patch_size×); the decoder
    inverts it with transposed grouped convs,
  * the "posterior" is an IdentityDistribution — the encoder output *is* the
    latent (`:1045`),
  * every resnet/attention uses 1-group (per-frame LayerNorm-ish) GroupNorm,
    and blocks carry both spatial attention (per frame) and causal temporal
    attention (per pixel, lower-triangular mask).

Layout: public NCTHW; internals [B, T, H, W, C].
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv3d, GroupNorm, Module, ModuleList, Params
from ..modeling_utils import ModelMixin
from .vae import DecoderOutput

_WAVELETS = {
    "haar": np.array([0.7071067811865476, 0.7071067811865476], dtype=np.float64),
    "rearrange": np.array([1.0, 1.0], dtype=np.float64),
}


class IdentityDistribution:
    """Reference `vae.py` IdentityDistribution: sample()/mode() return the
    parameters unchanged (Cosmos latents are deterministic)."""

    def __init__(self, parameters):
        self.parameters = parameters

    def sample(self, key=None):
        return self.parameters

    def mode(self):
        return self.parameters


class CosmosCausalConv3d(Conv3d):
    """Reference `:46`: replicate left temporal pad of d·(k_t−1)+(1−s_t),
    constant spatial pad, then plain Conv3d."""

    def __init__(self, in_channels=1, out_channels=1, kernel_size=(3, 3, 3), dilation=(1, 1, 1),
                 stride=(1, 1, 1), padding=1):
        k = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
        d = (dilation,) * 3 if isinstance(dilation, int) else tuple(dilation)
        s = (stride,) * 3 if isinstance(stride, int) else tuple(stride)
        super().__init__(
            in_channels, out_channels, kernel_size=k, stride=s,
            padding=((0, 0), (padding, padding), (padding, padding)), dilation=d)
        self.temporal_pad = d[0] * (k[0] - 1) + (1 - s[0])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.temporal_pad > 0:
            left = jnp.repeat(x[:, :1], self.temporal_pad, axis=1)
            x = jnp.concatenate([left, x], axis=1)
        return super().__call__(params, x)


class CosmosCausalGroupNorm(Module):
    """Reference `:83`: GroupNorm; with num_groups == 1 the statistics are
    per-frame (the tensor is flattened to [B·T, H, W, C] first)."""

    def __init__(self, in_channels: int, num_groups: int = 1):
        super().__init__()
        self.norm = GroupNorm(num_groups, in_channels, eps=1e-6)
        self.num_groups = num_groups

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.num_groups == 1:
            b, t, h, w, c = x.shape
            return self.norm(params["norm"], x.reshape(b * t, h, w, c)).reshape(x.shape)
        return self.norm(params["norm"], x)


def _axis_conv(x, taps, axis, stride):
    """Grouped (per-channel) 1D correlation along a spatial/temporal axis of
    [B, T, H, W, C] with the given taps and stride."""
    c = x.shape[-1]
    k = len(taps)
    kern = np.zeros((k, 1, 1, 1, c), dtype=np.float32)
    for i, tap in enumerate(taps):
        kern[i, 0, 0, 0, :] = tap
    # orient the kernel along the requested axis
    if axis == 1:
        kshape, strides = (k, 1, 1), (stride, 1, 1)
    elif axis == 2:
        kshape, strides = (1, k, 1), (1, stride, 1)
    else:
        kshape, strides = (1, 1, k), (1, 1, stride)
    kern = kern.reshape(kshape + (1, c))
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kern, x.dtype), window_strides=strides, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=c)


def _axis_conv_transpose(x, taps, axis, stride):
    """Grouped 1D transposed conv (stride-2 scatter): out[s·t + i] += x[t]·tap[i]."""
    c = x.shape[-1]
    k = len(taps)
    kern = np.zeros((k, 1, 1, 1, c), dtype=np.float32)
    for i, tap in enumerate(taps):
        kern[k - 1 - i, 0, 0, 0, :] = tap  # flip: transposed conv == lhs-dilated corr w/ flipped taps
    if axis == 1:
        kshape, dil, pad = (k, 1, 1), (stride, 1, 1), ((k - 1, k - 1), (0, 0), (0, 0))
    elif axis == 2:
        kshape, dil, pad = (1, k, 1), (1, stride, 1), ((0, 0), (k - 1, k - 1), (0, 0))
    else:
        kshape, dil, pad = (1, 1, k), (1, 1, stride), ((0, 0), (0, 0), (k - 1, k - 1))
    kern = kern.reshape(kshape + (1, c))
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kern, x.dtype), window_strides=(1, 1, 1), padding=pad,
        lhs_dilation=dil, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=c)


class CosmosPatchEmbed3d(Module):
    """Reference `:107`: log2(patch_size) separable Haar DWT levels."""

    def __init__(self, patch_size: int = 1, patch_method: str = "haar"):
        super().__init__()
        self.patch_size = patch_size
        self.patch_method = patch_method
        self.wavelets = _WAVELETS[patch_method]

    def _dwt(self, x, rescale=False):
        w = self.wavelets
        n = len(w)
        hl = w[::-1].astype(np.float32)
        hh = (w * ((-1.0) ** np.arange(n))).astype(np.float32)
        # reflect pad: W (n-2, n-1), H (n-2, n-1), T (n-2, n-1)
        x = jnp.pad(x, ((0, 0), (max(0, n - 2), n - 1), (n - 2, n - 1), (n - 2, n - 1), (0, 0)), mode="reflect")
        xl = _axis_conv(x, hl, 1, 2)
        xh = _axis_conv(x, hh, 1, 2)
        xll, xlh = _axis_conv(xl, hl, 2, 2), _axis_conv(xl, hh, 2, 2)
        xhl, xhh = _axis_conv(xh, hl, 2, 2), _axis_conv(xh, hh, 2, 2)
        out = jnp.concatenate([
            _axis_conv(xll, hl, 3, 2), _axis_conv(xll, hh, 3, 2),
            _axis_conv(xlh, hl, 3, 2), _axis_conv(xlh, hh, 3, 2),
            _axis_conv(xhl, hl, 3, 2), _axis_conv(xhl, hh, 3, 2),
            _axis_conv(xhh, hl, 3, 2), _axis_conv(xhh, hh, 3, 2),
        ], axis=-1)
        if rescale:
            out = out / math.sqrt(8.0)
        return out

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.patch_method == "haar":
            first, rest = x[:, :1], x[:, 1:]
            x = jnp.concatenate([jnp.repeat(first, self.patch_size, axis=1), rest], axis=1)
            for _ in range(int(math.log2(self.patch_size))):
                x = self._dwt(x, rescale=True)
            return x
        if self.patch_method == "rearrange":
            first, rest = x[:, :1], x[:, 1:]
            x = jnp.concatenate([jnp.repeat(first, self.patch_size, axis=1), rest], axis=1)
            b, t, h, w, c = x.shape
            p = self.patch_size
            x = x.reshape(b, t // p, p, h // p, p, w // p, p, c)
            # torch channel-major flatten [C, pt, ph, pw] in NCTHW == [..., pt, ph, pw? ] —
            # emulate: move (c, p_t, p_h, p_w) into channels in that order
            x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6)).reshape(b, t // p, h // p, w // p, c * p * p * p)
            return x
        raise ValueError(f"Unsupported patch method: {self.patch_method}")


class CosmosUnpatcher3d(Module):
    """Reference `:187`: inverse Haar DWT levels, then drop the replicated
    leading frames."""

    def __init__(self, patch_size: int = 1, patch_method: str = "haar"):
        super().__init__()
        self.patch_size = patch_size
        self.patch_method = patch_method
        self.wavelets = _WAVELETS[patch_method]

    def _idwt(self, x, rescale=False):
        w = self.wavelets
        n = len(w)
        hl = w[::-1].astype(np.float32)
        hh = (w * ((-1.0) ** np.arange(n))).astype(np.float32)
        parts = jnp.split(x, 8, axis=-1)
        xlll, xllh, xlhl, xlhh, xhll, xhlh, xhhl, xhhh = parts
        xll = _axis_conv_transpose(xlll, hl, 3, 2) + _axis_conv_transpose(xllh, hh, 3, 2)
        xlh = _axis_conv_transpose(xlhl, hl, 3, 2) + _axis_conv_transpose(xlhh, hh, 3, 2)
        xhl = _axis_conv_transpose(xhll, hl, 3, 2) + _axis_conv_transpose(xhlh, hh, 3, 2)
        xhh = _axis_conv_transpose(xhhl, hl, 3, 2) + _axis_conv_transpose(xhhh, hh, 3, 2)
        xl = _axis_conv_transpose(xll, hl, 2, 2) + _axis_conv_transpose(xlh, hh, 2, 2)
        xh = _axis_conv_transpose(xhl, hl, 2, 2) + _axis_conv_transpose(xhh, hh, 2, 2)
        out = _axis_conv_transpose(xl, hl, 1, 2) + _axis_conv_transpose(xh, hh, 1, 2)
        if rescale:
            out = out * math.sqrt(8.0)
        return out

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.patch_method == "haar":
            for _ in range(int(math.log2(self.patch_size))):
                x = self._idwt(x, rescale=True)
            return x[:, self.patch_size - 1:]
        if self.patch_method == "rearrange":
            p = self.patch_size
            b, t, h, w, c = x.shape
            x = x.reshape(b, t, h, w, c // p**3, p, p, p)
            x = jnp.transpose(x, (0, 1, 5, 2, 6, 3, 7, 4)).reshape(b, t * p, h * p, w * p, c // p**3)
            return x[:, p - 1:]
        raise ValueError("Unknown patch method: " + self.patch_method)


class CosmosConvProjection3d(Module):
    """Reference `:266`: spatial (1,3,3) then temporal (3,1,1) causal convs."""

    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.conv_s = CosmosCausalConv3d(in_channels, out_channels, kernel_size=(1, 3, 3), stride=1, padding=1)
        self.conv_t = CosmosCausalConv3d(out_channels, out_channels, kernel_size=(3, 1, 1), stride=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_s(params["conv_s"], x)
        return self.conv_t(params["conv_t"], x)


class CosmosResnetBlock3d(Module):
    def __init__(self, in_channels: int, out_channels: int, num_groups: int = 1):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = CosmosCausalGroupNorm(in_channels, num_groups)
        self.conv1 = CosmosConvProjection3d(in_channels, out_channels)
        self.norm2 = CosmosCausalGroupNorm(out_channels, num_groups)
        self.conv2 = CosmosConvProjection3d(out_channels, out_channels)
        self.conv_shortcut = None
        if in_channels != out_channels:
            self.conv_shortcut = CosmosCausalConv3d(in_channels, out_channels, kernel_size=1, stride=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        residual = self.conv_shortcut(params["conv_shortcut"], x) if self.conv_shortcut is not None else x
        h = self.norm1(params["norm1"], x)
        h = jax.nn.silu(h)
        h = self.conv1(params["conv1"], h)
        h = self.norm2(params["norm2"], h)
        h = jax.nn.silu(h)
        h = self.conv2(params["conv2"], h)
        return h + residual


class CosmosDownsample3d(Module):
    def __init__(self, in_channels: int, spatial_downsample=True, temporal_downsample=True):
        super().__init__()
        self.spatial_downsample = spatial_downsample
        self.temporal_downsample = temporal_downsample
        if spatial_downsample:
            self.conv1 = CosmosCausalConv3d(in_channels, in_channels, kernel_size=(1, 3, 3), stride=(1, 2, 2), padding=0)
        if temporal_downsample:
            self.conv2 = CosmosCausalConv3d(in_channels, in_channels, kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=0)
        if spatial_downsample or temporal_downsample:
            self.conv3 = CosmosCausalConv3d(in_channels, in_channels, kernel_size=(1, 1, 1), stride=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if not self.spatial_downsample and not self.temporal_downsample:
            return x
        if self.spatial_downsample:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            conv_out = self.conv1(params["conv1"], x)
            pool_out = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID") / 4.0
            x = conv_out + pool_out.astype(conv_out.dtype)
        if self.temporal_downsample:
            x = jnp.concatenate([x[:, :1], x], axis=1)
            conv_out = self.conv2(params["conv2"], x)
            pool_out = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 1, 1, 1), (1, 2, 1, 1, 1), "VALID") / 2.0
            x = conv_out + pool_out.astype(conv_out.dtype)
        return self.conv3(params["conv3"], x)


class CosmosUpsample3d(Module):
    def __init__(self, in_channels: int, spatial_upsample=True, temporal_upsample=True):
        super().__init__()
        self.spatial_upsample = spatial_upsample
        self.temporal_upsample = temporal_upsample
        if temporal_upsample:
            self.conv1 = CosmosCausalConv3d(in_channels, in_channels, kernel_size=(3, 1, 1), stride=1, padding=0)
        if spatial_upsample:
            self.conv2 = CosmosCausalConv3d(in_channels, in_channels, kernel_size=(1, 3, 3), stride=1, padding=1)
        if spatial_upsample or temporal_upsample:
            self.conv3 = CosmosCausalConv3d(in_channels, in_channels, kernel_size=(1, 1, 1), stride=1, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if not self.spatial_upsample and not self.temporal_upsample:
            return x
        if self.temporal_upsample:
            num_frames = x.shape[1]
            time_factor = 2 if num_frames > 1 else 1
            x = jnp.repeat(x, time_factor, axis=1)[:, time_factor - 1:]
            x = self.conv1(params["conv1"], x) + x
        if self.spatial_upsample:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x = self.conv2(params["conv2"], x) + x
        return self.conv3(params["conv3"], x)


class CosmosCausalAttention(Module):
    """Reference `:416`: 1-group GN + 1x1-conv q/k/v/out; spatial variant
    attends per frame over H·W tokens, temporal variant per pixel over T
    tokens with a causal mask."""

    def __init__(self, num_attention_heads: int, attention_head_dim: int, num_groups: int = 1,
                 mode: str = "spatial"):
        super().__init__()
        self.num_attention_heads = num_attention_heads
        self.mode = mode
        self.norm = CosmosCausalGroupNorm(attention_head_dim, num_groups=num_groups)
        self.to_q = CosmosCausalConv3d(attention_head_dim, attention_head_dim, kernel_size=1, stride=1, padding=0)
        self.to_k = CosmosCausalConv3d(attention_head_dim, attention_head_dim, kernel_size=1, stride=1, padding=0)
        self.to_v = CosmosCausalConv3d(attention_head_dim, attention_head_dim, kernel_size=1, stride=1, padding=0)
        self.to_out = ModuleList([
            CosmosCausalConv3d(attention_head_dim, attention_head_dim, kernel_size=1, stride=1, padding=0)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        residual = x
        h = self.norm(params["norm"], x)
        q = self.to_q(params["to_q"], h)
        k = self.to_k(params["to_k"], h)
        v = self.to_v(params["to_v"], h)
        heads = self.num_attention_heads
        if self.mode == "spatial":
            # [B·T, H·W, C]
            q = q.reshape(b * t, hh * ww, c)
            k = k.reshape(b * t, hh * ww, c)
            v = v.reshape(b * t, hh * ww, c)
            mask = None
        else:
            # [B·H·W, T, C]
            q = jnp.transpose(q, (0, 2, 3, 1, 4)).reshape(b * hh * ww, t, c)
            k = jnp.transpose(k, (0, 2, 3, 1, 4)).reshape(b * hh * ww, t, c)
            v = jnp.transpose(v, (0, 2, 3, 1, 4)).reshape(b * hh * ww, t, c)
            mask = jnp.tril(jnp.ones((t, t), bool))
        dh = c // heads
        s = q.shape[1]
        qh = q.reshape(-1, s, heads, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(-1, s, heads, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(-1, s, heads, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", qh, kh).astype(jnp.float32) / math.sqrt(dh)
        if mask is not None:
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhst,bhtd->bhsd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(-1, s, c)
        if self.mode == "spatial":
            out = out.reshape(b, t, hh, ww, c)
        else:
            out = out.reshape(b, hh, ww, t, c)
            out = jnp.transpose(out, (0, 3, 1, 2, 4))
        out = self.to_out[0](params["to_out"][0], out)
        return out + residual


class CosmosDownBlock3d(Module):
    def __init__(self, in_channels, out_channels, num_layers, use_attention, use_downsample,
                 spatial_downsample, temporal_downsample):
        super().__init__()
        resnets, attentions, temp_attentions = [], [], []
        in_ch = in_channels
        self.use_attention = use_attention
        for _ in range(num_layers):
            resnets.append(CosmosResnetBlock3d(in_ch, out_channels, num_groups=1))
            in_ch = out_channels
            if use_attention:
                attentions.append(CosmosCausalAttention(1, out_channels, num_groups=1, mode="spatial"))
                temp_attentions.append(CosmosCausalAttention(1, out_channels, num_groups=1, mode="temporal"))
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(attentions)
        self.temp_attentions = ModuleList(temp_attentions)
        self.downsamplers = None
        if use_downsample:
            self.downsamplers = ModuleList([CosmosDownsample3d(out_channels, spatial_downsample, temporal_downsample)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i in range(len(self.resnets)):
            x = self.resnets[i](params["resnets"][i], x)
            if self.use_attention:
                x = self.attentions[i](params["attentions"][i], x)
                x = self.temp_attentions[i](params["temp_attentions"][i], x)
        if self.downsamplers is not None:
            # a no-op downsampler (both flags False) owns no params
            x = self.downsamplers[0](params.get("downsamplers", {0: {}})[0], x)
        return x


class CosmosMidBlock3d(Module):
    def __init__(self, in_channels, num_layers, num_groups=1):
        super().__init__()
        resnets = [CosmosResnetBlock3d(in_channels, in_channels, num_groups)]
        attentions, temp_attentions = [], []
        for _ in range(num_layers):
            attentions.append(CosmosCausalAttention(1, in_channels, num_groups, mode="spatial"))
            temp_attentions.append(CosmosCausalAttention(1, in_channels, num_groups, mode="temporal"))
            resnets.append(CosmosResnetBlock3d(in_channels, in_channels, num_groups))
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(attentions)
        self.temp_attentions = ModuleList(temp_attentions)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.resnets[0](params["resnets"][0], x)
        for i in range(len(self.attentions)):
            x = self.attentions[i](params["attentions"][i], x)
            x = self.temp_attentions[i](params["temp_attentions"][i], x)
            x = self.resnets[i + 1](params["resnets"][i + 1], x)
        return x


class CosmosUpBlock3d(Module):
    def __init__(self, in_channels, out_channels, num_layers, use_attention, use_upsample,
                 spatial_upsample, temporal_upsample):
        super().__init__()
        resnets, attentions, temp_attentions = [], [], []
        in_ch = in_channels
        self.use_attention = use_attention
        for _ in range(num_layers):
            resnets.append(CosmosResnetBlock3d(in_ch, out_channels, num_groups=1))
            in_ch = out_channels
            if use_attention:
                attentions.append(CosmosCausalAttention(1, out_channels, num_groups=1, mode="spatial"))
                temp_attentions.append(CosmosCausalAttention(1, out_channels, num_groups=1, mode="temporal"))
        self.resnets = ModuleList(resnets)
        self.attentions = ModuleList(attentions)
        self.temp_attentions = ModuleList(temp_attentions)
        self.upsamplers = None
        if use_upsample:
            self.upsamplers = ModuleList([CosmosUpsample3d(out_channels, spatial_upsample, temporal_upsample)])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        for i in range(len(self.resnets)):
            x = self.resnets[i](params["resnets"][i], x)
            if self.use_attention:
                x = self.attentions[i](params["attentions"][i], x)
                x = self.temp_attentions[i](params["temp_attentions"][i], x)
        if self.upsamplers is not None:
            # a no-op upsampler (both flags False) owns no params
            x = self.upsamplers[0](params.get("upsamplers", {0: {}})[0], x)
        return x


class CosmosEncoder3d(Module):
    def __init__(self, in_channels=3, out_channels=16, block_out_channels=(128, 256, 512, 512),
                 num_resnet_blocks=2, attention_resolutions=(32,), resolution=1024, patch_size=4,
                 patch_type="haar", spatial_compression_ratio=8, temporal_compression_ratio=8):
        super().__init__()
        inner_dim = in_channels * patch_size**3
        num_spatial_layers = int(math.log2(spatial_compression_ratio)) - int(math.log2(patch_size))
        num_temporal_layers = int(math.log2(temporal_compression_ratio)) - int(math.log2(patch_size))
        self.patch_embed = CosmosPatchEmbed3d(patch_size, patch_type)
        self.conv_in = CosmosConvProjection3d(inner_dim, block_out_channels[0])
        current_resolution = resolution // patch_size
        blocks = []
        for i in range(len(block_out_channels) - 1):
            in_ch, out_ch = block_out_channels[i], block_out_channels[i + 1]
            use_attention = current_resolution in attention_resolutions
            spatial_down = temporal_down = False
            use_down = i < len(block_out_channels) - 2
            if use_down:
                spatial_down = i < num_spatial_layers
                temporal_down = i < num_temporal_layers
                current_resolution //= 2
            blocks.append(CosmosDownBlock3d(in_ch, out_ch, num_resnet_blocks, use_attention,
                                            use_down, spatial_down, temporal_down))
        self.down_blocks = ModuleList(blocks)
        self.mid_block = CosmosMidBlock3d(block_out_channels[-1], num_layers=1, num_groups=1)
        self.norm_out = CosmosCausalGroupNorm(block_out_channels[-1], num_groups=1)
        self.conv_out = CosmosConvProjection3d(block_out_channels[-1], out_channels)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.patch_embed({}, x)
        x = self.conv_in(params["conv_in"], x)
        for i in range(len(self.down_blocks)):
            x = self.down_blocks[i](params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = self.norm_out(params["norm_out"], x)
        x = jax.nn.silu(x)
        return self.conv_out(params["conv_out"], x)


class CosmosDecoder3d(Module):
    def __init__(self, in_channels=16, out_channels=3, block_out_channels=(128, 256, 512, 512),
                 num_resnet_blocks=2, attention_resolutions=(32,), resolution=1024, patch_size=4,
                 patch_type="haar", spatial_compression_ratio=8, temporal_compression_ratio=8):
        super().__init__()
        inner_dim = out_channels * patch_size**3
        num_spatial_layers = int(math.log2(spatial_compression_ratio)) - int(math.log2(patch_size))
        num_temporal_layers = int(math.log2(temporal_compression_ratio)) - int(math.log2(patch_size))
        reversed_channels = list(reversed(block_out_channels))
        self.conv_in = CosmosConvProjection3d(in_channels, reversed_channels[0])
        self.mid_block = CosmosMidBlock3d(reversed_channels[0], num_layers=1, num_groups=1)
        current_resolution = (resolution // patch_size) // 2 ** (len(block_out_channels) - 2)
        blocks = []
        for i in range(len(block_out_channels) - 1):
            in_ch, out_ch = reversed_channels[i], reversed_channels[i + 1]
            use_attention = current_resolution in attention_resolutions
            spatial_up = temporal_up = False
            use_up = i < len(block_out_channels) - 2
            if use_up:
                temporal_up = 0 < i < num_temporal_layers + 1
                spatial_up = temporal_up or (i < num_spatial_layers and num_spatial_layers > num_temporal_layers)
                current_resolution *= 2
            blocks.append(CosmosUpBlock3d(in_ch, out_ch, num_resnet_blocks + 1, use_attention,
                                          use_up, spatial_up, temporal_up))
        self.up_blocks = ModuleList(blocks)
        self.norm_out = CosmosCausalGroupNorm(reversed_channels[-1], num_groups=1)
        self.conv_out = CosmosConvProjection3d(reversed_channels[-1], inner_dim)
        self.unpatch_embed = CosmosUnpatcher3d(patch_size, patch_type)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        x = self.mid_block(params["mid_block"], x)
        for i in range(len(self.up_blocks)):
            x = self.up_blocks[i](params["up_blocks"][i], x)
        x = self.norm_out(params["norm_out"], x)
        x = jax.nn.silu(x)
        x = self.conv_out(params["conv_out"], x)
        return self.unpatch_embed({}, x)


class AutoencoderKLCosmos(Module, ModelMixin, ConfigMixin):
    """Reference `:883`. Public NCTHW; internals [B, T, H, W, C]."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 16,
        encoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
        decode_block_out_channels: Tuple[int, ...] = (256, 512, 512, 512),
        attention_resolutions: Tuple[int, ...] = (32,),
        resolution: int = 1024,
        num_layers: int = 2,
        patch_size: int = 4,
        patch_type: str = "haar",
        scaling_factor: float = 1.0,
        spatial_compression_ratio: int = 8,
        temporal_compression_ratio: int = 8,
        latents_mean: Optional[List[float]] = None,
        latents_std: Optional[List[float]] = None,
    ):
        super().__init__()
        self.encoder = CosmosEncoder3d(
            in_channels=in_channels, out_channels=latent_channels,
            block_out_channels=tuple(encoder_block_out_channels), num_resnet_blocks=num_layers,
            attention_resolutions=tuple(attention_resolutions), resolution=resolution,
            patch_size=patch_size, patch_type=patch_type,
            spatial_compression_ratio=spatial_compression_ratio,
            temporal_compression_ratio=temporal_compression_ratio)
        self.decoder = CosmosDecoder3d(
            in_channels=latent_channels, out_channels=out_channels,
            block_out_channels=tuple(decode_block_out_channels), num_resnet_blocks=num_layers,
            attention_resolutions=tuple(attention_resolutions), resolution=resolution,
            patch_size=patch_size, patch_type=patch_type,
            spatial_compression_ratio=spatial_compression_ratio,
            temporal_compression_ratio=temporal_compression_ratio)
        self.quant_conv = CosmosCausalConv3d(latent_channels, latent_channels, kernel_size=1, padding=0)
        self.post_quant_conv = CosmosCausalConv3d(latent_channels, latent_channels, kernel_size=1, padding=0)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, T, H, W] → IdentityDistribution over latents [B, z, t, h, w]."""
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        posterior = IdentityDistribution(jnp.transpose(h, (0, 4, 1, 2, 3)))
        if not return_dict:
            return (posterior,)
        return posterior

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        h = self.post_quant_conv(params["post_quant_conv"], h)
        h = self.decoder(params["decoder"], h)
        dec = jnp.transpose(h, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)
