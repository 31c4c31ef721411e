"""AutoencoderKLLTX2Audio — LTX-2's mel-spectrogram audio VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_ltx2_audio.py:668`
AutoencoderKLLTX2Audio; LTX2AudioCausalConv2d `:31`, PixelNorm `:82`,
AttnBlock `:98`, ResnetBlock `:138`, Down/Upsample `:222/:256`, encoder
`:319`, decoder `:469`).

TPU-native design: activations are NHWC with the mel spectrogram laid out as
[B, T(time), M(mel), C] so the causal axis ("height" = time) is a leading
spatial dim and channels ride the 128-lane minor dim. Causality is asymmetric
`jnp.pad` + VALID conv (one fused XLA op pair); the public API speaks the
reference's NCTM ([B, C, T, M]).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, Identity, Linear, Module, ModuleList, Params
from ..modeling_utils import ModelMixin
from .autoencoder_kl_ltx import AutoencoderKLOutput
from .vae import DecoderOutput, DiagonalGaussianDistribution

LATENT_DOWNSAMPLE_FACTOR = 4


def _causal_pad(x: jax.Array, pad_t: int, pad_m: int, causality_axis: str) -> jax.Array:
    """Asymmetric zero-pad of [B, T, M, C]. Reference F.pad order is
    (mel_left, mel_right, time_top, time_bottom) on NCHW (`:53-63`); here the
    same amounts apply to axes 1 (time) and 2 (mel)."""
    if causality_axis == "none":
        t = (pad_t // 2, pad_t - pad_t // 2)
        m = (pad_m // 2, pad_m - pad_m // 2)
    elif causality_axis in ("width", "width-compatibility"):
        t = (pad_t // 2, pad_t - pad_t // 2)
        m = (pad_m, 0)
    elif causality_axis == "height":
        t = (pad_t, 0)
        m = (pad_m // 2, pad_m - pad_m // 2)
    else:
        raise ValueError(f"Invalid causality_axis: {causality_axis}")
    return jnp.pad(x, ((0, 0), t, m, (0, 0)))


class LTX2AudioCausalConv2d(Module):
    """Causal 2D conv: explicit asymmetric pad + VALID conv (`:31`)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride: int = 1,
                 dilation=1, groups: int = 1, bias: bool = True, causality_axis: str = "height"):
        super().__init__()
        ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
        dil = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
        self.causality_axis = causality_axis
        self.pad_t = (ks[0] - 1) * dil[0]
        self.pad_m = (ks[1] - 1) * dil[1]
        self.conv = Conv2d(in_channels, out_channels, ks, stride=stride, padding=0,
                           dilation=dil, groups=groups, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.conv(params["conv"], _causal_pad(x, self.pad_t, self.pad_m, self.causality_axis))


class LTX2AudioPixelNorm(Module):
    """Per-location RMS norm over channels (`:82`; channel dim is minor here)."""

    def __init__(self, eps: float = 1e-8):
        super().__init__()
        self.eps = eps

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(ms + self.eps)).astype(x.dtype)


def _make_norm(norm_type: str, channels: int) -> Module:
    if norm_type == "group":
        return GroupNorm(num_groups=32, num_channels=channels, eps=1e-6)
    if norm_type == "pixel":
        return LTX2AudioPixelNorm(eps=1e-6)
    raise ValueError(f"Invalid normalization type: {norm_type}")


def _apply_norm(norm: Module, params: Params, name: str, x: jax.Array) -> jax.Array:
    return norm(params.get(name, {}), x)


class LTX2AudioAttnBlock(Module):
    """Single-head full spatial self-attention over T*M tokens (`:98`)."""

    def __init__(self, in_channels: int, norm_type: str = "group"):
        super().__init__()
        self.norm = _make_norm(norm_type, in_channels)
        self.q = Conv2d(in_channels, in_channels, 1)
        self.k = Conv2d(in_channels, in_channels, 1)
        self.v = Conv2d(in_channels, in_channels, 1)
        self.proj_out = Conv2d(in_channels, in_channels, 1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, t, m, c = x.shape
        h = _apply_norm(self.norm, params, "norm", x)
        q = self.q(params["q"], h).reshape(b, t * m, c)
        k = self.k(params["k"], h).reshape(b, t * m, c)
        v = self.v(params["v"], h).reshape(b, t * m, c)
        attn = jax.nn.softmax(jnp.einsum("bic,bjc->bij", q, k) * (c ** -0.5), axis=-1)
        out = jnp.einsum("bij,bjc->bic", attn, v).reshape(b, t, m, c)
        return x + self.proj_out(params["proj_out"], out)


class LTX2AudioResnetBlock(Module):
    """norm→silu→conv ×2 with 1x1/3x3 shortcut (`:138`)."""

    def __init__(self, in_channels: int, out_channels: Optional[int] = None,
                 conv_shortcut: bool = False, temb_channels: int = 0,
                 norm_type: str = "group", causality_axis: str = "height"):
        super().__init__()
        if causality_axis is not None and causality_axis != "none" and norm_type == "group":
            raise ValueError("Causal ResnetBlock with GroupNorm is not supported.")
        out_channels = in_channels if out_channels is None else out_channels
        self.in_channels, self.out_channels = in_channels, out_channels
        self.use_conv_shortcut = conv_shortcut

        def conv(cin, cout, k):
            if causality_axis is not None:
                return LTX2AudioCausalConv2d(cin, cout, k, causality_axis=causality_axis)
            return Conv2d(cin, cout, k, padding=(k - 1) // 2)

        self.norm1 = _make_norm(norm_type, in_channels)
        self.conv1 = conv(in_channels, out_channels, 3)
        if temb_channels > 0:
            self.temb_proj = Linear(temb_channels, out_channels)
        self.temb_channels = temb_channels
        self.norm2 = _make_norm(norm_type, out_channels)
        self.conv2 = conv(out_channels, out_channels, 3)
        if in_channels != out_channels:
            if conv_shortcut:
                self.conv_shortcut = conv(in_channels, out_channels, 3)
            else:
                self.nin_shortcut = conv(in_channels, out_channels, 1)

    def __call__(self, params: Params, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        h = _apply_norm(self.norm1, params, "norm1", x)
        h = self.conv1(params["conv1"], jax.nn.silu(h))
        if temb is not None and self.temb_channels > 0:
            h = h + self.temb_proj(params["temb_proj"], jax.nn.silu(temb))[:, None, None, :]
        h = _apply_norm(self.norm2, params, "norm2", h)
        h = self.conv2(params["conv2"], jax.nn.silu(h))
        if self.in_channels != self.out_channels:
            if self.use_conv_shortcut:
                x = self.conv_shortcut(params["conv_shortcut"], x)
            else:
                x = self.nin_shortcut(params["nin_shortcut"], x)
        return x + h


class LTX2AudioDownsample(Module):
    """Stride-2 conv with causality-dependent pad, or avg-pool (`:222`)."""

    def __init__(self, in_channels: int, with_conv: bool, causality_axis: Optional[str] = "height"):
        super().__init__()
        self.with_conv = with_conv
        self.causality_axis = causality_axis
        if with_conv:
            self.conv = Conv2d(in_channels, in_channels, 3, stride=2, padding=0)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if not self.with_conv:
            return jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        # reference pad order (mel_l, mel_r, time_t, time_b) (`:233-246`)
        pads = {
            "none": ((0, 1), (0, 1)),
            "width": ((0, 1), (2, 0)),
            "height": ((2, 0), (0, 1)),
            "width-compatibility": ((0, 1), (1, 0)),
        }
        t, m = pads[self.causality_axis]
        x = jnp.pad(x, ((0, 0), t, m, (0, 0)))
        return self.conv(params["conv"], x)


class LTX2AudioUpsample(Module):
    """Nearest 2x + causal conv + leading-edge crop (`:256`)."""

    def __init__(self, in_channels: int, with_conv: bool, causality_axis: Optional[str] = "height"):
        super().__init__()
        self.with_conv = with_conv
        self.causality_axis = causality_axis
        if with_conv:
            if causality_axis is not None:
                self.conv = LTX2AudioCausalConv2d(in_channels, in_channels, 3, causality_axis=causality_axis)
            else:
                self.conv = Conv2d(in_channels, in_channels, 3, padding=1)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        b, t, m, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = self.conv(params["conv"], x)
            if self.causality_axis == "height":
                x = x[:, 1:, :, :]
            elif self.causality_axis == "width":
                x = x[:, :, 1:, :]
        return x


class _Stage(Module):
    """Plain container whose attribute names mirror the torch stage module."""


class LTX2AudioEncoder(Module):
    """Reference LTX2AudioEncoder (`:319`): conv_in → down stages (+attn at
    listed resolutions) → mid → norm/silu → conv_out (2x latent if double_z)."""

    def __init__(self, base_channels=128, output_channels=1, num_res_blocks=2,
                 attn_resolutions=None, in_channels=2, resolution=256, latent_channels=8,
                 ch_mult=(1, 2, 4), norm_type="group", causality_axis="width",
                 mid_block_add_attention=False, mel_bins=64, double_z=True):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        self.num_res_blocks = num_res_blocks
        attn_resolutions = set(attn_resolutions) if attn_resolutions else set()

        def conv(cin, cout, k):
            if causality_axis is not None:
                return LTX2AudioCausalConv2d(cin, cout, k, causality_axis=causality_axis)
            return Conv2d(cin, cout, k, padding=(k - 1) // 2)

        self.conv_in = conv(in_channels, base_channels, 3)
        block_in = base_channels
        curr_res = resolution
        stages = []
        for level in range(self.num_resolutions):
            stage = _Stage()
            block_out = base_channels * ch_mult[level]
            blocks, attns = [], []
            for _ in range(num_res_blocks):
                blocks.append(LTX2AudioResnetBlock(
                    block_in, block_out, temb_channels=0, norm_type=norm_type,
                    causality_axis=causality_axis))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attns.append(LTX2AudioAttnBlock(block_in, norm_type=norm_type))
            stage.block = ModuleList(blocks)
            stage.attn = ModuleList(attns)
            if level != self.num_resolutions - 1:
                stage.downsample = LTX2AudioDownsample(block_in, True, causality_axis=causality_axis)
                curr_res //= 2
            stages.append(stage)
        self.down = ModuleList(stages)

        self.mid = _Stage()
        mk = dict(temb_channels=0, norm_type=norm_type, causality_axis=causality_axis)
        self.mid.block_1 = LTX2AudioResnetBlock(block_in, block_in, **mk)
        self.mid.attn_1 = (
            LTX2AudioAttnBlock(block_in, norm_type=norm_type) if mid_block_add_attention else Identity()
        )
        self.mid.block_2 = LTX2AudioResnetBlock(block_in, block_in, **mk)
        self.norm_out = _make_norm(norm_type, block_in)
        z_channels = 2 * latent_channels if double_z else latent_channels
        self.conv_out = conv(block_in, z_channels, 3)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        for level, stage in enumerate(self.down):
            sp = params["down"][level]
            for bi, block in enumerate(stage.block):
                x = block(sp["block"][bi], x)
                if len(stage.attn):
                    x = stage.attn[bi](sp["attn"][bi], x)
            if level != self.num_resolutions - 1:
                x = stage.downsample(sp["downsample"], x)
        mp = params["mid"]
        x = self.mid.block_1(mp["block_1"], x)
        x = self.mid.attn_1(mp.get("attn_1", {}), x)
        x = self.mid.block_2(mp["block_2"], x)
        x = _apply_norm(self.norm_out, params, "norm_out", x)
        return self.conv_out(params["conv_out"], jax.nn.silu(x))


class LTX2AudioDecoder(Module):
    """Reference LTX2AudioDecoder (`:469`): conv_in → mid → reversed up stages
    (num_res_blocks+1 each, nearest-2x upsample) → norm/silu → conv_out →
    crop/pad to T*4-3 causal target frames."""

    def __init__(self, base_channels=128, output_channels=1, num_res_blocks=2,
                 attn_resolutions=None, resolution=256, latent_channels=8,
                 ch_mult=(1, 2, 4), norm_type="group", causality_axis="width",
                 mid_block_add_attention=False, mel_bins=64):
        super().__init__()
        self.num_resolutions = len(ch_mult)
        self.num_res_blocks = num_res_blocks
        self.out_ch = output_channels
        self.mel_bins = mel_bins
        self.causality_axis = causality_axis
        attn_resolutions = set(attn_resolutions) if attn_resolutions else set()

        def conv(cin, cout, k):
            if causality_axis is not None:
                return LTX2AudioCausalConv2d(cin, cout, k, causality_axis=causality_axis)
            return Conv2d(cin, cout, k, padding=(k - 1) // 2)

        block_in = base_channels * ch_mult[-1]
        self.conv_in = conv(latent_channels, block_in, 3)
        self.mid = _Stage()
        mk = dict(temb_channels=0, norm_type=norm_type, causality_axis=causality_axis)
        self.mid.block_1 = LTX2AudioResnetBlock(block_in, block_in, **mk)
        self.mid.attn_1 = (
            LTX2AudioAttnBlock(block_in, norm_type=norm_type) if mid_block_add_attention else Identity()
        )
        self.mid.block_2 = LTX2AudioResnetBlock(block_in, block_in, **mk)

        curr_res = resolution // (2 ** (self.num_resolutions - 1))
        stages = [None] * self.num_resolutions
        for level in reversed(range(self.num_resolutions)):
            stage = _Stage()
            block_out = base_channels * ch_mult[level]
            blocks, attns = [], []
            for _ in range(num_res_blocks + 1):
                blocks.append(LTX2AudioResnetBlock(
                    block_in, block_out, temb_channels=0, norm_type=norm_type,
                    causality_axis=causality_axis))
                block_in = block_out
                if curr_res in attn_resolutions:
                    attns.append(LTX2AudioAttnBlock(block_in, norm_type=norm_type))
            stage.block = ModuleList(blocks)
            stage.attn = ModuleList(attns)
            if level != 0:
                stage.upsample = LTX2AudioUpsample(block_in, True, causality_axis=causality_axis)
                curr_res *= 2
            stages[level] = stage
        self.up = ModuleList(stages)
        self.norm_out = _make_norm(norm_type, block_in)
        self.conv_out = conv(block_in, output_channels, 3)

    def __call__(self, params: Params, z: jax.Array) -> jax.Array:
        _, frames, mel_bins, _ = z.shape
        target_t = frames * LATENT_DOWNSAMPLE_FACTOR
        if self.causality_axis is not None:
            target_t = max(target_t - (LATENT_DOWNSAMPLE_FACTOR - 1), 1)
        target_m = self.mel_bins if self.mel_bins is not None else mel_bins

        x = self.conv_in(params["conv_in"], z)
        mp = params["mid"]
        x = self.mid.block_1(mp["block_1"], x)
        x = self.mid.attn_1(mp.get("attn_1", {}), x)
        x = self.mid.block_2(mp["block_2"], x)
        for level in reversed(range(self.num_resolutions)):
            stage = self.up[level]
            sp = params["up"][level]
            for bi, block in enumerate(stage.block):
                x = block(sp["block"][bi], x)
                if len(stage.attn):
                    x = stage.attn[bi](sp["attn"][bi], x)
            if level != 0:
                x = stage.upsample(sp["upsample"], x)
        x = _apply_norm(self.norm_out, params, "norm_out", x)
        x = self.conv_out(params["conv_out"], jax.nn.silu(x))

        # crop/zero-pad to the causal target frame count (`:643-663`)
        x = x[:, : target_t, : target_m, : self.out_ch]
        pt = target_t - x.shape[1]
        pm = target_m - x.shape[2]
        if pt > 0 or pm > 0:
            x = jnp.pad(x, ((0, 0), (0, max(pt, 0)), (0, max(pm, 0)), (0, 0)))
        return x


class AutoencoderKLLTX2Audio(Module, ModelMixin, ConfigMixin):
    """Public API speaks the reference's NCTM ([B, C, T(time), M(mel)])
    (`autoencoder_kl_ltx2_audio.py:668`); compute is [B, T, M, C] internally."""

    @register_to_config
    def __init__(
        self,
        base_channels: int = 128,
        output_channels: int = 2,
        ch_mult: Tuple[int, ...] = (1, 2, 4),
        num_res_blocks: int = 2,
        attn_resolutions: Optional[Tuple[int, ...]] = None,
        in_channels: int = 2,
        resolution: int = 256,
        latent_channels: int = 8,
        norm_type: str = "pixel",
        causality_axis: Optional[str] = "height",
        dropout: float = 0.0,
        mid_block_add_attention: bool = False,
        sample_rate: int = 16000,
        mel_hop_length: int = 160,
        is_causal: bool = True,
        mel_bins: Optional[int] = 64,
        double_z: bool = True,
    ):
        super().__init__()
        supported = {"none", "width", "height", "width-compatibility"}
        if causality_axis not in supported:
            raise ValueError(f"{causality_axis=} is not valid. Supported values: {supported}")
        common = dict(
            base_channels=base_channels, output_channels=output_channels,
            num_res_blocks=num_res_blocks, attn_resolutions=attn_resolutions,
            resolution=resolution, latent_channels=latent_channels, ch_mult=tuple(ch_mult),
            norm_type=norm_type, causality_axis=causality_axis,
            mid_block_add_attention=mid_block_add_attention, mel_bins=mel_bins,
        )
        self.encoder = LTX2AudioEncoder(in_channels=in_channels, double_z=double_z, **common)
        self.decoder = LTX2AudioDecoder(**common)
        self.temporal_compression_ratio = LATENT_DOWNSAMPLE_FACTOR
        self.mel_compression_ratio = LATENT_DOWNSAMPLE_FACTOR

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        # dataset statistics stored as persistent buffers in the reference
        # checkpoint (`:745-748`; sized base_channels there too)
        params["latents_mean"] = jnp.zeros((self.config.base_channels,), dtype)
        params["latents_std"] = jnp.ones((self.config.base_channels,), dtype)
        return params

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = jnp.transpose(x, (0, 2, 3, 1))  # NCTM → NTMC
        moments = self.encoder(params["encoder"], h)
        moments = jnp.transpose(moments, (0, 3, 1, 2))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        h = jnp.transpose(z, (0, 2, 3, 1))
        dec = self.decoder(params["decoder"], h)
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)
