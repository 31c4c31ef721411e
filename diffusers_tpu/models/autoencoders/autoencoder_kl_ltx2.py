"""AutoencoderKLLTX2Video — LTX-2 audiovisual model's video VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_ltx2.py:1025`
AutoencoderKLLTX2Video; LTX2VideoCausalConv3d `:63`, LTX2VideoResnetBlock3d
`:114`, Down/Upsampler3d `:240/:288`, encoder `:687`, decoder `:843`).

Structurally the LTX-2 VAE is the LTX-1 0.9.5 VAE with (a) plain (non-causal)
1x1 Conv3d shortcuts, (b) configurable spatial padding (reflect in the
decoder), (c) a bigger encoder (block channels 256→2048, per-block downsample
types spatial/temporal/spatiotemporal), and (d) a 3-up-block residual decoder
with upscale_factor 2 everywhere — so this file is config wiring over the
shared LTX conv-stack modules in `autoencoder_kl_ltx.py` (TPU-first NDHWC,
replicate-pad causality, fused pixel-shuffle resamplers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Module, ModuleList, Params, RMSNorm
from ..modeling_utils import ModelMixin
from .autoencoder_kl_ltx import (
    AutoencoderKLOutput,
    LTXCausalConv3d,
    LTXMidBlock3d,
    LTXUpBlock3d,
    LTXVideo095DownBlock3D,
)
from .vae import DecoderOutput, DiagonalGaussianDistribution


class LTX2VideoEncoder3d(Module):
    """Reference LTX2VideoEncoder3d (`:687`): patchify → conv_in (to
    latent_channels) → down blocks (block i outputs block_out_channels[i]) →
    mid → RMS norm → conv_out to latent+1 moments."""

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 128,
        block_out_channels=(256, 512, 1024, 2048),
        spatio_temporal_scaling=(True, True, True, True),
        layers_per_block=(4, 6, 6, 2, 2),
        downsample_type=("spatial", "temporal", "spatiotemporal", "spatiotemporal"),
        patch_size: int = 4,
        patch_size_t: int = 1,
        resnet_norm_eps: float = 1e-6,
        is_causal: bool = True,
        spatial_padding_mode: str = "zeros",
    ):
        super().__init__()
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.in_channels = in_channels * patch_size**2

        output_channel = out_channels  # LTX2: conv_in maps into latent width, not block 0
        self.conv_in = LTXCausalConv3d(
            self.in_channels, output_channel, kernel_size=3, stride=1, is_causal=is_causal,
            padding_mode=spatial_padding_mode,
        )
        blocks = []
        for i in range(len(block_out_channels)):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            blocks.append(
                LTXVideo095DownBlock3D(
                    input_channel, output_channel, num_layers=layers_per_block[i],
                    resnet_eps=resnet_norm_eps, spatio_temporal_scale=spatio_temporal_scaling[i],
                    is_causal=is_causal, downsample_type=downsample_type[i],
                    padding_mode=spatial_padding_mode, plain_shortcut=True,
                )
            )
        self.down_blocks = ModuleList(blocks)
        self.mid_block = LTXMidBlock3d(
            output_channel, num_layers=layers_per_block[-1], resnet_eps=resnet_norm_eps,
            is_causal=is_causal, padding_mode=spatial_padding_mode, plain_shortcut=True,
        )
        self.norm_out = RMSNorm(output_channel, eps=1e-8, use_scale=False)
        self.conv_out = LTXCausalConv3d(
            output_channel, out_channels + 1, kernel_size=3, stride=1, is_causal=is_causal,
            padding_mode=spatial_padding_mode,
        )

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # x: [B, F, H, W, C]; patchify with the reference's (c, pt, pw, ph)
        # channel order (encoder forward `:813-817`)
        p, pt = self.patch_size, self.patch_size_t
        b, f, h, w, c = x.shape
        x = x.reshape(b, f // pt, pt, h // p, p, w // p, p, c)
        x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 6, 4))  # [B,F,H,W,c,pt,pw,ph]
        x = x.reshape(b, f // pt, h // p, w // p, c * pt * p * p)

        x = self.conv_in(params["conv_in"], x)
        for i, block in enumerate(self.down_blocks):
            x = block(params["down_blocks"][i], x)
        x = self.mid_block(params["mid_block"], x)
        x = self.norm_out({}, x)
        x = jax.nn.silu(x)
        x = self.conv_out(params["conv_out"], x)
        # broadcast the single logvar channel to a full set (`:835-837`)
        last = jnp.repeat(x[..., -1:], x.shape[-1] - 2, axis=-1)
        return jnp.concatenate([x, last], axis=-1)


class LTX2VideoDecoder3d(Module):
    """Reference LTX2VideoDecoder3d (`:843`): conv_in → mid → 3 residual up
    blocks (upscale_factor 2) → norm/act → conv_out → unpatchify."""

    def __init__(
        self,
        in_channels: int = 128,
        out_channels: int = 3,
        block_out_channels=(256, 512, 1024),
        spatio_temporal_scaling=(True, True, True),
        layers_per_block=(5, 5, 5, 5),
        upsample_type=("spatiotemporal",) * 3,
        patch_size: int = 4,
        patch_size_t: int = 1,
        resnet_norm_eps: float = 1e-6,
        is_causal: bool = False,
        inject_noise=(False, False, False),
        timestep_conditioning: bool = False,
        upsample_residual=(True, True, True),
        upsample_factor=(2, 2, 2),
        spatial_padding_mode: str = "reflect",
    ):
        super().__init__()
        self.patch_size = patch_size
        self.patch_size_t = patch_size_t
        self.out_channels = out_channels * patch_size**2
        self.timestep_conditioning = timestep_conditioning

        block_out_channels = tuple(reversed(block_out_channels))
        spatio_temporal_scaling = tuple(reversed(spatio_temporal_scaling))
        layers_per_block = tuple(reversed(layers_per_block))
        inject_noise = tuple(reversed(inject_noise))
        upsample_residual = tuple(reversed(upsample_residual))
        upsample_factor = tuple(reversed(upsample_factor))
        # note: the reference does NOT reverse upsample_type (`:878` used as-is)
        output_channel = block_out_channels[0]

        self.conv_in = LTXCausalConv3d(
            in_channels, output_channel, kernel_size=3, stride=1, is_causal=is_causal,
            padding_mode=spatial_padding_mode,
        )
        self.mid_block = LTXMidBlock3d(
            output_channel, num_layers=layers_per_block[0], resnet_eps=resnet_norm_eps,
            is_causal=is_causal, inject_noise=inject_noise[0],
            timestep_conditioning=timestep_conditioning, padding_mode=spatial_padding_mode,
            plain_shortcut=True,
        )
        blocks = []
        for i in range(len(block_out_channels)):
            input_channel = output_channel // upsample_factor[i]
            output_channel = block_out_channels[i] // upsample_factor[i]
            blocks.append(
                LTXUpBlock3d(
                    input_channel, output_channel, num_layers=layers_per_block[i + 1],
                    resnet_eps=resnet_norm_eps, spatio_temporal_scale=spatio_temporal_scaling[i],
                    is_causal=is_causal, inject_noise=inject_noise[i + 1] if i + 1 < len(inject_noise) else False,
                    timestep_conditioning=timestep_conditioning,
                    upsample_residual=upsample_residual[i], upscale_factor=upsample_factor[i],
                    upsample_type=upsample_type[i], padding_mode=spatial_padding_mode,
                    plain_shortcut=True,
                )
            )
        self.up_blocks = ModuleList(blocks)
        self.norm_out = RMSNorm(output_channel, eps=1e-8, use_scale=False)
        self.conv_out = LTXCausalConv3d(
            output_channel, self.out_channels, kernel_size=3, stride=1, is_causal=is_causal,
            padding_mode=spatial_padding_mode,
        )
        self._final_channel = output_channel
        if timestep_conditioning:
            from ..transformers.pixart_transformer_2d import PixArtAlphaCombinedTimestepSizeEmbeddings

            self.time_embedder = PixArtAlphaCombinedTimestepSizeEmbeddings(output_channel * 2, 0)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.timestep_conditioning:
            k = jax.random.fold_in(key, 17)
            params["scale_shift_table"] = (
                jax.random.normal(k, (2, self._final_channel), jnp.float32) / self._final_channel**0.5
            )
            params["timestep_scale_multiplier"] = jnp.asarray(1000.0, jnp.float32)
        return params

    def __call__(self, params: Params, x: jax.Array, temb: Optional[jax.Array] = None, key=None) -> jax.Array:
        x = self.conv_in(params["conv_in"], x)
        if self.timestep_conditioning and temb is not None:
            temb = temb * params["timestep_scale_multiplier"]
        x = self.mid_block(params["mid_block"], x, temb, key)
        for i, block in enumerate(self.up_blocks):
            if key is not None:
                key, sub = jax.random.split(key)
            else:
                sub = None
            x = block(params["up_blocks"][i], x, temb, sub)
        x = self.norm_out({}, x)
        if self.timestep_conditioning and temb is not None:
            t_emb = self.time_embedder(
                params["time_embedder"], jnp.ravel(temb), batch_size=x.shape[0], dtype=x.dtype
            )
            ada = params["scale_shift_table"][None].astype(jnp.float32) + t_emb.reshape(
                x.shape[0], 2, -1
            ).astype(jnp.float32)
            shift, scale = [ada[:, i][:, None, None, None, :].astype(x.dtype) for i in range(2)]
            x = x * (1 + scale) + shift
        x = jax.nn.silu(x)
        x = self.conv_out(params["conv_out"], x)

        # unpatchify (`:1018-1020`): channel order (c, pt, pa, pb)
        p, pt = self.patch_size, self.patch_size_t
        b, f, h, w, cs = x.shape
        c = cs // (pt * p * p)
        x = x.reshape(b, f, h, w, c, pt, p, p)
        x = jnp.transpose(x, (0, 1, 5, 2, 7, 3, 6, 4))  # F*pt, H*pb, W*pa
        return x.reshape(b, f * pt, h * p, w * p, c)


class AutoencoderKLLTX2Video(Module, ModelMixin, ConfigMixin):
    """Public API speaks NCDHW ([B, C, F, H, W]) like the reference
    (`autoencoder_kl_ltx2.py:1025`); compute is NDHWC internally."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        latent_channels: int = 128,
        block_out_channels=(256, 512, 1024, 2048),
        down_block_types=("LTX2VideoDownBlock3D",) * 4,
        decoder_block_out_channels=(256, 512, 1024),
        layers_per_block=(4, 6, 6, 2, 2),
        decoder_layers_per_block=(5, 5, 5, 5),
        spatio_temporal_scaling=(True, True, True, True),
        decoder_spatio_temporal_scaling=(True, True, True),
        decoder_inject_noise=(False, False, False, False),
        downsample_type=("spatial", "temporal", "spatiotemporal", "spatiotemporal"),
        upsample_type=("spatiotemporal", "spatiotemporal", "spatiotemporal"),
        upsample_residual=(True, True, True),
        upsample_factor=(2, 2, 2),
        timestep_conditioning: bool = False,
        patch_size: int = 4,
        patch_size_t: int = 1,
        resnet_norm_eps: float = 1e-6,
        scaling_factor: float = 1.0,
        encoder_causal: bool = True,
        decoder_causal: bool = True,
        encoder_spatial_padding_mode: str = "zeros",
        decoder_spatial_padding_mode: str = "reflect",
        spatial_compression_ratio: Optional[int] = None,
        temporal_compression_ratio: Optional[int] = None,
    ):
        super().__init__()
        self.encoder = LTX2VideoEncoder3d(
            in_channels=in_channels,
            out_channels=latent_channels,
            block_out_channels=tuple(block_out_channels),
            spatio_temporal_scaling=tuple(spatio_temporal_scaling),
            layers_per_block=tuple(layers_per_block),
            downsample_type=tuple(downsample_type),
            patch_size=patch_size,
            patch_size_t=patch_size_t,
            resnet_norm_eps=resnet_norm_eps,
            is_causal=encoder_causal,
            spatial_padding_mode=encoder_spatial_padding_mode,
        )
        self.decoder = LTX2VideoDecoder3d(
            in_channels=latent_channels,
            out_channels=out_channels,
            block_out_channels=tuple(decoder_block_out_channels),
            spatio_temporal_scaling=tuple(decoder_spatio_temporal_scaling),
            layers_per_block=tuple(decoder_layers_per_block),
            upsample_type=tuple(upsample_type),
            patch_size=patch_size,
            patch_size_t=patch_size_t,
            resnet_norm_eps=resnet_norm_eps,
            is_causal=decoder_causal,
            inject_noise=tuple(decoder_inject_noise),
            timestep_conditioning=timestep_conditioning,
            upsample_residual=tuple(upsample_residual),
            upsample_factor=tuple(upsample_factor),
            spatial_padding_mode=decoder_spatial_padding_mode,
        )
        self.spatial_compression_ratio = (
            patch_size * 2 ** sum(spatio_temporal_scaling)
            if spatial_compression_ratio is None
            else spatial_compression_ratio
        )
        self.temporal_compression_ratio = (
            patch_size_t * 2 ** sum(spatio_temporal_scaling)
            if temporal_compression_ratio is None
            else temporal_compression_ratio
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        # registered as persistent buffers in the reference state dict (`:1146-1149`)
        params["latents_mean"] = jnp.zeros((self.config.latent_channels,), dtype)
        params["latents_std"] = jnp.ones((self.config.latent_channels,), dtype)
        return params

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = jnp.transpose(x, (0, 2, 3, 4, 1))  # NCDHW → NDHWC
        moments = self.encoder(params["encoder"], h)
        moments = jnp.transpose(moments, (0, 4, 1, 2, 3))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return AutoencoderKLOutput(latent_dist=posterior)

    def decode(self, params: Params, z: jax.Array, temb: Optional[jax.Array] = None,
               key: Optional[jax.Array] = None, return_dict: bool = True):
        h = jnp.transpose(z, (0, 2, 3, 4, 1))
        dec = self.decoder(params["decoder"], h, temb, key)
        dec = jnp.transpose(dec, (0, 4, 1, 2, 3))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)
