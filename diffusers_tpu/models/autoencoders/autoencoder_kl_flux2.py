"""AutoencoderKLFlux2 — the Flux 2 image VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_flux2.py:39`):
a standard KL autoencoder (same Encoder/Decoder stack as AutoencoderKL) with

  * 32 latent channels and an optional distinct decoder width ladder
    (``decoder_block_out_channels``),
  * a stats-only BatchNorm over the 2×2-patchified latents (``bn``): the model
    never *applies* it in encode/decode — the Flux 2 pipelines read
    ``bn.running_mean`` / ``bn.running_var`` to normalize latents entering the
    transformer and to denormalize before decoding (reference
    `pipelines/flux2/pipeline_flux2.py:613,1018`).

Public API NCHW, internals NHWC (TPU lane-major channels).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Module, Params
from ..modeling_utils import ModelMixin
from .vae import Decoder, DecoderOutput, DiagonalGaussianDistribution, Encoder


class _BatchNormStats(Module):
    """Stats-only BatchNorm (affine=False, track_running_stats=True): holds the
    reference checkpoint's ``running_mean`` / ``running_var`` buffers; never
    applied inside the VAE forward."""

    def __init__(self, num_features: int, eps: float = 1e-4):
        super().__init__()
        self.num_features = num_features
        self.eps = eps

    def init(self, key, dtype=jnp.float32) -> Params:
        return {
            "running_mean": jnp.zeros((self.num_features,), jnp.float32),
            "running_var": jnp.ones((self.num_features,), jnp.float32),
        }

    def convert_torch_param(self, pname, tensor):
        if pname == "num_batches_tracked":
            return pname, tensor.reshape(-1)
        return pname, tensor

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        mean = params["running_mean"].astype(x.dtype)
        var = params["running_var"].astype(x.dtype)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class AutoencoderKLFlux2(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = (
            "DownEncoderBlock2D",
            "DownEncoderBlock2D",
            "DownEncoderBlock2D",
            "DownEncoderBlock2D",
        ),
        up_block_types: Tuple[str, ...] = (
            "UpDecoderBlock2D",
            "UpDecoderBlock2D",
            "UpDecoderBlock2D",
            "UpDecoderBlock2D",
        ),
        block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
        decoder_block_out_channels: Optional[Tuple[int, ...]] = None,
        layers_per_block: int = 2,
        act_fn: str = "silu",
        latent_channels: int = 32,
        norm_num_groups: int = 32,
        sample_size: int = 1024,
        force_upcast: bool = True,
        use_quant_conv: bool = True,
        use_post_quant_conv: bool = True,
        mid_block_add_attention: bool = True,
        batch_norm_eps: float = 1e-4,
        batch_norm_momentum: float = 0.1,
        patch_size: Tuple[int, int] = (2, 2),
    ):
        super().__init__()
        self.encoder = Encoder(
            in_channels=in_channels,
            out_channels=latent_channels,
            down_block_types=down_block_types,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            act_fn=act_fn,
            norm_num_groups=norm_num_groups,
            double_z=True,
            mid_block_add_attention=mid_block_add_attention,
        )
        self.decoder = Decoder(
            in_channels=latent_channels,
            out_channels=out_channels,
            up_block_types=up_block_types,
            block_out_channels=tuple(decoder_block_out_channels or block_out_channels),
            layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups,
            act_fn=act_fn,
            mid_block_add_attention=mid_block_add_attention,
        )
        self.quant_conv = Conv2d(2 * latent_channels, 2 * latent_channels, kernel_size=1, padding=0) if use_quant_conv else None
        self.post_quant_conv = Conv2d(latent_channels, latent_channels, kernel_size=1, padding=0) if use_post_quant_conv else None
        self.bn = _BatchNormStats(math.prod(patch_size) * latent_channels, eps=batch_norm_eps)

        sample = sample_size if isinstance(sample_size, int) else sample_size[0]
        self.tile_sample_min_size = sample
        self.tile_latent_min_size = int(sample / (2 ** (len(block_out_channels) - 1)))
        self.tile_overlap_factor = 0.25

    # -------------------------------------------------------------- latent bn
    def latent_distribution_stats(self, params: Params):
        """(mean, std) of the patchified-latent BatchNorm, each [C·prod(patch)],
        as the Flux 2 pipelines consume them (pipeline_flux2.py:613-616)."""
        mean = params["bn"]["running_mean"]
        std = jnp.sqrt(params["bn"]["running_var"] + self.config.batch_norm_eps)
        return mean, std

    # -------------------------------------------------------------- encode
    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, H, W] in [-1, 1] → DiagonalGaussianDistribution (NCHW)."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder(params["encoder"], h)
        if self.quant_conv is not None:
            h = self.quant_conv(params["quant_conv"], h)
        moments = jnp.transpose(h, (0, 3, 1, 2))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return posterior

    # -------------------------------------------------------------- decode
    def decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        """z: [B, latent_C, h, w] → sample [B, C, H, W]."""
        h = jnp.transpose(z, (0, 2, 3, 1))
        if self.post_quant_conv is not None:
            h = self.post_quant_conv(params["post_quant_conv"], h)
        dec = self.decoder(params["decoder"], h)
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)
