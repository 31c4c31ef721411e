"""AutoencoderKL — the SD-family image VAE.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl.py:36`;
encode `:171`, decode `:214`, tiled encode/decode `:302,364`). Public API is
NCHW like the reference; internals NHWC. Tiled encode/decode reuse the
reference's blend math for seam-free large-image decoding without blowing
past HBM.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Module, Params
from ..modeling_utils import ModelMixin
from .vae import Decoder, DecoderOutput, DiagonalGaussianDistribution, Encoder


class AutoencoderKL(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",),
        up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",),
        block_out_channels: Tuple[int, ...] = (64,),
        layers_per_block: int = 1,
        act_fn: str = "silu",
        latent_channels: int = 4,
        norm_num_groups: int = 32,
        sample_size: int = 32,
        scaling_factor: float = 0.18215,
        shift_factor: Optional[float] = None,
        latents_mean: Optional[Tuple[float]] = None,
        latents_std: Optional[Tuple[float]] = None,
        force_upcast: bool = True,
        use_quant_conv: bool = True,
        use_post_quant_conv: bool = True,
        mid_block_add_attention: bool = True,
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
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups,
            act_fn=act_fn,
            mid_block_add_attention=mid_block_add_attention,
        )
        self.quant_conv = Conv2d(2 * latent_channels, 2 * latent_channels, kernel_size=1, padding=0) if use_quant_conv else None
        self.post_quant_conv = Conv2d(latent_channels, latent_channels, kernel_size=1, padding=0) if use_post_quant_conv else None

        # tiling defaults (reference autoencoder_kl.py:137-147)
        self.tile_sample_min_size = self.config.sample_size if isinstance(self.config.sample_size, int) else 512
        self.tile_latent_min_size = int(self.tile_sample_min_size / (2 ** (len(block_out_channels) - 1)))
        self.tile_overlap_factor = 0.25
        self.use_tiling = False

    def enable_tiling(self, tile_sample_min_size: int = None):
        """Tiled encode/decode (reference autoencoder_kl.py enable_tiling):
        bounds decode HBM to one tile's working set — e.g. lets the 1024px
        Flux decode co-reside with an 11.9 GB quantized transformer."""
        self.use_tiling = True
        if tile_sample_min_size is not None:
            self.tile_sample_min_size = tile_sample_min_size
            self.tile_latent_min_size = int(
                tile_sample_min_size / (2 ** (len(self.config.block_out_channels) - 1)))

    def disable_tiling(self):
        self.use_tiling = False

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

    # -------------------------------------------------------------- tiled
    def _blend_v(self, a: jax.Array, b: jax.Array, blend_extent: int) -> jax.Array:
        blend_extent = min(a.shape[2], b.shape[2], blend_extent)
        ramp = (jnp.arange(blend_extent) / blend_extent)[None, None, :, None]
        mixed = a[:, :, -blend_extent:, :] * (1 - ramp) + b[:, :, :blend_extent, :] * ramp
        return jnp.concatenate([b[:, :, :0, :], mixed, b[:, :, blend_extent:, :]], axis=2)

    def _blend_h(self, a: jax.Array, b: jax.Array, blend_extent: int) -> jax.Array:
        blend_extent = min(a.shape[3], b.shape[3], blend_extent)
        ramp = (jnp.arange(blend_extent) / blend_extent)[None, None, None, :]
        mixed = a[:, :, :, -blend_extent:] * (1 - ramp) + b[:, :, :, :blend_extent] * ramp
        return jnp.concatenate([mixed, b[:, :, :, blend_extent:]], axis=3)

    def tiled_decode(self, params: Params, z: jax.Array, return_dict: bool = True):
        """Seam-blended tiled decode (reference autoencoder_kl.py:364)."""
        overlap_size = int(self.tile_latent_min_size * (1 - self.tile_overlap_factor))
        blend_extent = int(self.tile_sample_min_size * self.tile_overlap_factor)
        row_limit = self.tile_sample_min_size - blend_extent

        rows = []
        for i in range(0, z.shape[2], overlap_size):
            row = []
            for j in range(0, z.shape[3], overlap_size):
                tile = z[:, :, i : i + self.tile_latent_min_size, j : j + self.tile_latent_min_size]
                decoded = self.decode(params, tile).sample
                row.append(decoded)
            rows.append(row)
        result_rows = []
        for i, row in enumerate(rows):
            result_row = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = self._blend_v(rows[i - 1][j], tile, blend_extent)
                if j > 0:
                    tile = self._blend_h(row[j - 1], tile, blend_extent)
                result_row.append(tile[:, :, :row_limit, :row_limit])
            result_rows.append(jnp.concatenate(result_row, axis=3))
        dec = jnp.concatenate(result_rows, axis=2)
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)
