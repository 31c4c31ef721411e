"""VQ-VAE model (VQ-diffusion / Kandinsky MoVQ-family decoder).

Functional mirror of the reference
(`/root/reference/src/diffusers/models/autoencoders/vq_model.py:39` VQModel,
`vae.py:565` VectorQuantizer). The codebook lookup is an argmin over squared
distances — expressed as one [N, n_e] matmul (MXU-friendly) instead of cdist;
the straight-through estimator uses `stop_gradient` so the model trains under
`jax.grad` unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Embedding, Module, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .vae import Decoder, DecoderOutput, Encoder


@dataclass
class VQEncoderOutput(BaseOutput):
    latents: jax.Array


class VectorQuantizer(Module):
    """Nearest-codebook quantization with straight-through gradients."""

    def __init__(self, n_e: int, vq_embed_dim: int, beta: float = 0.25, legacy: bool = True):
        super().__init__()
        self.n_e = n_e
        self.vq_embed_dim = vq_embed_dim
        self.beta = beta
        self.legacy = legacy
        self.embedding = Embedding(n_e, vq_embed_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        embedding = jax.random.uniform(
            key, (self.n_e, self.vq_embed_dim), minval=-1.0 / self.n_e, maxval=1.0 / self.n_e
        )
        return {"embedding": {"embedding": embedding.astype(dtype)}}

    def __call__(self, params: Params, z: jax.Array):
        """z: [B, C, h, w] (NCHW, matching the reference contract)."""
        codebook = params["embedding"]["embedding"]  # [n_e, D]
        z_nhwc = jnp.transpose(z, (0, 2, 3, 1))
        flat = z_nhwc.reshape(-1, self.vq_embed_dim)

        # ||z - e||² = ||z||² + ||e||² − 2 z·eᵀ  (one MXU matmul, no cdist)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)[None, :]
            - 2.0 * flat @ codebook.T
        )
        indices = jnp.argmin(d, axis=1)
        z_q = codebook[indices].reshape(z_nhwc.shape)

        sg = jax.lax.stop_gradient
        if not self.legacy:
            loss = self.beta * jnp.mean((sg(z_q) - z_nhwc) ** 2) + jnp.mean((z_q - sg(z_nhwc)) ** 2)
        else:
            loss = jnp.mean((sg(z_q) - z_nhwc) ** 2) + self.beta * jnp.mean((z_q - sg(z_nhwc)) ** 2)

        z_q = z_nhwc + sg(z_q - z_nhwc)  # straight-through
        z_q = jnp.transpose(z_q, (0, 3, 1, 2))
        return z_q, loss, indices.reshape(z.shape[0], -1)

    def get_codebook_entry(self, params: Params, indices: jax.Array, shape: Optional[Tuple[int, ...]] = None):
        """indices → codebook vectors; `shape` is (batch, height, width, channel)."""
        z_q = params["embedding"]["embedding"][indices.reshape(-1)]
        if shape is not None:
            z_q = z_q.reshape(shape)
            z_q = jnp.transpose(z_q, (0, 3, 1, 2))
        return z_q


class VQModel(Module, ModelMixin, ConfigMixin):
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
        latent_channels: int = 3,
        sample_size: int = 32,
        num_vq_embeddings: int = 256,
        norm_num_groups: int = 32,
        vq_embed_dim: Optional[int] = None,
        scaling_factor: float = 0.18215,
        norm_type: str = "group",
        mid_block_add_attention: bool = True,
        lookup_from_codebook: bool = False,
        force_upcast: bool = False,
    ):
        super().__init__()
        if norm_type != "group":
            raise NotImplementedError("spatial norm decoder lands with the MoVQ family")
        self.encoder = Encoder(
            in_channels=in_channels,
            out_channels=latent_channels,
            down_block_types=down_block_types,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            act_fn=act_fn,
            norm_num_groups=norm_num_groups,
            double_z=False,
            mid_block_add_attention=mid_block_add_attention,
        )
        vq_embed_dim = vq_embed_dim if vq_embed_dim is not None else latent_channels
        self.quant_conv = Conv2d(latent_channels, vq_embed_dim, kernel_size=1, padding=0)
        self.quantize = VectorQuantizer(num_vq_embeddings, vq_embed_dim, beta=0.25, legacy=True)
        self.post_quant_conv = Conv2d(vq_embed_dim, latent_channels, kernel_size=1, padding=0)
        self.decoder = Decoder(
            in_channels=latent_channels,
            out_channels=out_channels,
            up_block_types=up_block_types,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            act_fn=act_fn,
            norm_num_groups=norm_num_groups,
            mid_block_add_attention=mid_block_add_attention,
        )

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        latents = jnp.transpose(h, (0, 3, 1, 2))
        if not return_dict:
            return (latents,)
        return VQEncoderOutput(latents=latents)

    def decode(
        self, params: Params, h: jax.Array, force_not_quantize: bool = False, return_dict: bool = True, shape=None
    ):
        if not force_not_quantize:
            quant, commit_loss, _ = self.quantize(params["quantize"], h)
        elif self.config.lookup_from_codebook:
            quant = self.quantize.get_codebook_entry(params["quantize"], h, shape)
            commit_loss = jnp.zeros((quant.shape[0],), dtype=quant.dtype)
        else:
            quant = h
            commit_loss = jnp.zeros((h.shape[0],), dtype=h.dtype)
        q = jnp.transpose(quant, (0, 2, 3, 1))
        q = self.post_quant_conv(params["post_quant_conv"], q)
        dec = self.decoder(params["decoder"], q)
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        if not return_dict:
            return (dec, commit_loss)
        return DecoderOutput(sample=dec, commit_loss=commit_loss)

    def __call__(self, params: Params, sample: jax.Array, return_dict: bool = True):
        h = self.encode(params, sample).latents
        dec = self.decode(params, h, return_dict=return_dict)
        return dec
