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
from ...ops.module import Conv2d, Embedding, GroupNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from ..resnet import ResnetBlock2D, SpatialNorm, Upsample2D
from ..unets.unet_2d_blocks import _attend_spatial
from ...models.attention import Attention
from .vae import Decoder, DecoderOutput, Encoder, UpDecoderBlock2D


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
        self.is_movq = norm_type == "spatial"
        if self.is_movq or any("Attn" in t for t in down_block_types):
            self.encoder = MoVQEncoder(
                in_channels=in_channels,
                out_channels=latent_channels,
                down_block_types=down_block_types,
                block_out_channels=block_out_channels,
                layers_per_block=layers_per_block,
                act_fn=act_fn,
                norm_num_groups=norm_num_groups,
                double_z=False,
            )
        else:
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
        if self.is_movq:
            self.decoder = MoVQDecoder(
                in_channels=latent_channels,
                out_channels=out_channels,
                up_block_types=up_block_types,
                block_out_channels=block_out_channels,
                layers_per_block=layers_per_block,
                act_fn=act_fn,
                norm_num_groups=norm_num_groups,
            )
        else:
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
        q2 = self.post_quant_conv(params["post_quant_conv"], q)
        if self.is_movq:
            dec = self.decoder(params["decoder"], q2, q)  # zq conditions the norms
        else:
            dec = self.decoder(params["decoder"], q2)
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        if not return_dict:
            return (dec, commit_loss)
        return DecoderOutput(sample=dec, commit_loss=commit_loss)

    def __call__(self, params: Params, sample: jax.Array, return_dict: bool = True):
        h = self.encode(params, sample).latents
        dec = self.decode(params, h, return_dict=return_dict)
        return dec


class _SpatialAttention(Module):
    """VAE-style spatial self-attention whose pre-norm is a SpatialNorm
    conditioned on the quantized latents (reference Attention with
    spatial_norm_dim; MoVQ decoder)."""

    def __init__(self, channels: int, zq_channels: Optional[int] = None, norm_groups: int = 32):
        super().__init__()
        self.channels = channels
        if zq_channels is not None:
            self.spatial_norm = SpatialNorm(channels, zq_channels)
            self.group_norm = None
        else:
            self.spatial_norm = None
            self.group_norm = GroupNorm(num_groups=norm_groups, num_channels=channels, eps=1e-6)
        self.to_q = Linear(channels, channels, use_bias=True)
        self.to_k = Linear(channels, channels, use_bias=True)
        self.to_v = Linear(channels, channels, use_bias=True)
        self.to_out = ModuleList([Linear(channels, channels, use_bias=True)])

    def __call__(self, params: Params, x: jax.Array, zq: Optional[jax.Array] = None) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        if self.spatial_norm is not None:
            normed = self.spatial_norm(params["spatial_norm"], x, zq)
        else:
            normed = self.group_norm(params["group_norm"], x)
        tokens = normed.reshape(b, h * w, c)
        from ...ops.attention import dispatch_attention_fn

        q = self.to_q(params["to_q"], tokens).reshape(b, -1, 1, c)
        k = self.to_k(params["to_k"], tokens).reshape(b, -1, 1, c)
        v = self.to_v(params["to_v"], tokens).reshape(b, -1, 1, c)
        out = dispatch_attention_fn(q, k, v).reshape(b, h * w, c).astype(x.dtype)
        out = self.to_out[0](params["to_out"][0], out)
        return out.reshape(b, h, w, c) + residual


class AttnDownEncoderBlock2D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1,
                 resnet_eps: float = 1e-6, resnet_act_fn: str = "silu", resnet_groups: int = 32,
                 attention_head_dim: Optional[int] = None, add_downsample: bool = True):
        super().__init__()
        from .vae import DownEncoderBlock2D  # reuse its downsampler layout

        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=None,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    non_linearity=resnet_act_fn,
                )
                for i in range(num_layers)
            ]
        )
        self.attentions = ModuleList(
            [_SpatialAttention(out_channels, None, resnet_groups) for _ in range(num_layers)]
        )
        self.add_downsample = add_downsample
        if add_downsample:
            from ..resnet import Downsample2D

            self.downsamplers = ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=0)]
            )

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, None)
            hidden_states = self.attentions[i](params["attentions"][i], hidden_states)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
        return hidden_states


class AttnUpDecoderBlock2D(Module):
    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 1,
                 resnet_eps: float = 1e-6, resnet_act_fn: str = "silu", resnet_groups: int = 32,
                 add_upsample: bool = True, temb_channels: Optional[int] = None,
                 resnet_time_scale_shift: str = "default"):
        super().__init__()
        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    non_linearity=resnet_act_fn,
                    time_embedding_norm=resnet_time_scale_shift,
                )
                for i in range(num_layers)
            ]
        )
        zq_ch = temb_channels if resnet_time_scale_shift == "spatial" else None
        self.attentions = ModuleList(
            [_SpatialAttention(out_channels, zq_ch, resnet_groups) for _ in range(num_layers)]
        )
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states: jax.Array, temb=None) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb)
            hidden_states = self.attentions[i](params["attentions"][i], hidden_states, temb)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class MoVQEncoder(Module):
    """Encoder allowing Attn down blocks (reference vae.Encoder with
    AttnDownEncoderBlock2D entries)."""

    def __init__(self, in_channels, out_channels, down_block_types, block_out_channels,
                 layers_per_block, act_fn, norm_num_groups, double_z=False):
        super().__init__()
        from .vae import DownEncoderBlock2D
        from ..unets.unet_2d_blocks import UNetMidBlock2D

        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, stride=1, padding=1)
        blocks = []
        output_channel = block_out_channels[0]
        for i, t in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            if t == "DownEncoderBlock2D":
                blocks.append(DownEncoderBlock2D(
                    num_layers=layers_per_block, in_channels=input_channel, out_channels=output_channel,
                    add_downsample=not is_final, resnet_eps=1e-6, resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups, downsample_padding=0,
                ))
            elif t == "AttnDownEncoderBlock2D":
                blocks.append(AttnDownEncoderBlock2D(
                    num_layers=layers_per_block, in_channels=input_channel, out_channels=output_channel,
                    add_downsample=not is_final, resnet_eps=1e-6, resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups,
                ))
            else:
                raise ValueError(f"unsupported down_block_type {t}")
        self.down_blocks = ModuleList(blocks)
        self.mid_block = UNetMidBlock2D(
            in_channels=block_out_channels[-1], temb_channels=None, resnet_eps=1e-6,
            resnet_act_fn=act_fn, output_scale_factor=1, attention_head_dim=block_out_channels[-1],
            resnet_groups=norm_num_groups, add_attention=True,
        )
        conv_out_channels = 2 * out_channels if double_z else out_channels
        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[-1], num_groups=norm_num_groups, eps=1e-6)
        self.conv_out = Conv2d(block_out_channels[-1], conv_out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, sample: jax.Array) -> jax.Array:
        from ...ops.module import get_activation

        sample = self.conv_in(params["conv_in"], sample)
        for i, block in enumerate(self.down_blocks):
            sample = block(params["down_blocks"][i], sample)
        sample = self.mid_block(params["mid_block"], sample, None)
        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = get_activation("silu")(sample)
        return self.conv_out(params["conv_out"], sample)


class _MoVQMidBlock(Module):
    """UNetMidBlock2D with spatial norms (reference key layout
    mid_block.resnets.{0,1} / mid_block.attentions.0)."""

    def __init__(self, channels: int, zq_channels: int, act_fn: str, norm_groups: int):
        super().__init__()
        self.resnets = ModuleList([
            ResnetBlock2D(
                in_channels=channels, out_channels=channels, temb_channels=zq_channels,
                eps=1e-6, groups=norm_groups, non_linearity=act_fn, time_embedding_norm="spatial",
            )
            for _ in range(2)
        ])
        self.attentions = ModuleList([_SpatialAttention(channels, zq_channels, norm_groups)])

    def __call__(self, params: Params, sample: jax.Array, zq: jax.Array) -> jax.Array:
        sample = self.resnets[0](params["resnets"][0], sample, zq)
        sample = self.attentions[0](params["attentions"][0], sample, zq)
        return self.resnets[1](params["resnets"][1], sample, zq)


class MoVQDecoder(Module):
    """Decoder with SpatialNorm conditioning on the quantized latents
    (reference vae.Decoder with norm_type='spatial')."""

    def __init__(self, in_channels, out_channels, up_block_types, block_out_channels,
                 layers_per_block, act_fn, norm_num_groups):
        super().__init__()
        self.conv_in = Conv2d(in_channels, block_out_channels[-1], kernel_size=3, stride=1, padding=1)
        self.mid_block = _MoVQMidBlock(block_out_channels[-1], in_channels, act_fn, norm_num_groups)
        up_blocks = []
        rev = list(reversed(block_out_channels))
        output_channel = rev[0]
        for i, t in enumerate(up_block_types):
            prev_output_channel = output_channel
            output_channel = rev[i]
            is_final = i == len(block_out_channels) - 1
            if t == "UpDecoderBlock2D":
                up_blocks.append(UpDecoderBlock2D(
                    num_layers=layers_per_block + 1, in_channels=prev_output_channel,
                    out_channels=output_channel, add_upsample=not is_final, resnet_eps=1e-6,
                    resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                    temb_channels=in_channels, resnet_time_scale_shift="spatial",
                ))
            elif t == "AttnUpDecoderBlock2D":
                up_blocks.append(AttnUpDecoderBlock2D(
                    num_layers=layers_per_block + 1, in_channels=prev_output_channel,
                    out_channels=output_channel, add_upsample=not is_final, resnet_eps=1e-6,
                    resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                    temb_channels=in_channels, resnet_time_scale_shift="spatial",
                ))
            else:
                raise ValueError(f"unsupported up_block_type {t}")
        self.up_blocks = ModuleList(up_blocks)
        self.conv_norm_out = SpatialNorm(block_out_channels[0], in_channels)
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, sample: jax.Array, zq: jax.Array) -> jax.Array:
        from ...ops.module import get_activation

        sample = self.conv_in(params["conv_in"], sample)
        sample = self.mid_block(params["mid_block"], sample, zq)
        for i, block in enumerate(self.up_blocks):
            sample = block(params["up_blocks"][i], sample, zq)
        sample = self.conv_norm_out(params["conv_norm_out"], sample, zq)
        sample = get_activation("silu")(sample)
        return self.conv_out(params["conv_out"], sample)
