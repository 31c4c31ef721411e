"""AsymmetricAutoencoderKL — inpainting-specialised VAE with a
mask-conditioned decoder (used by SD inpaint "asymmetric VQGAN").

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/autoencoders/autoencoder_asym_kl.py`
(model `:64`) and `vae.py` (MaskConditionEncoder `:330`,
MaskConditionDecoder `:395`): the decoder blends masked-image features in at
every resolution. NHWC internals; NCHW public API; the shape-keyed feature
dict becomes a spatial-size-keyed dict (static under jit).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, Module, ModuleList, Params, get_activation
from ..modeling_utils import ModelMixin
from ..unets.unet_2d_blocks import UNetMidBlock2D
from .vae import DecoderOutput, DiagonalGaussianDistribution, Encoder, UpDecoderBlock2D


class MaskConditionEncoder(Module):
    def __init__(self, in_ch: int, out_ch: int = 192, res_ch: int = 768, stride: int = 16):
        super().__init__()
        channels = []
        while stride > 1:
            stride = stride // 2
            in_ch_ = out_ch * 2
            if out_ch > res_ch:
                out_ch = res_ch
            if stride == 1:
                in_ch_ = res_ch
            channels.append((in_ch_, out_ch))
            out_ch *= 2
        out_channels = [c[1] for c in channels]
        out_channels.append(channels[-1][0])
        layers = []
        in_ch_ = in_ch
        for i, out_ch_ in enumerate(out_channels):
            if i in (0, 1):
                layers.append(Conv2d(in_ch_, out_ch_, kernel_size=3, stride=1, padding=1))
            else:
                layers.append(Conv2d(in_ch_, out_ch_, kernel_size=4, stride=2, padding=1))
            in_ch_ = out_ch_
        self.layers = ModuleList(layers)

    def __call__(self, params: Params, x: jax.Array):
        """x: [B, H, W, C] NHWC → {spatial_size: features} (pre-ReLU)."""
        out = {}
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][i], x)
            out[(x.shape[1], x.shape[2], x.shape[3])] = x
            x = jax.nn.relu(x)
        return out


class MaskConditionDecoder(Module):
    def __init__(self, in_channels: int = 3, out_channels: int = 3,
                 up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",),
                 block_out_channels: Tuple[int, ...] = (64,),
                 layers_per_block: int = 2, norm_num_groups: int = 32, act_fn: str = "silu"):
        super().__init__()
        self.conv_in = Conv2d(in_channels, block_out_channels[-1], kernel_size=3, stride=1, padding=1)
        self.mid_block = UNetMidBlock2D(
            in_channels=block_out_channels[-1],
            temb_channels=None,
            resnet_eps=1e-6,
            resnet_act_fn=act_fn,
            output_scale_factor=1,
            attention_head_dim=block_out_channels[-1],
            resnet_groups=norm_num_groups,
        )
        up_blocks = []
        rev = list(reversed(block_out_channels))
        output_channel = rev[0]
        for i, t in enumerate(up_block_types):
            if t != "UpDecoderBlock2D":
                raise NotImplementedError(f"up_block_type {t} not supported")
            prev_output_channel = output_channel
            output_channel = rev[i]
            up_blocks.append(
                UpDecoderBlock2D(
                    num_layers=layers_per_block + 1,
                    in_channels=prev_output_channel,
                    out_channels=output_channel,
                    add_upsample=i != len(block_out_channels) - 1,
                    resnet_eps=1e-6,
                    resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups,
                )
            )
        self.up_blocks = ModuleList(up_blocks)
        self.condition_encoder = MaskConditionEncoder(
            in_ch=out_channels, out_ch=block_out_channels[0], res_ch=block_out_channels[-1]
        )
        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0], num_groups=norm_num_groups, eps=1e-6)
        self.conv_act = get_activation("silu")
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    @staticmethod
    def _nearest_resize(x, h, w):
        # torch F.interpolate(mode="nearest") indexing: floor(i * src/dst)
        hi = (jnp.arange(h) * (x.shape[1] / h)).astype(jnp.int32)
        wi = (jnp.arange(w) * (x.shape[2] / w)).astype(jnp.int32)
        return x[:, hi][:, :, wi]

    def __call__(self, params: Params, z, image=None, mask=None):
        sample = self.conv_in(params["conv_in"], z)
        sample = self.mid_block(params["mid_block"], sample, None)

        im_x = None
        if image is not None and mask is not None:
            masked_image = (1 - mask) * image
            im_x = self.condition_encoder(params["condition_encoder"], masked_image, )

        for i, up_block in enumerate(self.up_blocks):
            if im_x is not None:
                sample_ = im_x[(sample.shape[1], sample.shape[2], sample.shape[3])]
                mask_ = self._nearest_resize(mask, sample.shape[1], sample.shape[2])
                sample = sample * mask_ + sample_ * (1 - mask_)
            sample = up_block(params["up_blocks"][i], sample)
        if im_x is not None:
            sample = sample * mask + im_x[(sample.shape[1], sample.shape[2], sample.shape[3])] * (1 - mask)

        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = self.conv_act(sample)
        return self.conv_out(params["conv_out"], sample)


class AsymmetricAutoencoderKL(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",),
        down_block_out_channels: Tuple[int, ...] = (64,),
        layers_per_down_block: int = 1,
        up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",),
        up_block_out_channels: Tuple[int, ...] = (64,),
        layers_per_up_block: int = 1,
        act_fn: str = "silu",
        latent_channels: int = 4,
        norm_num_groups: int = 32,
        sample_size: int = 32,
        scaling_factor: float = 0.18215,
    ):
        super().__init__()
        self.encoder = Encoder(
            in_channels=in_channels,
            out_channels=latent_channels,
            down_block_types=down_block_types,
            block_out_channels=down_block_out_channels,
            layers_per_block=layers_per_down_block,
            act_fn=act_fn,
            norm_num_groups=norm_num_groups,
            double_z=True,
        )
        self.decoder = MaskConditionDecoder(
            in_channels=latent_channels,
            out_channels=out_channels,
            up_block_types=up_block_types,
            block_out_channels=up_block_out_channels,
            layers_per_block=layers_per_up_block,
            act_fn=act_fn,
            norm_num_groups=norm_num_groups,
        )
        self.quant_conv = Conv2d(2 * latent_channels, 2 * latent_channels, kernel_size=1, padding=0)
        self.post_quant_conv = Conv2d(latent_channels, latent_channels, kernel_size=1, padding=0)
        self.register_to_config(block_out_channels=up_block_out_channels)
        self.register_to_config(force_upcast=False)

    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        posterior = DiagonalGaussianDistribution(jnp.transpose(h, (0, 3, 1, 2)))
        if not return_dict:
            return (posterior,)
        return posterior

    def decode(self, params: Params, z: jax.Array, image: Optional[jax.Array] = None,
               mask: Optional[jax.Array] = None, return_dict: bool = True):
        """z: [B, C, h, w]; image/mask: NCHW (mask 1 = keep original pixels)."""
        h = jnp.transpose(z, (0, 2, 3, 1))
        h = self.post_quant_conv(params["post_quant_conv"], h)
        img = jnp.transpose(image, (0, 2, 3, 1)) if image is not None else None
        msk = jnp.transpose(mask, (0, 2, 3, 1)) if mask is not None else None
        dec = self.decoder(params["decoder"], h, image=img, mask=msk)
        dec = jnp.transpose(dec, (0, 3, 1, 2))
        if not return_dict:
            return (dec,)
        return DecoderOutput(sample=dec)
