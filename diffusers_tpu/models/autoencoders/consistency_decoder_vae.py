"""ConsistencyDecoderVAE — DALL-E 3's consistency decoder for SD latents.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/autoencoders/consistency_decoder_vae.py:52`):
standard KL encoder + quant conv produce the posterior; `decode` runs the
2-step consistency UNet (`UNet2DModel` with learned time embeddings and
Resnet up/downsample blocks) over nearest-upsampled, stat-normalized
latents, with the EDM-style c_in/c_skip/c_out ladder from
`ConsistencyDecoderScheduler` (reference
`schedulers/scheduling_consistency_decoder.py:80`). The 2-step loop is a
`lax.scan` over the fixed [1008, 512] schedule — one compiled program, fresh
noise from an explicit PRNG key so decode is pure.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...schedulers.scheduling_consistency_decoder import ConsistencyDecoderScheduler
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..modeling_utils import ModelMixin
from ...ops.module import Conv2d, Module, Params
from ..unets.unet_2d import UNet2DModel
from .vae import DecoderOutput, DiagonalGaussianDistribution, Encoder


@dataclass
class ConsistencyDecoderVAEOutput(BaseOutput):
    latent_dist: "DiagonalGaussianDistribution"


class ConsistencyDecoderVAE(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        scaling_factor: float = 0.18215,
        latent_channels: int = 4,
        sample_size: int = 32,
        encoder_act_fn: str = "silu",
        encoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512),
        encoder_double_z: bool = True,
        encoder_down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",) * 4,
        encoder_in_channels: int = 3,
        encoder_layers_per_block: int = 2,
        encoder_norm_num_groups: int = 32,
        encoder_out_channels: int = 4,
        decoder_add_attention: bool = False,
        decoder_block_out_channels: Tuple[int, ...] = (320, 640, 1024, 1024),
        decoder_down_block_types: Tuple[str, ...] = ("ResnetDownsampleBlock2D",) * 4,
        decoder_downsample_padding: int = 1,
        decoder_in_channels: int = 7,
        decoder_layers_per_block: int = 3,
        decoder_norm_eps: float = 1e-05,
        decoder_norm_num_groups: int = 32,
        decoder_num_train_timesteps: int = 1024,
        decoder_out_channels: int = 6,
        decoder_resnet_time_scale_shift: str = "scale_shift",
        decoder_time_embedding_type: str = "learned",
        decoder_up_block_types: Tuple[str, ...] = ("ResnetUpsampleBlock2D",) * 4,
    ):
        super().__init__()
        self.encoder = Encoder(
            act_fn=encoder_act_fn,
            block_out_channels=encoder_block_out_channels,
            double_z=encoder_double_z,
            down_block_types=encoder_down_block_types,
            in_channels=encoder_in_channels,
            layers_per_block=encoder_layers_per_block,
            norm_num_groups=encoder_norm_num_groups,
            out_channels=encoder_out_channels,
        )
        self.decoder_unet = UNet2DModel(
            add_attention=decoder_add_attention,
            block_out_channels=decoder_block_out_channels,
            down_block_types=decoder_down_block_types,
            downsample_padding=decoder_downsample_padding,
            in_channels=decoder_in_channels,
            layers_per_block=decoder_layers_per_block,
            norm_eps=decoder_norm_eps,
            norm_num_groups=decoder_norm_num_groups,
            num_train_timesteps=decoder_num_train_timesteps,
            out_channels=decoder_out_channels,
            resnet_time_scale_shift=decoder_resnet_time_scale_shift,
            time_embedding_type=decoder_time_embedding_type,
            up_block_types=decoder_up_block_types,
        )
        self.decoder_scheduler = ConsistencyDecoderScheduler()
        self.quant_conv = Conv2d(2 * latent_channels, 2 * latent_channels, kernel_size=1)
        # fixed latent stats (reference buffers `means`/`stds`, not persisted)
        self._means = np.array([0.38862467, 0.02253063, 0.07381133, -0.0171294], np.float32)
        self._stds = np.array([0.9654121, 1.0440036, 0.76147926, 0.77022034], np.float32)
        self.register_to_config(block_out_channels=encoder_block_out_channels, force_upcast=False)

    # ------------------------------------------------------------------ api
    def encode(self, params: Params, x: jax.Array, return_dict: bool = True):
        """x: [B, C, H, W] in [-1, 1] → posterior over NCHW moments."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder(params["encoder"], h)
        h = self.quant_conv(params["quant_conv"], h)
        moments = jnp.transpose(h, (0, 3, 1, 2))
        posterior = DiagonalGaussianDistribution(moments)
        if not return_dict:
            return (posterior,)
        return ConsistencyDecoderVAEOutput(latent_dist=posterior)

    def decode(
        self,
        params: Params,
        z: jax.Array,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
        num_inference_steps: int = 2,
        initial_noise: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
    ):
        """2-step consistency decode (reference `decode`, `:233-260`).

        `initial_noise` / `variance_noise` ([steps, B, 3, H, W]) override the
        PRNG draws — the functional analogue of the reference's `generator`
        argument, used by parity tests to pin noise across frameworks."""
        if key is None:
            key = jax.random.PRNGKey(0)
        means = self._means[None, :, None, None].astype(z.dtype)
        stds = self._stds[None, :, None, None].astype(z.dtype)
        z = (z * self.config.scaling_factor - means) / stds

        scale_factor = 2 ** (len(self.config.block_out_channels) - 1)
        b, c, h, w = z.shape
        z = jnp.repeat(jnp.repeat(z, scale_factor, axis=2), scale_factor, axis=3)  # nearest

        scheduler = self.decoder_scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        key, noise_key = jax.random.split(key)
        if initial_noise is None:
            initial_noise = randn_tensor(
                (b, 3, h * scale_factor, w * scale_factor), key=noise_key, dtype=z.dtype
            )
        x_t = state.init_noise_sigma.astype(z.dtype) * initial_noise

        n_steps = int(state.timesteps.shape[0])
        if variance_noise is None:
            step_keys = jax.random.split(key, n_steps)
            variance_noise = jax.vmap(
                lambda k: randn_tensor(x_t.shape, key=k, dtype=x_t.dtype)
            )(step_keys)

        def step_fn(x_t, xs):
            t, noise = xs
            model_input = jnp.concatenate([scheduler.scale_model_input(state, x_t, t), z], axis=1)
            model_output = self.decoder_unet(
                params["decoder_unet"], model_input, t
            ).sample[:, :3, :, :]
            out = scheduler.step(state, model_output, t, x_t, variance_noise=noise)
            return out.prev_sample, None

        x_0, _ = jax.lax.scan(step_fn, x_t, (state.timesteps, variance_noise))
        if not return_dict:
            return (x_0,)
        return DecoderOutput(sample=x_0)

    def __call__(
        self,
        params: Params,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        sample_posterior: bool = False,
        return_dict: bool = True,
    ):
        posterior = self.encode(params, sample).latent_dist
        if sample_posterior:
            if key is None:
                raise ValueError("sample_posterior=True needs a PRNG key")
            key, sample_key = jax.random.split(key)
            z = posterior.sample(sample_key)
        else:
            z = posterior.mode()
        return self.decode(params, z, key=key, return_dict=return_dict)
