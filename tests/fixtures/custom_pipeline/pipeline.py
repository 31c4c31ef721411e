"""Custom local pipeline fixture — jax mirror of the reference's
`tests/fixtures/custom_pipeline/pipeline.py` (CustomLocalPipeline): a DDPM-style
unconditional pipeline that additionally returns a marker string proving the
CUSTOM class (not the library one) ran."""

import jax
import jax.numpy as jnp

from diffusers_tpu import DiffusionPipeline
from diffusers_tpu.utils.jax_utils import randn_tensor


class CustomLocalPipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler)

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 2,
                 key=None, output_type: str = "np", return_dict: bool = True):
        unet, unet_params = self.unet
        if key is None:
            key = jax.random.PRNGKey(0)
        sample_size = unet.config.sample_size
        latents = randn_tensor(
            (batch_size, unet.config.in_channels, sample_size, sample_size), key=key
        )
        state = self.scheduler.set_timesteps(num_inference_steps)

        def step_fn(carry, t):
            lat, sstate = carry
            noise_pred = unet(unet_params, lat, jnp.broadcast_to(t, (lat.shape[0],))).sample
            out = self.scheduler.step(sstate, noise_pred, t, lat)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        image = (latents / 2 + 0.5).clip(0, 1).transpose(0, 2, 3, 1)
        return (image, "This is a local test")
