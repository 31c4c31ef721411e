"""Stable Diffusion modular block pack.

TPU-native counterpart of the reference's per-model block packs
(`/root/reference/src/diffusers/modular_pipelines/stable_diffusion_xl/` —
encoder / before-denoise / denoise / decode step blocks). The denoise block
is a LoopSequentialPipelineBlocks whose iteration compiles to one lax.scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.jax_utils import randn_tensor
from ..modular_pipeline import (
    InputParam,
    LoopSequentialPipelineBlocks,
    ModularPipelineBlocks,
    OutputParam,
    PipelineState,
    SequentialPipelineBlocks,
)


class StableDiffusionTextEncoderBlock(ModularPipelineBlocks):
    """prompt (+ negative) → CFG-stacked [2B|B, 77, D] embeddings."""

    inputs = [
        InputParam("prompt", required=True),
        InputParam("negative_prompt", default=""),
        InputParam("guidance_scale", default=7.5),
    ]
    intermediate_outputs = [OutputParam("prompt_embeds"), OutputParam("do_cfg")]
    expected_components = ["text_encoder", "tokenizer"]

    def _encode(self, components, texts):
        encoder, params = components.text_encoder
        inputs = components.tokenizer(
            texts, padding="max_length", max_length=77, truncation=True, return_tensors="np"
        )
        return encoder(params, jnp.asarray(inputs.input_ids)).last_hidden_state

    def __call__(self, components, state: PipelineState) -> PipelineState:
        block_state = self.get_block_state(state)
        prompt = block_state.prompt
        if isinstance(prompt, str):
            prompt = [prompt]
        do_cfg = block_state.guidance_scale > 1.0
        embeds = self._encode(components, prompt)
        if do_cfg:
            negative = block_state.negative_prompt or ""
            if isinstance(negative, str):
                negative = [negative] * len(prompt)
            embeds = jnp.concatenate([self._encode(components, negative), embeds], axis=0)
        block_state.prompt_embeds = embeds
        block_state.do_cfg = do_cfg
        self.set_block_state(state, block_state)
        return state


class StableDiffusionPrepareLatentsBlock(ModularPipelineBlocks):
    inputs = [
        InputParam("height", default=512),
        InputParam("width", default=512),
        InputParam("num_inference_steps", default=50),
        InputParam("key", default=None),
        InputParam("latents", default=None),
    ]
    intermediate_inputs = [InputParam("prompt_embeds", required=True), InputParam("do_cfg", required=True)]
    intermediate_outputs = [OutputParam("latents"), OutputParam("scheduler_state"), OutputParam("batch_size")]
    expected_components = ["unet", "vae", "scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        unet = components.unet[0]
        scheduler = components.scheduler
        vsf = 2 ** (len(components.vae[0].config.block_out_channels) - 1)
        batch_size = b.prompt_embeds.shape[0] // (2 if b.do_cfg else 1)
        sstate = scheduler.set_timesteps(b.num_inference_steps)
        if b.latents is None:
            key = b.key if b.key is not None else jax.random.PRNGKey(0)
            shape = (batch_size, unet.config.in_channels, b.height // vsf, b.width // vsf)
            b.latents = randn_tensor(shape, key=key)
        b.latents = b.latents * sstate.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            sstate = scheduler.prepare(sstate, b.latents)
        b.scheduler_state = sstate
        b.batch_size = batch_size
        self.set_block_state(state, b)
        return state


class StableDiffusionDenoiseLoopBlock(LoopSequentialPipelineBlocks):
    """One lax.scan over timesteps: CFG batch-2 UNet forward + scheduler step."""

    inputs = [InputParam("guidance_scale", default=7.5)]
    intermediate_inputs = [
        InputParam("latents", required=True),
        InputParam("prompt_embeds", required=True),
        InputParam("scheduler_state", required=True),
        InputParam("do_cfg", required=True),
    ]
    intermediate_outputs = [OutputParam("latents")]
    expected_components = ["unet", "scheduler"]

    def loop_carry(self, components, state):
        b = self.get_block_state(state)
        return (b.latents, b.scheduler_state)

    def loop_xs(self, components, state):
        return self.get_block_state(state).scheduler_state.timesteps

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        unet, unet_params = components.unet
        scheduler = components.scheduler
        do_cfg = bool(b.do_cfg)
        guidance_scale = float(b.guidance_scale)

        def step(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=b.prompt_embeds,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        def run(latents, sstate, prompt_embeds):
            (latents, _), _ = jax.lax.scan(step, (latents, sstate), sstate.timesteps)
            return latents

        b.latents = jax.jit(run)(b.latents, b.scheduler_state, b.prompt_embeds)
        self.set_block_state(state, b)
        return state


class StableDiffusionDecodeBlock(ModularPipelineBlocks):
    inputs = [InputParam("output_type", default="np")]
    intermediate_inputs = [InputParam("latents", required=True)]
    intermediate_outputs = [OutputParam("images")]
    expected_components = ["vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        vae, vae_params = components.vae
        if b.output_type == "latent":
            b.images = b.latents
        else:
            image = jax.jit(lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)(
                vae_params, b.latents
            )
            from ...image_processor import VaeImageProcessor

            b.images = VaeImageProcessor().postprocess(image, output_type=b.output_type)
        self.set_block_state(state, b)
        return state


class StableDiffusionModularBlocks(SequentialPipelineBlocks):
    block_classes = [
        StableDiffusionTextEncoderBlock,
        StableDiffusionPrepareLatentsBlock,
        StableDiffusionDenoiseLoopBlock,
        StableDiffusionDecodeBlock,
    ]
    block_names = ["text_encoder", "prepare_latents", "denoise", "decode"]


SD_BLOCKS = StableDiffusionModularBlocks
