"""SD3 modular block pack.

TPU-native counterpart of the reference SD3 modular blocks
(`/root/reference/src/diffusers/modular_pipelines/` sd3 pack): text-encode
(dual CLIP + optional T5) → prepare latents → set flow-match timesteps →
CFG denoise as ONE lax.scan → decode. The math mirrors the monolithic
`pipelines/stable_diffusion_3/pipeline_stable_diffusion_3.py`, so the
modular graph matches the pipeline output for the same key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.jax_utils import randn_tensor
from ..modular_pipeline import (
    InputParam,
    ModularPipelineBlocks,
    OutputParam,
    PipelineState,
    SequentialPipelineBlocks,
)


class SD3TextEncoderStep(ModularPipelineBlocks):
    """prompt/negative → joint [neg‖pos] sequence embeds + pooled (reference
    sd3 encoders; mirrors StableDiffusion3Pipeline.encode_prompt)."""

    inputs = [
        InputParam("prompt", required=True),
        InputParam("negative_prompt", default=None),
        InputParam("guidance_scale", default=7.0),
        InputParam("max_sequence_length", default=256),
    ]
    intermediate_outputs = [
        OutputParam("prompt_embeds"), OutputParam("pooled"), OutputParam("do_cfg"),
    ]
    expected_components = ["text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        from ...pipelines.stable_diffusion_3.pipeline_stable_diffusion_3 import (
            StableDiffusion3Pipeline,
        )

        do_cfg = float(b.guidance_scale) > 1.0
        # reuse the monolithic pipeline's encode logic via a shim carrying the
        # same component attributes (single source of truth for the encoding)
        shim = StableDiffusion3Pipeline.__new__(StableDiffusion3Pipeline)
        shim.text_encoder = components.text_encoder
        shim.text_encoder_2 = components.text_encoder_2
        shim.text_encoder_3 = getattr(components, "text_encoder_3", None)
        shim.tokenizer = components.tokenizer
        shim.tokenizer_2 = components.tokenizer_2
        shim.tokenizer_3 = getattr(components, "tokenizer_3", None)
        shim.transformer = components.transformer
        pe, ne, pooled, npl = shim.encode_prompt(
            b.prompt, negative_prompt=b.negative_prompt, do_cfg=do_cfg,
            max_sequence_length=b.max_sequence_length,
        )
        if do_cfg:
            pe = jnp.concatenate([ne, pe], axis=0)
            pooled = jnp.concatenate([npl, pooled], axis=0)
        b.prompt_embeds, b.pooled, b.do_cfg = pe, pooled, do_cfg
        self.set_block_state(state, b)
        return state


class SD3PrepareLatentsStep(ModularPipelineBlocks):
    inputs = [
        InputParam("height", default=None), InputParam("width", default=None),
        InputParam("key", default=None), InputParam("latents", default=None),
    ]
    intermediate_inputs = [InputParam("prompt_embeds", required=True), InputParam("do_cfg", required=True)]
    intermediate_outputs = [OutputParam("latents"), OutputParam("height"), OutputParam("width")]
    expected_components = ["transformer", "vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        transformer = components.transformer[0]
        vsf = 2 ** (len(components.vae[0].config.block_out_channels) - 1)
        b.height = b.height or transformer.config.sample_size * vsf
        b.width = b.width or transformer.config.sample_size * vsf
        batch = b.prompt_embeds.shape[0] // (2 if b.do_cfg else 1)
        if b.latents is None:
            key = b.key if b.key is not None else jax.random.PRNGKey(0)
            b.latents = randn_tensor(
                (batch, transformer.config.in_channels, b.height // vsf, b.width // vsf), key=key)
        self.set_block_state(state, b)
        return state


class SD3SetTimestepsStep(ModularPipelineBlocks):
    inputs = [InputParam("num_inference_steps", default=28)]
    intermediate_outputs = [OutputParam("scheduler_state")]
    expected_components = ["scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        b.scheduler_state = components.scheduler.set_timesteps(b.num_inference_steps)
        self.set_block_state(state, b)
        return state


class SD3DenoiseLoopStep(ModularPipelineBlocks):
    inputs = [InputParam("guidance_scale", default=7.0)]
    intermediate_inputs = [
        InputParam("latents", required=True), InputParam("prompt_embeds", required=True),
        InputParam("pooled", required=True), InputParam("scheduler_state", required=True),
        InputParam("do_cfg", required=True),
    ]
    intermediate_outputs = [OutputParam("latents")]
    expected_components = ["transformer", "scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        transformer, t_params = components.transformer
        scheduler = components.scheduler
        do_cfg, gs = bool(b.do_cfg), float(b.guidance_scale)

        def step(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(t_params, latent_input, b.prompt_embeds, b.pooled, timestep).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + gs * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        def run(latents, sstate, prompt_embeds, pooled):
            (latents, _), _ = jax.lax.scan(step, (latents, sstate), sstate.timesteps)
            return latents

        b.latents = jax.jit(run)(b.latents, b.scheduler_state, b.prompt_embeds, b.pooled)
        self.set_block_state(state, b)
        return state


class SD3DecodeStep(ModularPipelineBlocks):
    inputs = [InputParam("output_type", default="np")]
    intermediate_inputs = [InputParam("latents", required=True)]
    intermediate_outputs = [OutputParam("images")]
    expected_components = ["vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        vae, vae_params = components.vae
        if b.output_type == "latent":
            b.images = b.latents
            self.set_block_state(state, b)
            return state

        def decode(p, z):
            z = z / vae.config.scaling_factor
            if vae.config.get("shift_factor") is not None:
                z = z + vae.config.shift_factor
            return vae.decode(p, z).sample

        image = jax.jit(decode)(vae_params, b.latents)
        from ...image_processor import VaeImageProcessor

        b.images = VaeImageProcessor().postprocess(image, output_type=b.output_type)
        self.set_block_state(state, b)
        return state


class SD3ModularBlocks(SequentialPipelineBlocks):
    block_classes = [SD3TextEncoderStep, SD3PrepareLatentsStep, SD3SetTimestepsStep,
                     SD3DenoiseLoopStep, SD3DecodeStep]
    block_names = ["text_encoder", "prepare_latents", "set_timesteps", "denoise", "decode"]


SD3_BLOCKS = SD3ModularBlocks
