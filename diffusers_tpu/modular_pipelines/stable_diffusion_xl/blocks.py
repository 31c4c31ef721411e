"""SDXL modular block pack.

TPU-native counterpart of the reference's SDXL modular blocks
(`/root/reference/src/diffusers/modular_pipelines/stable_diffusion_xl/`:
encoders.py `StableDiffusionXLTextEncoderStep`, before_denoise.py
`StableDiffusionXLInputStep`/`SetTimestepsStep`/`PrepareLatentsStep`/
`PrepareAdditionalConditioningStep`, denoise.py `StableDiffusionXLDenoiseStep`,
decoders.py `StableDiffusionXLDecodeStep`, composed in
modular_blocks_stable_diffusion_xl.py). Same composition granularity —
before_denoise is itself a SequentialPipelineBlocks of three sub-steps — but
every block is a pure function over the functional PipelineState, the text
towers compile into one jit, and the denoise loop is ONE `jax.lax.scan`.

The denoise math mirrors the monolithic
`pipelines/stable_diffusion_xl/pipeline_stable_diffusion_xl.py` exactly
(same CFG batch-2 stacking, scale_model_input, added_cond_kwargs), so the
modular graph's output matches the monolithic pipeline's for the same key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from ..modular_pipeline import (
    InputParam,
    LoopSequentialPipelineBlocks,
    ModularPipelineBlocks,
    OutputParam,
    PipelineState,
    SequentialPipelineBlocks,
)


class StableDiffusionXLTextEncoderStep(ModularPipelineBlocks):
    """prompt (+negative) → concat dual-tower embeds + pooled (reference
    encoders.py StableDiffusionXLTextEncoderStep)."""

    inputs = [
        InputParam("prompt", required=True),
        InputParam("negative_prompt", default=None),
        InputParam("guidance_scale", default=5.0),
        InputParam("force_zeros_for_empty_prompt", default=True),
    ]
    intermediate_outputs = [
        OutputParam("prompt_embeds"), OutputParam("negative_prompt_embeds"),
        OutputParam("pooled_prompt_embeds"), OutputParam("negative_pooled_prompt_embeds"),
        OutputParam("do_cfg"),
    ]
    expected_components = ["text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2"]

    def _encode(self, components, texts):
        towers = [
            (components.text_encoder, components.tokenizer),
            (components.text_encoder_2, components.tokenizer_2),
        ]
        ids, params, encs = {}, {}, {}
        for idx, ((enc, enc_params), tok) in enumerate(towers):
            inputs = tok(texts, padding="max_length", max_length=77, truncation=True, return_tensors="np")
            ids[str(idx)] = jnp.asarray(inputs.input_ids)
            params[str(idx)] = enc_params
            encs[str(idx)] = enc

        def _towers(params, ids):
            embeds, pooled = [], None
            for idx, enc in encs.items():
                out = enc(params[idx], ids[idx], output_hidden_states=True)
                pl = out.text_embeds if getattr(out, "text_embeds", None) is not None else out.pooler_output
                embeds.append(out.hidden_states[-2])
                pooled = pl
            return jnp.concatenate(embeds, axis=-1), pooled

        return jax.jit(_towers)(params, ids)

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        prompt = [b.prompt] if isinstance(b.prompt, str) else list(b.prompt)
        b.do_cfg = b.guidance_scale > 1.0
        b.prompt_embeds, b.pooled_prompt_embeds = self._encode(components, prompt)
        b.negative_prompt_embeds = b.negative_pooled_prompt_embeds = None
        if b.do_cfg:
            if b.negative_prompt is None and b.force_zeros_for_empty_prompt:
                b.negative_prompt_embeds = jnp.zeros_like(b.prompt_embeds)
                b.negative_pooled_prompt_embeds = jnp.zeros_like(b.pooled_prompt_embeds)
            else:
                neg = b.negative_prompt or ""
                neg = [neg] * len(prompt) if isinstance(neg, str) else list(neg)
                b.negative_prompt_embeds, b.negative_pooled_prompt_embeds = self._encode(components, neg)
        self.set_block_state(state, b)
        return state


class StableDiffusionXLSetTimestepsStep(ModularPipelineBlocks):
    inputs = [InputParam("num_inference_steps", default=50)]
    intermediate_outputs = [OutputParam("scheduler_state")]
    expected_components = ["scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        b.scheduler_state = components.scheduler.set_timesteps(b.num_inference_steps)
        self.set_block_state(state, b)
        return state


class StableDiffusionXLPrepareLatentsStep(ModularPipelineBlocks):
    inputs = [
        InputParam("height", default=None),
        InputParam("width", default=None),
        InputParam("key", default=None),
        InputParam("latents", default=None),
    ]
    intermediate_inputs = [
        InputParam("prompt_embeds", required=True),
        InputParam("do_cfg", required=True),
        InputParam("scheduler_state", required=True),
    ]
    intermediate_outputs = [OutputParam("latents"), OutputParam("height"), OutputParam("width")]
    expected_components = ["unet", "vae", "scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        unet = components.unet[0]
        vsf = 2 ** (len(components.vae[0].config.block_out_channels) - 1)
        b.height = b.height or unet.config.sample_size * vsf
        b.width = b.width or unet.config.sample_size * vsf
        batch = b.prompt_embeds.shape[0]
        if b.latents is None:
            key = b.key if b.key is not None else jax.random.PRNGKey(0)
            shape = (batch, unet.config.in_channels, b.height // vsf, b.width // vsf)
            b.latents = randn_tensor(shape, key=key)
        b.latents = b.latents * b.scheduler_state.init_noise_sigma
        scheduler = components.scheduler
        if hasattr(scheduler, "prepare"):
            b.scheduler_state = scheduler.prepare(b.scheduler_state, b.latents)
            state.set("scheduler_state", b.scheduler_state)
        self.set_block_state(state, b)
        return state


class StableDiffusionXLPrepareAdditionalConditioningStep(ModularPipelineBlocks):
    """Micro-conditioning time_ids + CFG stacking (reference before_denoise.py
    StableDiffusionXLPrepareAdditionalConditioningStep)."""

    inputs = [
        InputParam("original_size", default=None),
        InputParam("target_size", default=None),
        InputParam("crops_coords_top_left", default=(0, 0)),
    ]
    intermediate_inputs = [
        InputParam("prompt_embeds", required=True),
        InputParam("negative_prompt_embeds"),
        InputParam("pooled_prompt_embeds", required=True),
        InputParam("negative_pooled_prompt_embeds"),
        InputParam("do_cfg", required=True),
        InputParam("height", required=True),
        InputParam("width", required=True),
    ]
    intermediate_outputs = [
        OutputParam("prompt_embeds"), OutputParam("add_text_embeds"), OutputParam("add_time_ids"),
    ]
    expected_components = []

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        batch = b.prompt_embeds.shape[0]
        original = b.original_size or (b.height, b.width)
        target = b.target_size or (b.height, b.width)
        time_ids = jnp.asarray([list(original + tuple(b.crops_coords_top_left) + target)] * batch,
                               dtype=jnp.float32)
        if b.do_cfg:
            b.prompt_embeds = jnp.concatenate([b.negative_prompt_embeds, b.prompt_embeds], axis=0)
            b.add_text_embeds = jnp.concatenate(
                [b.negative_pooled_prompt_embeds, b.pooled_prompt_embeds], axis=0
            )
            b.add_time_ids = jnp.concatenate([time_ids, time_ids], axis=0)
        else:
            b.add_text_embeds = b.pooled_prompt_embeds
            b.add_time_ids = time_ids
        self.set_block_state(state, b)
        return state


class StableDiffusionXLBeforeDenoiseStep(SequentialPipelineBlocks):
    """set_timesteps → prepare_latents → additional conditioning (reference
    modular_blocks_stable_diffusion_xl.py StableDiffusionXLBeforeDenoiseStep)."""

    block_classes = [
        StableDiffusionXLSetTimestepsStep,
        StableDiffusionXLPrepareLatentsStep,
        StableDiffusionXLPrepareAdditionalConditioningStep,
    ]
    block_names = ["set_timesteps", "prepare_latents", "prepare_add_cond"]


class StableDiffusionXLDenoiseLoopStep(LoopSequentialPipelineBlocks):
    """CFG batch-2 UNet forward + scheduler step, ONE lax.scan (reference
    denoise.py StableDiffusionXLDenoiseStep; here jitted as one program)."""

    inputs = [InputParam("guidance_scale", default=5.0)]
    intermediate_inputs = [
        InputParam("latents", required=True),
        InputParam("prompt_embeds", required=True),
        InputParam("add_text_embeds", required=True),
        InputParam("add_time_ids", required=True),
        InputParam("scheduler_state", required=True),
        InputParam("do_cfg", required=True),
    ]
    intermediate_outputs = [OutputParam("latents")]
    expected_components = ["unet", "scheduler"]

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
                added_cond_kwargs={"text_embeds": b.add_text_embeds, "time_ids": b.add_time_ids},
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        def run(latents, sstate, prompt_embeds, add_text_embeds, add_time_ids):
            (latents, _), _ = jax.lax.scan(step, (latents, sstate), sstate.timesteps)
            return latents

        b.latents = jax.jit(run)(
            b.latents, b.scheduler_state, b.prompt_embeds, b.add_text_embeds, b.add_time_ids
        )
        self.set_block_state(state, b)
        return state


class StableDiffusionXLDecodeStep(ModularPipelineBlocks):
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


class StableDiffusionXLModularBlocks(SequentialPipelineBlocks):
    block_classes = [
        StableDiffusionXLTextEncoderStep,
        StableDiffusionXLBeforeDenoiseStep,
        StableDiffusionXLDenoiseLoopStep,
        StableDiffusionXLDecodeStep,
    ]
    block_names = ["text_encoder", "before_denoise", "denoise", "decode"]


SDXL_BLOCKS = StableDiffusionXLModularBlocks
