"""Flux modular block pack.

TPU-native counterpart of the reference Flux modular blocks
(`/root/reference/src/diffusers/modular_pipelines/flux/`: encoders.py
`FluxTextEncoderStep`, before_denoise.py `FluxSetTimestepsStep`/
`FluxPrepareLatentsStep`/`FluxRoPEInputsStep`, denoise.py `FluxDenoiseStep`,
decoders.py `FluxDecodeStep`, composed in modular_blocks_flux.py
`FluxAutoBlocks`). The denoise math mirrors the monolithic
`pipelines/flux/pipeline_flux.py` (packed 2x2 latents, resolution-shifted
flow-match schedule, guidance-distilled conditioning — no CFG batch), so
the modular graph matches the monolithic pipeline for the same key.
"""

from __future__ import annotations

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


class FluxTextEncoderStep(ModularPipelineBlocks):
    """prompt → pooled CLIP embeds + T5 sequence embeds + txt rope ids
    (reference encoders.py FluxTextEncoderStep)."""

    inputs = [
        InputParam("prompt", required=True),
        InputParam("prompt_2", default=None),
        InputParam("max_sequence_length", default=512),
    ]
    intermediate_outputs = [
        OutputParam("prompt_embeds"), OutputParam("pooled_prompt_embeds"), OutputParam("txt_ids"),
    ]
    expected_components = ["text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        prompt = [b.prompt] if isinstance(b.prompt, str) else list(b.prompt)
        prompt_2 = b.prompt_2 or prompt
        prompt_2 = [prompt_2] if isinstance(prompt_2, str) else list(prompt_2)

        clip, clip_params = components.text_encoder
        t5, t5_params = components.text_encoder_2
        clip_ids = jnp.asarray(components.tokenizer(
            prompt, padding="max_length", max_length=77, truncation=True, return_tensors="np"
        ).input_ids)
        t5_ids = jnp.asarray(components.tokenizer_2(
            prompt_2, padding="max_length", max_length=b.max_sequence_length, truncation=True,
            return_tensors="np",
        ).input_ids)

        def _encode(clip_params, t5_params, clip_ids, t5_ids):
            pooled = clip(clip_params, clip_ids).pooler_output
            seq = t5(t5_params, t5_ids).last_hidden_state
            return seq, pooled

        b.prompt_embeds, b.pooled_prompt_embeds = jax.jit(_encode)(
            clip_params, t5_params, clip_ids, t5_ids
        )
        b.txt_ids = np.zeros((b.prompt_embeds.shape[1], 3), dtype=np.float32)
        self.set_block_state(state, b)
        return state


class FluxPrepareLatentsStep(ModularPipelineBlocks):
    """Sample + pack 2x2 latents, build image rope ids (reference
    before_denoise.py FluxPrepareLatentsStep + FluxRoPEInputsStep)."""

    inputs = [
        InputParam("height", default=None),
        InputParam("width", default=None),
        InputParam("key", default=None),
        InputParam("latents", default=None),
    ]
    intermediate_inputs = [InputParam("prompt_embeds", required=True), InputParam("txt_ids", required=True)]
    intermediate_outputs = [
        OutputParam("latents"), OutputParam("rope_cos"), OutputParam("rope_sin"),
        OutputParam("height"), OutputParam("width"),
    ]
    expected_components = ["transformer", "vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        transformer = components.transformer[0]
        vsf = 2 ** (len(components.vae[0].config.block_out_channels) - 1)
        # monolithic FluxPipeline hardcodes default_sample_size=128
        b.height = b.height or 128 * vsf
        b.width = b.width or 128 * vsf
        batch = b.prompt_embeds.shape[0]
        c = transformer.config.in_channels // 4
        lh = 2 * (b.height // (vsf * 2))
        lw = 2 * (b.width // (vsf * 2))
        if b.latents is None:
            key = b.key if b.key is not None else jax.random.PRNGKey(0)
            lat = randn_tensor((batch, c, lh, lw), key=key)
            lat = lat.reshape(batch, c, lh // 2, 2, lw // 2, 2)
            lat = jnp.transpose(lat, (0, 2, 4, 1, 3, 5))
            b.latents = lat.reshape(batch, (lh // 2) * (lw // 2), c * 4)
        img_ids = np.zeros((lh // 2, lw // 2, 3), dtype=np.float32)
        img_ids[..., 1] += np.arange(lh // 2)[:, None]
        img_ids[..., 2] += np.arange(lw // 2)[None, :]
        ids = np.concatenate([b.txt_ids, img_ids.reshape(-1, 3)], axis=0)
        cos, sin = transformer.pos_embed({}, ids)
        b.rope_cos, b.rope_sin = jnp.asarray(cos), jnp.asarray(sin)
        self.set_block_state(state, b)
        return state


class FluxSetTimestepsStep(ModularPipelineBlocks):
    """Resolution-shifted flow-match sigmas (reference before_denoise.py
    FluxSetTimestepsStep with calculate_shift)."""

    inputs = [InputParam("num_inference_steps", default=28)]
    intermediate_inputs = [InputParam("latents", required=True)]
    intermediate_outputs = [OutputParam("scheduler_state")]
    expected_components = ["scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        scheduler = components.scheduler
        from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift

        sigmas = np.linspace(1.0, 1.0 / b.num_inference_steps, b.num_inference_steps)
        if scheduler.config.use_dynamic_shifting:
            mu = calculate_shift(
                b.latents.shape[1],
                scheduler.config.get("base_image_seq_len", 256),
                scheduler.config.get("max_image_seq_len", 4096),
                scheduler.config.get("base_shift", 0.5),
                scheduler.config.get("max_shift", 1.15),
            )
            b.scheduler_state = scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            b.scheduler_state = scheduler.set_timesteps(b.num_inference_steps)
        self.set_block_state(state, b)
        return state


class FluxBeforeDenoiseStep(SequentialPipelineBlocks):
    block_classes = [FluxPrepareLatentsStep, FluxSetTimestepsStep]
    block_names = ["prepare_latents", "set_timesteps"]


class FluxDenoiseLoopStep(LoopSequentialPipelineBlocks):
    """Guidance-distilled forward + flow step, ONE lax.scan (reference
    denoise.py FluxDenoiseStep)."""

    inputs = [InputParam("guidance_scale", default=3.5)]
    intermediate_inputs = [
        InputParam("latents", required=True),
        InputParam("prompt_embeds", required=True),
        InputParam("pooled_prompt_embeds", required=True),
        InputParam("rope_cos", required=True),
        InputParam("rope_sin", required=True),
        InputParam("scheduler_state", required=True),
    ]
    intermediate_outputs = [OutputParam("latents")]
    expected_components = ["transformer", "scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        transformer, t_params = components.transformer
        scheduler = components.scheduler
        guidance = None
        if transformer.config.guidance_embeds:
            guidance = jnp.full((b.latents.shape[0],), float(b.guidance_scale), dtype=jnp.float32)

        def step(carry, t):
            latents, sstate = carry
            timestep = jnp.broadcast_to(t, (latents.shape[0],)) / 1000.0
            noise_pred = transformer(
                t_params, latents,
                encoder_hidden_states=b.prompt_embeds,
                pooled_projections=b.pooled_prompt_embeds,
                timestep=timestep, guidance=guidance,
                image_rotary_emb=(b.rope_cos, b.rope_sin),
            ).sample
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        def run(latents, sstate, prompt_embeds, pooled, rope_cos, rope_sin):
            (latents, _), _ = jax.lax.scan(step, (latents, sstate), sstate.timesteps)
            return latents

        b.latents = jax.jit(run)(
            b.latents, b.scheduler_state, b.prompt_embeds, b.pooled_prompt_embeds,
            b.rope_cos, b.rope_sin,
        )
        self.set_block_state(state, b)
        return state


class FluxDecodeStep(ModularPipelineBlocks):
    inputs = [InputParam("output_type", default="np")]
    intermediate_inputs = [
        InputParam("latents", required=True),
        InputParam("height", required=True),
        InputParam("width", required=True),
    ]
    intermediate_outputs = [OutputParam("images")]
    expected_components = ["vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        vae, vae_params = components.vae
        if b.output_type == "latent":
            b.images = b.latents
            self.set_block_state(state, b)
            return state
        vsf = 2 ** (len(vae.config.block_out_channels) - 1)
        bsz, num_patches, channels = b.latents.shape
        lh = 2 * (int(b.height) // (vsf * 2))
        lw = 2 * (int(b.width) // (vsf * 2))
        lat = b.latents.reshape(bsz, lh // 2, lw // 2, channels // 4, 2, 2)
        lat = jnp.transpose(lat, (0, 3, 1, 4, 2, 5)).reshape(bsz, channels // 4, lh, lw)

        def decode(p, z):
            z = z / vae.config.scaling_factor
            if vae.config.get("shift_factor") is not None:
                z = z + vae.config.shift_factor
            return vae.decode(p, z).sample

        image = jax.jit(decode)(vae_params, lat)
        from ...image_processor import VaeImageProcessor

        b.images = VaeImageProcessor().postprocess(image, output_type=b.output_type)
        self.set_block_state(state, b)
        return state


class FluxModularBlocks(SequentialPipelineBlocks):
    block_classes = [
        FluxTextEncoderStep,
        FluxBeforeDenoiseStep,
        FluxDenoiseLoopStep,
        FluxDecodeStep,
    ]
    block_names = ["text_encoder", "before_denoise", "denoise", "decode"]


FLUX_BLOCKS = FluxModularBlocks
