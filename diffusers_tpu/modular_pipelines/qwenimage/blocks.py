"""QwenImage modular block pack.

TPU-native counterpart of the reference QwenImage modular blocks
(`/root/reference/src/diffusers/modular_pipelines/qwenimage/`): Qwen2.5-VL
templated text encode → packed-2x2 latents → resolution-shifted flow-match
timesteps → true-CFG denoise as ONE lax.scan → Wan-family VAE decode. Math
mirrors the monolithic `pipelines/qwenimage/pipeline_qwenimage.py`.
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


def _shim(components):
    from ...pipelines.qwenimage.pipeline_qwenimage import QwenImagePipeline

    shim = QwenImagePipeline.__new__(QwenImagePipeline)
    shim.text_encoder = components.text_encoder
    shim.tokenizer = components.tokenizer
    shim.transformer = components.transformer
    shim.vae = components.vae
    from ...pipelines.qwenimage.pipeline_qwenimage import PROMPT_TEMPLATE, PROMPT_TEMPLATE_START_IDX

    shim.prompt_template_encode = PROMPT_TEMPLATE
    shim.prompt_template_encode_start_idx = PROMPT_TEMPLATE_START_IDX
    shim.vae_scale_factor = components.vae[0].config.get("scale_factor_spatial", 8) \
        if hasattr(components.vae[0].config, "get") else 8
    from ...image_processor import VaeImageProcessor

    shim.image_processor = VaeImageProcessor(vae_scale_factor=shim.vae_scale_factor * 2)
    return shim


class QwenImageTextEncoderStep(ModularPipelineBlocks):
    inputs = [
        InputParam("prompt", required=True),
        InputParam("negative_prompt", default=None),
        InputParam("true_cfg_scale", default=4.0),
        InputParam("max_sequence_length", default=1024),
    ]
    intermediate_outputs = [
        OutputParam("prompt_embeds"), OutputParam("prompt_mask"), OutputParam("do_cfg"),
    ]
    expected_components = ["text_encoder", "tokenizer"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        do_cfg = float(b.true_cfg_scale) > 1.0
        shim = _shim(components)
        embeds, mask, neg_embeds, neg_mask = shim.encode_prompt(
            b.prompt, b.negative_prompt, do_cfg, b.max_sequence_length)
        if do_cfg:
            embeds = jnp.concatenate([neg_embeds, embeds], axis=0)
            mask = jnp.concatenate([neg_mask, mask], axis=0)
        b.prompt_embeds, b.prompt_mask, b.do_cfg = embeds, mask, do_cfg
        self.set_block_state(state, b)
        return state


class QwenImagePrepareLatentsStep(ModularPipelineBlocks):
    inputs = [
        InputParam("height", default=1024), InputParam("width", default=1024),
        InputParam("key", default=None), InputParam("latents", default=None),
    ]
    intermediate_inputs = [InputParam("prompt_embeds", required=True), InputParam("do_cfg", required=True)]
    intermediate_outputs = [OutputParam("latents"), OutputParam("img_shapes"),
                            OutputParam("height"), OutputParam("width")]
    expected_components = ["transformer", "vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        shim = _shim(components)
        transformer = components.transformer[0]
        vsf = shim.vae_scale_factor
        lh = 2 * (b.height // (vsf * 2))
        lw = 2 * (b.width // (vsf * 2))
        batch = b.prompt_embeds.shape[0] // (2 if b.do_cfg else 1)
        if b.latents is None:
            key = b.key if b.key is not None else jax.random.PRNGKey(0)
            # the monolithic pipeline splits before sampling — mirror for parity
            _, lat_key = jax.random.split(key)
            lat = randn_tensor((batch, transformer.config.in_channels // 4, lh, lw), key=lat_key)
            b.latents = shim._pack_latents(lat)
        b.img_shapes = ((1, lh // 2, lw // 2),)
        self.set_block_state(state, b)
        return state


class QwenImageSetTimestepsStep(ModularPipelineBlocks):
    inputs = [InputParam("num_inference_steps", default=50)]
    intermediate_inputs = [InputParam("latents", required=True)]
    intermediate_outputs = [OutputParam("scheduler_state")]
    expected_components = ["scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        scheduler = components.scheduler
        from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift

        sigmas = np.linspace(1.0, 1 / b.num_inference_steps, b.num_inference_steps)
        mu = calculate_shift(
            b.latents.shape[1],
            scheduler.config.get("base_image_seq_len", 256),
            scheduler.config.get("max_image_seq_len", 4096),
            scheduler.config.get("base_shift", 0.5),
            scheduler.config.get("max_shift", 1.15),
        )
        try:
            b.scheduler_state = scheduler.set_timesteps(b.num_inference_steps, sigmas=sigmas, mu=mu)
        except (TypeError, ValueError):
            b.scheduler_state = scheduler.set_timesteps(b.num_inference_steps)
        self.set_block_state(state, b)
        return state


class QwenImageDenoiseLoopStep(ModularPipelineBlocks):
    inputs = [InputParam("true_cfg_scale", default=4.0)]
    intermediate_inputs = [
        InputParam("latents", required=True), InputParam("prompt_embeds", required=True),
        InputParam("prompt_mask", required=True), InputParam("scheduler_state", required=True),
        InputParam("img_shapes", required=True), InputParam("do_cfg", required=True),
    ]
    intermediate_outputs = [OutputParam("latents")]
    expected_components = ["transformer", "scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        transformer, t_params = components.transformer
        scheduler = components.scheduler
        do_cfg, gs = bool(b.do_cfg), float(b.true_cfg_scale)
        img_shapes = tuple(b.img_shapes)

        def step(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],)) / 1000.0
            noise_pred = transformer(
                t_params, latent_input, b.prompt_embeds, b.prompt_mask, timestep,
                img_shapes=img_shapes).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + gs * (cond - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        def run(latents, sstate, pe, mask):
            (latents, _), _ = jax.lax.scan(step, (latents, sstate), sstate.timesteps)
            return latents

        b.latents = jax.jit(run)(b.latents, b.scheduler_state, b.prompt_embeds, b.prompt_mask)
        self.set_block_state(state, b)
        return state


class QwenImageDecodeStep(ModularPipelineBlocks):
    inputs = [InputParam("output_type", default="np")]
    intermediate_inputs = [
        InputParam("latents", required=True),
        InputParam("height", required=True), InputParam("width", required=True),
    ]
    intermediate_outputs = [OutputParam("images")]
    expected_components = ["vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        shim = _shim(components)
        b.images = shim._decode_packed_latents(b.latents, int(b.height), int(b.width), b.output_type)
        self.set_block_state(state, b)
        return state


class QwenImageModularBlocks(SequentialPipelineBlocks):
    block_classes = [QwenImageTextEncoderStep, QwenImagePrepareLatentsStep,
                     QwenImageSetTimestepsStep, QwenImageDenoiseLoopStep, QwenImageDecodeStep]
    block_names = ["text_encoder", "prepare_latents", "set_timesteps", "denoise", "decode"]


QWENIMAGE_BLOCKS = QwenImageModularBlocks
