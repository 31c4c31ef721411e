"""Wan modular block pack.

TPU-native counterpart of the reference Wan modular blocks
(`/root/reference/src/diffusers/modular_pipelines/wan/`): UMT5 text encode →
prepare video latents + RoPE → flow-match timesteps → two-forward CFG denoise
as ONE lax.scan → causal-VAE decode with per-channel latent statistics. Math
mirrors the monolithic `pipelines/wan/pipeline_wan.py`.
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


class WanTextEncoderStep(ModularPipelineBlocks):
    inputs = [
        InputParam("prompt", required=True),
        InputParam("negative_prompt", default=None),
        InputParam("guidance_scale", default=5.0),
        InputParam("max_sequence_length", default=226),
    ]
    intermediate_outputs = [
        OutputParam("prompt_embeds"), OutputParam("negative_embeds"), OutputParam("do_cfg"),
    ]
    expected_components = ["text_encoder", "tokenizer"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        from ...pipelines.wan.pipeline_wan import WanPipeline

        do_cfg = float(b.guidance_scale) > 1.0
        shim = WanPipeline.__new__(WanPipeline)
        shim.text_encoder = components.text_encoder
        shim.tokenizer = components.tokenizer
        b.prompt_embeds, b.negative_embeds = shim.encode_prompt(
            b.prompt, b.negative_prompt, do_cfg, b.max_sequence_length)
        b.do_cfg = do_cfg
        self.set_block_state(state, b)
        return state


class WanPrepareLatentsStep(ModularPipelineBlocks):
    inputs = [
        InputParam("height", default=480), InputParam("width", default=832),
        InputParam("num_frames", default=81),
        InputParam("key", default=None), InputParam("latents", default=None),
    ]
    intermediate_inputs = [InputParam("prompt_embeds", required=True)]
    intermediate_outputs = [OutputParam("latents"), OutputParam("rope_cos"), OutputParam("rope_sin")]
    expected_components = ["transformer", "vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        transformer = components.transformer[0]
        vae = components.vae[0]
        sft = vae.config.scale_factor_temporal
        sfs = vae.config.scale_factor_spatial
        batch = b.prompt_embeds.shape[0]
        f = (b.num_frames - 1) // sft + 1
        lh, lw = b.height // sfs, b.width // sfs
        if b.latents is None:
            key = b.key if b.key is not None else jax.random.PRNGKey(0)
            b.latents = randn_tensor((batch, transformer.config.in_channels, f, lh, lw), key=key)
        b.rope_cos, b.rope_sin = transformer.rope(f, lh, lw)
        self.set_block_state(state, b)
        return state


class WanSetTimestepsStep(ModularPipelineBlocks):
    inputs = [InputParam("num_inference_steps", default=50)]
    intermediate_inputs = [InputParam("latents", required=True)]
    intermediate_outputs = [OutputParam("scheduler_state")]
    expected_components = ["scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        try:
            b.scheduler_state = components.scheduler.set_timesteps(
                b.num_inference_steps, sample_shape=b.latents.shape)
        except TypeError:
            b.scheduler_state = components.scheduler.set_timesteps(b.num_inference_steps)
        self.set_block_state(state, b)
        return state


class WanDenoiseLoopStep(ModularPipelineBlocks):
    inputs = [InputParam("guidance_scale", default=5.0)]
    intermediate_inputs = [
        InputParam("latents", required=True), InputParam("prompt_embeds", required=True),
        InputParam("negative_embeds", default=None), InputParam("rope_cos", required=True),
        InputParam("rope_sin", required=True), InputParam("scheduler_state", required=True),
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
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            cond = transformer(t_params, latents, timestep, b.prompt_embeds,
                               rotary_emb=(b.rope_cos, b.rope_sin)).sample
            if do_cfg:
                uncond = transformer(t_params, latents, timestep, b.negative_embeds,
                                     rotary_emb=(b.rope_cos, b.rope_sin)).sample
                noise_pred = uncond + gs * (cond - uncond)
            else:
                noise_pred = cond
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        def run(latents, sstate, pe, ne, rc, rs):
            (latents, _), _ = jax.lax.scan(step, (latents, sstate), sstate.timesteps)
            return latents

        b.latents = jax.jit(run)(b.latents, b.scheduler_state, b.prompt_embeds,
                                 b.negative_embeds, b.rope_cos, b.rope_sin)
        self.set_block_state(state, b)
        return state


class WanDecodeStep(ModularPipelineBlocks):
    inputs = [InputParam("output_type", default="np")]
    intermediate_inputs = [InputParam("latents", required=True)]
    intermediate_outputs = [OutputParam("videos")]
    expected_components = ["vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        vae, vae_params = components.vae
        if b.output_type == "latent":
            b.videos = b.latents
            self.set_block_state(state, b)
            return state
        latents = b.latents
        lm, ls = vae.config.get("latents_mean"), vae.config.get("latents_std")
        if lm is not None and ls is not None:
            latents = latents * jnp.asarray(ls).reshape(1, -1, 1, 1, 1) + \
                jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
        video = jax.jit(lambda p, z: vae.decode(p, z).sample)(vae_params, latents)
        b.videos = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))
        self.set_block_state(state, b)
        return state


class WanModularBlocks(SequentialPipelineBlocks):
    block_classes = [WanTextEncoderStep, WanPrepareLatentsStep, WanSetTimestepsStep,
                     WanDenoiseLoopStep, WanDecodeStep]
    block_names = ["text_encoder", "prepare_latents", "set_timesteps", "denoise", "decode"]


WAN_BLOCKS = WanModularBlocks
