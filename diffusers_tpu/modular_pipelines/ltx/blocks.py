"""LTX-Video modular block pack.

TPU-native counterpart of the reference LTX modular blocks
(`/root/reference/src/diffusers/modular_pipelines/ltx/`): T5 text encode →
packed video latents + 3D RoPE tables → flow-match timesteps with
resolution-dependent mu shift → single-scan CFG denoise → causal-VAE decode
with per-channel latent statistics (+ optional decode-timestep conditioning).
Math delegates to the monolithic `pipelines/ltx/pipeline_ltx.py` via a shim,
so modular output is bit-identical to the monolithic pipeline.
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
    """A component-bound LTXPipeline for reusing its jitted helpers."""
    from ...pipelines.ltx.pipeline_ltx import LTXPipeline

    return LTXPipeline(
        scheduler=components.scheduler,
        vae=components.vae,
        text_encoder=components.text_encoder,
        tokenizer=components.tokenizer,
        transformer=components.transformer,
    )


class LTXTextEncoderStep(ModularPipelineBlocks):
    inputs = [
        InputParam("prompt", required=True),
        InputParam("negative_prompt", default=None),
        InputParam("guidance_scale", default=3.0),
        InputParam("max_sequence_length", default=128),
    ]
    intermediate_outputs = [
        OutputParam("prompt_embeds"), OutputParam("prompt_mask"), OutputParam("do_cfg"),
    ]
    expected_components = ["text_encoder", "tokenizer"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        do_cfg = float(b.guidance_scale) > 1.0
        pe, pm, ne, nm = _shim(components).encode_prompt(
            b.prompt, b.negative_prompt, do_cfg, b.max_sequence_length)
        if do_cfg:
            b.prompt_embeds = jnp.concatenate([ne, pe], axis=0)
            b.prompt_mask = jnp.concatenate([nm, pm], axis=0)
        else:
            b.prompt_embeds, b.prompt_mask = pe, pm
        b.do_cfg = do_cfg
        self.set_block_state(state, b)
        return state


class LTXPrepareLatentsStep(ModularPipelineBlocks):
    inputs = [
        InputParam("height", default=512), InputParam("width", default=704),
        InputParam("num_frames", default=161), InputParam("frame_rate", default=25),
        InputParam("key", default=None), InputParam("latents", default=None),
    ]
    intermediate_inputs = [InputParam("do_cfg", required=True),
                           InputParam("prompt_embeds", required=True)]
    intermediate_outputs = [
        OutputParam("latents"), OutputParam("rope_cos"), OutputParam("rope_sin"),
        OutputParam("latent_grid"), OutputParam("decode_key"),
    ]
    expected_components = ["transformer", "vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        pipe = _shim(components)
        transformer = components.transformer[0]
        p, pt = pipe.transformer_spatial_patch_size, pipe.transformer_temporal_patch_size
        f = (b.num_frames - 1) // pipe.vae_temporal_compression_ratio + 1
        lh = b.height // pipe.vae_spatial_compression_ratio
        lw = b.width // pipe.vae_spatial_compression_ratio
        batch = b.prompt_embeds.shape[0] // (2 if b.do_cfg else 1)

        key = b.key if b.key is not None else jax.random.PRNGKey(0)
        key, latents_key, decode_key = jax.random.split(key, 3)
        if b.latents is None:
            lat = randn_tensor((batch, transformer.config.in_channels, f, lh, lw), key=latents_key)
            b.latents = pipe._pack_latents(lat, p, pt)
        grid = transformer.rope.prepare_video_coords(
            batch * (2 if b.do_cfg else 1), f // pt, lh // p, lw // p,
            rope_interpolation_scale=(
                pipe.vae_temporal_compression_ratio / b.frame_rate,
                pipe.vae_spatial_compression_ratio,
                pipe.vae_spatial_compression_ratio,
            ),
        )
        b.rope_cos, b.rope_sin = transformer.rope({}, grid)
        b.latent_grid = (f // pt, lh // p, lw // p)
        b.decode_key = decode_key
        self.set_block_state(state, b)
        return state


class LTXSetTimestepsStep(ModularPipelineBlocks):
    inputs = [InputParam("num_inference_steps", default=50)]
    intermediate_inputs = [InputParam("latents", required=True)]
    intermediate_outputs = [OutputParam("scheduler_state")]
    expected_components = ["scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift

        b = self.get_block_state(state)
        scheduler = components.scheduler
        sigmas = np.linspace(1.0, 1.0 / b.num_inference_steps, b.num_inference_steps)
        mu = calculate_shift(
            b.latents.shape[1],
            scheduler.config.get("base_image_seq_len", 256),
            scheduler.config.get("max_image_seq_len", 4096),
            scheduler.config.get("base_shift", 0.5),
            scheduler.config.get("max_shift", 1.15),
        )
        if scheduler.config.get("use_dynamic_shifting", False):
            b.scheduler_state = scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            b.scheduler_state = scheduler.set_timesteps(b.num_inference_steps)
        self.set_block_state(state, b)
        return state


class LTXDenoiseLoopStep(ModularPipelineBlocks):
    inputs = [
        InputParam("guidance_scale", default=3.0),
        InputParam("guidance_rescale", default=0.0),
    ]
    intermediate_inputs = [
        InputParam("latents", required=True), InputParam("prompt_embeds", required=True),
        InputParam("prompt_mask", required=True), InputParam("rope_cos", required=True),
        InputParam("rope_sin", required=True), InputParam("scheduler_state", required=True),
        InputParam("do_cfg", required=True), InputParam("latent_grid", required=True),
    ]
    intermediate_outputs = [OutputParam("latents")]
    expected_components = ["transformer", "scheduler"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        pipe = _shim(components)
        sstate = b.scheduler_state
        denoise = pipe._jit(
            "modular_denoise",
            lambda *a: pipe._denoise(*a, float(b.guidance_scale), float(b.guidance_rescale),
                                     bool(b.do_cfg), latent_grid=tuple(b.latent_grid)),
            static=(float(b.guidance_scale), float(b.guidance_rescale), bool(b.do_cfg)),
        )
        b.latents = denoise(components.transformer[1], b.latents, b.prompt_embeds,
                            b.prompt_mask, b.rope_cos, b.rope_sin, sstate.timesteps, sstate)
        self.set_block_state(state, b)
        return state


class LTXDecodeStep(ModularPipelineBlocks):
    inputs = [
        InputParam("output_type", default="np"),
        InputParam("decode_timestep", default=0.0),
        InputParam("decode_noise_scale", default=None),
    ]
    intermediate_inputs = [
        InputParam("latents", required=True), InputParam("latent_grid", required=True),
        InputParam("decode_key", required=True),
    ]
    intermediate_outputs = [OutputParam("videos")]
    expected_components = ["vae"]

    def __call__(self, components, state: PipelineState) -> PipelineState:
        b = self.get_block_state(state)
        pipe = _shim(components)
        vae, vae_params = components.vae
        if b.output_type == "latent":
            b.videos = b.latents
            self.set_block_state(state, b)
            return state
        f, lh, lw = b.latent_grid
        p, pt = pipe.transformer_spatial_patch_size, pipe.transformer_temporal_patch_size
        latents = pipe._unpack_latents(b.latents, f, lh, lw, p, pt)
        latents = pipe._denormalize_latents(
            latents, vae_params["latents_mean"], vae_params["latents_std"],
            vae.config.scaling_factor)
        temb = None
        if vae.config.timestep_conditioning:
            noise = randn_tensor(latents.shape, key=b.decode_key, dtype=latents.dtype)
            scale = b.decode_timestep if b.decode_noise_scale is None else b.decode_noise_scale
            latents = (1 - scale) * latents + scale * noise
            temb = jnp.full((latents.shape[0],), b.decode_timestep, latents.dtype)
        decode = pipe._jit(
            "modular_decode",
            lambda pp, z, tt, kk: vae.decode(pp, z, tt, key=kk).sample,
            static=(vae.config.timestep_conditioning,),
        )
        video = decode(vae_params, latents, temb, b.decode_key)
        b.videos = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))
        self.set_block_state(state, b)
        return state


class LTXModularBlocks(SequentialPipelineBlocks):
    block_classes = [LTXTextEncoderStep, LTXPrepareLatentsStep, LTXSetTimestepsStep,
                     LTXDenoiseLoopStep, LTXDecodeStep]
    block_names = ["text_encoder", "prepare_latents", "set_timesteps", "denoise", "decode"]


LTX_BLOCKS = LTXModularBlocks
