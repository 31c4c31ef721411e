"""PixArt-Alpha text-to-image pipeline (and PixArt-Sigma variant).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pixart_alpha/pipeline_pixart_alpha.py:180`
PixArtAlphaPipeline: T5 masked encode `:312-436`, resolution binning `:802-812`
+ `:970-971`, micro-conditions for the 1024 model `:905-915`, learned-sigma
chunk `:947`; `pipeline_pixart_sigma.py:135` PixArtSigmaPipeline differs only
in the bin tables and in never using micro-conditions).

TPU-first: one scanned, jitted CFG denoise loop; the T5 attention mask rides
through the transformer's additive-bias path as a trace-time constant shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

ASPECT_RATIO_1024_BIN = {
    "0.25": [512.0, 2048.0], "0.28": [512.0, 1856.0], "0.32": [576.0, 1792.0],
    "0.33": [576.0, 1728.0], "0.35": [576.0, 1664.0], "0.4": [640.0, 1600.0],
    "0.42": [640.0, 1536.0], "0.48": [704.0, 1472.0], "0.5": [704.0, 1408.0],
    "0.52": [704.0, 1344.0], "0.57": [768.0, 1344.0], "0.6": [768.0, 1280.0],
    "0.68": [832.0, 1216.0], "0.72": [832.0, 1152.0], "0.78": [896.0, 1152.0],
    "0.82": [896.0, 1088.0], "0.88": [960.0, 1088.0], "0.94": [960.0, 1024.0],
    "1.0": [1024.0, 1024.0], "1.07": [1024.0, 960.0], "1.13": [1088.0, 960.0],
    "1.21": [1088.0, 896.0], "1.29": [1152.0, 896.0], "1.38": [1152.0, 832.0],
    "1.46": [1216.0, 832.0], "1.67": [1280.0, 768.0], "1.75": [1344.0, 768.0],
    "2.0": [1408.0, 704.0], "2.09": [1472.0, 704.0], "2.4": [1536.0, 640.0],
    "2.5": [1600.0, 640.0], "3.0": [1728.0, 576.0], "4.0": [2048.0, 512.0],
}

ASPECT_RATIO_512_BIN = {
    "0.25": [256.0, 1024.0], "0.28": [256.0, 928.0], "0.32": [288.0, 896.0],
    "0.33": [288.0, 864.0], "0.35": [288.0, 832.0], "0.4": [320.0, 800.0],
    "0.42": [320.0, 768.0], "0.48": [352.0, 736.0], "0.5": [352.0, 704.0],
    "0.52": [352.0, 672.0], "0.57": [384.0, 672.0], "0.6": [384.0, 640.0],
    "0.68": [416.0, 608.0], "0.72": [416.0, 576.0], "0.78": [448.0, 576.0],
    "0.82": [448.0, 544.0], "0.88": [480.0, 544.0], "0.94": [480.0, 512.0],
    "1.0": [512.0, 512.0], "1.07": [512.0, 480.0], "1.13": [544.0, 480.0],
    "1.21": [544.0, 448.0], "1.29": [576.0, 448.0], "1.38": [576.0, 416.0],
    "1.46": [608.0, 416.0], "1.67": [640.0, 384.0], "1.75": [672.0, 384.0],
    "2.0": [704.0, 352.0], "2.09": [736.0, 352.0], "2.4": [768.0, 320.0],
    "2.5": [800.0, 320.0], "3.0": [864.0, 288.0], "4.0": [1024.0, 256.0],
}

ASPECT_RATIO_256_BIN = {
    "0.25": [128.0, 512.0], "0.28": [128.0, 464.0], "0.32": [144.0, 448.0],
    "0.33": [144.0, 432.0], "0.35": [144.0, 416.0], "0.4": [160.0, 400.0],
    "0.42": [160.0, 384.0], "0.48": [176.0, 368.0], "0.5": [176.0, 352.0],
    "0.52": [176.0, 336.0], "0.57": [192.0, 336.0], "0.6": [192.0, 320.0],
    "0.68": [208.0, 304.0], "0.72": [208.0, 288.0], "0.78": [224.0, 288.0],
    "0.82": [224.0, 272.0], "0.88": [240.0, 272.0], "0.94": [240.0, 256.0],
    "1.0": [256.0, 256.0], "1.07": [256.0, 240.0], "1.13": [272.0, 240.0],
    "1.21": [272.0, 224.0], "1.29": [288.0, 224.0], "1.38": [288.0, 208.0],
    "1.46": [304.0, 208.0], "1.67": [320.0, 192.0], "1.75": [336.0, 192.0],
    "2.0": [352.0, 176.0], "2.09": [368.0, 176.0], "2.4": [384.0, 160.0],
    "2.5": [400.0, 160.0], "3.0": [432.0, 144.0], "4.0": [512.0, 128.0],
}

ASPECT_RATIO_2048_BIN = {
    "0.25": [1024.0, 4096.0], "0.26": [1024.0, 3968.0], "0.32": [1152.0, 3584.0],
    "0.33": [1152.0, 3456.0], "0.35": [1152.0, 3328.0], "0.4": [1280.0, 3200.0],
    "0.42": [1280.0, 3072.0], "0.48": [1408.0, 2944.0], "0.5": [1408.0, 2816.0],
    "0.52": [1408.0, 2688.0], "0.57": [1536.0, 2688.0], "0.6": [1536.0, 2560.0],
    "0.68": [1664.0, 2432.0], "0.72": [1664.0, 2304.0], "0.78": [1792.0, 2304.0],
    "0.82": [1792.0, 2176.0], "0.88": [1920.0, 2176.0], "0.94": [1920.0, 2048.0],
    "1.0": [2048.0, 2048.0], "1.07": [2048.0, 1920.0], "1.13": [2176.0, 1920.0],
    "1.21": [2176.0, 1792.0], "1.29": [2304.0, 1792.0], "1.38": [2304.0, 1664.0],
    "1.46": [2432.0, 1664.0], "1.67": [2560.0, 1536.0], "1.75": [2688.0, 1536.0],
    "2.0": [2816.0, 1408.0], "2.09": [2944.0, 1408.0], "2.4": [3072.0, 1280.0],
    "2.5": [3200.0, 1280.0], "3.0": [3456.0, 1152.0], "4.0": [4096.0, 1024.0],
}


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class PixArtAlphaPipeline(DiffusionPipeline):
    _optional_components = ["tokenizer", "text_encoder"]
    bin_tables = {32: ASPECT_RATIO_256_BIN, 64: ASPECT_RATIO_512_BIN, 128: ASPECT_RATIO_1024_BIN}
    default_max_length = 120

    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def encode_prompt(self, prompt, negative_prompt="", do_cfg=True, max_sequence_length=None):
        if isinstance(prompt, str):
            prompt = [prompt]
        max_length = max_sequence_length or self.default_max_length
        encoder, enc_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_length, truncation=True, return_tensors="np"
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(getattr(inputs, "attention_mask", np.ones_like(inputs.input_ids)))
            embeds = encoder(enc_params, ids, attention_mask=mask).last_hidden_state
            return embeds, mask

        prompt_embeds, prompt_mask = encode(prompt)
        if not do_cfg:
            return prompt_embeds, prompt_mask, None, None
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_embeds, neg_mask = encode(negative_prompt)
        return prompt_embeds, prompt_mask, neg_embeds, neg_mask

    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, added_cond,
                 timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        latent_channels = latents.shape[1]
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t) if hasattr(
                scheduler, "scale_model_input") else latent_input
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, timestep,
                added_cond_kwargs=added_cond, encoder_attention_mask=prompt_mask,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            # learned sigma: keep the epsilon half (reference :947)
            if noise_pred.shape[1] == 2 * latent_channels:
                noise_pred = noise_pred[:, :latent_channels]
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: str = "",
        num_inference_steps: int = 20,
        guidance_scale: float = 4.5,
        height: Optional[int] = None,
        width: Optional[int] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        prompt_attention_mask: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_attention_mask: Optional[jax.Array] = None,
        use_resolution_binning: bool = True,
        max_sequence_length: Optional[int] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        sample = transformer.config.sample_size
        height = height or sample * self.vae_scale_factor
        width = width or sample * self.vae_scale_factor
        orig_height, orig_width = height, width
        if use_resolution_binning:
            bin_table = self.bin_tables.get(sample)
            if bin_table is not None:
                height, width = self.image_processor.classify_height_width_bin(height, width, bin_table)
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            prompt_embeds, prompt_mask, neg_embeds, neg_mask = self.encode_prompt(
                prompt, negative_prompt, do_cfg, max_sequence_length
            )
        else:
            prompt_mask, neg_embeds, neg_mask = (
                prompt_attention_mask, negative_prompt_embeds, negative_prompt_attention_mask
            )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            prompt_mask = jnp.concatenate([neg_mask, prompt_mask], axis=0)

        latent_channels = transformer.config.in_channels
        shape = (batch_size, latent_channels, height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma

        added_cond = None
        if transformer.use_additional_conditions:
            n = batch_size * (2 if do_cfg else 1)
            resolution = jnp.asarray([[orig_height, orig_width]] * n, dtype=jnp.float32)
            aspect_ratio = jnp.asarray([[orig_height / orig_width]] * n, dtype=jnp.float32)
            added_cond = {"resolution": resolution, "aspect_ratio": aspect_ratio}

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(t_params, latents, prompt_embeds, prompt_mask, added_cond,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            if use_resolution_binning and (orig_height != height or orig_width != width):
                image = self.image_processor.resize_and_crop_tensor(image, orig_width, orig_height)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)


class PixArtSigmaPipeline(PixArtAlphaPipeline):
    """PixArt-Sigma: same skeleton, 2K-capable bin tables, no micro-conditions
    (reference pipeline_pixart_sigma.py:135; Sigma checkpoints set
    use_additional_conditions=False via sample_size != 128)."""

    bin_tables = {32: ASPECT_RATIO_256_BIN, 64: ASPECT_RATIO_512_BIN,
                  128: ASPECT_RATIO_1024_BIN, 256: ASPECT_RATIO_2048_BIN}
    default_max_length = 300
