"""VisualCloze in-context generation pipeline (Flux-Fill-style grid denoise).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/visualcloze/pipeline_visualcloze_generation.py:118`
VisualClozeGenerationPipeline): layout/task/content prompts fused into one
Flux prompt (`:340-349`), per-row width-concatenated grid latents packed and
concatenated along tokens, RoPE ids carrying the row index on axis 0
(`:469-487`), latents initialized by `scale_noise` on the grid image latents
(strength-1 image-to-image), conditioning = [grid latents, vsf²-expanded
masks] concatenated on channels into the 384-channel Fill transformer
(`:193`), and decode of the final (query) row with target-position crops
(`:893-914`).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils.jax_utils import randn_tensor
from ..flux.pipeline_flux import FluxPipeline, FluxPipelineOutput
from .visualcloze_utils import VisualClozeProcessor


class VisualClozeGenerationPipeline(FluxPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, text_encoder_2, tokenizer_2,
                 transformer, resolution: int = 384):
        super().__init__(scheduler, vae, text_encoder, tokenizer, text_encoder_2,
                         tokenizer_2, transformer)
        self.register_to_config(resolution=resolution)
        self.image_processor = VisualClozeProcessor(
            vae_scale_factor=self.vae_scale_factor * 2, resolution=resolution)

    def encode_cloze_prompt(self, layout_prompt, task_prompt, content_prompt,
                            max_sequence_length: int = 512):
        def _preprocess(prompt, content=False):
            if prompt is not None:
                return f"The last image of the last row depicts: {prompt}" if content else prompt
            return ""

        prompt = [
            f"{_preprocess(layout_prompt[i])} {_preprocess(task_prompt[i])} "
            f"{_preprocess(content_prompt[i], content=True)}".strip()
            for i in range(len(layout_prompt))
        ]
        return self.encode_prompt(prompt, prompt, max_sequence_length)

    def _prepare_grid_latents(self, init_image, mask, vae, vae_params, key):
        """One sample: rows of [1,3,H,W] numpy images + per-image masks ->
        (packed image latents [1,S,C4], packed masks [1,S,vsf²·4], img ids)."""
        vsf = self.vae_scale_factor
        packed_rows, packed_masks, ids_rows = [], [], []
        for idx, (row_imgs, row_masks) in enumerate(zip(init_image, mask), start=1):
            row = jnp.concatenate([jnp.asarray(im) for im in row_imgs], axis=3)
            key, enc_key = jax.random.split(key)
            lat = vae.encode(vae_params, row).sample(enc_key)
            lat = (lat - vae.config.get("shift_factor", 0.0)) * vae.config.scaling_factor
            packed_rows.append(self._pack_latents(lat))

            m = jnp.concatenate([jnp.asarray(mm) for mm in row_masks], axis=3)
            b, c, h, w = m.shape
            m = m.reshape(b, c, h // vsf, vsf, w // vsf, vsf)
            m = jnp.transpose(m, (0, 1, 3, 5, 2, 4)).reshape(b, c * vsf * vsf, h // vsf, w // vsf)
            packed_masks.append(self._pack_latents(m))

            nh, nw = lat.shape[2] // 2, lat.shape[3] // 2
            pid = np.zeros((nh, nw, 3), dtype=np.float32)
            pid[..., 0] = idx
            pid[..., 1] = np.arange(nh)[:, None]
            pid[..., 2] = np.arange(nw)[None, :]
            ids_rows.append(pid.reshape(-1, 3))

        return (jnp.concatenate(packed_rows, axis=1), jnp.concatenate(packed_masks, axis=1),
                np.concatenate(ids_rows, axis=0), key)

    def __call__(
        self,
        task_prompt: Union[str, List[str]] = None,
        content_prompt: Union[str, List[str]] = None,
        image=None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 30.0,
        key: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, transformer_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        processor_output = self.image_processor.preprocess(
            task_prompt, content_prompt, image, vae_scale_factor=self.vae_scale_factor)
        batch_size = len(processor_output["task_prompt"])

        prompt_embeds, pooled_prompt_embeds, txt_ids = self.encode_cloze_prompt(
            processor_output["layout_prompt"], processor_output["task_prompt"],
            processor_output["content_prompt"], max_sequence_length)

        # per-sample grid latents (uniform shapes across the batch are required
        # for dense batching; the reference concatenates on the batch axis too)
        img_lat_list, mask_list, ids_list = [], [], []
        for b in range(batch_size):
            img_lat, m, ids, key = self._prepare_grid_latents(
                processor_output["init_image"][b], processor_output["mask"][b], vae, vae_params, key)
            img_lat_list.append(img_lat)
            mask_list.append(m)
            ids_list.append(ids)
        image_latents = jnp.concatenate(img_lat_list, axis=0)
        masks = jnp.concatenate(mask_list, axis=0)
        img_ids = ids_list[0]

        image_seq_len = image_latents.shape[1]
        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        if self.scheduler.config.get("use_dynamic_shifting", False):
            state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            state = self.scheduler.set_timesteps(num_inference_steps)

        key, noise_key = jax.random.split(key)
        noise = randn_tensor(image_latents.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, image_latents, state.timesteps[0], noise)
        cond = jnp.concatenate([image_latents, masks], axis=-1)

        ids = np.concatenate([np.asarray(txt_ids), img_ids], axis=0)
        rope_cos, rope_sin = transformer.pos_embed({}, ids)

        guidance = None
        if transformer.config.guidance_embeds:
            guidance = jnp.full((latents.shape[0],), guidance_scale, dtype=jnp.float32)

        from ..flux.pipeline_flux_fill import FluxFillPipeline

        denoise = self._jit("denoise", FluxFillPipeline._denoise_cond.__get__(self))
        latents = denoise(transformer_params, latents, cond, prompt_embeds, pooled_prompt_embeds,
                          jnp.asarray(rope_cos), jnp.asarray(rope_sin), state.timesteps, state, guidance)

        if output_type == "latent":
            images = latents
        else:
            images = []
            for b in range(latents.shape[0]):
                sizes = processor_output["image_size"][b % batch_size]
                tpos = processor_output["target_position"][b % batch_size]
                # tokens of the final (query) row sit at the tail
                last_h = sizes[-1][0][0] // self.vae_scale_factor
                last_w = sum(s[1] for s in sizes[-1]) // self.vae_scale_factor
                n_last = (last_h // 2) * (last_w // 2)
                row = latents[b: b + 1, -n_last:]
                row = self._unpack_latents(row, last_h * self.vae_scale_factor,
                                           last_w * self.vae_scale_factor, self.vae_scale_factor)
                row = row / vae.config.scaling_factor + vae.config.get("shift_factor", 0.0)
                decoded = vae.decode(vae_params, row).sample
                decoded = self.image_processor.postprocess(decoded, output_type=output_type)[0]
                start = 0
                cropped = []
                for i, size in enumerate(sizes[-1]):
                    if tpos[i]:
                        if output_type == "pil":
                            cropped.append(decoded.crop((start, 0, start + size[1], size[0])))
                        else:
                            cropped.append(decoded[0: size[0], start: start + size[1]])
                    start += size[1]
                images.append(cropped)
            if output_type != "pil":
                images = np.concatenate([arr[None] for sub in images for arr in sub], axis=0)

        if not return_dict:
            return (images,)
        return FluxPipelineOutput(images=images)
