"""UnCLIP (Karlo) text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/unclip/pipeline_unclip.py:40`,
DALL·E 2 architecture): three chained diffusions — a CLIP-embedding PRIOR, a
64px variance-learning DECODER conditioned through `UnCLIPTextProjModel`
(extra context tokens + additive time embeddings, with the text mask padded
True over the extra tokens), and a two-phase SUPER-RES stack whose last step
switches to `super_res_last` and which conditions on the bicubic-upscaled
small image.

TPU-native: each stage is one lax.scan; explicit per-step `prev_timestep`
rides the xs (the UnCLIP posterior needs it), variance noise is pre-sampled,
and the super-res "last step uses the other UNet" becomes a scan over T−1
steps plus one trailing call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import BaseOutput
from ....utils.jax_utils import randn_tensor
from ...pipeline_utils import DiffusionPipeline
from .text_proj import UnCLIPTextProjModel


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class UnCLIPPipeline(DiffusionPipeline):
    def __init__(self, prior, decoder, text_encoder, tokenizer, text_proj,
                 super_res_first, super_res_last, prior_scheduler,
                 decoder_scheduler, super_res_scheduler):
        super().__init__()
        self.register_modules(
            prior=prior, decoder=decoder, text_encoder=text_encoder, tokenizer=tokenizer,
            text_proj=text_proj, super_res_first=super_res_first, super_res_last=super_res_last,
            prior_scheduler=prior_scheduler, decoder_scheduler=decoder_scheduler,
            super_res_scheduler=super_res_scheduler)

    def _encode_prompt(self, prompt, do_cfg):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]
        if do_cfg:
            prompt = [""] * len(prompt) + prompt  # [uncond | cond]
        inputs = self.tokenizer(prompt, padding="max_length",
                                max_length=getattr(self.tokenizer, "model_max_length", 77),
                                truncation=True, return_tensors="np")
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask) if hasattr(inputs, "attention_mask") \
            else jnp.ones_like(ids)
        out = text_encoder(te_params, ids)
        return out.text_embeds, out.last_hidden_state, mask

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        num_images_per_prompt: int = 1,
        prior_num_inference_steps: int = 25,
        decoder_num_inference_steps: int = 25,
        super_res_num_inference_steps: int = 7,
        prior_latents: Optional[jax.Array] = None,
        decoder_latents: Optional[jax.Array] = None,
        super_res_latents: Optional[jax.Array] = None,
        prior_guidance_scale: float = 4.0,
        decoder_guidance_scale: float = 8.0,
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        prior, prior_params = self.prior
        decoder, decoder_params = self.decoder
        text_proj, tp_params = self.text_proj
        sr_first, sr_first_params = self.super_res_first
        sr_last, sr_last_params = self.super_res_last
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = prior_guidance_scale > 1.0 or decoder_guidance_scale > 1.0

        prompt_embeds, text_enc_hid, text_mask = self._encode_prompt(prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        # ------------------------------------------------------------- prior
        p_state = self.prior_scheduler.set_timesteps(prior_num_inference_steps)
        embedding_dim = prior.config.embedding_dim
        key, lat_key, noise_key = jax.random.split(key, 3)
        if prior_latents is None:
            prior_latents = randn_tensor((batch_size, embedding_dim), key=lat_key)
            prior_latents = prior_latents * p_state.init_noise_sigma
        p_ts = np.asarray(p_state.timesteps)
        p_prev = np.append(p_ts[1:], -1)
        p_noise = randn_tensor((len(p_ts), batch_size, embedding_dim), key=noise_key)

        def prior_step(carry, xs):
            latents, sstate = carry
            t, prev_t, noise = xs
            latent_input = jnp.concatenate([latents] * 2, axis=0) if do_cfg else latents
            pred = prior(prior_params, latent_input, timestep=t, proj_embedding=prompt_embeds,
                         encoder_hidden_states=text_enc_hid,
                         attention_mask=text_mask).predicted_image_embedding
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + prior_guidance_scale * (cond - uncond)
            out = self.prior_scheduler.step(sstate, pred, t, latents, prev_timestep=prev_t,
                                            variance_noise=noise)
            return (out.prev_sample, out.state), None

        (prior_latents, _), _ = jax.lax.scan(
            prior_step, (prior_latents, p_state),
            (jnp.asarray(p_ts), jnp.asarray(p_prev), p_noise))
        image_embeddings = prior.post_process_latents(prior_params, prior_latents)

        # ----------------------------------------------------------- decoder
        text_enc_hid_states, additive_time = text_proj(
            tp_params, image_embeddings=image_embeddings, prompt_embeds=prompt_embeds,
            text_encoder_hidden_states=text_enc_hid, do_classifier_free_guidance=do_cfg)
        decoder_text_mask = jnp.pad(text_mask, ((0, 0), (text_proj.clip_extra_context_tokens, 0)),
                                    constant_values=1)

        d_state = self.decoder_scheduler.set_timesteps(decoder_num_inference_steps)
        ch = decoder.config.in_channels
        size = decoder.config.sample_size
        key, lat_key, noise_key = jax.random.split(key, 3)
        if decoder_latents is None:
            decoder_latents = randn_tensor((batch_size, ch, size, size), key=lat_key)
            decoder_latents = decoder_latents * d_state.init_noise_sigma
        d_ts = np.asarray(d_state.timesteps)
        d_prev = np.append(d_ts[1:], -1)
        d_noise = randn_tensor((len(d_ts), batch_size, ch, size, size), key=noise_key)

        def decoder_step(carry, xs):
            latents, sstate = carry
            t, prev_t, noise = xs
            latent_input = jnp.concatenate([latents] * 2, axis=0) if do_cfg else latents
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = decoder(decoder_params, latent_input, t_b,
                                 encoder_hidden_states=text_enc_hid_states,
                                 class_labels=additive_time,
                                 encoder_attention_mask=decoder_text_mask).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                u_eps, _ = jnp.split(uncond, 2, axis=1)
                c_eps, c_var = jnp.split(cond, 2, axis=1)
                eps = u_eps + decoder_guidance_scale * (c_eps - u_eps)
                noise_pred = jnp.concatenate([eps, c_var], axis=1)
            out = self.decoder_scheduler.step(sstate, noise_pred, t, latents,
                                              prev_timestep=prev_t, variance_noise=noise)
            return (out.prev_sample, out.state), None

        (decoder_latents, _), _ = jax.lax.scan(
            decoder_step, (decoder_latents, d_state),
            (jnp.asarray(d_ts), jnp.asarray(d_prev), d_noise))
        image_small = jnp.clip(decoder_latents, -1, 1)

        # --------------------------------------------------------- super res
        s_state = self.super_res_scheduler.set_timesteps(super_res_num_inference_steps)
        channels = sr_first.config.in_channels // 2
        size = sr_first.config.sample_size
        key, lat_key, noise_key = jax.random.split(key, 3)
        if super_res_latents is None:
            super_res_latents = randn_tensor((batch_size, channels, size, size), key=lat_key)
            super_res_latents = super_res_latents * s_state.init_noise_sigma

        # torch-exact bicubic (antialias) upscale of the 64px image
        from ....models.autoencoders.autoencoder_rae import _torch_bicubic_matrix

        mh = jnp.asarray(_torch_bicubic_matrix(image_small.shape[-2], size, antialias=True))
        mw = jnp.asarray(_torch_bicubic_matrix(image_small.shape[-1], size, antialias=True))
        image_upscaled = jnp.einsum("oh,bchw,pw->bcop", mh, image_small, mw)

        s_ts = np.asarray(s_state.timesteps)
        s_prev = np.append(s_ts[1:], -1)
        s_noise = randn_tensor((len(s_ts), batch_size, channels, size, size), key=noise_key)

        def sr_step(unet, unet_params):
            def fn(carry, xs):
                latents, sstate = carry
                t, prev_t, noise = xs
                latent_input = jnp.concatenate([latents, image_upscaled], axis=1)
                t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
                noise_pred = unet(unet_params, latent_input, t_b).sample
                out = self.super_res_scheduler.step(sstate, noise_pred, t, latents,
                                                    prev_timestep=prev_t, variance_noise=noise)
                return (out.prev_sample, out.state), None
            return fn

        # all but the last step with super_res_first, final step with _last
        (super_res_latents, s_state), _ = jax.lax.scan(
            sr_step(sr_first, sr_first_params), (super_res_latents, s_state),
            (jnp.asarray(s_ts[:-1]), jnp.asarray(s_prev[:-1]), s_noise[:-1]))
        (super_res_latents, _), _ = sr_step(sr_last, sr_last_params)(
            (super_res_latents, s_state),
            (jnp.asarray(s_ts[-1]), jnp.asarray(s_prev[-1]), s_noise[-1]))

        image = np.asarray(jnp.clip(super_res_latents * 0.5 + 0.5, 0, 1).transpose(0, 2, 3, 1))
        if output_type == "pil":
            from ....image_processor import numpy_to_pil

            image = numpy_to_pil(image)
        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)
