"""Marigold surface-normals estimation pipeline.

Behavioral mirror of the reference
`pipelines/marigold/pipeline_marigold_normals.py`: same image-latent
channel-concat denoise as the depth pipeline, decode → clip → optional
half-z rescale (`use_full_z_range=False` models) → unit-normalization
(`:632`), and "closest-to-mean" / mean ensembling with angular
uncertainty (`:661`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from .marigold_image_processing import MarigoldImageProcessor

logger = logging.get_logger(__name__)


@dataclass
class MarigoldNormalsOutput(BaseOutput):
    prediction: Union[np.ndarray, jax.Array]
    uncertainty: Union[None, np.ndarray, jax.Array]
    latent: Optional[jax.Array]


class MarigoldNormalsPipeline(DiffusionPipeline):
    supported_prediction_types = ("normals",)

    def __init__(
        self,
        unet,
        vae,
        scheduler,
        text_encoder,
        tokenizer,
        prediction_type: Optional[str] = None,
        use_full_z_range: bool = True,
        default_denoising_steps: Optional[int] = None,
        default_processing_resolution: Optional[int] = None,
    ):
        super().__init__()
        self.register_modules(
            unet=unet, vae=vae, scheduler=scheduler, text_encoder=text_encoder, tokenizer=tokenizer
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1)
        self.use_full_z_range = use_full_z_range
        self.default_denoising_steps = default_denoising_steps
        self.default_processing_resolution = default_processing_resolution
        self.empty_text_embedding = None
        self.image_processor = MarigoldImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def _encode_empty_text(self):
        if self.empty_text_embedding is None:
            text_encoder, te_params = self.text_encoder
            inputs = self.tokenizer(
                [""], padding="do_not_pad", max_length=self.tokenizer.model_max_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            self.empty_text_embedding = text_encoder(te_params, ids).last_hidden_state
        return self.empty_text_embedding

    def _denoise(self, unet_params, image_latent, pred_latent, text, timesteps, state):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            pred, sstate = carry
            latent = jnp.concatenate([image_latent, pred], axis=1)
            noise = unet(unet_params, latent, t, encoder_hidden_states=text).sample
            out = scheduler.step(sstate, noise, t, pred)
            return (out.prev_sample, out.state), None

        (pred_latent, _), _ = jax.lax.scan(step_fn, (pred_latent, state), timesteps)
        return pred_latent

    def decode_prediction(self, vae_params, pred_latent: jax.Array) -> jax.Array:
        vae = self.vae[0]
        prediction = vae.decode(vae_params, pred_latent / vae.config.scaling_factor).sample
        prediction = jnp.clip(prediction, -1.0, 1.0)
        if not self.use_full_z_range:
            prediction = prediction.at[:, 2].multiply(0.5)
            prediction = prediction.at[:, 2].add(0.5)
        return self.normalize_normals(prediction)

    @staticmethod
    def normalize_normals(normals: jax.Array, eps: float = 1e-6) -> jax.Array:
        norm = jnp.linalg.norm(normals, axis=1, keepdims=True)
        return normals / jnp.clip(norm, eps, None)

    def __call__(
        self,
        image,
        num_inference_steps: Optional[int] = None,
        ensemble_size: int = 1,
        processing_resolution: Optional[int] = None,
        match_input_resolution: bool = True,
        resample_method_input: str = "bilinear",
        resample_method_output: str = "bilinear",
        batch_size: int = 1,
        ensembling_kwargs: Optional[Dict[str, Any]] = None,
        latents: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        output_type: str = "np",
        output_uncertainty: bool = False,
        output_latent: bool = False,
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if num_inference_steps is None:
            num_inference_steps = self.default_denoising_steps
        if processing_resolution is None:
            processing_resolution = self.default_processing_resolution
        if num_inference_steps is None:
            raise ValueError("`num_inference_steps` is not specified and could not be resolved from the model config.")
        if processing_resolution is None:
            raise ValueError("`processing_resolution` is not specified and could not be resolved from the model config.")
        if ensemble_size == 1 and output_uncertainty:
            raise ValueError("`output_uncertainty=True` requires `ensemble_size` > 1.")

        text = self._encode_empty_text()
        image, padding, original_resolution = self.image_processor.preprocess(
            image, processing_resolution, resample_method_input
        )
        num_images = image.shape[0]

        encode = self._jit("encode", lambda p, x: vae.encode(p, x).mode())
        image_latent = encode(vae_params, image) * vae.config.scaling_factor
        image_latent = jnp.repeat(image_latent, ensemble_size, axis=0)

        pred_latent = latents
        if pred_latent is None:
            key, lat_key = jax.random.split(key)
            pred_latent = randn_tensor(image_latent.shape, key=lat_key, dtype=image_latent.dtype)

        text = jnp.tile(text, (image_latent.shape[0], 1, 1))
        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, pred_latent)

        denoise = self._jit("denoise", self._denoise, static=(num_inference_steps,))
        pred_latent = denoise(unet_params, image_latent, pred_latent, text, state.timesteps, state)

        decode = self._jit("decode", self.decode_prediction)
        prediction = decode(vae_params, pred_latent)
        prediction = self.image_processor.unpad_image(prediction, padding)
        if not output_latent:
            pred_latent = None

        uncertainty = None
        if ensemble_size > 1:
            prediction = prediction.reshape(num_images, ensemble_size, *prediction.shape[1:])
            pairs = [
                self.ensemble_normals(prediction[i], output_uncertainty, **(ensembling_kwargs or {}))
                for i in range(num_images)
            ]
            prediction = jnp.concatenate([p for p, _ in pairs], axis=0)
            if output_uncertainty:
                uncertainty = jnp.concatenate([u for _, u in pairs], axis=0)

        if match_input_resolution:
            prediction = self.image_processor.resize_antialias(
                prediction, original_resolution, resample_method_output, is_aa=False
            )
            prediction = self.normalize_normals(prediction)
            if uncertainty is not None and output_uncertainty:
                uncertainty = self.image_processor.resize_antialias(
                    uncertainty, original_resolution, resample_method_output, is_aa=False
                )

        if output_type == "np":
            prediction = self.image_processor.pt_to_numpy(prediction)
            if uncertainty is not None and output_uncertainty:
                uncertainty = self.image_processor.pt_to_numpy(uncertainty)

        if not return_dict:
            return (prediction, uncertainty, pred_latent)
        return MarigoldNormalsOutput(prediction=prediction, uncertainty=uncertainty, latent=pred_latent)

    @staticmethod
    def ensemble_normals(
        normals: jax.Array, output_uncertainty: bool, reduction: str = "closest"
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        if normals.ndim != 4 or normals.shape[1] != 3:
            raise ValueError(f"Expecting [B,3,H,W]; got {normals.shape}.")
        if reduction not in ("closest", "mean"):
            raise ValueError(f"Unrecognized reduction method: {reduction}.")

        mean_normals = MarigoldNormalsPipeline.normalize_normals(jnp.mean(normals, axis=0, keepdims=True))
        sim_cos = jnp.clip(jnp.sum(mean_normals * normals, axis=1, keepdims=True), -1, 1)

        uncertainty = None
        if output_uncertainty:
            uncertainty = jnp.mean(jnp.arccos(sim_cos), axis=0, keepdims=True) / np.pi

        if reduction == "mean":
            return mean_normals, uncertainty

        closest = jnp.argmax(sim_cos, axis=0, keepdims=True)  # [1,1,H,W]
        closest = jnp.repeat(closest, 3, axis=1)
        closest_normals = jnp.take_along_axis(normals, closest, axis=0)
        return closest_normals, uncertainty
