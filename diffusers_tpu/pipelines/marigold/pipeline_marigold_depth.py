"""Marigold monocular depth estimation pipeline.

Behavioral mirror of the reference
`pipelines/marigold/pipeline_marigold_depth.py`: empty-text CLIP
conditioning (`:463`), per-image `ensemble_size` diffused predictions with
the image latent channel-concatenated to the prediction latent (`:525`),
decode → channel-mean → [0,1] (`:663`), affine-invariant ensemble
alignment via scipy BFGS over scale/shift (`:676`), optional uncertainty,
and output upsampling to the input resolution.

TPU-first: the denoise loop is one jitted `lax.scan` over timesteps with
the whole `N*E` ensemble batched; alignment stays host-side (tiny, scalar
scipy problem).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from .marigold_image_processing import MarigoldImageProcessor

logger = logging.get_logger(__name__)


@dataclass
class MarigoldDepthOutput(BaseOutput):
    prediction: Union[np.ndarray, jax.Array]
    uncertainty: Union[None, np.ndarray, jax.Array]
    latent: Optional[jax.Array]


class MarigoldDepthPipeline(DiffusionPipeline):
    supported_prediction_types = ("depth", "disparity")

    def __init__(
        self,
        unet,
        vae,
        scheduler,
        text_encoder,
        tokenizer,
        prediction_type: Optional[str] = None,
        scale_invariant: bool = True,
        shift_invariant: bool = True,
        default_denoising_steps: Optional[int] = None,
        default_processing_resolution: Optional[int] = None,
    ):
        super().__init__()
        self.register_modules(
            unet=unet, vae=vae, scheduler=scheduler, text_encoder=text_encoder, tokenizer=tokenizer
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1)
        self.prediction_type = prediction_type
        self.scale_invariant = scale_invariant
        self.shift_invariant = shift_invariant
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
        prediction = jnp.mean(prediction, axis=1, keepdims=True)
        return (jnp.clip(prediction, -1.0, 1.0) + 1.0) / 2.0

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

        # encode the image, replicate per ensemble member
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
                self.ensemble_depth(
                    prediction[i], self.scale_invariant, self.shift_invariant, output_uncertainty,
                    **(ensembling_kwargs or {}),
                )
                for i in range(num_images)
            ]
            prediction = jnp.concatenate([p for p, _ in pairs], axis=0)
            if output_uncertainty:
                uncertainty = jnp.concatenate([u for _, u in pairs], axis=0)

        if match_input_resolution:
            prediction = self.image_processor.resize_antialias(
                prediction, original_resolution, resample_method_output, is_aa=False
            )
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
        return MarigoldDepthOutput(prediction=prediction, uncertainty=uncertainty, latent=pred_latent)

    @staticmethod
    def ensemble_depth(
        depth: jax.Array,
        scale_invariant: bool = True,
        shift_invariant: bool = True,
        output_uncertainty: bool = False,
        reduction: str = "median",
        regularizer_strength: float = 0.02,
        max_iter: int = 2,
        tol: float = 1e-3,
        max_res: int = 1024,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Scale/shift alignment (scipy BFGS, host-side) + median/mean
        reduction (reference ensemble_depth :684)."""
        if depth.ndim != 4 or depth.shape[1] != 1:
            raise ValueError(f"Expecting [B,1,H,W]; got {depth.shape}.")
        if reduction not in ("mean", "median"):
            raise ValueError(f"Unrecognized reduction method: {reduction}.")
        if not scale_invariant and shift_invariant:
            raise ValueError("Pure shift-invariant ensembling is not supported.")

        ensemble_size = depth.shape[0]
        depth_np = np.asarray(depth, dtype=np.float32)

        def align(d: np.ndarray, param: np.ndarray) -> np.ndarray:
            if scale_invariant and shift_invariant:
                s, t = np.split(param, 2)
                return d * s.reshape(-1, 1, 1, 1) + t.reshape(-1, 1, 1, 1)
            return d * param.reshape(-1, 1, 1, 1)

        def ensemble(d: np.ndarray, return_uncertainty: bool = False):
            if reduction == "mean":
                pred = np.mean(d, axis=0, keepdims=True)
                unc = np.std(d, axis=0, keepdims=True) if return_uncertainty else None
            else:
                pred = np.median(d, axis=0, keepdims=True)
                unc = np.median(np.abs(d - pred), axis=0, keepdims=True) if return_uncertainty else None
            return pred, unc

        requires_aligning = scale_invariant or shift_invariant
        if requires_aligning:
            import scipy.optimize

            d_align = depth_np
            if max_res is not None and max(d_align.shape[2:]) > max_res:
                d_align = np.asarray(
                    MarigoldImageProcessor.resize_to_max_edge(jnp.asarray(d_align), max_res, "nearest-exact")
                )
            init_min = d_align.reshape(ensemble_size, -1).min(axis=1)
            init_max = d_align.reshape(ensemble_size, -1).max(axis=1)
            if scale_invariant and shift_invariant:
                init_s = 1.0 / np.clip(init_max - init_min, 1e-6, None)
                param0 = np.concatenate([init_s, -init_s * init_min]).astype(np.float64)
            else:
                param0 = (1.0 / np.clip(init_max, 1e-6, None)).astype(np.float64)

            def cost_fn(param: np.ndarray) -> float:
                cost = 0.0
                aligned = align(d_align, param)
                for i in range(ensemble_size):
                    for j in range(i + 1, ensemble_size):
                        diff = aligned[i] - aligned[j]
                        cost += float(np.sqrt(np.mean(diff**2)))
                if regularizer_strength > 0:
                    pred, _ = ensemble(aligned)
                    cost += (abs(float(pred.min())) + abs(1.0 - float(pred.max()))) * regularizer_strength
                return cost

            res = scipy.optimize.minimize(
                cost_fn, param0, method="BFGS", tol=tol, options={"maxiter": max_iter, "disp": False}
            )
            depth_np = align(depth_np, res.x)

        depth_np, uncertainty = ensemble(depth_np, return_uncertainty=output_uncertainty)

        depth_max = depth_np.max()
        depth_min = depth_np.min() if (scale_invariant and shift_invariant) else 0.0
        depth_range = max(depth_max - depth_min, 1e-6)
        depth_np = (depth_np - depth_min) / depth_range
        if output_uncertainty:
            uncertainty = uncertainty / depth_range
            return jnp.asarray(depth_np), jnp.asarray(uncertainty)
        return jnp.asarray(depth_np), None
