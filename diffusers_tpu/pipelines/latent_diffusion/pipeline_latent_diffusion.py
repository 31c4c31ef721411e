"""Latent Diffusion (CompVis LDM) text-to-image pipeline + LDMBert encoder.

Behavioral mirror of the reference
`pipelines/latent_diffusion/pipeline_latent_diffusion.py`: the LDMBert
text encoder is a pre-norm BART-style encoder with bias-free qkv
projections, a decoupled head_dim (inner dim = heads * head_dim ≠
d_model in general, `:317`), learned position embeddings and a final
LayerNorm (`:559`); the pipeline does 77-token conditioning, optional
CFG (guidance_scale != 1), a DDIM denoise loop, and VQ-VAE decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: np.ndarray


@dataclass
class LDMBertOutput(BaseOutput):
    last_hidden_state: jax.Array


class _LDMBertAttention(Module):
    def __init__(self, embed_dim: int, num_heads: int, head_dim: int):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = head_dim
        inner = num_heads * head_dim
        self.q_proj = Linear(embed_dim, inner, use_bias=False)
        self.k_proj = Linear(embed_dim, inner, use_bias=False)
        self.v_proj = Linear(embed_dim, inner, use_bias=False)
        self.out_proj = Linear(inner, embed_dim)

    def __call__(self, params: Params, x: jax.Array, additive_mask=None) -> jax.Array:
        B, S, _ = x.shape
        q = self.q_proj(params["q_proj"], x) * self.head_dim**-0.5
        k = self.k_proj(params["k_proj"], x)
        v = self.v_proj(params["v_proj"], x)
        q, k, v = (
            jnp.transpose(t.reshape(B, S, self.num_heads, self.head_dim), (0, 2, 1, 3))
            for t in (q, k, v)
        )
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if additive_mask is not None:
            scores = scores + additive_mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, -1)
        return self.out_proj(params["out_proj"], out)


class _LDMBertEncoderLayer(Module):
    def __init__(self, d_model: int, num_heads: int, head_dim: int, ffn_dim: int, activation: str):
        super().__init__()
        self.activation = activation
        self.self_attn = _LDMBertAttention(d_model, num_heads, head_dim)
        self.self_attn_layer_norm = LayerNorm(d_model)
        self.fc1 = Linear(d_model, ffn_dim)
        self.fc2 = Linear(ffn_dim, d_model)
        self.final_layer_norm = LayerNorm(d_model)

    def __call__(self, params: Params, x: jax.Array, additive_mask=None) -> jax.Array:
        residual = x
        x = self.self_attn_layer_norm(params["self_attn_layer_norm"], x)
        x = residual + self.self_attn(params["self_attn"], x, additive_mask)
        residual = x
        x = self.final_layer_norm(params["final_layer_norm"], x)
        act = jax.nn.gelu if self.activation == "gelu" else jax.nn.silu
        x = self.fc2(params["fc2"], act(self.fc1(params["fc1"], x), approximate=False))
        return residual + x


class _LDMBertEncoder(Module):
    def __init__(self, vocab_size, d_model, num_layers, num_heads, head_dim, ffn_dim,
                 max_position_embeddings, activation):
        super().__init__()
        self.embed_tokens = Embedding(vocab_size, d_model)
        self.embed_positions = Embedding(max_position_embeddings, d_model)
        self.layers = ModuleList([
            _LDMBertEncoderLayer(d_model, num_heads, head_dim, ffn_dim, activation)
            for _ in range(num_layers)
        ])
        self.layer_norm = LayerNorm(d_model)

    def __call__(self, params: Params, input_ids: jax.Array, attention_mask=None) -> jax.Array:
        S = input_ids.shape[1]
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        x = x + self.embed_positions(params["embed_positions"], jnp.arange(S))[None]
        additive_mask = None
        if attention_mask is not None:
            additive_mask = ((1 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, None, :]
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][i], x, additive_mask)
        return self.layer_norm(params["layer_norm"], x)


class LDMBertModel(Module, ModelMixin, ConfigMixin):
    """LDMBert (reference `pipeline_latent_diffusion.py:719`)."""

    @register_to_config
    def __init__(
        self,
        vocab_size: int = 30522,
        max_position_embeddings: int = 77,
        encoder_layers: int = 32,
        encoder_ffn_dim: int = 5120,
        encoder_attention_heads: int = 8,
        head_dim: int = 64,
        activation_function: str = "gelu",
        d_model: int = 1280,
        pad_token_id: int = 0,
    ):
        super().__init__()
        self.model = _LDMBertEncoder(
            vocab_size, d_model, encoder_layers, encoder_attention_heads, head_dim,
            encoder_ffn_dim, max_position_embeddings, activation_function,
        )
        self.to_logits = Linear(d_model, vocab_size)

    def __call__(self, params: Params, input_ids: jax.Array, attention_mask=None,
                 return_dict: bool = True):
        out = self.model(params["model"], input_ids, attention_mask)
        if not return_dict:
            return (out,)
        return LDMBertOutput(last_hidden_state=out)


class LDMTextToImagePipeline(DiffusionPipeline):
    def __init__(self, vqvae, bert, tokenizer, unet, scheduler):
        super().__init__()
        self.register_modules(vqvae=vqvae, bert=bert, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(self.vqvae[0].config.block_out_channels) - 1)

    def _denoise(self, params, latents, context, state, guidance_scale, do_cfg, eta, key):
        unet, scheduler = self.unet[0], self.scheduler
        step_keys = jax.random.split(key, state.timesteps.shape[0])

        def step_fn(latents, xs):
            t, k = xs
            latents_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = unet(params, latents_input, t, encoder_hidden_states=context).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(state, noise_pred, t, latents, eta=eta, key=k)
            return out.prev_sample, None

        latents, _ = jax.lax.scan(step_fn, latents, (state.timesteps, step_keys))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]],
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 1.0,
        eta: float = 0.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vqvae, vq_params = self.vqvae
        bert, bert_params = self.bert
        height = height or unet.config.sample_size * self.vae_scale_factor
        width = width or unet.config.sample_size * self.vae_scale_factor
        if height % 8 != 0 or width % 8 != 0:
            raise ValueError(f"`height`/`width` must be divisible by 8, got {height}x{width}")
        if isinstance(prompt, str):
            prompt = [prompt]
        batch_size = len(prompt)
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale != 1.0

        text_input = self.tokenizer(prompt, padding="max_length", max_length=77,
                                    truncation=True, return_tensors="np")
        prompt_embeds = bert(bert_params, jnp.asarray(text_input.input_ids)).last_hidden_state
        context = prompt_embeds
        if do_cfg:
            uncond_input = self.tokenizer([""] * batch_size, padding="max_length", max_length=77,
                                          truncation=True, return_tensors="np")
            negative_embeds = bert(bert_params, jnp.asarray(uncond_input.input_ids)).last_hidden_state
            context = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)

        latents_shape = (batch_size, unet.config.in_channels, height // 8, width // 8)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(latents_shape, key=lat_key)
        elif latents.shape != latents_shape:
            raise ValueError(f"Unexpected latents shape {latents.shape}, expected {latents_shape}")

        state = self.scheduler.set_timesteps(num_inference_steps)
        key, step_key = jax.random.split(key)
        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg, eta=eta),
            static=(guidance_scale, do_cfg, eta, num_inference_steps),
        )
        latents = denoise(unet_params, latents, context, state, key=step_key)

        scaling = getattr(vqvae.config, "scaling_factor", 1.0) or 1.0
        decode = self._jit("decode", lambda p, z: vqvae.decode(p, z / scaling).sample)
        image = decode(vq_params, latents)
        image = np.asarray(jnp.transpose(jnp.clip(image / 2 + 0.5, 0, 1), (0, 2, 3, 1)))

        if output_type == "pil":
            from ...image_processor import numpy_to_pil

            image = numpy_to_pil(image)
        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)
