"""LoRA fuse tests: diffusers/PEFT format and kohya format."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.loaders.lora import fuse_lora, group_lora_weights, load_lora_weights
from diffusers_tpu.models.transformers.transformer_flux import FluxTransformer2DModel

TINY = dict(
    patch_size=1, in_channels=4, num_layers=1, num_single_layers=1,
    attention_head_dim=8, num_attention_heads=2, joint_attention_dim=16,
    pooled_projection_dim=16, axes_dims_rope=(2, 4, 2),
)


def test_fuse_peft_format_changes_output_and_matches_manual():
    model = FluxTransformer2DModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    r, dim = 2, 16
    A = rng.randn(r, dim).astype(np.float32) * 0.1
    B = rng.randn(dim, r).astype(np.float32) * 0.1
    sd = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": A,
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": B,
        "transformer.transformer_blocks.0.attn.to_q.alpha": np.array(4.0, dtype=np.float32),
    }
    new_params = load_lora_weights(sd, params, scale=0.5)

    old_k = np.asarray(params["transformer_blocks"][0]["attn"]["to_q"]["kernel"])
    new_k = np.asarray(new_params["transformer_blocks"][0]["attn"]["to_q"]["kernel"])
    expected = old_k + 0.5 * (4.0 / r) * (B @ A).T
    np.testing.assert_allclose(new_k, expected, atol=1e-6)

    # unrelated params untouched
    np.testing.assert_array_equal(
        np.asarray(params["transformer_blocks"][0]["attn"]["to_k"]["kernel"]),
        np.asarray(new_params["transformer_blocks"][0]["attn"]["to_k"]["kernel"]),
    )
    # original pytree not mutated
    np.testing.assert_array_equal(
        old_k, np.asarray(params["transformer_blocks"][0]["attn"]["to_q"]["kernel"])
    )


def test_group_filters_component():
    sd = {
        "transformer.x_embedder.lora_A.weight": np.zeros((2, 4), np.float32),
        "transformer.x_embedder.lora_B.weight": np.zeros((8, 2), np.float32),
        "text_encoder.foo.lora_A.weight": np.zeros((2, 4), np.float32),
        "text_encoder.foo.lora_B.weight": np.zeros((8, 2), np.float32),
    }
    grouped = group_lora_weights(sd, component="transformer")
    assert list(grouped.keys()) == ["x_embedder"]


def test_kohya_format_conversion():
    sd = {
        "lora_unet_single_transformer_blocks_0_attn_to_q.lora_down.weight": np.ones((2, 16), np.float32) * 0.01,
        "lora_unet_single_transformer_blocks_0_attn_to_q.lora_up.weight": np.ones((16, 2), np.float32) * 0.01,
        "lora_unet_single_transformer_blocks_0_attn_to_q.alpha": np.array(2.0, dtype=np.float32),
    }
    grouped = group_lora_weights(sd, component="unet")
    assert "single_transformer_blocks.0.attn.to_q" in grouped

    model = FluxTransformer2DModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    new_params = fuse_lora(params, grouped, scale=1.0)
    diff = np.abs(
        np.asarray(new_params["single_transformer_blocks"][0]["attn"]["to_q"]["kernel"])
        - np.asarray(params["single_transformer_blocks"][0]["attn"]["to_q"]["kernel"])
    )
    assert diff.max() > 0
