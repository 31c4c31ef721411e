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


def _tiny_sd_lora(seed, scale_mag=0.1):
    """A PEFT-format LoRA over the tiny SD UNet's mid-block to_q."""
    rng = np.random.RandomState(seed)
    return {
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.weight":
            (rng.randn(2, 16) * scale_mag).astype(np.float32),
        "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.weight":
            (rng.randn(16, 2) * scale_mag).astype(np.float32),
    }


def test_lora_runtime_set_adapters_and_unfuse():
    """Reference peft.py:661 set_adapters semantics: named adapters activate
    at per-adapter scales across calls without reloading base weights."""
    import jax

    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(prompt="lora test", height=16, width=16, num_inference_steps=1,
                  output_type="latent", key=jax.random.PRNGKey(0))
    base_out = np.asarray(pipe(**kwargs).images)
    base_kernel = np.asarray(pipe.unet[1]["mid_block"]["attentions"][0]["transformer_blocks"][0]["attn1"]["to_q"]["kernel"])

    pipe.load_lora_weights(_tiny_sd_lora(0), adapter_name="style_a")
    a_out = np.asarray(pipe(**kwargs).images)
    assert not np.allclose(a_out, base_out)
    assert pipe.get_active_adapters() == {"style_a": 1.0}

    pipe.load_lora_weights(_tiny_sd_lora(1), adapter_name="style_b")
    # both adapters, different scales — no reload of base weights
    pipe.set_adapters(["style_a", "style_b"], [0.3, 0.7])
    ab_out = np.asarray(pipe(**kwargs).images)
    assert not np.allclose(ab_out, a_out)

    # manual fused-kernel check for the multi-adapter merge
    k = np.asarray(pipe.unet[1]["mid_block"]["attentions"][0]["transformer_blocks"][0]["attn1"]["to_q"]["kernel"])
    la, lb = _tiny_sd_lora(0), _tiny_sd_lora(1)
    pref = "unet.mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    expected = base_kernel \
        + 0.3 * (la[pref + ".lora_B.weight"] @ la[pref + ".lora_A.weight"]).T \
        + 0.7 * (lb[pref + ".lora_B.weight"] @ lb[pref + ".lora_A.weight"]).T
    np.testing.assert_allclose(k, expected, atol=1e-5)

    # swap back to a single adapter at a different scale
    pipe.set_adapters("style_a", 0.5)
    a_half = np.asarray(pipe(**kwargs).images)
    assert not np.allclose(a_half, a_out)

    # unfuse → identical to the pristine base output
    pipe.disable_lora()
    restored = np.asarray(pipe(**kwargs).images)
    np.testing.assert_allclose(restored, base_out, atol=1e-6)

    # delete active adapter falls back cleanly
    pipe.set_adapters("style_b")
    pipe.delete_adapters("style_b")
    assert pipe.get_active_adapters() == {}
    np.testing.assert_allclose(np.asarray(pipe(**kwargs).images), base_out, atol=1e-6)
