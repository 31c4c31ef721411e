"""T2I-Adapter model + pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu import MultiAdapter, StableDiffusionAdapterPipeline, T2IAdapter


def test_full_adapter_feature_pyramid():
    adapter = T2IAdapter(in_channels=3, channels=(8, 16, 32, 32), num_res_blocks=1,
                         downscale_factor=2, adapter_type="full_adapter")
    params = adapter.init_params(jax.random.PRNGKey(0))
    x = jnp.ones((1, 3, 32, 32))
    feats = adapter(params, x)
    assert [f.shape for f in feats] == [
        (1, 8, 16, 16), (1, 16, 8, 8), (1, 32, 4, 4), (1, 32, 2, 2)
    ]
    assert adapter.total_downscale_factor == 2 * 2 ** 3


def test_full_adapter_xl_downscale_pattern():
    adapter = T2IAdapter(in_channels=3, channels=(8, 16, 32, 32), num_res_blocks=1,
                         downscale_factor=4, adapter_type="full_adapter_xl")
    params = adapter.init_params(jax.random.PRNGKey(0))
    feats = adapter(params, jnp.ones((1, 3, 32, 32)))
    # XL: only block 2 downsamples
    assert [f.shape for f in feats] == [
        (1, 8, 8, 8), (1, 16, 8, 8), (1, 32, 4, 4), (1, 32, 4, 4)
    ]


def test_light_adapter():
    adapter = T2IAdapter(in_channels=3, channels=(8, 16, 32), num_res_blocks=1,
                         downscale_factor=2, adapter_type="light_adapter")
    params = adapter.init_params(jax.random.PRNGKey(0))
    feats = adapter(params, jnp.ones((1, 3, 32, 32)))
    assert [f.shape[1] for f in feats] == [8, 16, 32, 32]
    assert feats[-1].shape == (1, 32, 2, 2)


def test_multi_adapter_weighted_sum():
    a1 = T2IAdapter(channels=(8, 16), num_res_blocks=1, downscale_factor=2)
    a2 = T2IAdapter(channels=(8, 16), num_res_blocks=1, downscale_factor=2)
    multi = MultiAdapter([a1, a2])
    params = multi.init(jax.random.PRNGKey(0))
    xs = jnp.ones((1, 6, 16, 16))
    feats = multi(params, xs, adapter_weights=[0.25, 0.75])
    f1 = a1(params["adapters"][0], xs[:, :3])
    f2 = a2(params["adapters"][1], xs[:, 3:])
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(0.25 * f1[0] + 0.75 * f2[0]), atol=1e-6)

    with pytest.raises(ValueError, match="single adapter"):
        MultiAdapter([a1])


def test_adapter_pipeline_runs_and_conditions():
    from tests.test_pipelines_ip2p_upscale import _small_components
    from tests.test_pipeline_stable_diffusion import DummyTokenizer

    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    vae, te, _, sched = _small_components(in_channels=4)
    # all-cross-attn UNet so each block consumes one adapter feature at its
    # operating resolution: block0 8ch@32, block1 16ch@16 (latents are 32px:
    # tiny VAE has scale factor 1)
    key = jax.random.PRNGKey(0)
    unet_m = UNet2DConditionModel(
        sample_size=32, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, attention_head_dim=2,
        cross_attention_dim=16, norm_num_groups=4,
    )
    unet = (unet_m, unet_m.init_params(key))
    adapter = T2IAdapter(in_channels=3, channels=(8, 16), num_res_blocks=1,
                         downscale_factor=1, adapter_type="full_adapter")
    adapter_params = adapter.init_params(jax.random.PRNGKey(1))
    pipe = StableDiffusionAdapterPipeline(
        vae=vae, text_encoder=te, tokenizer=DummyTokenizer(), unet=unet,
        adapter=(adapter, adapter_params), scheduler=sched,
    )
    control = np.zeros((32, 32, 3), np.float32)
    control[8:24, 8:24] = 1.0
    out = pipe(prompt="a box", image=control, num_inference_steps=2, guidance_scale=6.0,
               key=jax.random.PRNGKey(0), output_type="latent")
    ref = pipe(prompt="a box", image=control, num_inference_steps=2, guidance_scale=6.0,
               adapter_conditioning_scale=0.0, key=jax.random.PRNGKey(0), output_type="latent")
    assert out.images.shape == ref.images.shape
    assert not np.allclose(np.asarray(out.images), np.asarray(ref.images)), \
        "adapter features must influence the output"
