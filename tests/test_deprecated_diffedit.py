"""Round-5 deprecated batch 5: DiffEdit mask-guided editing."""

import jax
import jax.numpy as jnp
import numpy as np


def _diffedit_pipe():
    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    from diffusers_tpu.pipelines.deprecated.stable_diffusion_diffedit import (
        StableDiffusionDiffEditPipeline,
    )
    from diffusers_tpu.schedulers import DDIMInverseScheduler, DDIMScheduler

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items()
             if k in ("vae", "text_encoder", "tokenizer", "unet")}
    comps["scheduler"] = DDIMScheduler(num_train_timesteps=1000, clip_sample=False,
                                       set_alpha_to_one=False, steps_offset=1)
    comps["inverse_scheduler"] = DDIMInverseScheduler(
        num_train_timesteps=1000, clip_sample=False, set_alpha_to_one=False, steps_offset=1)
    return StableDiffusionDiffEditPipeline(**comps)


def test_diffedit_full_three_stage_flow():
    pipe = _diffedit_pipe()
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1

    mask = pipe.generate_mask(
        image=image, target_prompt="a cat", source_prompt="a dog",
        num_maps_per_mask=2, mask_encode_strength=0.5, num_inference_steps=4,
        guidance_scale=3.0, key=jax.random.PRNGKey(0))
    latent_hw = 16 // pipe.vae_scale_factor
    assert mask.shape == (1, latent_hw, latent_hw)
    assert set(np.unique(mask)).issubset({0.0, 1.0})

    inv = pipe.invert(prompt="a dog", image=image, num_inference_steps=4,
                      inpaint_strength=1.0, guidance_scale=3.0, key=jax.random.PRNGKey(1))
    # strength 1.0 -> all 4 steps recorded, time-reversed, [B, T, C, h, w]
    assert inv.latents.shape == (1, 4, 4, latent_hw, latent_hw)
    assert np.isfinite(np.asarray(inv.latents)).all()

    out = pipe("a cat", mask_image=mask, image_latents=inv.latents,
               inpaint_strength=1.0, num_inference_steps=4, guidance_scale=3.0,
               key=jax.random.PRNGKey(2), output_type="np")
    assert np.asarray(out.images).shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out.images)).all()


def test_diffedit_mask_prompts_steer_mask():
    pipe = _diffedit_pipe()
    rng = np.random.RandomState(1)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    kwargs = dict(image=image, num_maps_per_mask=2, mask_encode_strength=0.6,
                  num_inference_steps=4, guidance_scale=3.0, key=jax.random.PRNGKey(0))
    m_same = pipe.generate_mask(target_prompt="a dog", source_prompt="a dog", **kwargs)
    # identical prompts -> zero noise diff -> empty mask
    assert m_same.sum() == 0


def test_diffedit_masked_region_preserved():
    """Outside the mask, the output latent must equal the inverted trail's final latent."""
    pipe = _diffedit_pipe()
    rng = np.random.RandomState(2)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    latent_hw = 16 // pipe.vae_scale_factor

    inv = pipe.invert(prompt="a dog", image=image, num_inference_steps=4,
                      inpaint_strength=1.0, guidance_scale=1.0, key=jax.random.PRNGKey(1))
    mask = np.zeros((1, latent_hw, latent_hw), np.float32)
    mask[0, : latent_hw // 2] = 1.0  # edit top half only

    out = pipe("a cat", mask_image=mask, image_latents=inv.latents,
               inpaint_strength=1.0, num_inference_steps=4, guidance_scale=1.0,
               key=jax.random.PRNGKey(2), output_type="latent")
    final = np.asarray(out.images)
    # the (1 - mask) region is snapped to image_latents[i] each step; the last
    # step uses the ORIGINAL clean image latent (trail index -1 after reversal)
    trail = np.asarray(inv.latents)  # [B, T, ...] time-reversed
    expected_keep = trail[:, -1]
    np.testing.assert_allclose(final[0, :, latent_hw // 2 :],
                               expected_keep[0, :, latent_hw // 2 :], atol=1e-4)


def test_diffedit_invert_with_regularization():
    pipe = _diffedit_pipe()
    rng = np.random.RandomState(3)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    base = pipe.invert(prompt="a dog", image=image, num_inference_steps=3,
                       inpaint_strength=1.0, guidance_scale=1.0,
                       key=jax.random.PRNGKey(4))
    reg = pipe.invert(prompt="a dog", image=image, num_inference_steps=3,
                      inpaint_strength=1.0, guidance_scale=1.0,
                      num_reg_steps=2, num_auto_corr_rolls=2,
                      lambda_auto_corr=20.0, lambda_kl=20.0,
                      key=jax.random.PRNGKey(4))
    a, b = np.asarray(base.latents), np.asarray(reg.latents)
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-7  # regularizer actually moved the noise
