"""Round-5 deprecated batch 2: SEGA semantic guidance, CycleDiffusion,
TIME model editing, AudioDiffusion + librosa-free Mel."""

import jax
import jax.numpy as jnp
import numpy as np


def _sd_components():
    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    return {k: v for k, v in pipe.components.items()
            if k in ("vae", "text_encoder", "tokenizer", "unet", "scheduler")}


def test_semantic_sd_edit_changes_output():
    from diffusers_tpu.pipelines.deprecated.semantic_stable_diffusion import (
        SemanticStableDiffusionPipeline,
    )

    pipe = SemanticStableDiffusionPipeline(**_sd_components())
    kwargs = dict(height=16, width=16, num_inference_steps=4, guidance_scale=6.0,
                  key=jax.random.PRNGKey(0), output_type="np")
    base = pipe("a castle", **kwargs)
    edited = pipe("a castle", editing_prompt=["snowy winter", "sunset"],
                  edit_warmup_steps=1, edit_guidance_scale=4.0, edit_threshold=0.5,
                  reverse_editing_direction=[False, True], **kwargs)
    assert np.isfinite(np.asarray(edited.images)).all()
    assert np.abs(np.asarray(edited.images) - np.asarray(base.images)).max() > 1e-5
    # no editing prompt -> identical to plain CFG
    noedit = pipe("a castle", **kwargs)
    np.testing.assert_allclose(np.asarray(noedit.images), np.asarray(base.images), atol=1e-5)


def test_cycle_diffusion_runs_and_depends_on_source_prompt():
    from diffusers_tpu.pipelines.deprecated.stable_diffusion_variants import CycleDiffusionPipeline
    from diffusers_tpu.schedulers import DDIMScheduler

    comps = _sd_components()
    comps["scheduler"] = DDIMScheduler(num_train_timesteps=1000, clip_sample=False,
                                       set_alpha_to_one=False, steps_offset=1)  # SD config; keeps t_min variance > 0
    pipe = CycleDiffusionPipeline(**comps)
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    kwargs = dict(image=image, strength=0.8, num_inference_steps=4, guidance_scale=3.0,
                  eta=0.1, key=jax.random.PRNGKey(0), output_type="latent")
    a = np.asarray(pipe("a photo of a cat", source_prompt="a photo of a dog", **kwargs).images)
    b = np.asarray(pipe("a photo of a cat", source_prompt="a sketch of a house", **kwargs).images)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-5  # source prompt steers the noise transfer


def test_model_editing_time_closed_form():
    from diffusers_tpu.pipelines.deprecated.stable_diffusion_variants import (
        StableDiffusionModelEditingPipeline,
    )

    pipe = StableDiffusionModelEditingPipeline(**_sd_components(), with_augs=[])
    kwargs = dict(height=16, width=16, num_inference_steps=3, guidance_scale=6.0,
                  key=jax.random.PRNGKey(0), output_type="np")
    before = np.asarray(pipe("a pack of roses", **kwargs).images)
    old_params = jax.tree.leaves(pipe.unet[1])

    pipe.edit_model("A pack of roses", "A pack of blue roses", lamb=0.1)
    new_leaves = jax.tree.leaves(pipe.unet[1])
    changed = sum(int(not np.allclose(np.asarray(a), np.asarray(b)))
                  for a, b in zip(old_params, new_leaves))
    assert changed > 0  # cross-attn k/v projections rewritten
    after = np.asarray(pipe("a pack of roses", **kwargs).images)
    assert np.isfinite(after).all()
    assert np.abs(after - before).max() > 1e-6

    # restart_params=True must re-edit from the pristine weights (idempotent)
    p1 = jax.tree.leaves(pipe.edit_model("A pack of roses", "A pack of blue roses", lamb=0.1))
    p2 = jax.tree.leaves(pipe.edit_model("A pack of roses", "A pack of blue roses", lamb=0.1))
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mel_roundtrip_and_audio_diffusion_pipeline():
    from diffusers_tpu.models.unets.unet_2d import UNet2DModel
    from diffusers_tpu.pipelines.deprecated.audio_diffusion import AudioDiffusionPipeline, Mel
    from diffusers_tpu.schedulers import DDIMScheduler

    mel = Mel(x_res=8, y_res=8, sample_rate=8000, n_fft=256, hop_length=128, n_iter=4)
    t = np.linspace(0, 1, 8000)
    tone = 0.5 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mel.load_audio(raw_audio=tone)
    assert mel.get_number_of_slices() >= 1
    img = mel.audio_slice_to_image(0)
    assert img.size == (8, 8)
    audio = mel.image_to_audio(img)
    assert audio.shape == (mel.slice_size,)
    assert np.isfinite(audio).all()

    model = UNet2DModel(
        sample_size=8, in_channels=1, out_channels=1, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=4, norm_num_groups=8,
    )
    pipe = AudioDiffusionPipeline(
        vqvae=None, unet=(model, model.init_params(jax.random.PRNGKey(0))),
        mel=mel, scheduler=DDIMScheduler(num_train_timesteps=10))
    out = pipe(batch_size=1, steps=3, key=jax.random.PRNGKey(1))
    assert len(out.images) == 1 and out.images[0].size == (8, 8)
    assert out.audios.shape[0] == 1
    assert np.isfinite(out.audios).all()

    # audio-conditioned continuation with masking
    out2 = pipe(batch_size=1, steps=3, raw_audio=tone, start_step=1,
                mask_start_secs=0.05, key=jax.random.PRNGKey(2))
    assert np.isfinite(out2.audios).all()

    # deterministic DDIM encode runs
    noise = pipe.encode(out.images, steps=3)
    assert noise.shape == (1, 1, 8, 8)
    assert np.isfinite(noise).all()
