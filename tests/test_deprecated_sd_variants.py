"""Round-5 deprecated SD variants: panorama (MultiDiffusion), SLD safe,
LDM3D rgb+depth, legacy inpaint, ParaDiGMS parallel sampling + the parallel
scheduler parity vs torch."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")


def _sd_components():
    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    return {k: v for k, v in pipe.components.items()
            if k in ("vae", "text_encoder", "tokenizer", "unet", "scheduler")}


def test_panorama_pipeline_multidiffusion():
    from diffusers_tpu.pipelines.deprecated.stable_diffusion_panorama.pipeline_stable_diffusion_panorama import (
        StableDiffusionPanoramaPipeline,
        get_views,
    )

    # reference view math: 512x2048 -> 8-latent stride windows
    views = get_views(512, 2048, window_size=64, stride=8)
    assert len(views) == 25 and views[0] == (0, 64, 0, 64) and views[-1] == (0, 64, 192, 256)
    wrap = get_views(512, 2048, window_size=64, stride=8, circular_padding=True)
    assert len(wrap) == 32 and wrap[-1][3] > 256  # wrap-around views exist

    pipe = StableDiffusionPanoramaPipeline(**_sd_components())
    out = pipe("a mountain panorama", height=16, width=32, num_inference_steps=2,
               guidance_scale=6.0, window_size=8, stride=4,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 16, 32, 3)
    assert np.isfinite(out.images).all()
    # circular padding path
    out = pipe("a mountain panorama", height=16, width=32, num_inference_steps=2,
               guidance_scale=6.0, window_size=8, stride=4, circular_padding=True,
               key=jax.random.PRNGKey(0), output_type="np")
    assert np.isfinite(out.images).all()


def test_safe_pipeline_sld_guidance():
    from diffusers_tpu.pipelines.deprecated.stable_diffusion_safe import (
        SafetyConfig,
        StableDiffusionPipelineSafe,
    )

    pipe = StableDiffusionPipelineSafe(**_sd_components())
    kwargs = dict(height=16, width=16, num_inference_steps=3, guidance_scale=6.0,
                  key=jax.random.PRNGKey(0), output_type="np")
    strong = pipe("a portrait", **kwargs, **SafetyConfig.MAX)
    assert np.isfinite(strong.images).all()
    # sld disabled (scale <= 1) must equal the plain SD result
    off = pipe("a portrait", **kwargs, sld_guidance_scale=0.0)
    from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline

    plain = StableDiffusionPipeline(**_sd_components())("a portrait", **kwargs)
    np.testing.assert_allclose(np.asarray(off.images), np.asarray(plain.images), atol=1e-4)
    # with MAX config the safety stream must change the output
    assert np.abs(np.asarray(strong.images) - np.asarray(off.images)).max() > 1e-5


def test_ldm3d_pipeline_rgb_depth():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.pipelines.deprecated.stable_diffusion_ldm3d import StableDiffusionLDM3DPipeline

    comps = _sd_components()
    key = jax.random.PRNGKey(0)
    vae6 = AutoencoderKL(
        in_channels=6, out_channels=6, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
        scaling_factor=0.18,
    )
    comps["vae"] = (vae6, vae6.init_params(key))
    pipe = StableDiffusionLDM3DPipeline(**comps)
    out = pipe("a room with depth", height=16, width=16, num_inference_steps=2,
               guidance_scale=6.0, key=key, output_type="np")
    assert out.rgb.shape == (1, 16, 16, 3)
    assert out.depth.shape == (1, 16, 16, 3)
    assert np.isfinite(out.rgb).all() and np.isfinite(out.depth).all()
    pil = pipe("a room with depth", height=16, width=16, num_inference_steps=2,
               guidance_scale=6.0, key=key, output_type="pil")
    assert pil.depth[0].mode == "I;16"


def test_inpaint_legacy_preserves_masked_region():
    from diffusers_tpu.pipelines.deprecated.stable_diffusion_variants import (
        StableDiffusionInpaintPipelineLegacy,
    )

    pipe = StableDiffusionInpaintPipelineLegacy(**_sd_components())
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    # array-mask semantics (reference torch branch): 1 = KEEP; keep right half
    mask = np.zeros((1, 1, 16, 16), dtype=np.float32)
    mask[..., 8:] = 1.0
    out = pipe("a red couch", image=image, mask_image=mask, strength=0.8,
               num_inference_steps=3, guidance_scale=6.0,
               key=jax.random.PRNGKey(0), output_type="latent")
    latents = np.asarray(out.images)
    assert np.isfinite(latents).all()
    # kept half must equal the encoded original
    vae, vae_params = pipe.vae
    _, enc_key, _ = jax.random.split(jax.random.PRNGKey(0), 3)
    init_lat = np.asarray(
        vae.encode(vae_params, jnp.asarray(image)).sample(enc_key) * vae.config.scaling_factor)
    keep = init_lat.shape[-1] // 2
    np.testing.assert_allclose(latents[..., keep:], init_lat[..., keep:], atol=1e-4)
    assert np.abs(latents[..., :keep] - init_lat[..., :keep]).max() > 1e-3


def test_ddim_parallel_batch_step_parity():
    torch = pytest.importorskip("torch")
    from diffusers import DDIMParallelScheduler as TorchSched

    from diffusers_tpu.schedulers.scheduling_ddim_parallel import DDIMParallelScheduler

    ts = TorchSched(num_train_timesteps=1000)
    ts.set_timesteps(8)
    ours = DDIMParallelScheduler(num_train_timesteps=1000)
    state = ours.set_timesteps(8)

    rng = np.random.RandomState(0)
    sample = rng.randn(4, 4, 8, 8).astype(np.float32)
    eps = rng.randn(4, 4, 8, 8).astype(np.float32)
    tvec = np.asarray(ts.timesteps[:4])
    ref = ts.batch_step_no_noise(torch.from_numpy(eps), torch.from_numpy(tvec.copy()),
                                 torch.from_numpy(sample)).numpy()
    out = np.asarray(ours.batch_step_no_noise(state, jnp.asarray(eps), jnp.asarray(tvec),
                                              jnp.asarray(sample)))
    assert np.max(np.abs(out - ref)) < 1e-4, np.max(np.abs(out - ref))


def test_paradigms_pipeline_matches_sequential_ddim():
    from diffusers_tpu.pipelines.deprecated.stable_diffusion_variants import (
        StableDiffusionParadigmsPipeline,
    )
    from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline
    from diffusers_tpu.schedulers.scheduling_ddim_parallel import DDIMParallelScheduler

    comps = _sd_components()
    comps["scheduler"] = DDIMParallelScheduler(num_train_timesteps=1000)
    pipe = StableDiffusionParadigmsPipeline(**comps)
    kwargs = dict(height=16, width=16, num_inference_steps=6, guidance_scale=6.0,
                  key=jax.random.PRNGKey(3), latents=jnp.asarray(
                      np.random.RandomState(5).randn(1, 4, 8, 8).astype(np.float32)),
                  output_type="latent")
    # tight tolerance: Picard iterations must converge to the sequential DDIM result
    par = np.asarray(pipe("a lighthouse", parallel=4, tolerance=0.001, **kwargs).images)
    seq = StableDiffusionPipeline(**comps)
    ref = np.asarray(seq("a lighthouse", **kwargs).images)
    assert np.isfinite(par).all()
    cos = float(par.ravel() @ ref.ravel() / (np.linalg.norm(par) * np.linalg.norm(ref) + 1e-9))
    assert cos > 0.99, cos
