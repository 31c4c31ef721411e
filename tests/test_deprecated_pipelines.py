"""Deprecated-family coverage, batch 1: PNDM / RePaint / ScoreSdeVe /
KarrasVe / LDM-uncond unconditional pipelines + AudioLDM / MusicLDM.

Reference: `/root/reference/src/diffusers/pipelines/deprecated/*` and
`/root/reference/src/diffusers/schedulers/deprecated/scheduling_karras_ve.py`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.unets.unet_2d import UNet2DModel

sys.path.insert(0, "/root/reference/src")

UNET_TINY = dict(
    sample_size=8, in_channels=3, out_channels=3, layers_per_block=1,
    block_out_channels=(8, 16), norm_num_groups=4,
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
)


def _unet(key):
    m = UNet2DModel(**UNET_TINY)
    return (m, m.init_params(key))


def test_pndm_pipeline():
    from diffusers_tpu.pipelines.deprecated import PNDMPipeline
    from diffusers_tpu.schedulers import PNDMScheduler

    pipe = PNDMPipeline(unet=_unet(jax.random.PRNGKey(0)), scheduler=PNDMScheduler(skip_prk_steps=True))
    out = pipe(batch_size=1, num_inference_steps=6, key=jax.random.PRNGKey(0), output_type="np")
    img = np.asarray(out.images)
    assert img.shape == (1, 8, 8, 3) and np.isfinite(img).all()


def test_repaint_pipeline():
    from diffusers_tpu.pipelines.deprecated import RePaintPipeline
    from diffusers_tpu.schedulers import RePaintScheduler

    pipe = RePaintPipeline(unet=_unet(jax.random.PRNGKey(1)), scheduler=RePaintScheduler())
    rng = np.random.RandomState(0)
    image = rng.uniform(-1, 1, (1, 3, 8, 8)).astype(np.float32)
    mask = np.ones((1, 3, 8, 8), np.float32)
    mask[:, :, 2:6, 2:6] = 0.0  # inpaint the center
    out = pipe(image=image, mask_image=mask, num_inference_steps=8, jump_length=2,
               jump_n_sample=2, key=jax.random.PRNGKey(0), output_type="np")
    img = np.asarray(out.images)
    assert img.shape == (1, 8, 8, 3) and np.isfinite(img).all()


def test_score_sde_ve_pipeline():
    from diffusers_tpu.pipelines.deprecated import ScoreSdeVePipeline
    from diffusers_tpu.schedulers import ScoreSdeVeScheduler

    pipe = ScoreSdeVePipeline(unet=_unet(jax.random.PRNGKey(2)),
                              scheduler=ScoreSdeVeScheduler(sigma_max=10.0))
    out = pipe(batch_size=1, num_inference_steps=4, key=jax.random.PRNGKey(0), output_type="np")
    img = np.asarray(out.images)
    assert img.shape == (1, 8, 8, 3) and np.isfinite(img).all()


@pytest.mark.refparity
def test_karras_ve_scheduler_parity_and_pipeline():
    torch = pytest.importorskip("torch")
    from diffusers.schedulers.deprecated import KarrasVeScheduler as TorchSched

    from diffusers_tpu.pipelines.deprecated import KarrasVePipeline
    from diffusers_tpu.schedulers.deprecated import KarrasVeScheduler

    ref_s = TorchSched(s_churn=0.0)  # deterministic (no churn noise)
    ours = KarrasVeScheduler(s_churn=0.0)
    n = 6
    ref_s.set_timesteps(n)
    state = ours.set_timesteps(n)
    np.testing.assert_allclose(np.asarray(state.schedule), ref_s.schedule.numpy(), rtol=1e-5)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 3, 8, 8).astype(np.float32)
    s_ref = torch.from_numpy(sample.copy()) * ref_s.init_noise_sigma
    s_ours = jnp.asarray(sample) * ours.init_noise_sigma
    for t in range(n - 1, -1, -1):
        sigma = float(np.asarray(state.schedule)[t])
        sigma_prev = float(np.asarray(state.schedule)[t - 1]) if t > 0 else 0.0
        mo = rng.randn(1, 3, 8, 8).astype(np.float32)
        out_ref = ref_s.step(torch.from_numpy(mo), sigma, sigma_prev, s_ref)
        out = ours.step(state, jnp.asarray(mo), sigma, sigma_prev, s_ours)
        if sigma_prev != 0:
            mo2 = rng.randn(1, 3, 8, 8).astype(np.float32)
            out_ref = ref_s.step_correct(torch.from_numpy(mo2), sigma, sigma_prev,
                                         s_ref, out_ref.prev_sample, out_ref.derivative)
            out = ours.step_correct(state, jnp.asarray(mo2), sigma, sigma_prev,
                                    s_ours, out.prev_sample, out.derivative)
        s_ref, s_ours = out_ref.prev_sample, out.prev_sample
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), rtol=1e-4, atol=1e-4)

    pipe = KarrasVePipeline(unet=_unet(jax.random.PRNGKey(3)), scheduler=KarrasVeScheduler())
    img = np.asarray(pipe(batch_size=1, num_inference_steps=4,
                          key=jax.random.PRNGKey(0), output_type="np").images)
    assert img.shape == (1, 8, 8, 3) and np.isfinite(img).all()


def test_ldm_uncond_pipeline():
    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.pipelines.deprecated import LDMPipeline
    from diffusers_tpu.schedulers import DDIMScheduler

    key = jax.random.PRNGKey(4)
    unet = UNet2DModel(**dict(UNET_TINY, in_channels=4, out_channels=4, sample_size=4))
    vq = VQModel(in_channels=3, out_channels=3, latent_channels=4, block_out_channels=(8,),
                 layers_per_block=1, norm_num_groups=4, num_vq_embeddings=16,
                 down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",))
    pipe = LDMPipeline(vqvae=(vq, vq.init_params(key)), unet=(unet, unet.init_params(key)),
                       scheduler=DDIMScheduler())
    out = pipe(batch_size=1, num_inference_steps=4, key=jax.random.PRNGKey(0), output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()


class DummyClapTok:
    model_max_length = 12

    def __call__(self, text, max_length=12, **kw):
        if isinstance(text, str):
            text = [text]
        ids = np.full((len(text), max_length), 1, np.int64)
        mask = np.zeros((len(text), max_length), np.int64)
        for i, p in enumerate(text):
            n = 6
            ids[i, :n] = [(hash(p) + j) % 100 + 2 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _audioldm_components(key, music=False):
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.clap import ClapTextModelWithProjection
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.audioldm2.vocoder import SpeechT5HifiGan
    from diffusers_tpu.schedulers import DDIMScheduler

    # encoder_hidden_states=None makes cross-attn fall back to self-attn, so
    # cross_attention_dim must equal the per-block channels (as in the real
    # cvssp/audioldm checkpoint layout).
    unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4, layers_per_block=1,
        block_out_channels=(8, 16), norm_num_groups=4, cross_attention_dim=(8, 16),
        attention_head_dim=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        class_embed_type="simple_projection", projection_class_embeddings_input_dim=6,
        class_embeddings_concat=True)
    vae = AutoencoderKL(in_channels=1, out_channels=1, latent_channels=4,
                        block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
                        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
                        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
                        scaling_factor=0.9)
    clap = ClapTextModelWithProjection(vocab_size=120, hidden_size=16, num_hidden_layers=1,
                                       num_attention_heads=2, intermediate_size=32,
                                       max_position_embeddings=64, pad_token_id=1,
                                       projection_dim=6)
    voc = SpeechT5HifiGan(model_in_dim=8, sampling_rate=100, upsample_initial_channel=16,
                          upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
                          resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]])
    return dict(
        vae=(vae, vae.init_params(key)), text_encoder=(clap, clap.init_params(key)),
        tokenizer=DummyClapTok(), unet=(unet, unet.init_params(key)),
        scheduler=DDIMScheduler(), vocoder=(voc, voc.init_params(key)))


def test_audioldm_pipeline():
    from diffusers_tpu.pipelines.deprecated import AudioLDMPipeline

    pipe = AudioLDMPipeline(**_audioldm_components(jax.random.PRNGKey(5)))
    out = pipe("gentle piano", negative_prompt="noise", audio_length_in_s=0.64,
               num_inference_steps=2, guidance_scale=2.0, key=jax.random.PRNGKey(0))
    audio = np.asarray(out.audios)
    assert audio.ndim == 2 and np.isfinite(audio).all()


def test_musicldm_pipeline():
    from diffusers_tpu.pipelines.deprecated import MusicLDMPipeline

    pipe = MusicLDMPipeline(**_audioldm_components(jax.random.PRNGKey(6), music=True))
    out = pipe("lofi hip hop beat", audio_length_in_s=0.64, num_inference_steps=2,
               guidance_scale=2.0, key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out.audios)).all()
