"""Stable Cascade: UNet + Paella VQGAN parity, Wuerstchen scheduler parity,
prior→decoder pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

PRIOR_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    timestep_ratio_embedding_dim=8,
    patch_size=1,
    conditioning_dim=16,
    block_out_channels=(16, 32),
    num_attention_heads=(2, 2),
    down_num_layers_per_block=(1, 1),
    up_num_layers_per_block=(1, 1),
    down_blocks_repeat_mappers=(1, 1),
    up_blocks_repeat_mappers=(1, 1),
    block_types_per_layer=(
        ("SDCascadeResBlock", "SDCascadeTimestepBlock", "SDCascadeAttnBlock"),
        ("SDCascadeResBlock", "SDCascadeTimestepBlock", "SDCascadeAttnBlock"),
    ),
    clip_text_in_channels=12,
    clip_text_pooled_in_channels=12,
    clip_image_in_channels=12,
    clip_seq=2,
    kernel_size=3,
    dropout=(0.0, 0.0),
    self_attn=True,
    timestep_conditioning_type=("sca", "crp"),
)

DECODER_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    timestep_ratio_embedding_dim=8,
    patch_size=2,
    conditioning_dim=16,
    block_out_channels=(16, 32),
    num_attention_heads=(0, 2),
    down_num_layers_per_block=(1, 1),
    up_num_layers_per_block=(1, 1),
    down_blocks_repeat_mappers=(1, 1),
    up_blocks_repeat_mappers=(1, 1),
    block_types_per_layer=(
        ("SDCascadeResBlock", "SDCascadeTimestepBlock"),
        ("SDCascadeResBlock", "SDCascadeTimestepBlock", "SDCascadeAttnBlock"),
    ),
    clip_text_pooled_in_channels=12,
    clip_seq=2,
    effnet_in_channels=6,
    pixel_mapper_in_channels=3,
    kernel_size=3,
    dropout=(0.0, 0.0),
    self_attn=True,
    timestep_conditioning_type=("sca",),
)

VQ_KWARGS = dict(
    in_channels=3, out_channels=3, up_down_scale_factor=2, levels=2,
    bottleneck_blocks=2, embed_dim=16, latent_channels=4, num_vq_embeddings=32,
    scale_factor=0.3764,
)


def test_cascade_prior_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import StableCascadeUNet as TorchUNet

    from diffusers_tpu.models.unets.unet_stable_cascade import StableCascadeUNet

    tm = TorchUNet(**PRIOR_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = StableCascadeUNet(**PRIOR_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    ratio = np.array([0.3, 0.8], dtype=np.float32)
    pooled = rng.randn(2, 1, 12).astype(np.float32)
    text = rng.randn(2, 5, 12).astype(np.float32)
    img = rng.randn(2, 1, 12).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ratio), torch.from_numpy(pooled),
                 clip_text=torch.from_numpy(text), clip_img=torch.from_numpy(img)).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ratio), jnp.asarray(pooled),
          clip_text=jnp.asarray(text), clip_img=jnp.asarray(img)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_cascade_decoder_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import StableCascadeUNet as TorchUNet

    from diffusers_tpu.models.unets.unet_stable_cascade import StableCascadeUNet

    tm = TorchUNet(**DECODER_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = StableCascadeUNet(**DECODER_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ratio = np.array([0.5], dtype=np.float32)
    pooled = rng.randn(1, 1, 12).astype(np.float32)
    effnet = rng.randn(1, 6, 2, 2).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ratio), torch.from_numpy(pooled),
                 effnet=torch.from_numpy(effnet)).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ratio), jnp.asarray(pooled),
          effnet=jnp.asarray(effnet)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_paella_vq_parity():
    torch = pytest.importorskip("torch")
    # the reference's overdue deprecation shim raises at import — disarm it
    import diffusers.utils as du
    import diffusers.utils.deprecation_utils as ddu

    ddu.deprecate = du.deprecate = lambda *a, **k: None
    from diffusers.pipelines.deprecated.wuerstchen.modeling_paella_vq_model import (
        PaellaVQModel as TorchVQ,
    )

    from diffusers_tpu.models.autoencoders.paella_vq_model import PaellaVQModel

    tm = TorchVQ(**VQ_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = PaellaVQModel(**VQ_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(2)
    x = rng.rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_lat = tm.encode(torch.from_numpy(x)).latents.numpy()
        ref_dec = tm.decode(torch.from_numpy(ref_lat)).sample.numpy()
    lat = np.asarray(m.encode(params, jnp.asarray(x)).latents)
    assert np.max(np.abs(lat - ref_lat)) < 5e-4, np.max(np.abs(lat - ref_lat))
    dec = np.asarray(m.decode(params, jnp.asarray(ref_lat)).sample)
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))


def test_wuerstchen_scheduler_parity():
    torch = pytest.importorskip("torch")
    from diffusers import DDPMWuerstchenScheduler as TorchSched

    from diffusers_tpu.schedulers.scheduling_ddpm_wuerstchen import DDPMWuerstchenScheduler

    ts_ref = TorchSched()
    ts_ref.set_timesteps(5)
    ours = DDPMWuerstchenScheduler()
    state = ours.set_timesteps(5)
    np.testing.assert_allclose(np.asarray(state.timesteps), ts_ref.timesteps.numpy(), atol=1e-6)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 4, 4, 4).astype(np.float32)
    model_out = rng.randn(1, 4, 4, 4).astype(np.float32)
    t = ts_ref.timesteps[0:1]
    # deterministic comparison: compare the mean (mu) by zeroing noise via same seed trick —
    # instead compare with noise removed (prev_t != 0 masks noise only at final step),
    # so evaluate the FINAL step where noise is gated off
    t_last = ts_ref.timesteps[-2:-1]
    ref = ts_ref.step(torch.from_numpy(model_out), t_last, torch.from_numpy(sample)).prev_sample.numpy()
    out = np.asarray(
        ours.step(state, jnp.asarray(model_out), jnp.asarray(np.asarray(t_last)),
                  jnp.asarray(sample), prev_timestep=jnp.asarray([0.0]),
                  key=jax.random.PRNGKey(0)).prev_sample
    )
    assert np.max(np.abs(out - ref)) < 1e-4, np.max(np.abs(out - ref))


def test_cascade_pipelines_smoke():
    from diffusers_tpu.models.autoencoders.paella_vq_model import PaellaVQModel
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.unets.unet_stable_cascade import StableCascadeUNet
    from diffusers_tpu.pipelines.stable_cascade import (
        StableCascadeDecoderPipeline,
        StableCascadePriorPipeline,
    )
    from diffusers_tpu.schedulers.scheduling_ddpm_wuerstchen import DDPMWuerstchenScheduler

    key = jax.random.PRNGKey(0)
    te = CLIPTextModelWithProjection(
        vocab_size=80, hidden_size=12, intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=12,
    )

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 70) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    prior = StableCascadeUNet(**PRIOR_KWARGS)
    prior_pipe = StableCascadePriorPipeline(
        tokenizer=Tok(), text_encoder=(te, te.init_params(key)),
        prior=(prior, prior.init_params(key)), scheduler=DDPMWuerstchenScheduler(),
        resolution_multiple=8.0,
    )
    pout = prior_pipe("a knight", height=32, width=32, num_inference_steps=2,
                      guidance_scale=4.0, key=key)
    assert pout.image_embeddings.shape == (1, 4, 4, 4)
    assert np.isfinite(pout.image_embeddings).all()

    decoder = StableCascadeUNet(**DECODER_KWARGS, switch_level=None)
    vqgan = PaellaVQModel(**VQ_KWARGS)
    dec_pipe = StableCascadeDecoderPipeline(
        decoder=(decoder, decoder.init_params(key)), tokenizer=Tok(),
        text_encoder=(te, te.init_params(key)), scheduler=DDPMWuerstchenScheduler(),
        vqgan=(vqgan, vqgan.init_params(key)), latent_dim_scale=4.0,
    )
    # decoder conditions on the prior's embeddings as effnet (6 channels here)
    effnet = jnp.asarray(np.random.RandomState(0).randn(1, 6, 4, 4).astype(np.float32))
    dout = dec_pipe(image_embeddings=effnet, prompt="a knight", num_inference_steps=2,
                    guidance_scale=2.0, key=key, output_type="np")
    assert dout.images.shape[0] == 1 and dout.images.shape[-1] == 3
    assert np.isfinite(dout.images).all()
