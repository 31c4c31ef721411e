"""QwenImage img2img + inpaint pipeline tests (dummy components), mirroring
test_pipeline_flux.py's inpaint exactness / strength-truncation checks
(reference strategy: tests/pipelines/qwenimage/test_qwenimage_inpaint.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.transformers.transformer_qwenimage import QwenImageTransformer2DModel
from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
    FlowMatchEulerDiscreteScheduler,
)

TINY = dict(
    patch_size=2,
    in_channels=16,
    out_channels=4,
    num_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=24,
    axes_dims_rope=(8, 4, 4),
)


class DummyQwen:
    def __call__(self, params, ids, attention_mask=None, output_hidden_states=False):
        class Out:
            pass

        o = Out()
        rng = np.random.RandomState(int(np.asarray(ids).sum()) % 991)
        hs = jnp.asarray(rng.randn(ids.shape[0], ids.shape[1], 24).astype(np.float32))
        o.hidden_states = [hs * 0.3, hs]
        o.last_hidden_state = hs
        return o


class Tok:
    def __call__(self, prompts, padding=None, max_length=40, truncation=True, return_tensors="np"):
        class Out:
            pass

        o = Out()
        ids, masks = [], []
        for p in prompts:
            n = min(36, len(p) % 5 + 35)
            ids.append([((hash(p) + i) % 70) + 1 for i in range(n)] + [0] * (max_length - n))
            masks.append([1] * n + [0] * (max_length - n))
        o.input_ids = np.array(ids)
        o.attention_mask = np.array(masks)
        return o


def _components():
    key = jax.random.PRNGKey(0)
    transformer = QwenImageTransformer2DModel(**TINY)
    # 4 levels → vae_scale_factor 8 (matches the pipeline's packed-latent math)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8, 8, 8, 8),
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4,
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
        scaling_factor=1.0,
    )
    return dict(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(DummyQwen(), {}),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
    )


def test_qwenimage_img2img():
    from diffusers_tpu.pipelines.qwenimage.pipeline_qwenimage_img2img import (
        QwenImageImg2ImgPipeline,
    )

    pipe = QwenImageImg2ImgPipeline(**_components())
    image = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out = pipe("a jade rabbit", image=image, strength=0.8, num_inference_steps=4,
               true_cfg_scale=3.0, key=jax.random.PRNGKey(0), max_sequence_length=6,
               output_type="np")
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(out.images).all()

    # low strength stays closer to the input than high strength
    near = pipe("a jade rabbit", image=image, strength=0.25, num_inference_steps=4,
                true_cfg_scale=3.0, key=jax.random.PRNGKey(0), max_sequence_length=6,
                output_type="np").images
    ref = ((image[0].transpose(1, 2, 0) + 1) / 2).clip(0, 1)
    assert np.abs(near - ref).mean() < np.abs(out.images - ref).mean() + 0.5


def test_qwenimage_img2img_strength_validation():
    from diffusers_tpu.pipelines.qwenimage.pipeline_qwenimage_img2img import (
        QwenImageImg2ImgPipeline,
    )

    pipe = QwenImageImg2ImgPipeline(**_components())
    image = np.zeros((1, 3, 32, 32), np.float32)
    with pytest.raises(ValueError, match="strength"):
        pipe("x", image=image, strength=1.5, num_inference_steps=2, key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="zero denoise steps"):
        pipe("x", image=image, strength=0.0, num_inference_steps=2, key=jax.random.PRNGKey(0))


def test_qwenimage_inpaint_unmasked_exactness():
    """Final latents outside the mask must EXACTLY equal the encoded image
    latents; inside the mask they must actually change."""
    from diffusers_tpu.pipelines.inpaint_utils import prepare_packed_mask
    from diffusers_tpu.pipelines.qwenimage.pipeline_qwenimage_inpaint import (
        QwenImageInpaintPipeline,
    )

    pipe = QwenImageInpaintPipeline(**_components())
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    mask = np.zeros((1, 1, 32, 32), np.float32)
    mask[:, :, 8:24, 8:24] = 1.0

    key = jax.random.PRNGKey(7)
    out = pipe("repair", image=image, mask_image=mask, strength=1.0,
               num_inference_steps=3, true_cfg_scale=3.0, key=key,
               max_sequence_length=6, output_type="latent", return_dict=False)[0]

    # recompute the pipeline's encoded latents (same key-split path)
    _, enc_key, _ = jax.random.split(key, 3)
    init = jnp.asarray(pipe.image_processor.preprocess(image))
    lat = pipe._encode_vae_image(init, enc_key)
    packed = pipe._pack_latents(lat)
    packed_mask = prepare_packed_mask(np.asarray(mask), 1, lat.shape[1], lat.shape[2],
                                      lat.shape[3], pipe._pack_latents)

    out = np.asarray(out)
    packed = np.asarray(packed)
    keep = np.asarray(packed_mask) == 0
    assert keep.any() and (~keep).any()
    np.testing.assert_allclose(out[keep], packed[keep], atol=1e-5)
    assert np.abs(out[~keep] - packed[~keep]).max() > 1e-3

    # pixel output path also runs
    img = pipe("repair", image=image, mask_image=mask, strength=0.7,
               num_inference_steps=2, true_cfg_scale=3.0, key=key,
               max_sequence_length=6, output_type="np").images
    assert img.shape == (1, 32, 32, 3) and np.isfinite(img).all()


def test_inpaint_mask_smaller_than_latent_grid():
    """A mask smaller than the latent grid must be UPSAMPLED (nearest), not
    crash (ADVICE r3: strided downsample reshape mismatch)."""
    from diffusers_tpu.pipelines.inpaint_utils import prepare_packed_mask, resize_mask_nearest

    small = np.zeros((1, 1, 4, 4), np.float32)
    small[:, :, 1:3, 1:3] = 1.0
    up = resize_mask_nearest(small, 8, 8)
    assert up.shape == (1, 1, 8, 8)
    assert up[0, 0, 2, 2] == 1.0 and up[0, 0, 0, 0] == 0.0
    # odd, non-divisible target
    odd = resize_mask_nearest(small, 6, 10)
    assert odd.shape == (1, 1, 6, 10)

    packed = prepare_packed_mask(
        small, 1, 4, 8, 8,
        lambda m: m.reshape(m.shape[0], m.shape[1], -1).transpose(0, 2, 1),
    )
    assert packed.shape == (1, 64, 4)
