"""HunyuanVideo Framepack pipeline: sectioned generation smoke tests.

Reference: `/root/reference/src/diffusers/pipelines/hunyuan_video/pipeline_hunyuan_video_framepack.py:218`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.text_encoders.siglip import SiglipVisionModel
from diffusers_tpu.models.transformers.transformer_hunyuan_video_framepack import (
    HunyuanVideoFramepackTransformer3DModel,
)


def _pipe():
    from diffusers_tpu import HunyuanVideoFramepackPipeline
    from test_pipeline_hunyuan_video import TEMPLATE, get_dummy_pipeline

    base = get_dummy_pipeline()
    key = jax.random.PRNGKey(0)
    transformer = HunyuanVideoFramepackTransformer3DModel(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=10,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, patch_size=2, patch_size_t=1,
        guidance_embeds=True, text_embed_dim=16, pooled_projection_dim=8,
        rope_axes_dim=(2, 4, 4), has_image_proj=True, image_proj_dim=12,
        has_clean_x_embedder=True,
    )
    siglip = SiglipVisionModel(hidden_size=12, intermediate_size=24, num_hidden_layers=1,
                               num_attention_heads=2, image_size=32, patch_size=8)
    comps = dict(base.components)
    comps["transformer"] = (transformer, transformer.init_params(key))
    return HunyuanVideoFramepackPipeline(
        image_encoder=(siglip, siglip.init_params(key)), feature_extractor=None, **comps)


@pytest.mark.parametrize("sampling_type", ["inverted_anti_drifting", "vanilla"])
def test_framepack_pipeline_sections(sampling_type):
    from test_pipeline_hunyuan_video import TEMPLATE

    pipe = _pipe()
    rt = pipe.vae_scale_factor_temporal
    window = 2
    # two sections of window latent frames each
    num_frames = 2 * ((window - 1) * rt + 1)
    img = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    out = pipe(image=img, prompt="a sailing ship", height=32, width=32,
               num_frames=num_frames, latent_window_size=window,
               num_inference_steps=2, guidance_scale=6.0,
               prompt_template=TEMPLATE, max_sequence_length=8,
               sampling_type=sampling_type,
               key=jax.random.PRNGKey(0), output_type="np").frames
    assert out.ndim == 5 and out.shape[-1] == 3
    assert out.shape[1] >= num_frames  # soft-append keeps >= requested frames
    assert np.isfinite(out).all()


def test_framepack_pipeline_last_image():
    from test_pipeline_hunyuan_video import TEMPLATE

    pipe = _pipe()
    rt = pipe.vae_scale_factor_temporal
    window = 2
    num_frames = (window - 1) * rt + 1
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32)
    last = rng.rand(1, 3, 32, 32).astype(np.float32)
    out = pipe(image=img, last_image=last, prompt="a sunrise transition",
               height=32, width=32, num_frames=num_frames, latent_window_size=window,
               num_inference_steps=2, guidance_scale=6.0,
               prompt_template=TEMPLATE, max_sequence_length=8,
               key=jax.random.PRNGKey(0), output_type="np").frames
    assert np.isfinite(out).all()

    # conditioning on a different last image must change the output
    last2 = rng.rand(1, 3, 32, 32).astype(np.float32)
    out2 = pipe(image=img, last_image=last2, prompt="a sunrise transition",
                height=32, width=32, num_frames=num_frames, latent_window_size=window,
                num_inference_steps=2, guidance_scale=6.0,
                prompt_template=TEMPLATE, max_sequence_length=8,
                key=jax.random.PRNGKey(0), output_type="np").frames
    assert np.abs(out - out2).max() > 1e-6
