"""ChronoEdit: transformer parity (incl. the 2-frame temporal-skip rope) vs
the torch reference + temporal-reasoning pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_chronoedit.py:523`,
`/root/reference/src/diffusers/pipelines/chronoedit/pipeline_chronoedit.py:128`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_chronoedit import ChronoEditTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=12,
    in_channels=4,
    out_channels=4,
    text_dim=16,
    freq_dim=16,
    ffn_dim=32,
    num_layers=2,
    cross_attn_norm=True,
    qk_norm="rms_norm_across_heads",
    rope_max_seq_len=32,
    rope_temporal_skip_len=8,
)


@pytest.mark.refparity
@pytest.mark.parametrize("num_frames", [2, 3])
def test_chronoedit_parity(num_frames):
    """2 latent frames hits the temporal-skip rope branch; 3 the normal one."""
    torch = pytest.importorskip("torch")
    from diffusers import ChronoEditTransformer3DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ChronoEditTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, num_frames, 8, 8).astype(np.float32)
    t = np.array([500], dtype=np.int64)
    ehs = rng.randn(1, 12, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
        ).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


class DummyCLIPProcessor:
    def __call__(self, images=None, return_tensors="np"):
        arr = np.asarray(images, np.float32)[None]
        arr = np.transpose(arr, (0, 3, 1, 2)) / 255.0
        # CLIP-vision wants 32x32+ tiny inputs; resize by simple pooling
        return {"pixel_values": arr[:, :, :32, :32]}


def test_chronoedit_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.clip import CLIPVisionModel
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.pipelines.chronoedit import ChronoEditPipeline
    from diffusers_tpu.schedulers import UniPCMultistepScheduler
    from tests.test_pipeline_wan import DummyTokenizer

    key = jax.random.PRNGKey(0)
    # condition = vsf_t(2) mask channels + z_dim(4) latents; input = 4 + 6 = 10
    transformer = ChronoEditTransformer3DModel(
        **{**TINY, "num_layers": 1, "in_channels": 10, "image_dim": 8, "added_kv_proj_dim": 24,
           "rope_max_seq_len": 64}
    )
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[True, False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    t5 = T5EncoderModel(vocab_size=512, d_model=16, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    clip_v = CLIPVisionModel(hidden_size=8, intermediate_size=16, num_hidden_layers=2,
                             num_attention_heads=2, image_size=32, patch_size=16)
    scheduler = UniPCMultistepScheduler(prediction_type="flow_prediction", use_flow_sigmas=True,
                                        flow_shift=3.0)
    pipe = ChronoEditPipeline(
        tokenizer=DummyTokenizer(), text_encoder=(t5, t5.init_params(key)),
        image_encoder=(clip_v, clip_v.init_params(key)), image_processor=DummyCLIPProcessor(),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)), scheduler=scheduler,
    )
    rng = np.random.RandomState(0)
    image = Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))
    out = pipe(image=image, prompt="make it snow", height=32, width=32, num_frames=9,
               num_inference_steps=4, guidance_scale=2.0,
               enable_temporal_reasoning=True, num_temporal_reasoning_steps=2,
               key=key, max_sequence_length=8, output_type="np")
    video = np.asarray(out.frames)
    assert video.ndim == 5 and np.isfinite(video).all()


def test_wan_i2v_two_stage_smoke():
    """WanImageToVideoPipeline: FLF conditioning + Wan-2.2 boundary two-stage."""
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_wan import WanTransformer3DModel
    from diffusers_tpu.pipelines.wan import WanImageToVideoPipeline
    from diffusers_tpu.schedulers import UniPCMultistepScheduler
    from tests.test_pipeline_wan import DummyTokenizer

    key = jax.random.PRNGKey(0)
    tf_kwargs = dict(patch_size=(1, 2, 2), num_attention_heads=2, attention_head_dim=12,
                     in_channels=10, out_channels=4, text_dim=16, freq_dim=16, ffn_dim=32,
                     num_layers=1, cross_attn_norm=True, rope_max_seq_len=64)
    t1 = WanTransformer3DModel(**tf_kwargs)
    t2 = WanTransformer3DModel(**tf_kwargs)
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[True, False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    t5 = T5EncoderModel(vocab_size=512, d_model=16, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    scheduler = UniPCMultistepScheduler(prediction_type="flow_prediction", use_flow_sigmas=True,
                                        flow_shift=3.0)
    pipe = WanImageToVideoPipeline(
        tokenizer=DummyTokenizer(), text_encoder=(t5, t5.init_params(key)),
        transformer=(t1, t1.init_params(key)), vae=(vae, vae.init_params(key)),
        scheduler=scheduler, transformer_2=(t2, t2.init_params(jax.random.PRNGKey(1))),
        boundary_ratio=0.5,
    )
    rng = np.random.RandomState(0)
    first = Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))
    last = Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))
    out = pipe(image=first, last_image=last, prompt="a drifting boat", height=32, width=32,
               num_frames=9, num_inference_steps=4, guidance_scale=2.0, guidance_scale_2=1.5,
               key=key, max_sequence_length=8, output_type="np")
    video = np.asarray(out.frames)
    assert video.ndim == 5 and np.isfinite(video).all()
