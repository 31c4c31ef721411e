"""Cosmos transformer parity + text2world pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    num_attention_heads=2,
    attention_head_dim=12,
    num_layers=2,
    mlp_ratio=2.0,
    text_embed_dim=16,
    adaln_lora_dim=8,
    max_size=(4, 8, 8),
    patch_size=(1, 2, 2),
    rope_scale=(2.0, 1.0, 1.0),
    concat_padding_mask=True,
    extra_pos_embed_type="learnable",
)


def test_cosmos_transformer_parity():
    torch = pytest.importorskip("torch")
    import diffusers.models.transformers.transformer_cosmos as ref_mod
    from diffusers import CosmosTransformer3DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_cosmos import CosmosTransformer3DModel

    # torchvision isn't installed; the mask is already at latent resolution so
    # the reference's NEAREST resize is an identity — stub it.
    class _Functional:
        @staticmethod
        def resize(x, size, interpolation=None):
            assert list(x.shape[-2:]) == list(size)
            return x

    class _Transforms:
        functional = _Functional

        class InterpolationMode:
            NEAREST = "nearest"

    ref_mod.transforms = _Transforms

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    with torch.no_grad():
        for p in tm.parameters():
            if not torch.isfinite(p).all() or p.abs().max() > 10 or (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = CosmosTransformer3DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, F, H, W = 2, 2, 4, 4
    x = rng.randn(B, 4, F, H, W).astype(np.float32)
    ehs = rng.randn(B, 6, 16).astype(np.float32)
    t = np.array([0.5, -1.2], dtype=np.float32)
    pad = (rng.rand(1, 1, H, W) > 0.5).astype(np.float32)
    mask = np.ones((B, 6), dtype=bool)
    mask[0, 4:] = False

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            attention_mask=torch.from_numpy(mask), fps=24,
            padding_mask=torch.from_numpy(pad),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), timestep=jnp.asarray(t),
          encoder_hidden_states=jnp.asarray(ehs),
          attention_mask=jnp.asarray(mask.astype(np.float32)), fps=24,
          padding_mask=jnp.asarray(pad)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_cosmos_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_cosmos import CosmosTransformer3DModel
    from diffusers_tpu.pipelines.cosmos import CosmosTextToWorldPipeline
    from diffusers_tpu.schedulers.scheduling_edm_euler import EDMEulerScheduler

    key = jax.random.PRNGKey(0)
    transformer = CosmosTransformer3DModel(**TF_KWARGS)
    vae = AutoencoderKLCogVideoX(
        in_channels=3, out_channels=3, down_block_types=("CogVideoXDownBlock3D",) * 2,
        up_block_types=("CogVideoXUpBlock3D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32,
        temporal_compression_ratio=1, scaling_factor=0.7,
    )
    te = T5EncoderModel(vocab_size=60, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True,
                     return_tensors="np", add_special_tokens=True):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = CosmosTextToWorldPipeline(
        text_encoder=(te, te.init_params(key)), tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)), scheduler=EDMEulerScheduler(),
    )
    out = pipe("a robot in a warehouse", height=16, width=16, num_frames=2,
               num_inference_steps=2, guidance_scale=7.0, fps=24, key=key,
               max_sequence_length=8, output_type="np")
    assert out.frames.shape[0] == 1 and out.frames.shape[-1] == 3
    assert np.isfinite(out.frames).all()


def test_cosmos_video2world_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_cosmos import CosmosTransformer3DModel
    from diffusers_tpu.pipelines.cosmos.pipeline_cosmos_video2world import CosmosVideoToWorldPipeline
    from diffusers_tpu.schedulers.scheduling_edm_euler import EDMEulerScheduler

    key = jax.random.PRNGKey(0)
    kwargs = dict(TF_KWARGS)
    kwargs["in_channels"] = TF_KWARGS["in_channels"] + 1  # + condition mask channel
    transformer = CosmosTransformer3DModel(**kwargs)
    vae = AutoencoderKLCogVideoX(
        in_channels=3, out_channels=3, down_block_types=("CogVideoXDownBlock3D",) * 2,
        up_block_types=("CogVideoXUpBlock3D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32,
        temporal_compression_ratio=1, scaling_factor=0.7,
    )
    te = T5EncoderModel(vocab_size=60, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True,
                     return_tensors="np", add_special_tokens=True):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                h = [((hash(p) + i * 7) % 50) + 2 for i in range(4)]
                ids.append(h + [1] + [0] * (max_length - 5))
                masks.append([1] * 5 + [0] * (max_length - 5))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = CosmosVideoToWorldPipeline(
        text_encoder=(te, te.init_params(key)), tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)), scheduler=EDMEulerScheduler(),
    )
    image = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    out = pipe("a robot picks up a box", image=image, height=16, width=16, num_frames=2,
               num_inference_steps=2, guidance_scale=7.0, fps=24, key=key,
               max_sequence_length=8, output_type="np")
    assert out.frames.shape[0] == 1 and out.frames.shape[-1] == 3
    assert np.isfinite(out.frames).all()
