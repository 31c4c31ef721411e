"""AuraFlow transformer parity vs the torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.auraflow_transformer_2d import AuraFlowTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    sample_size=16,
    patch_size=2,
    in_channels=4,
    num_mmdit_layers=2,
    num_single_dit_layers=2,
    attention_head_dim=8,
    num_attention_heads=2,
    joint_attention_dim=24,
    caption_projection_dim=16,
    out_channels=4,
    pos_embed_max_size=64,
)


def test_auraflow_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AuraFlowTransformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AuraFlowTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 6, 24).astype(np.float32)
    t = np.array([0.5, 0.9], dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_auraflow_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.t5 import UMT5EncoderModel
    from diffusers_tpu.pipelines.aura_flow import AuraFlowPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    transformer = AuraFlowTransformer2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )
    te = UMT5EncoderModel(vocab_size=128, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, truncation=True, max_length=8, padding=None, return_tensors="np"):
            class Out:
                pass

            out = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 4 + 2
                ids.append([((hash(p) + i) % 100) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            out.input_ids = np.array(ids)
            out.attention_mask = np.array(masks)
            return out

    pipe = AuraFlowPipeline(
        tokenizer=Tok(),
        text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(),
    )
    out = pipe("a watercolor fox", height=16, width=16, num_inference_steps=2,
               guidance_scale=3.5, key=key, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
