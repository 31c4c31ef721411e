"""Kandinsky 3 UNet parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

UNET_KWARGS = dict(
    in_channels=4,
    time_embedding_dim=32,
    groups=4,
    attention_head_dim=8,
    layers_per_block=2,
    block_out_channels=(16, 32),
    cross_attention_dim=16,
    encoder_hid_dim=24,
)


def test_kandinsky3_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import Kandinsky3UNet as TorchUNet

    from diffusers_tpu.models.unets.unet_kandinsky3 import Kandinsky3UNet

    tm = TorchUNet(**UNET_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Kandinsky3UNet(**UNET_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 6, 24).astype(np.float32)
    mask = np.ones((2, 6), dtype=np.int64)
    mask[0, 4:] = 0
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 7, torch.from_numpy(ehs),
                 encoder_attention_mask=torch.from_numpy(mask)).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), 7, jnp.asarray(ehs),
          encoder_attention_mask=jnp.asarray(mask)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_kandinsky3_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.unets.unet_kandinsky3 import Kandinsky3UNet
    from diffusers_tpu.pipelines.kandinsky3 import Kandinsky3Pipeline
    from diffusers_tpu.schedulers.scheduling_ddpm import DDPMScheduler

    key = jax.random.PRNGKey(0)
    unet = Kandinsky3UNet(**UNET_KWARGS)
    te = T5EncoderModel(vocab_size=60, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    movq = VQModel(
        block_out_channels=[32, 64], down_block_types=["DownEncoderBlock2D", "AttnDownEncoderBlock2D"],
        in_channels=3, latent_channels=4, layers_per_block=1, norm_num_groups=8,
        norm_type="spatial", num_vq_embeddings=12, out_channels=3,
        up_block_types=["AttnUpDecoderBlock2D", "UpDecoderBlock2D"], vq_embed_dim=4,
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
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = Kandinsky3Pipeline(
        tokenizer=Tok(), text_encoder=(te, te.init_params(key)),
        unet=(unet, unet.init_params(key)),
        scheduler=DDPMScheduler(variance_type="fixed_small"),
        movq=(movq, movq.init_params(key)),
    )
    out = pipe("a fluffy owl", height=32, width=32, num_inference_steps=2,
               guidance_scale=3.0, key=key, output_type="np")
    assert out.images.shape[0] == 1 and out.images.shape[-1] == 3
    assert np.isfinite(out.images).all()
