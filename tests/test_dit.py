"""DiTTransformer2DModel parity vs torch reference + DiTPipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.dit_transformer_2d import DiTTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=8,
    in_channels=4,
    out_channels=8,
    num_layers=2,
    norm_num_groups=4,
    sample_size=8,
    patch_size=2,
    num_embeds_ada_norm=10,
)


@pytest.mark.refparity
def test_dit_parity():
    torch = pytest.importorskip("torch")
    from diffusers import DiTTransformer2DModel as TorchDiT

    tm = TorchDiT(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = DiTTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    t = np.array([3, 7], dtype=np.int64)
    labels = np.array([1, 9], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), timestep=torch.from_numpy(t),
                 class_labels=torch.from_numpy(labels)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), timestep=jnp.asarray(t),
                       class_labels=jnp.asarray(labels)).sample)
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_dit_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.pipelines.dit.pipeline_dit import DiTPipeline
    from diffusers_tpu.schedulers import DDIMScheduler

    key = jax.random.PRNGKey(0)
    transformer = DiTTransformer2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,), down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",), latent_channels=4, layers_per_block=1,
        norm_num_groups=4, sample_size=8, scaling_factor=0.18,
    )
    pipe = DiTPipeline(
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=DDIMScheduler(),
        id2label={"0": "cat", "1": "dog, canine"},
    )
    assert pipe.get_label_ids(["dog", "cat"]) == [1, 0]
    out = pipe(class_labels=[1, 9], guidance_scale=4.0, num_inference_steps=2,
               key=key, output_type="np")
    assert out.images.shape == (2, 8, 8, 3)
    assert np.isfinite(out.images).all()

    # guidance must matter (null-class CFG)
    out0 = pipe(class_labels=[1, 9], guidance_scale=1.0, num_inference_steps=2,
                key=key, output_type="np")
    assert np.abs(out.images - out0.images).max() > 1e-6
