"""ConsistencyModelPipeline tests (onestep + multistep, class-conditional)."""

import jax
import numpy as np

from diffusers_tpu.models.unets.unet_2d import UNet2DModel
from diffusers_tpu.pipelines.consistency_models.pipeline_consistency_models import ConsistencyModelPipeline
from diffusers_tpu.schedulers.scheduling_consistency_models import CMStochasticIterativeScheduler


def _unet(class_cond=False):
    kwargs = dict(
        sample_size=8, in_channels=3, out_channels=3, layers_per_block=1,
        block_out_channels=(8, 16), norm_num_groups=4,
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    )
    if class_cond:
        kwargs.update(num_class_embeds=10)
    m = UNet2DModel(**kwargs)
    return m, m.init_params(jax.random.PRNGKey(0))


def test_cm_onestep():
    pipe = ConsistencyModelPipeline(unet=_unet(), scheduler=CMStochasticIterativeScheduler())
    out = pipe(batch_size=2, num_inference_steps=1, key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (2, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_cm_multistep_class_conditional():
    pipe = ConsistencyModelPipeline(unet=_unet(class_cond=True), scheduler=CMStochasticIterativeScheduler())
    out = pipe(batch_size=2, class_labels=[1, 7], num_inference_steps=3,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (2, 8, 8, 3)
    assert np.isfinite(out.images).all()

    out2 = pipe(batch_size=2, class_labels=[3, 5], num_inference_steps=3,
                key=jax.random.PRNGKey(0), output_type="np")
    assert np.abs(out.images - out2.images).max() > 1e-6


def test_cm_custom_timesteps():
    pipe = ConsistencyModelPipeline(unet=_unet(), scheduler=CMStochasticIterativeScheduler())
    out = pipe(batch_size=1, timesteps=[22, 0], key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()
