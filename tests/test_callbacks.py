"""callback_on_step_end wiring (reference `callbacks.py:7` protocol +
per-pipeline wiring, CFG-cutoff behavior mirrored from
`tests/pipelines/test_pipelines_common.py:1942`)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.callbacks import MultiPipelineCallbacks, SDXLCFGCutoffCallback

from test_pipeline_sdxl import get_dummy_pipeline as get_sdxl_pipeline


def test_sdxl_noop_callback_matches_fused_scan():
    """The per-step-jitted callback loop must reproduce the fused lax.scan."""
    pipe = get_sdxl_pipeline()
    kw = dict(num_inference_steps=3, guidance_scale=5.0, key=jax.random.PRNGKey(0),
              output_type="latent")
    ref = np.asarray(pipe("a cat", **kw).images)
    calls = []

    def noop(p, i, t, cbk):
        calls.append(i)
        return {}

    out = np.asarray(pipe("a cat", callback_on_step_end=noop, **kw).images)
    assert calls == [0, 1, 2]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sdxl_cfg_cutoff_callback():
    """After the cutoff the uncond half is dropped: output changes vs full
    CFG and the conditioning tensors seen by later steps are halved."""
    pipe = get_sdxl_pipeline()
    kw = dict(num_inference_steps=4, guidance_scale=5.0, key=jax.random.PRNGKey(0),
              output_type="latent")
    full = np.asarray(pipe("a cat", **kw).images)

    cb = SDXLCFGCutoffCallback(cutoff_step_index=2)
    seen = {}

    def spy(p, i, t, cbk):
        cbk = cb(p, i, t, cbk)
        seen[i] = cbk["prompt_embeds"].shape[0]
        return cbk

    out = np.asarray(pipe("a cat", callback_on_step_end=spy, **kw).images)
    assert seen[1] == 2 and seen[2] == 1 and seen[3] == 1  # halved at cutoff
    assert np.abs(out - full).max() > 1e-6
    assert np.isfinite(out).all()


def test_sdxl_callback_latents_mutation():
    pipe = get_sdxl_pipeline()

    def zero_at_last(p, i, t, cbk):
        if i == p._num_timesteps - 1:
            return {"latents": jnp.zeros_like(cbk["latents"])}
        return {}

    out = np.asarray(pipe("a cat", num_inference_steps=2, guidance_scale=5.0,
                          key=jax.random.PRNGKey(0), output_type="latent",
                          callback_on_step_end=zero_at_last).images)
    np.testing.assert_allclose(out, 0.0, atol=0)


def test_multi_callbacks_compose():
    pipe = get_sdxl_pipeline()
    order = []

    class A(SDXLCFGCutoffCallback):
        def callback_fn(self, p, i, t, cbk):
            order.append(("a", i))
            return super().callback_fn(p, i, t, cbk)

    class B(SDXLCFGCutoffCallback):
        tensor_inputs = []

        def callback_fn(self, p, i, t, cbk):
            order.append(("b", i))
            return cbk

    multi = MultiPipelineCallbacks([A(cutoff_step_index=1), B()])
    pipe("a cat", num_inference_steps=2, guidance_scale=5.0, key=jax.random.PRNGKey(0),
         output_type="latent", callback_on_step_end=multi)
    assert order == [("a", 0), ("b", 0), ("a", 1), ("b", 1)]


def test_flux_callback():
    from test_pipeline_flux import get_dummy_pipeline as get_flux_pipeline

    pipe = get_flux_pipeline()
    kw = dict(num_inference_steps=3, guidance_scale=3.5, key=jax.random.PRNGKey(0),
              output_type="latent")
    ref = np.asarray(pipe("a fox", **kw).images)
    steps = []
    out = np.asarray(pipe("a fox", callback_on_step_end=lambda p, i, t, c: steps.append(i) or {},
                          **kw).images)
    assert steps == [0, 1, 2]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_wan_callback():
    from test_pipeline_wan import get_dummy_pipeline as get_wan_pipeline

    pipe = get_wan_pipeline()
    kw = dict(height=16, width=16, num_frames=5, num_inference_steps=2,
              guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="latent")
    ref = np.asarray(pipe("a dog", **kw).frames)
    steps = []
    out = np.asarray(pipe("a dog", callback_on_step_end=lambda p, i, t, c: steps.append(i) or {},
                          **kw).frames)
    assert steps == [0, 1]
    np.testing.assert_allclose(out, ref, atol=1e-5)
