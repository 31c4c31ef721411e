"""PipelineTesterMixin applied across pipeline families (reference strategy:
every pipeline suite inherits test_pipelines_common.PipelineTesterMixin)."""

import jax

from tests.pipeline_test_utils import PipelineTesterMixin


class TestStableDiffusionCommon(PipelineTesterMixin):
    def get_pipeline(self):
        from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a red fox", height=16, width=16, num_inference_steps=2,
            guidance_scale=6.0, output_type="np", key=jax.random.PRNGKey(0),
        )


class TestFluxCommon(PipelineTesterMixin):
    def get_pipeline(self):
        from tests.test_pipeline_flux import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a blue owl", height=32, width=32, num_inference_steps=2,
            output_type="np", key=jax.random.PRNGKey(0),
        )


class TestSDXLCommon(PipelineTesterMixin):
    def get_pipeline(self):
        from tests.test_pipeline_sdxl import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a glass bridge", height=32, width=32, num_inference_steps=2,
            guidance_scale=5.0, output_type="np", key=jax.random.PRNGKey(0),
        )


class TestWanCommon(PipelineTesterMixin):
    output_attr = "frames"

    def get_pipeline(self):
        from tests.test_pipeline_wan import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a paper boat", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=5.0, output_type="np",
            key=jax.random.PRNGKey(0),
        )


class TestLTXCommon(PipelineTesterMixin):
    output_attr = "frames"

    def get_pipeline(self):
        from tests.test_pipeline_ltx import get_dummy_pipeline

        return get_dummy_pipeline()

    def call_kwargs(self):
        return dict(
            prompt="a meteor shower", height=16, width=16, num_frames=5,
            num_inference_steps=2, guidance_scale=3.0, output_type="np",
            key=jax.random.PRNGKey(0),
        )
