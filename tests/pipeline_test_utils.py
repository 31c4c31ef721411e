"""Shared pipeline behavior tests (reference analogue:
`tests/pipelines/test_pipelines_common.py:1032` PipelineTesterMixin, which
contributes save/load round-trip `:1149`, dict/tuple parity `:1343`, batch
consistency `:1230` to every pipeline suite).

Subclasses provide `get_pipeline()`, `call_kwargs()` (small hermetic args) and
`output_attr` ("images" / "frames"); host-only components (dummy tokenizers)
are passed back through `from_pretrained` overrides on reload.
"""

import tempfile

import jax
import numpy as np


class PipelineTesterMixin:
    output_attr = "images"
    # component names that cannot round-trip through save_pretrained (dummy
    # tokenizers etc.) and are re-bound on reload
    host_components = ("tokenizer", "tokenizer_2", "feature_extractor")
    batch_param = "prompt"
    supports_save_load = True

    def get_pipeline(self):
        raise NotImplementedError

    def call_kwargs(self):
        raise NotImplementedError

    # ------------------------------------------------------------- helpers
    def _run(self, pipe, **overrides):
        kwargs = {**self.call_kwargs(), **overrides}
        out = pipe(**kwargs)
        return np.asarray(getattr(out, self.output_attr))

    # --------------------------------------------------------------- tests
    def test_dict_tuple_output_parity(self):
        pipe = self.get_pipeline()
        a = self._run(pipe, output_type="latent")
        out_tuple = pipe(**{**self.call_kwargs(), "output_type": "latent", "return_dict": False})
        assert isinstance(out_tuple, tuple)
        np.testing.assert_allclose(a, np.asarray(out_tuple[0]), atol=1e-5)

    def test_latent_output_finite(self):
        pipe = self.get_pipeline()
        lat = self._run(pipe, output_type="latent")
        assert np.isfinite(lat).all()

    def test_second_call_reuses_trace(self):
        pipe = self.get_pipeline()
        self._run(pipe, output_type="latent")
        entries = {k: v for k, v in pipe.__dict__.get("_jit_cache", {}).items()}
        assert entries, "pipeline did not populate its jit cache"
        sizes = {k: v._cache_size() for k, v in entries.items() if hasattr(v, "_cache_size")}
        self._run(pipe, output_type="latent")
        for k, v in pipe.__dict__["_jit_cache"].items():
            if hasattr(v, "_cache_size") and k in sizes:
                assert v._cache_size() == sizes[k], f"{k} retraced on identical second call"

    def test_save_load_roundtrip(self, tmp_path):
        if not self.supports_save_load:
            import pytest

            pytest.skip("pipeline declares save/load unsupported in the tiny harness")
        pipe = self.get_pipeline()
        ref = self._run(pipe, output_type="latent")
        pipe.save_pretrained(str(tmp_path))
        overrides = {
            name: getattr(pipe, name)
            for name in self.host_components
            if getattr(pipe, name, None) is not None
        }
        reloaded = type(pipe).from_pretrained(str(tmp_path), **overrides)
        out = self._run(reloaded, output_type="latent")
        np.testing.assert_allclose(out, ref, atol=5e-4)

    # ------------------------------------------------- round-3 behaviors
    # (reference PipelineTesterMixin contributes ~50 behaviors per family,
    #  tests/pipelines/test_pipelines_common.py:1032; these are the highest-
    #  value ones for this framework's functional pipelines)
    cfg_param = "guidance_scale"  # None → no CFG surface
    supports_batch_consistency = True

    def test_batch_consistency(self):
        """Element 0 of a batched call matches the single-prompt call (our
        randn_tensor splits the key per-sample, so this must hold exactly)."""
        if not self.supports_batch_consistency:
            import pytest

            pytest.skip("pipeline declares batched prompts unsupported in the tiny harness")
        kwargs = self.call_kwargs()
        prompt = kwargs.pop(self.batch_param)
        if not isinstance(prompt, str):
            import pytest

            pytest.skip("non-string batch param")
        pipe = self.get_pipeline()
        one = self._run(pipe, **{self.batch_param: prompt, "output_type": "latent"})
        two = self._run(pipe, **{self.batch_param: [prompt, prompt], "output_type": "latent"})
        assert two.shape[0] == 2 * one.shape[0], (two.shape, one.shape)
        np.testing.assert_allclose(two[: one.shape[0]], one, rtol=1e-5, atol=2e-4)

    def test_cfg_on_off(self):
        """Guidance on vs off must both be finite and actually differ."""
        if self.cfg_param is None:
            import pytest

            pytest.skip("no CFG surface")
        pipe = self.get_pipeline()
        kwargs = self.call_kwargs()
        if self.cfg_param not in kwargs:
            import pytest

            pytest.skip("call_kwargs carries no guidance value")
        on = self._run(pipe, output_type="latent")
        off = self._run(pipe, **{self.cfg_param: 1.0, "output_type": "latent"})
        assert np.isfinite(on).all() and np.isfinite(off).all()
        assert not np.allclose(on, off), "guidance had no effect"

    def test_from_pipe_consistency(self):
        """from_pipe re-binds components with zero reload and reproduces
        output (reference pipeline_utils.py:2122)."""
        pipe = self.get_pipeline()
        ref = self._run(pipe, output_type="latent")
        sibling = type(pipe).from_pipe(pipe)
        out = self._run(sibling, output_type="latent")
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_callback_on_step_end(self):
        """callback_on_step_end fires once per step when the pipeline exposes
        the reference callback protocol."""
        import inspect

        import pytest

        pipe = self.get_pipeline()
        sig = inspect.signature(pipe.__call__)
        if "callback_on_step_end" not in sig.parameters:
            pytest.skip("pipeline has no callback surface")
        steps = []

        def cb(p, i, t, kw):
            steps.append(int(np.asarray(i)))
            return kw

        kwargs = self.call_kwargs()
        n = int(kwargs.get("num_inference_steps", 2))
        self._run(pipe, callback_on_step_end=cb, output_type="latent")
        assert len(steps) == n, (steps, n)
