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
