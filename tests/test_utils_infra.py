"""Infra utilities: constants env flags, profiling harness, remote VAE
round-trip against a local HTTP server, audio export, CLI subcommands."""

import json
import os
import threading
import wave
from http.server import BaseHTTPRequestHandler, HTTPServer

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.utils import export_utils, profiling, remote_utils
from diffusers_tpu.utils.constants import CONFIG_NAME, SAFETENSORS_WEIGHTS_NAME


def test_constants_match_reference_filenames():
    assert CONFIG_NAME == "config.json"
    assert SAFETENSORS_WEIGHTS_NAME == "diffusion_pytorch_model.safetensors"


def test_benchmark_fn_reports_latency():
    import jax

    f = jax.jit(lambda x: x * 2.0 + 1.0)
    stats = profiling.benchmark_fn(f, jnp.ones((8, 8)), iters=3, warmup=1, flops=128.0)
    assert stats["mean_ms"] > 0
    assert "tflops_per_sec" in stats


def test_profiler_trace(tmp_path):
    import jax

    with profiling.trace(str(tmp_path)):
        _ = jax.jit(lambda x: x + 1)(jnp.ones(4))
    # trace dir gets populated with a plugins/profile subdir
    assert any(tmp_path.rglob("*")), "profiler wrote nothing"


class _FakeVAEHandler(BaseHTTPRequestHandler):
    """Echo endpoint implementing the binary-tensor protocol: 'decodes' by
    scaling the latents by 2 and returning the tensor with shape headers."""

    def do_POST(self):
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        shape = json.loads(q["shape"][0])
        body = self.rfile.read(int(self.headers["Content-Length"]))
        arr = np.frombuffer(body, dtype=np.float32).reshape(shape) * 2.0
        out = arr.astype(np.float32).tobytes()
        self.send_response(200)
        self.send_header("Content-Type", "tensor/binary")
        self.send_header("X-Shape", json.dumps(list(arr.shape)))
        self.send_header("X-Dtype", "float32")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture()
def fake_endpoint():
    server = HTTPServer(("127.0.0.1", 0), _FakeVAEHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/"
    server.shutdown()


def test_remote_decode_roundtrip(fake_endpoint):
    latents = np.random.RandomState(0).randn(1, 4, 8, 8).astype(np.float32)
    out = remote_utils.remote_decode(
        fake_endpoint, latents, output_type="pt", return_type="pt", scaling_factor=0.18215
    )
    np.testing.assert_allclose(out, latents * 2.0, rtol=1e-6)


def test_remote_encode_roundtrip(fake_endpoint):
    img = np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32)
    out = remote_utils.remote_encode(fake_endpoint, img)
    np.testing.assert_allclose(out, img * 2.0, rtol=1e-6)


def test_remote_decode_unreachable_raises():
    with pytest.raises(RuntimeError, match="unreachable"):
        remote_utils.remote_decode(
            "http://127.0.0.1:9/", np.zeros((1, 4, 2, 2), np.float32), output_type="pt", return_type="pt"
        )


def test_export_to_audio(tmp_path):
    t = np.linspace(0, 1, 4410)
    waveform = np.stack([np.sin(2 * np.pi * 440 * t), np.cos(2 * np.pi * 440 * t)])
    path = export_utils.export_to_audio(waveform, str(tmp_path / "a.wav"), sample_rate=4410)
    with wave.open(path) as w:
        assert w.getnchannels() == 2
        assert w.getframerate() == 4410
        assert w.getnframes() == 4410


def test_cli_fp16_safetensors_and_schema(tmp_path, capsys):
    from safetensors.numpy import save_file

    from diffusers_tpu.commands.diffusers_cli import fp16_safetensors_command, schema_command

    sub = tmp_path / "unet"
    sub.mkdir()
    save_file({"w": np.ones((4, 4), np.float32)}, str(sub / "diffusion_pytorch_model.safetensors"))
    (sub / "config.json").write_text(json.dumps({"_class_name": "UNet2DModel", "in_channels": 4}))
    (tmp_path / "model_index.json").write_text(json.dumps({"_class_name": "TestPipeline"}))

    class Args:
        path = str(tmp_path)
        variant = "fp16"

    fp16_safetensors_command(Args)
    assert (sub / "diffusion_pytorch_model.fp16.safetensors").exists()
    from safetensors import safe_open

    with safe_open(str(sub / "diffusion_pytorch_model.fp16.safetensors"), framework="numpy") as f:
        assert f.get_tensor("w").dtype == np.float16

    schema_command(Args)
    out = capsys.readouterr().out
    schema = json.loads(out[out.index("{") :])
    assert schema["model_index"]["_class_name"] == "TestPipeline"
    assert schema["unet"]["in_channels"] == 4


def test_cli_custom_blocks(tmp_path):
    from diffusers_tpu.commands.diffusers_cli import custom_blocks_command

    class Args:
        name = "MyBlock"
        output = str(tmp_path / "my_block.py")

    custom_blocks_command(Args)
    text = (tmp_path / "my_block.py").read_text()
    assert "class MyBlock(ModularPipelineBlocks)" in text


def test_attn_checks_flag(monkeypatch):
    import importlib

    from diffusers_tpu.ops import attention as attn_mod
    from diffusers_tpu.utils import constants

    monkeypatch.setenv("DIFFUSERS_TPU_ATTN_CHECKS", "1")
    importlib.reload(constants)
    q = jnp.ones((1, 8, 2, 16))
    with pytest.raises(ValueError, match="inconsistent"):
        attn_mod.dispatch_attention_fn(q, jnp.ones((1, 4, 2, 16)), jnp.ones((1, 8, 2, 16)))
    monkeypatch.delenv("DIFFUSERS_TPU_ATTN_CHECKS")
    importlib.reload(constants)
