"""examples/server: end-to-end HTTP round trip against a tiny pipeline
(reference examples/server/server.py:69 — OpenAI images API shape)."""

import importlib.util
import json
import pathlib
import sys
import urllib.request

import numpy as np


def _load_server_module():
    path = pathlib.Path(__file__).parents[1] / "examples" / "server" / "server.py"
    spec = importlib.util.spec_from_file_location("tpu_server_example", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["tpu_server_example"] = mod  # dataclass annotation resolution
    spec.loader.exec_module(mod)
    return mod


def test_server_generates_and_serves_images():
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    server_mod = _load_server_module()
    pipe = get_dummy_pipeline()
    httpd = server_mod.serve(pipeline=pipe, host="127.0.0.1", port=0,
                             default_size="16x16", default_steps=2, default_guidance=6.0)
    port = httpd.server_address[1]
    import threading

    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # greeting
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert r.status == 200

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/images/generations",
            data=json.dumps({"prompt": "a tiny fox", "n": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert len(payload["data"]) == 2
        url = payload["data"][0]["url"]
        fname = url.rsplit("/", 1)[-1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/images/{fname}") as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # missing prompt -> 422
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/images/generations",
            data=b"{}", headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 422"
        except urllib.error.HTTPError as e:
            assert e.code == 422
    finally:
        httpd.shutdown()
        httpd.worker.stop()
