"""TPU text-to-image serving example (reference `examples/server/server.py:69`).

The reference serves a StableDiffusion3Pipeline behind FastAPI + aiohttp.
This TPU-native counterpart is dependency-free (stdlib `http.server`) and is
shaped around the TPU execution model instead of a GPU thread pool:

  * ONE inference worker thread owns the TPU — XLA programs are not
    re-entrant per device, so requests are funneled through a queue instead
    of `run_in_executor` parallelism.
  * requests with identical (height, width, steps, guidance) coalesce into a
    MICRO-BATCH: prompts stack on the batch axis and reuse the already
    compiled program (batch growth only recompiles once per distinct size).
  * the first request per shape pays the jit compile; subsequent ones hit the
    cache — the worker logs compile vs steady-state latency.

API (OpenAI images shape, matching the reference):
    POST /v1/images/generations   {"prompt": "...", "n": 1, "size": "1024x1024"}
        → {"data": [{"url": "http://host/images/draw<id>.png"}]}
    GET  /images/<file>           static results
    GET  /                        greeting / health

Run:  python examples/server/server.py   (MODEL_PATH env selects checkpoint)
"""

from __future__ import annotations

import io
import json
import logging
import os
import queue
import tempfile
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

logger = logging.getLogger("diffusers_tpu.server")

IMAGE_DIR = os.path.join(tempfile.gettempdir(), "images")
SERVICE_URL = os.getenv("SERVICE_URL", "http://localhost:8000")
MAX_MICROBATCH = int(os.getenv("MAX_MICROBATCH", "4"))


@dataclass
class _Job:
    prompt: str
    height: int
    width: int
    steps: int
    guidance: float
    n: int
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[str]] = None
    error: Optional[str] = None

    @property
    def batch_key(self):
        return (self.height, self.width, self.steps, self.guidance)


class TpuWorker:
    """Single thread that owns the pipeline (and therefore the TPU)."""

    def __init__(self, pipeline=None, default_steps: int = 28):
        self.pipeline = pipeline
        self.default_steps = default_steps
        self.jobs: "queue.Queue[_Job]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def start(self):
        if self.pipeline is None:
            self.pipeline = self._load_pipeline()
        os.makedirs(IMAGE_DIR, exist_ok=True)
        self._thread = threading.Thread(target=self._run, name="tpu-worker", daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        self.jobs.put(None)  # wake the worker
        if self._thread is not None:
            self._thread.join(timeout=10)

    @staticmethod
    def _load_pipeline():
        from diffusers_tpu import StableDiffusion3Pipeline

        model_path = os.getenv("MODEL_PATH", "stabilityai/stable-diffusion-3.5-medium")
        logger.info("loading %s onto the TPU", model_path)
        return StableDiffusion3Pipeline.from_pretrained(model_path, dtype="bfloat16")

    def submit(self, job: _Job) -> _Job:
        self.jobs.put(job)
        job.done.wait()
        return job

    # ------------------------------------------------------------- internals

    def _run(self):
        import jax

        key = jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))
        while not self._stop.is_set():
            job = self.jobs.get()
            if job is None:
                continue
            # coalesce same-shape jobs into one micro-batch (one TPU program)
            batch = [job]
            try:
                while len(batch) < MAX_MICROBATCH:
                    peek = self.jobs.get_nowait()
                    if peek is None:
                        break
                    if peek.batch_key == job.batch_key:
                        batch.append(peek)
                    else:
                        self.jobs.put(peek)
                        break
            except queue.Empty:
                pass
            prompts = []
            for j in batch:
                prompts.extend([j.prompt] * j.n)
            key, call_key = jax.random.split(key)
            t0 = time.monotonic()
            try:
                out = self.pipeline(
                    prompts, height=job.height, width=job.width,
                    num_inference_steps=job.steps, guidance_scale=job.guidance,
                    key=call_key, output_type="pil",
                )
                urls = [_save_image(im) for im in out.images]
                logger.info("batch=%d %dx%d steps=%d in %.2fs",
                            len(prompts), job.width, job.height, job.steps,
                            time.monotonic() - t0)
                i = 0
                for j in batch:
                    j.result = urls[i: i + j.n]
                    i += j.n
            except Exception as exc:  # surface per-job
                logger.exception("generation failed")
                for j in batch:
                    j.error = str(exc)
            finally:
                for j in batch:
                    j.done.set()


def _save_image(image) -> str:
    filename = "draw" + str(uuid.uuid4()).split("-")[0] + ".png"
    path = os.path.join(IMAGE_DIR, filename)
    if hasattr(image, "save"):
        image.save(path)
    else:  # np array fallback
        import numpy as np
        from PIL import Image

        Image.fromarray((np.asarray(image) * 255).clip(0, 255).astype("uint8")).save(path)
    return f"{SERVICE_URL}/images/{filename}"


def make_handler(worker: TpuWorker, default_size: str = "1024x1024",
                 default_steps: int = 28, default_guidance: float = 7.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/images/"):
                fname = os.path.basename(self.path)
                path = os.path.join(IMAGE_DIR, fname)
                if not os.path.isfile(path):
                    return self._json(404, {"error": "not found"})
                with open(path, "rb") as f:
                    data = f.read()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            self._json(200, {"message": "Welcome to diffusers-tpu! POST /v1/images/generations"})

        def do_OPTIONS(self):
            self._json(200, {})

        def do_POST(self):
            if self.path.rstrip("/") == "":
                return self._json(200, {"message": "Welcome to diffusers-tpu!"})
            if self.path != "/v1/images/generations":
                return self._json(404, {"error": "unknown route"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                prompt = payload.get("prompt")
                if not prompt:
                    return self._json(422, {"error": "`prompt` is required"})
                size = payload.get("size") or default_size
                w, h = (int(v) for v in size.lower().split("x"))
                job = _Job(
                    prompt=prompt, height=h, width=w,
                    steps=int(payload.get("steps", default_steps)),
                    guidance=float(payload.get("guidance_scale", default_guidance)),
                    n=int(payload.get("n") or 1),
                )
                worker.submit(job)
                if job.error is not None:
                    return self._json(500, {"error": job.error})
                self._json(200, {"data": [{"url": u} for u in job.result]})
            except Exception as exc:
                self._json(500, {"error": str(exc)})

    return Handler


def serve(pipeline=None, host: str = "0.0.0.0", port: int = 8000, **handler_kwargs):
    """Start the server. Pass `pipeline` to skip the default model load
    (used by tests with tiny components)."""
    worker = TpuWorker(pipeline=pipeline)
    worker.start()
    httpd = ThreadingHTTPServer((host, port), make_handler(worker, **handler_kwargs))
    httpd.worker = worker
    return httpd


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    server = serve(port=int(os.getenv("PORT", "8000")))
    logger.info("serving on %s", SERVICE_URL)
    try:
        server.serve_forever()
    finally:
        server.worker.stop()
