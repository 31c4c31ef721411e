"""DiffusionGemma block-diffusion text pipeline: canvas-loop smoke over the
three text-diffusion schedulers.

Reference: `/root/reference/src/diffusers/pipelines/diffusion_gemma/pipeline_diffusion_gemma.py:53`.
(The upstream transformers denoiser is unavailable as an oracle; the JAX
denoiser here implements the pipeline's documented model contract.)
"""

import jax
import numpy as np
import pytest

from diffusers_tpu.pipelines.diffusion_gemma import DiffusionGemmaDenoiser, DiffusionGemmaPipeline
from diffusers_tpu.schedulers import (
    BlockRefinementScheduler,
    DiscreteDDIMScheduler,
    EntropyBoundScheduler,
)

VOCAB = 64


class DummyProcessor:
    eos_token_id = VOCAB - 1

    def apply_chat_template(self, messages, add_generation_prompt=True, tokenize=True,
                            return_tensors="np", return_dict=True):
        if isinstance(messages, dict):
            messages = [messages]
        if messages and isinstance(messages[0], dict):
            messages = [messages]
        ids = []
        for conv in messages:
            text = " ".join(str(m["content"]) for m in conv)
            ids.append([(hash(text) + j) % (VOCAB - 2) + 1 for j in range(6)])
        ids = np.asarray(ids, dtype=np.int64)
        return {"input_ids": ids, "attention_mask": np.ones_like(ids)}

    def decode(self, seq, skip_special_tokens=True):
        return " ".join(str(int(t)) for t in seq)


def _pipe(scheduler):
    key = jax.random.PRNGKey(0)
    model = DiffusionGemmaDenoiser(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, canvas_length=8,
    )
    return DiffusionGemmaPipeline(
        model=(model, model.init_params(key)), scheduler=scheduler, processor=DummyProcessor())


@pytest.mark.parametrize("scheduler", [
    BlockRefinementScheduler(block_length=8, num_inference_steps=4),
    DiscreteDDIMScheduler(num_inference_steps=4),
    EntropyBoundScheduler(num_inference_steps=4, entropy_bound=0.5),
], ids=["block_refinement", "discrete_ddim", "entropy_bound"])
def test_diffusion_gemma_pipeline_smoke(scheduler):
    pipe = _pipe(scheduler)
    out = pipe("hello world", gen_length=16, num_inference_steps=4,
               confidence_threshold=None, eos_early_stop=False,
               key=jax.random.PRNGKey(0), output_type="text")
    assert out.sequences.shape == (1, 16)
    assert (out.sequences >= 0).all() and (out.sequences < VOCAB).all()
    assert isinstance(out.texts[0], str)


def test_diffusion_gemma_corrector_budget_folding():
    sched = DiscreteDDIMScheduler(num_inference_steps=6, corrector_steps=1, corrector_k=1)
    pipe = _pipe(sched)
    calls = {"step": 0, "correct": 0}
    orig_step, orig_correct = sched.step, sched.step_correct

    def counting_step(*a, **kw):
        calls["step"] += 1
        return orig_step(*a, **kw)

    def counting_correct(*a, **kw):
        calls["correct"] += 1
        return orig_correct(*a, **kw)

    sched.step = counting_step
    sched.step_correct = counting_correct
    out = pipe("count forwards", gen_length=8, num_inference_steps=6,
               confidence_threshold=None, eos_early_stop=False, key=jax.random.PRNGKey(1))
    sched.step, sched.step_correct = orig_step, orig_correct
    # budget folding: corrected_steps=(6-1)//2=2, predictor=6-2=4 → 4 predictor + 2 corrector
    # forwards (one decode per scheduler call), total = num_inference_steps = 6
    assert calls["step"] == 4 and calls["correct"] == 2, calls
    assert out.sequences.shape == (1, 8)
