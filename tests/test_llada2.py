"""LLaDA2 masked block-refinement text pipeline smoke.

Reference: `/root/reference/src/diffusers/pipelines/llada2/pipeline_llada2.py:59`.
"""

import jax
import numpy as np

from diffusers_tpu.pipelines.llada2 import LLaDA2Denoiser, LLaDA2Pipeline
from diffusers_tpu.schedulers import BlockRefinementScheduler

VOCAB = 48
MASK = VOCAB - 1
EOS = VOCAB - 2


class DummyTok:
    eos_token_id = EOS
    mask_token_id = MASK
    chat_template = None

    def __call__(self, text, return_tensors="np", padding=False):
        if isinstance(text, str):
            text = [text]
        ids = np.asarray([[(hash(t) + j) % (VOCAB - 3) + 1 for j in range(5)] for t in text])
        return {"input_ids": ids, "attention_mask": np.ones_like(ids)}

    def batch_decode(self, seqs, skip_special_tokens=True):
        return [" ".join(str(int(t)) for t in s) for s in seqs]


class _NoMaskHead:
    """Suppress the mask channel so the random-weight tied head can't
    'predict' the mask token it just read (a real LM never predicts mask)."""

    def __init__(self, inner):
        self.inner = inner
        self.config = inner.config

    def init_params(self, key):
        return self.inner.init_params(key)

    def __call__(self, params, input_ids, attention_mask=None, position_ids=None):
        import jax.numpy as jnp
        logits = self.inner(params, input_ids, attention_mask=attention_mask,
                            position_ids=position_ids)
        return logits.at[..., MASK].set(-1e9)


def test_llada2_pipeline_smoke():
    key = jax.random.PRNGKey(0)
    model = _NoMaskHead(LLaDA2Denoiser(vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                                       num_hidden_layers=2, num_attention_heads=2))
    pipe = LLaDA2Pipeline(model=(model, model.init_params(key)),
                          scheduler=BlockRefinementScheduler(),
                          tokenizer=DummyTok())
    out = pipe("tell me a story", gen_length=16, block_length=8, num_inference_steps=4,
               eos_early_stop=False, key=key, output_type="text")
    seqs = np.asarray(out.sequences)
    assert seqs.shape == (1, 16)
    assert (seqs != MASK).all()  # every mask resolved to a real token
    assert isinstance(out.texts[0], str)


def test_llada2_editing_mode():
    key = jax.random.PRNGKey(1)
    model = LLaDA2Denoiser(vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2)
    pipe = LLaDA2Pipeline(model=(model, model.init_params(key)),
                          scheduler=BlockRefinementScheduler(),
                          tokenizer=DummyTok())
    out = pipe("edit me", gen_length=8, block_length=8, num_inference_steps=4,
               editing_threshold=0.5, max_post_steps=2, eos_early_stop=False, key=key,
               output_type="seq")
    assert np.asarray(out.sequences).shape == (1, 8)
