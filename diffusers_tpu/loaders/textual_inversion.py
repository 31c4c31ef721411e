"""Textual inversion loading.

Counterpart of the reference `loaders/textual_inversion.py`
(TextualInversionLoaderMixin): appends learned token embeddings to the CLIP
token-embedding table and registers the placeholder tokens with the
tokenizer. Functional: returns a NEW text-encoder params pytree.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..utils import logging

logger = logging.get_logger(__name__)


def _read_embedding(state_dict: Dict[str, np.ndarray]) -> np.ndarray:
    """Accepts diffusers-native {'<token>': emb}, A1111 {'string_to_param':
    {'*': emb}}, or {'emb_params': emb} formats."""
    if "string_to_param" in state_dict:
        return np.asarray(state_dict["string_to_param"]["*"])
    if "emb_params" in state_dict:
        return np.asarray(state_dict["emb_params"])
    if len(state_dict) == 1:
        return np.asarray(next(iter(state_dict.values())))
    raise ValueError(f"unrecognized textual inversion format with keys {list(state_dict)[:5]}")


def load_textual_inversion(
    path_or_state_dict: Union[str, Dict[str, np.ndarray]],
    token: str,
    tokenizer,
    text_encoder_params,
) -> Tuple[object, "text_encoder_params"]:
    """Returns (tokenizer, new_text_encoder_params) with the embedding rows
    appended. Multi-vector embeddings register `token`, `token_1`, ... like
    the reference."""
    if isinstance(path_or_state_dict, str):
        from safetensors import safe_open

        sd = {}
        with safe_open(path_or_state_dict, framework="numpy") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    else:
        sd = path_or_state_dict

    emb = _read_embedding(sd)
    if emb.ndim == 1:
        emb = emb[None]
    n_vectors = emb.shape[0]
    tokens = [token] + [f"{token}_{i}" for i in range(1, n_vectors)]

    added = tokenizer.add_tokens(tokens)
    if added != len(tokens):
        logger.warning(f"tokenizer already contained {len(tokens) - added} of the tokens")

    table = text_encoder_params["text_model"]["embeddings"]["token_embedding"]["embedding"]
    new_table = jnp.concatenate([table, jnp.asarray(emb, dtype=table.dtype)], axis=0)

    def replace(tree, path, value):
        if not path:
            return value
        out = dict(tree)
        out[path[0]] = replace(tree[path[0]], path[1:], value)
        return out

    new_params = replace(
        text_encoder_params, ["text_model", "embeddings", "token_embedding", "embedding"], new_table
    )
    logger.info(f"loaded textual inversion {token} with {n_vectors} vectors")
    return tokenizer, new_params


def maybe_convert_prompt(prompt: str, tokenizer) -> str:
    """Expand multi-vector placeholder tokens in a prompt (reference
    TextualInversionLoaderMixin.maybe_convert_prompt)."""
    tokens = prompt.split()
    out = []
    for t in tokens:
        out.append(t)
        i = 1
        while f"{t}_{i}" in getattr(tokenizer, "added_tokens_encoder", {}):
            out.append(f"{t}_{i}")
            i += 1
    return " ".join(out)
