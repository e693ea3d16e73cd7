"""Model-level utilities.

Reference parity: percivaltts's ``ModelTTS`` base wrapper (SURVEY.md §2
"Model base" — parameter counting, weight save/load, utterance-level
prediction). Save/load lives with the Orbax checkpoint layer
(``percivaltts_tpu.training.checkpoints``); here are the pure helpers.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def dtype_by_name(name: str):
    """Shared compute/param dtype lookup for the model zoo."""
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]

# Utterance lengths are padded up to a multiple of this for prediction so the
# critic/generator conv stacks (time strides up to 4) and TPU lane tiling see
# friendly shapes, and so the number of jit variants stays bounded.
TIME_MULTIPLE = 64


def count_params(params: Any) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


@functools.partial(jax.jit, static_argnums=(0,))
def _apply_padded(apply_fn: Callable, params: Any, lab: jax.Array) -> jax.Array:
    return apply_fn(params, lab)


def predict_utterance(
    apply_fn: Callable,
    params: Any,
    lab: np.ndarray,
    time_multiple: int = TIME_MULTIPLE,
) -> np.ndarray:
    """Run one utterance ``(frames, label_dim)`` through a generator.

    Pads frames up to the next multiple of ``time_multiple`` (bounded jit
    variants — the reference predicts each utterance at its exact length,
    which on XLA would compile once per distinct length), then crops back.
    """
    n = lab.shape[0]
    padded = -(-n // time_multiple) * time_multiple
    x = np.zeros((1, padded, lab.shape[1]), dtype=np.float32)
    x[0, :n] = lab
    y = _apply_padded(apply_fn, params, jnp.asarray(x))
    return np.asarray(y[0, :n])


def predict_batch(
    apply_fn: Callable,
    params: Any,
    labs,
    time_multiple: int = TIME_MULTIPLE,
    chunk: int = 8,
) -> list:
    """Predict a list of utterances in stacked chunks — the generation-stage
    equivalent of ``Vocoder.analyze_batch`` (the reference predicts one
    utterance per model call, SURVEY.md §3.4).

    Utterances are grouped by their OWN padded length (next multiple of
    ``time_multiple``) and chunks stay within a group, so every utterance
    sees exactly the padding ``predict_utterance`` would give it — a
    recurrent generator's backward pass over the zero tail is identical,
    and the output never depends on which neighbors share the chunk.
    Short chunks repeat their last row so each distinct padded length
    compiles exactly one (chunk, padded, dim) variant."""
    labs = list(labs)
    out: list = [None] * len(labs)
    groups: dict = {}
    for i, lab in enumerate(labs):
        padded = -(-lab.shape[0] // time_multiple) * time_multiple
        groups.setdefault(padded, []).append(i)
    for padded, idxs in groups.items():
        for c0 in range(0, len(idxs), chunk):
            sel = idxs[c0 : c0 + chunk]
            rows = sel + [sel[-1]] * (chunk - len(sel))
            x = np.zeros((chunk, padded, labs[sel[0]].shape[1]), np.float32)
            for j, i in enumerate(rows):
                x[j, : labs[i].shape[0]] = labs[i]
            y = np.asarray(_apply_padded(apply_fn, params, jnp.asarray(x)))
            for j, i in enumerate(sel):
                out[i] = y[j, : labs[i].shape[0]]
    return out
