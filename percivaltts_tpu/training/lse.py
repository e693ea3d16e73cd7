"""LSE (least-squares) trainer step.

Reference parity: ``percivaltts/optimizertts.py`` (SURVEY.md §2 "Trainer:
LSE", §3.2) — masked MSE regression with Adam. Rebuilt as one pure jitted
function ``state, batch → state, metrics``; under a mesh the same function is
jitted with the batch sharded over the ``data`` axis and XLA inserts the
gradient psum (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from percivaltts_tpu.training.losses import masked_mse
from percivaltts_tpu.training.state import GANState


def lse_step(
    state: GANState,
    batch: Dict[str, jax.Array],
    dim_weights=None,
    ema_decay: float = 0.0,
    boundary_weight: float = 0.0,
    boundary_radius: int = 3,
) -> Tuple[GANState, Dict[str, jax.Array]]:
    """One masked-MSE generator update (``dim_weights``: per-dimension loss
    weights from TrainConfig.stream_weights; ``ema_decay`` > 0 also advances
    the generator-EMA copy, TrainConfig.ema_decay; ``boundary_weight`` > 0
    enables the transition-weighted LSE, TrainConfig.boundary_weight)."""
    lab, cmp, mask = batch["lab"], batch["cmp"], batch["mask"]
    frame_w = None
    if boundary_weight > 0.0:
        from percivaltts_tpu.training.losses import transition_weights

        frame_w = transition_weights(cmp, mask, boundary_weight, boundary_radius)
    # per-step dropout rng (ModelConfig.dropout_rate; unused modules ignore
    # it): fold the state key by the optimizer step — deterministic, no key
    # threading through the state
    dkey = jax.random.fold_in(state.key, state.gen.step)

    def loss_fn(params):
        pred = state.gen.apply_fn(params, lab, train=True, rngs={"dropout": dkey})
        return masked_mse(pred, cmp, mask, dim_weights, frame_weights=frame_w)

    loss, grads = jax.value_and_grad(loss_fn)(state.gen.params)
    gen = state.gen.apply_gradients(grads=grads)
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
    }
    new_state = state.replace(gen=gen)
    if ema_decay > 0.0 and state.ema is not None:
        from percivaltts_tpu.training.state import ema_update

        new_state = new_state.replace(
            ema=ema_update(state.ema, gen.params, ema_decay)
        )
    return new_state, metrics


def lse_eval_step(state: GANState, batch: Dict[str, jax.Array]) -> jax.Array:
    """Masked validation MSE (no update)."""
    pred = state.gen.apply_fn(state.gen.params, batch["lab"])
    return masked_mse(pred, batch["cmp"], batch["mask"])


def lse_eval_sums(
    state: GANState, batch: Dict[str, jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """(Σ per-frame masked squared error, Σ mask) — callers accumulate both
    across batches for a frame-weighted validation mean, so short final
    batches and padded rows cannot bias the metric (reference validates per
    batch with equal weights; the per-frame weighting is strictly fairer)."""
    pred = state.gen.apply_fn(state.gen.params, batch["lab"])
    mask = batch["mask"]
    se = jnp.mean(
        jnp.square(pred.astype(jnp.float32) - batch["cmp"].astype(jnp.float32)),
        axis=-1,
    )
    return jnp.sum(se * mask), jnp.sum(mask)
