"""Training state containers.

Reference parity: the weights + Adam-state bookkeeping inside percivaltts's
``optimizertts*.py`` trainers (SURVEY.md §2). Here both networks' states are
one pytree (flax TrainState pair + RNG key + step counter) so the whole
training step is a pure function ``state, batch → state, metrics`` — the
shape jit/pjit wants, and the unit Orbax checkpoints.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from percivaltts_tpu.config import Configuration
from percivaltts_tpu.models import build_generator
from percivaltts_tpu.models.critic import build_critic


class TrainState(train_state.TrainState):
    pass


@struct.dataclass
class GANState:
    """Generator (+ optional critic) training state, one pytree."""

    gen: TrainState
    critic: Optional[TrainState]
    key: jax.Array
    epoch: jax.Array  # int32 scalar
    # EMA of the generator params (TrainConfig.ema_decay > 0), else None.
    # Part of the pytree so Orbax checkpoints/restores it with everything
    # else and the EMA update runs inside the fused jitted step.
    ema: Optional[dict] = None

    @property
    def step(self):
        return self.gen.step


def ema_update(ema, params, decay: float):
    """ema ← decay·ema + (1−decay)·params, leafwise (f32 master copies)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), ema, params
    )


def eval_params(state: GANState):
    """Generator params every quality-facing consumer should use:
    the EMA copy when the run carries one, else the live params.
    Used by generation, objective-measure validation, and serving export."""
    return state.ema if state.ema is not None else state.gen.params


def _adam(lr: float, b1: float, b2: float) -> optax.GradientTransformation:
    return optax.adam(lr, b1=b1, b2=b2)


def make_gan_state(
    cfg: Configuration, label_dim: int, seed: Optional[int] = None, mesh=None
) -> GANState:
    """Build generator (+ critic for the WGAN trainer) and optimizer states.
    ``mesh``: partition the recurrent Pallas kernels over its ``data`` axis
    (multi-chip DP; plumbed to build_generator)."""
    seed = cfg.train.seed if seed is None else seed
    key = jax.random.key(seed)
    kg, kc, krest = jax.random.split(key, 3)
    T = min(cfg.data.bucket_bounds)
    lab = jnp.zeros((1, T, label_dim), jnp.float32)

    gen = build_generator(cfg.model, cfg.vocoder, label_dim, mesh=mesh)
    gen_params = gen.init(kg, lab)
    gen_ts = TrainState.create(
        apply_fn=gen.apply,
        params=gen_params,
        tx=_adam(cfg.train.lr_gen, cfg.train.adam_b1, cfg.train.adam_b2),
    )

    critic_ts = None
    if cfg.train.trainer == "wgan":
        critic = build_critic(cfg.model, cfg.vocoder)
        cmp = jnp.zeros((1, T, cfg.vocoder.feature_size), jnp.float32)
        mask = jnp.ones((1, T), jnp.float32)
        critic_params = critic.init(kc, cmp, lab, mask)
        critic_ts = TrainState.create(
            apply_fn=critic.apply,
            params=critic_params,
            tx=_adam(cfg.train.lr_critic, cfg.train.adam_b1, cfg.train.adam_b2),
        )

    ema = (
        # copy=True: astype to the same dtype is a no-op that would ALIAS
        # the param buffers — the jitted step donates the state, and a
        # buffer appearing twice in one donated pytree is an XLA error
        jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True), gen_params)
        if cfg.train.ema_decay > 0.0
        else None
    )
    return GANState(
        gen=gen_ts,
        critic=critic_ts,
        key=krest,
        epoch=jnp.asarray(0, jnp.int32),
        ema=ema,
    )


def abstract_gan_state(
    cfg: Configuration, label_dim: int, seed: Optional[int] = None
) -> GANState:
    """The same state with ``ShapeDtypeStruct`` leaves and no device work —
    the restore target for checkpoint loading (``jax.eval_shape`` over
    ``make_gan_state``). Generation/synthesis entry points use this instead
    of initializing real parameters that the restore would immediately
    overwrite (measured ~95 s of wasted init on the tunneled v5e)."""
    return jax.eval_shape(lambda: make_gan_state(cfg, label_dim, seed))
