"""Fused WGAN-GP training step.

Reference parity: ``percivaltts/optimizertts_wgan.py`` (SURVEY.md §2
"Trainer: WGAN-GP", §3.3 — the headline path): per generator update,
``n_critic`` critic updates each minimizing

    D(fake) − D(real) + λ · (‖∇_x̂ D(x̂)‖₂ − 1)²,   x̂ = ε·real + (1−ε)·fake

followed by one generator update minimizing ``−D(G(lab))`` mixed with a
weighted masked LSE term. λ=10, n_critic=5, Adam(β1=.5, β2=.9) defaults per
WGAN-GP practice.

TPU-first design (the single most performance-critical construct per
SURVEY.md §3.3): the *whole* outer step — the ``n_critic`` inner critic loop
(``lax.fori_loop`` over a stacked batch pytree), the double-backprop gradient
penalty (``jax.grad`` through the critic w.r.t. its input), and the generator
update — is one jit/pjit region. Under a device mesh the batches are sharded
over the ``data`` axis and XLA emits the gradient all-reduces over ICI; no
host round-trips inside the step.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from percivaltts_tpu.config import TrainConfig
from percivaltts_tpu.training.losses import masked_mse
from percivaltts_tpu.training.state import GANState


def make_wgan_step(
    cfg: TrainConfig,
    dim_weights=None,
) -> Callable[[GANState, Dict[str, jax.Array], Dict[str, jax.Array]], Tuple[GANState, Dict[str, jax.Array]]]:
    """Build the fused step. ``critic_batches`` carries a leading
    ``n_critic`` axis (one fresh batch per critic update, as the reference
    draws); ``gen_batch`` is the batch for the generator update.
    ``dim_weights``: per-dimension LSE weights (TrainConfig.stream_weights)."""

    n_critic = cfg.n_critic
    gp_lambda = cfg.gp_lambda
    gp_every = max(1, cfg.gp_every)
    lse_weight = cfg.lse_weight

    def critic_loss_fn(
        critic_params, batch, fake, eps_key, state: GANState, apply_gp: bool
    ):
        lab, real, mask = batch["lab"], batch["cmp"], batch["mask"]
        if cfg.critic_fused_pass:
            # one 2B-batch pass for both scores (see TrainConfig docs for
            # the measured A/B record of this knob)
            B = real.shape[0]
            d = state.critic.apply_fn(
                critic_params,
                jnp.concatenate([real, fake], axis=0),
                jnp.concatenate([lab, lab], axis=0),
                jnp.concatenate([mask, mask], axis=0),
            )
            d_real, d_fake = d[:B], d[B:]
        else:
            d_real = state.critic.apply_fn(critic_params, real, lab, mask)
            d_fake = state.critic.apply_fn(critic_params, fake, lab, mask)

        w_dist = jnp.mean(d_real) - jnp.mean(d_fake)
        if not apply_gp:
            # lazy-GP skip iteration: the double-backprop subgraph is not
            # traced at all (apply_gp is a static Python bool — the loop
            # below is unrolled), so XLA never sees it
            return -w_dist, (w_dist, jnp.float32(0))

        # gradient penalty on per-sample interpolates; λ·gp_every keeps the
        # time-averaged penalty pressure equal to the every-step schedule
        eps = jax.random.uniform(eps_key, (real.shape[0], 1, 1))
        interp = eps * real + (1.0 - eps) * fake

        def d_sum(x):
            return state.critic.apply_fn(critic_params, x, lab, mask).sum()

        g = jax.grad(d_sum)(interp) * mask[..., None]
        gnorm = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2)) + 1e-12)
        gp = jnp.mean(jnp.square(gnorm - 1.0))

        loss = -w_dist + (gp_lambda * gp_every) * gp
        return loss, (w_dist, gp)

    def gen_loss_fn(gen_params, critic_params, batch, dkey, state: GANState):
        lab, real, mask = batch["lab"], batch["cmp"], batch["mask"]
        fake = state.gen.apply_fn(
            gen_params, lab, train=True, rngs={"dropout": dkey}
        )
        adv = -jnp.mean(state.critic.apply_fn(critic_params, fake, lab, mask))
        frame_w = None
        if cfg.boundary_weight > 0.0:
            # transition-weighted LSE term (TrainConfig.boundary_weight);
            # the adversarial term is untouched
            from percivaltts_tpu.training.losses import transition_weights

            frame_w = transition_weights(
                real, mask, cfg.boundary_weight, cfg.boundary_radius
            )
        lse = masked_mse(fake, real, mask, dim_weights, frame_weights=frame_w)
        return adv + lse_weight * lse, (adv, lse)

    def step(
        state: GANState,
        critic_batches: Dict[str, jax.Array],
        gen_batch: Dict[str, jax.Array],
    ) -> Tuple[GANState, Dict[str, jax.Array]]:
        key, dkey_fakes, dkey_gen, *eps_keys = jax.random.split(
            state.key, n_critic + 3
        )
        eps_keys = jnp.stack(eps_keys)

        # Generator params are frozen during the critic loop, so the fakes
        # for all n_critic batches come from ONE batched generator pass
        # ((n_critic·B) batch): scans and convs run once at high utilization
        # instead of n_critic latency-bound passes inside the loop.
        lab_all = critic_batches["lab"]
        nc, B = lab_all.shape[0], lab_all.shape[1]
        fakes = state.gen.apply_fn(
            state.gen.params,
            lab_all.reshape((nc * B,) + lab_all.shape[2:]),
            # training mode (dropout active, as in Keras GAN training where
            # G(z) runs in the training phase); no-op at dropout_rate=0
            train=True,
            rngs={"dropout": dkey_fakes},
        )
        fakes = jax.lax.stop_gradient(
            fakes.reshape((nc, B) + fakes.shape[1:])
        )

        def critic_body(i, carry):
            critic_ts, w_acc, gp_acc = carry
            batch = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
                critic_batches,
            )
            (loss, (w, gp)), grads = jax.value_and_grad(
                critic_loss_fn, has_aux=True
            )(
                critic_ts.params,
                batch,
                fakes[i],
                eps_keys[i],
                state,
                i % gp_every == 0,  # static: i is a Python int (unrolled)
            )
            critic_ts = critic_ts.apply_gradients(grads=grads)
            return critic_ts, w_acc + w, gp_acc + gp

        # n_critic is static, so the critic loop is UNROLLED into the jit
        # graph (a Python loop, not lax.fori_loop): XLA then schedules across
        # iteration boundaries and drops the while-loop carry sync — measured
        # 27.8 → 26.7 ms on the v5e headline step. Compile time grows with
        # n_critic, which stays bounded (reference default 5).
        carry = (state.critic, jnp.float32(0), jnp.float32(0))
        for i in range(n_critic):
            carry = critic_body(i, carry)
        critic_ts, w_sum, gp_sum = carry

        (gen_loss, (adv, lse)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.gen.params, critic_ts.params, gen_batch, dkey_gen, state)
        gen_ts = state.gen.apply_gradients(grads=gen_grads)

        metrics = {
            "loss": gen_loss,
            "gen_adv": adv,
            "lse": lse,
            "w_dist": w_sum / n_critic,
            # gp averages over the iterations that computed it (lazy-GP
            # skips contribute an exact 0 to gp_sum)
            "gp": gp_sum / len(range(0, n_critic, gp_every)),
        }
        new_state = state.replace(gen=gen_ts, critic=critic_ts, key=key)
        if cfg.ema_decay > 0.0 and state.ema is not None:
            from percivaltts_tpu.training.state import ema_update

            new_state = new_state.replace(
                ema=ema_update(state.ema, gen_ts.params, cfg.ema_decay)
            )
        return new_state, metrics

    return step


# default-config step for direct use/tests. The built step is cached per
# (hashable, frozen) TrainConfig so jitted callers re-trace once per config
# instead of once per call.
@functools.lru_cache(maxsize=None)
def _cached_step(cfg: TrainConfig):
    return make_wgan_step(cfg)


def wgan_step(state, critic_batches, gen_batch, cfg: TrainConfig = TrainConfig()):
    return _cached_step(cfg)(state, critic_batches, gen_batch)
