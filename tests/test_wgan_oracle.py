"""WGAN-GP numerics oracle (SURVEY.md §7 "hard parts"): the gradient-penalty
term — a double-backprop — checked against an independent torch
implementation with identical weights and inputs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

D, H, B, T = 6, 8, 3, 10
LAM = 10.0


def _weights(seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.normal(size=(D, H)).astype(np.float32) * 0.5,
        rng.normal(size=(H,)).astype(np.float32) * 0.1,
        rng.normal(size=(H, 1)).astype(np.float32) * 0.5,
    )


def _critic_jax(params, x):
    W1, b1, W2 = params
    h = jnp.tanh(x @ W1 + b1)
    return (h @ W2)[..., 0].mean(axis=-1)  # (B,)


def _critic_torch(params, x):
    W1, b1, W2 = params
    h = torch.tanh(x @ W1 + b1)
    return (h @ W2)[..., 0].mean(dim=-1)


@pytest.mark.slow
def test_gradient_penalty_matches_torch():
    W = _weights()
    rng = np.random.default_rng(1)
    real = rng.normal(size=(B, T, D)).astype(np.float32)
    fake = rng.normal(size=(B, T, D)).astype(np.float32)
    eps = rng.uniform(size=(B, 1, 1)).astype(np.float32)

    # ---- JAX: same construction as training/wgan.py ----
    jW = tuple(jnp.asarray(w) for w in W)
    interp = jnp.asarray(eps) * jnp.asarray(real) + (1 - jnp.asarray(eps)) * jnp.asarray(fake)

    def critic_loss(params):
        d_real = _critic_jax(params, jnp.asarray(real))
        d_fake = _critic_jax(params, jnp.asarray(fake))

        def d_sum(x):
            return _critic_jax(params, x).sum()

        g = jax.grad(d_sum)(interp)
        gnorm = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2)) + 1e-12)
        gp = jnp.mean(jnp.square(gnorm - 1.0))
        return jnp.mean(d_fake) - jnp.mean(d_real) + LAM * gp, gp

    (jloss, jgp), jgrads = jax.value_and_grad(critic_loss, has_aux=True)(jW)

    # ---- torch oracle ----
    tW = [torch.tensor(w, requires_grad=True) for w in W]
    treal, tfake = torch.tensor(real), torch.tensor(fake)
    tinterp = (torch.tensor(eps) * treal + (1 - torch.tensor(eps)) * tfake).requires_grad_(True)
    d_i = _critic_torch(tW, tinterp).sum()
    g = torch.autograd.grad(d_i, tinterp, create_graph=True)[0]
    gnorm = torch.sqrt((g**2).sum(dim=(1, 2)) + 1e-12)
    tgp = ((gnorm - 1.0) ** 2).mean()
    tloss = _critic_torch(tW, tfake).mean() - _critic_torch(tW, treal).mean() + LAM * tgp
    tloss.backward()

    np.testing.assert_allclose(float(jgp), float(tgp), rtol=1e-5)
    np.testing.assert_allclose(float(jloss), float(tloss), rtol=1e-5)
    # parameter gradients of the full critic loss, incl. the double-backprop
    for jg, tw in zip(jgrads, tW):
        np.testing.assert_allclose(
            np.asarray(jg), tw.grad.numpy(), rtol=2e-4, atol=2e-6
        )


def test_gp_is_zero_for_unit_gradient_critic():
    """A linear critic with unit-norm slope has ‖∇x D‖ ≡ 1 → gp = 0."""
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 5, 3)).astype(np.float32))
    w = jnp.zeros((3,)).at[0].set(1.0)  # D(x) = Σ_t,d x·w → ∇ = w broadcast

    def d(xx):
        return (xx @ w).sum()

    g = jax.grad(d)(x)
    # per-sample norm over (T, D): T frames each contribute w → norm = sqrt(T)
    gnorm = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2)))
    np.testing.assert_allclose(np.asarray(gnorm), np.sqrt(5.0), rtol=1e-6)
