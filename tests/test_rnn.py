import jax
import jax.numpy as jnp
import numpy as np

from flax import linen as nn

from percivaltts_tpu.models.rnn import BiLSTM


def test_bilstm_matches_two_rnn_oracle():
    """The fused single-scan BiLSTM must equal two independent nn.RNN passes
    (forward + time-reversed) using the same cell parameters."""
    B, T, D, H = 2, 12, 5, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))

    bi = BiLSTM(H, unroll=4, compute_dtype="float32")
    params = bi.init(jax.random.key(0), x)
    out = bi.apply(params, x)
    assert out.shape == (B, T, 2 * H)

    cell_params = params["params"]["cell"]
    fwd_rnn = nn.RNN(nn.OptimizedLSTMCell(H))
    bwd_rnn = nn.RNN(nn.OptimizedLSTMCell(H), reverse=True, keep_order=True)
    yf = fwd_rnn.apply({"params": {"cell": cell_params["fwd"]}}, x)
    yb = bwd_rnn.apply({"params": {"cell": cell_params["bwd"]}}, x)
    oracle = jnp.concatenate([yf, yb], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=2e-5)


def test_bilstm_direction_params_differ():
    B, T, D, H = 1, 8, 3, 4
    x = jnp.ones((B, T, D))
    bi = BiLSTM(H, compute_dtype="float32")
    params = bi.init(jax.random.key(1), x)
    cp = params["params"]["cell"]
    assert "fwd" in cp and "bwd" in cp
    # distinct parameters per direction (not shared): at least one pair of
    # corresponding leaves (the kernels; biases init to zero) must differ
    lf = jax.tree.leaves(cp["fwd"])
    lb = jax.tree.leaves(cp["bwd"])
    assert len(lf) == len(lb)
    assert any(
        a.shape == b.shape and not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(lf, lb)
    )


def test_bilstm_grad_flows_and_unroll_consistent():
    B, T, D, H = 2, 16, 5, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    out_ref = None
    for unroll in (1, 4, 16):
        bi = BiLSTM(H, unroll=unroll, compute_dtype="float32")
        params = bi.init(jax.random.key(3), x)
        out = jax.jit(bi.apply)(params, x)
        if out_ref is None:
            out_ref = out
        else:
            np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)
    g = jax.grad(lambda p: bi.apply(p, x).sum())(params)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))
