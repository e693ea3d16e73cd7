import pytest
import jax
import jax.numpy as jnp
import numpy as np

from flax import linen as nn

from percivaltts_tpu.models.rnn import BiLSTM

GATES = "ifgo"


def _flax_cell_params(p):
    """Map BiLSTM's per-direction per-gate params onto the parameter tree of
    flax's OptimizedLSTMCell (i{c}: kernel only; h{c}: kernel + bias)."""
    d = {}
    for c in GATES:
        d[f"i{c}"] = {"kernel": p[f"i{c}"]}
        d[f"h{c}"] = {"kernel": p[f"h{c}"], "bias": p[f"b{c}"]}
    return d


def test_bilstm_matches_two_rnn_oracle():
    """The fused BiLSTM must equal two independent nn.RNN passes (forward +
    time-reversed) built from the same per-gate parameters."""
    B, T, D, H = 2, 12, 5, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))

    bi = BiLSTM(H, unroll=4, compute_dtype="float32")
    params = bi.init(jax.random.key(0), x)
    out = bi.apply(params, x)
    assert out.shape == (B, T, 2 * H)

    pp = params["params"]
    fwd_rnn = nn.RNN(nn.OptimizedLSTMCell(H))
    bwd_rnn = nn.RNN(nn.OptimizedLSTMCell(H), reverse=True, keep_order=True)
    yf = fwd_rnn.apply({"params": {"cell": _flax_cell_params(pp["fwd"])}}, x)
    yb = bwd_rnn.apply({"params": {"cell": _flax_cell_params(pp["bwd"])}}, x)
    oracle = jnp.concatenate([yf, yb], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=2e-5)


@pytest.mark.slow
def test_bilstm_pallas_matches_scan():
    """The Pallas kernel path (interpret mode on CPU) must match the fused
    scan fallback bit-for-bit in f32 — forward and gradients."""
    B, T, D, H = 2, 16, 5, 4
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    scan_m = BiLSTM(H, compute_dtype="float32", use_pallas=False)
    pal_m = BiLSTM(
        H, compute_dtype="float32", use_pallas=True, pallas_interpret=True
    )
    params = scan_m.init(jax.random.key(0), x)
    y_scan = scan_m.apply(params, x)
    y_pal = pal_m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan), atol=1e-5)

    def loss(m):
        return lambda p, x: jnp.sum(jnp.sin(m.apply(p, x)))

    g_scan = jax.grad(loss(scan_m), argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss(pal_m), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_bilstm_direction_params_differ():
    B, T, D, H = 1, 8, 3, 4
    x = jnp.ones((B, T, D))
    bi = BiLSTM(H, compute_dtype="float32")
    params = bi.init(jax.random.key(1), x)
    pp = params["params"]
    assert "fwd" in pp and "bwd" in pp
    # distinct parameters per direction (not shared): at least one pair of
    # corresponding leaves (the kernels; biases init to zero) must differ
    lf = jax.tree.leaves(pp["fwd"])
    lb = jax.tree.leaves(pp["bwd"])
    assert len(lf) == len(lb)
    assert any(
        a.shape == b.shape and not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(lf, lb)
    )


@pytest.mark.slow
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


def test_bgru_runs_and_differs_from_lstm():
    B, T, D, H = 2, 10, 5, 4
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    gru = BiLSTM(H, cell_type="gru", compute_dtype="float32")
    pg = gru.init(jax.random.key(0), x)
    yg = gru.apply(pg, x)
    assert yg.shape == (B, T, 2 * H)
    assert np.isfinite(np.asarray(yg)).all()


@pytest.mark.slow
def test_bilstm_pallas_under_sharded_batch_jit():
    """The Pallas path must compile and match unsharded numerics when the
    batch is sharded over the data axis of a mesh (multi-chip DP: XLA may
    all-gather around the kernel — correct, see module docstring)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("data", "model"))
    B, T, D, H = 16, 32, 12, 8
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    pal = BiLSTM(H, compute_dtype="float32", use_pallas=True, pallas_interpret=True)
    params = pal.init(jax.random.key(0), x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    y = jax.jit(pal.apply)(ps, xs)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(pal.apply(params, x)), atol=1e-5
    )
    g = jax.jit(jax.grad(lambda p, x: pal.apply(p, x).sum()))(ps, xs)
    g_ref = jax.grad(lambda p, x: pal.apply(p, x).sum())(params, x)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4)


def _flax_gru_params(p):
    d = {}
    for c in "rzn":
        d[f"i{c}" if c != "n" else "in"] = {"kernel": p[f"i{c}"], "bias": p[f"b{c}"]}
    d["hr"] = {"kernel": p["hr"]}
    d["hz"] = {"kernel": p["hz"]}
    d["hn"] = {"kernel": p["hn"], "bias": p["bhn"]}
    return d


def test_bgru_matches_flax_rnn_oracle():
    """The fused BGRU (scan fallback) must equal two flax nn.RNN(GRUCell)
    passes built from the same per-gate parameters."""
    B, T, D, H = 2, 12, 5, 4
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    bi = BiLSTM(H, cell_type="gru", compute_dtype="float32", use_pallas=False)
    params = bi.init(jax.random.key(2), x)
    out = bi.apply(params, x)

    pp = params["params"]
    fwd = nn.RNN(nn.GRUCell(H))
    bwd = nn.RNN(nn.GRUCell(H), reverse=True, keep_order=True)
    yf = fwd.apply({"params": {"cell": _flax_gru_params(pp["fwd"])}}, x)
    yb = bwd.apply({"params": {"cell": _flax_gru_params(pp["bwd"])}}, x)
    oracle = jnp.concatenate([yf, yb], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=2e-5)


@pytest.mark.slow
def test_bgru_pallas_matches_scan():
    B, T, D, H = 2, 16, 5, 4
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    scan_m = BiLSTM(H, cell_type="gru", compute_dtype="float32", use_pallas=False)
    pal_m = BiLSTM(H, cell_type="gru", compute_dtype="float32",
                   use_pallas=True, pallas_interpret=True)
    params = scan_m.init(jax.random.key(0), x)
    y_scan = scan_m.apply(params, x)
    y_pal = pal_m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan), atol=1e-5)

    def loss(m):
        return lambda p, x: jnp.sum(jnp.sin(m.apply(p, x)))

    g_scan = jax.grad(loss(scan_m), argnums=(0, 1))(params, x)
    g_pal = jax.grad(loss(pal_m), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_bilstm_pallas_odd_length():
    """T not divisible by any block size exercises the K=1 grid path."""
    B, T, D, H = 2, 15, 5, 4
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    scan_m = BiLSTM(H, compute_dtype="float32", use_pallas=False)
    pal_m = BiLSTM(H, compute_dtype="float32", use_pallas=True, pallas_interpret=True)
    params = scan_m.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(pal_m.apply(params, x)),
        np.asarray(scan_m.apply(params, x)),
        atol=1e-5,
    )


@pytest.mark.slow
def test_bilstm_pallas_shard_map_partitioned():
    """With shard_mesh set, the kernel runs under shard_map partitioned over
    the data axis (each device computes its local batch rows) and must equal
    the unsharded path — forward and gradients."""
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("data", "model"))
    B, T, D, H = 16, 32, 12, 8
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    plain = BiLSTM(H, compute_dtype="float32", use_pallas=True, pallas_interpret=True)
    sharded = BiLSTM(H, compute_dtype="float32", use_pallas=True,
                     pallas_interpret=True, shard_mesh=mesh)
    params = plain.init(jax.random.key(0), x)
    y0 = plain.apply(params, x)
    y1 = jax.jit(sharded.apply)(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)

    g0 = jax.grad(lambda p, x: jnp.sum(jnp.sin(plain.apply(p, x))), argnums=(0, 1))(params, x)
    g1 = jax.jit(jax.grad(lambda p, x: jnp.sum(jnp.sin(sharded.apply(p, x))), argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-4)

    # B=1 (init-style) falls back to the unsharded call rather than failing
    x1 = x[:1]
    y = jax.jit(sharded.apply)(params, x1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(plain.apply(params, x1)), atol=1e-5)


def test_pick_pallas_auto_heuristic_evaluates_on_all_dtypes(monkeypatch):
    """The auto heuristic's VMEM check must actually evaluate for every
    compute dtype: on CPU `backend == "tpu"` short-circuits the `and`, which
    hid a crash (`type object 'bfloat16' has no attribute 'itemsize'`) that
    broke every TPU cnn_blstm run. Mock the backend so the full expression
    runs here."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for dt, cell in (("bfloat16", "lstm"), ("float32", "lstm"), ("bfloat16", "gru")):
        m = BiLSTM(128, compute_dtype=dt, cell_type=cell)
        assert m._pick_pallas(16) in (True, False)
    # lane-misaligned gate width never picks the kernel
    assert BiLSTM(100, compute_dtype="bfloat16")._pick_pallas(16) is False
