"""Fused LSTM ops vs NumPy goldens (reference test/lstm_gates_test.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops import lstm


def test_fused_lstm_gates():
    N, width = 8, 16
    c = np.random.uniform(-1, 1, (N, width)).astype(np.float32)
    h = np.random.uniform(-1, 1, (N, 4 * width)).astype(np.float32)
    b = np.random.uniform(-0.5, 0.5, 4 * width).astype(np.float32)

    c2, h2 = lstm.fused_lstm_gates(jnp.asarray(c), jnp.asarray(h),
                                   bias=jnp.asarray(b), forget_bias=1.0)
    c_g, h_g = lstm.lstm_gates_test(c, h, bias=b, forget_bias=1.0)
    # rtol covers TPU transcendental accuracy (~1e-4 rel)
    np.testing.assert_allclose(np.asarray(c2), c_g, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), h_g, rtol=5e-4, atol=1e-5)

    # 4-tensor mode
    i, u, f, o = np.split(h, 4, axis=1)
    c3, h3 = lstm.fused_lstm_gates(jnp.asarray(c), jnp.asarray(i),
                                   jnp.asarray(u), jnp.asarray(f),
                                   jnp.asarray(o))
    c_g3, h_g3 = lstm.lstm_gates_test(c, h, forget_bias=1.0)
    np.testing.assert_allclose(np.asarray(c3), c_g3, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h3), h_g3, rtol=5e-4, atol=1e-5)


def test_split_concat4():
    x = np.random.randn(4, 16).astype(np.float32)
    parts = lstm.split4(jnp.asarray(x))
    y = lstm.concat4(*parts)
    np.testing.assert_allclose(np.asarray(y), x)


def test_sparse_relu():
    x = np.random.randn(8, 64).astype(np.float32)
    y = lstm.sparse_relu(jnp.asarray(x), alpha=1.0)
    np.testing.assert_allclose(np.asarray(y), lstm.sparse_relu_test(x),
                               rtol=1e-5, atol=1e-6)


def test_fused_cell_and_grouped_lstm():
    N, T, in_w, width = 4, 5, 8, 16
    key = jax.random.PRNGKey(0)
    cell = lstm.FusedBasicLSTMCell(width)
    params = cell.init(key, in_w)
    x = jnp.asarray(np.random.randn(N, in_w), jnp.float32)
    state = (jnp.zeros((N, width)), jnp.zeros((N, width)))
    h, (c2, h2) = cell(params, x, state)
    assert h.shape == (N, width)

    gp = lstm.grouped_lstm_init(key, in_w, width, layernorm=True)
    xs = jnp.asarray(np.random.randn(N, T, in_w), jnp.float32)
    ys, (c, h) = lstm.grouped_lstm(xs, width, T, state, gp, layernorm=True)
    assert ys.shape == (N, T, width)

    # grads flow through scan into the shared kernel
    def loss(p):
        ys, _ = lstm.grouped_lstm(xs, width, T, state, p, layernorm=True)
        return jnp.sum(ys ** 2)

    g = jax.grad(loss)(gp)
    assert g["kernel"].shape == gp["kernel"].shape
    assert float(jnp.abs(g["kernel"]).sum()) > 0
