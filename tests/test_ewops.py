"""ewops / norms / embed / grads tests vs NumPy goldens."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops import ewops as ew
from blocksparse_tpu.ops import norms
from blocksparse_tpu.ops import embed
from blocksparse_tpu.ops.grads import recomputable


def test_float_cast_dtypes():
    x = jnp.asarray(np.random.randn(8, 16), jnp.float32)
    y = ew.float_cast(x, jnp.bfloat16)
    assert y.dtype == jnp.bfloat16

    # grad comes back in dx_dtype
    def loss(x):
        y = ew.float_cast(x, jnp.bfloat16, dx_dtype=jnp.float32)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    assert g.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(g),
                               2 * np.asarray(x.astype(jnp.bfloat16),
                                              np.float32), rtol=1e-2)


def test_filter_tensor():
    x = np.array([1.0, np.inf, -np.inf, np.nan, 1e9, -5.0], np.float32)
    y = ew.filter_tensor(jnp.asarray(x), scale=2.0, saturate=100.0,
                         zero_infs=True, zero_nans=True)
    np.testing.assert_allclose(np.asarray(y),
                               [2.0, 0.0, 0.0, 0.0, 200.0, -10.0])


def test_dropout_mask_reuse():
    x = jnp.ones((32, 64))
    key = jax.random.PRNGKey(0)
    y1, mask = ew.dropout(x, 0.5, key=key)
    y2, _ = ew.dropout(x, 0.5, mask=mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    kept = np.asarray(mask).mean()
    assert 0.3 < kept < 0.7
    # broadcast mask
    y3, m3 = ew.dropout(x, 0.5, mask_shape=(1, 64), key=key)
    assert m3.shape == (1, 64)


def test_gelu_swish():
    x = jnp.linspace(-3, 3, 64)
    np.testing.assert_allclose(
        np.asarray(ew.fast_gelu(x)),
        np.asarray(x * jax.nn.sigmoid(1.702 * x)), rtol=1e-6)
    # tanh gelu close to exact gelu
    np.testing.assert_allclose(np.asarray(ew.gelu(x)),
                               np.asarray(jax.nn.gelu(x)), atol=2e-3)


def test_bias_relu():
    x = np.random.randn(16, 32).astype(np.float32)
    b = np.random.randn(32).astype(np.float32)
    y = ew.bias_relu(jnp.asarray(x), jnp.asarray(b), relu=True)
    np.testing.assert_allclose(np.asarray(y), np.maximum(x + b, 0), rtol=1e-6)
    # axis=0 (feature-major)
    y0 = ew.bias_relu(jnp.asarray(x.T), jnp.asarray(b), axis=0, relu=True)
    np.testing.assert_allclose(np.asarray(y0), np.maximum(x.T + b[:, None], 0),
                               rtol=1e-6)


def test_fancy_gather():
    x = np.random.randn(4, 8, 6).astype(np.float32)
    idx = np.random.randint(0, 8, (4,)).astype(np.int32)
    y = ew.fancy_gather(jnp.asarray(x), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(y), ew.fancy_gather_test(x, idx))


def test_add_n():
    xs = [jnp.full((4, 4), float(i)) for i in range(11)]
    y = ew.add_n(list(xs))
    np.testing.assert_allclose(np.asarray(y), np.full((4, 4), sum(range(11))))


def test_concrete_gate():
    loga = jnp.zeros((128,))
    g = ew.concrete_gate(loga, key=jax.random.PRNGKey(0))
    assert ((np.asarray(g) >= 0) & (np.asarray(g) <= 1)).all()
    gi = ew.concrete_gate_infer(loga)
    np.testing.assert_allclose(np.asarray(gi),
                               np.clip(0.5 * 1.2 - 0.1, 0, 1), rtol=1e-5)


@pytest.mark.parametrize("axis,segments,relu", [(1, 1, False), (1, 4, False),
                                                (0, 1, False), (1, 1, True),
                                                (0, 4, True)])
def test_layer_norm(axis, segments, relu):
    K, N = 64, 32
    shape = (K, N) if axis == 0 else (N, K)
    x = np.random.randn(*shape).astype(np.float32)
    g = np.random.uniform(0.5, 1.5, K).astype(np.float32)
    b = np.random.randn(K).astype(np.float32)
    dy = np.random.randn(*shape).astype(np.float32)

    y = norms.layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                         axis=axis, segments=segments, relu=relu)
    y_g = norms.layer_norm_test(x, g, b, axis=axis, segments=segments,
                                relu=relu)
    np.testing.assert_allclose(np.asarray(y), y_g, rtol=1e-4, atol=1e-4)

    def loss(x, g, b):
        return jnp.sum(norms.layer_norm(x, g, b, axis=axis,
                                        segments=segments, relu=relu)
                       * jnp.asarray(dy))

    dx, dg, db = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    dx_g, dg_g, db_g = norms.layer_norm_grad_test(
        dy.copy(), x, g, b, axis=axis, segments=segments, relu=relu)
    np.testing.assert_allclose(np.asarray(dx), dx_g, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dg).reshape(-1), dg_g.reshape(-1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(db).reshape(-1), db_g.reshape(-1),
                               rtol=1e-3, atol=1e-3)


def test_batch_norm():
    x = np.random.randn(4, 8, 6, 5).astype(np.float32)
    g = np.random.uniform(0.5, 1.5, 8).astype(np.float32)
    b = np.random.randn(8).astype(np.float32)
    y, m, v = norms.batch_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    y_g, m_g, v_g = norms.batch_norm_test(x, g, b)
    np.testing.assert_allclose(np.asarray(y), y_g, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), m_g, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), v_g, rtol=1e-4, atol=1e-5)

    yi = norms.batch_norm_inference(jnp.asarray(x), jnp.asarray(g),
                                    jnp.asarray(b), jnp.asarray(m_g),
                                    jnp.asarray(v_g))
    np.testing.assert_allclose(
        np.asarray(yi), norms.batch_norm_inf_test(x, g, b, m_g, v_g),
        rtol=1e-4, atol=1e-4)


def test_embedding_lookup():
    emb = np.random.randn(100, 16).astype(np.float32)
    idx = np.random.randint(0, 100, (4, 7))
    y = embed.embedding_lookup(jnp.asarray(emb), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(y), emb[idx])
    # grad is a deterministic scatter-add
    dy = np.random.randn(4, 7, 16).astype(np.float32)
    g = jax.grad(lambda e: jnp.sum(embed.embedding_lookup(e, jnp.asarray(idx))
                                   * jnp.asarray(dy)))(jnp.asarray(emb))
    expect = np.zeros_like(emb)
    for i in np.ndindex(4, 7):
        expect[idx[i]] += dy[i]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-5)


def test_recomputable():
    @recomputable
    def block(x, w):
        return jnp.tanh(x @ w)

    x = jnp.asarray(np.random.randn(8, 8), jnp.float32)
    w = jnp.asarray(np.random.randn(8, 8), jnp.float32)

    g1 = jax.grad(lambda x: jnp.sum(block(x, w)))(x)
    g2 = jax.grad(lambda x: jnp.sum(block(x, w, recompute=True)))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
