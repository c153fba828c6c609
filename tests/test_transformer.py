"""BlocksparseTransformer + dense softmax family vs NumPy goldens.

Mirrors reference test/blocksparse_transformer_test.py with hard asserts.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops import transformer as trans
from blocksparse_tpu.ops.transformer import BlocksparseTransformer


def causal_subblock_mask(blk_shape, head, qry, key, blk):
    """Causal mask callback (reference enwik8.py:82-94 pattern)."""
    mask = np.ones(blk_shape, dtype=bool)
    if qry == key:
        for q, k in np.ndindex(blk_shape):
            if k > q:
                mask[q, k] = 0
    return mask


def make_bst(ctx_blks=4, bsize=16, heads=2, per_head=False, masked=True,
             seed=0):
    rng = np.random.RandomState(seed)
    lut_heads = heads if per_head else 1
    layouts = []
    base = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
    nnz = int(base.sum())
    for h in range(lut_heads):
        lay = base.copy()
        layouts.append(lay)
    layout = np.array(layouts) if per_head else base
    cb = causal_subblock_mask if masked else None
    return BlocksparseTransformer(layout, block_size=bsize, heads=heads,
                                  mask_callback=cb)


@pytest.mark.parametrize("bsize", [8, 16, 32])
@pytest.mark.parametrize("per_head", [False, True])
def test_nt_nn_tn(bsize, per_head):
    heads, ctx_blks, batch, hs = 2, 4, 2, 16
    bst = make_bst(ctx_blks, bsize, heads, per_head, masked=False)
    ctx = ctx_blks * bsize
    state = heads * hs
    A = np.random.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    B = np.random.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    W = np.random.uniform(-1, 1, (batch, heads, bst.blocks, bsize,
                                  bsize)).astype(np.float32)

    w = bst.nt_op(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(w), bst.nt_test(A, B),
                               rtol=1e-4, atol=1e-4)

    y = bst.nn_op(jnp.asarray(W), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(y), bst.nn_test(W, B),
                               rtol=1e-4, atol=1e-4)

    z = bst.tn_op(jnp.asarray(W), jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(z), bst.tn_test(W, A),
                               rtol=1e-4, atol=1e-4)


def test_nt_nn_grads():
    heads, ctx_blks, batch, hs, bsize = 2, 3, 1, 8, 16
    bst = make_bst(ctx_blks, bsize, heads, masked=False)
    ctx = ctx_blks * bsize
    state = heads * hs
    Q = np.random.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    K = np.random.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    V = np.random.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    DY = np.random.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)

    def f(q, k, v):
        w = bst.nt_op(q, k)
        y = bst.nn_op(w, v)
        return jnp.sum(y * jnp.asarray(DY))

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))

    # numerical golden via pure numpy chain rule
    W = bst.nt_test(Q, K)
    DW = bst.nt_test(DY, V)          # dW = NT(dy, v)
    DV = bst.tn_test(W, DY)          # dV = TN(w, dy)
    DQ = bst.nn_test(DW, K)          # dQ = NN(dw, k)
    DK = bst.tn_test(DW, Q)          # dK = TN(dw, q)

    np.testing.assert_allclose(np.asarray(dv), DV, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dq), DQ, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), DK, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bsize", [16, 32])
@pytest.mark.parametrize("per_head", [False, True])
def test_nt_nn_tn_pallas(bsize, per_head):
    """Kernel-backed unfused trio (Pallas rectangle schedules) vs the
    NumPy goldens, including irregular random layouts and grads."""
    heads, ctx_blks, batch, hs = 2, 5, 2, 16
    rng = np.random.RandomState(3)
    lut_heads = heads if per_head else 1
    lays = []
    for h in range(lut_heads):
        lay = (rng.rand(ctx_blks, ctx_blks) < 0.5).astype(np.int32)
        lay[0, 0] = 1
        # equal block counts across heads (API invariant)
        flat = lay.ravel()
        want = 12
        on = np.flatnonzero(flat)
        if len(on) > want:
            flat[on[want:]] = 0
        while flat.sum() < want:
            off = np.flatnonzero(flat == 0)
            flat[off[0]] = 1
        lays.append(flat.reshape(ctx_blks, ctx_blks))
    layout = np.array(lays) if per_head else lays[0]
    bst = BlocksparseTransformer(layout, block_size=bsize, heads=heads,
                                 impl="pallas")
    ctx = ctx_blks * bsize
    state = heads * hs
    A = rng.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    B = rng.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    W = rng.uniform(-1, 1, (batch, heads, bst.blocks, bsize,
                            bsize)).astype(np.float32)

    w = bst.nt_op(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(w), bst.nt_test(A, B),
                               rtol=1e-4, atol=1e-4)
    y = bst.nn_op(jnp.asarray(W), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(y), bst.nn_test(W, B),
                               rtol=1e-4, atol=1e-4)
    z = bst.tn_op(jnp.asarray(W), jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(z), bst.tn_test(W, A),
                               rtol=1e-4, atol=1e-4)

    DY = rng.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)

    def f(q, k, v):
        return jnp.sum(bst.nn_op(bst.nt_op(q, k), v) * jnp.asarray(DY))

    dq, dk, dv = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(B))
    Wt = bst.nt_test(A, B)
    DW = bst.nt_test(DY, B)
    np.testing.assert_allclose(np.asarray(dv), bst.tn_test(Wt, DY),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dq), bst.nn_test(DW, B),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), bst.tn_test(DW, A),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bsize", [8, 16, 32])
def test_blocked_masked_softmax(bsize):
    heads, ctx_blks, batch = 2, 4, 2
    bst = make_bst(ctx_blks, bsize, heads, masked=True)
    X = np.random.uniform(-1, 1, (batch, heads, bst.blocks, bsize,
                                  bsize)).astype(np.float32)
    scale = 0.5

    y = bst.masked_softmax(jnp.asarray(X), scale=scale)
    y_g = bst.masked_softmax_test(X, scale=scale)
    np.testing.assert_allclose(np.asarray(y), y_g, rtol=1e-4, atol=1e-5)

    # unmasked blocked softmax
    bst2 = make_bst(ctx_blks, bsize, heads, masked=False)
    y2 = bst2.softmax(jnp.asarray(X), scale=scale)
    y2_g = bst2.masked_softmax_test(X, scale=scale)
    np.testing.assert_allclose(np.asarray(y2), y2_g, rtol=1e-4, atol=1e-5)


def test_blocked_softmax_grad():
    heads, ctx_blks, batch, bsize = 2, 3, 1, 16
    bst = make_bst(ctx_blks, bsize, heads, masked=True)
    X = np.random.uniform(-1, 1, (batch, heads, bst.blocks, bsize,
                                  bsize)).astype(np.float32)
    DY = np.random.uniform(-1, 1, X.shape).astype(np.float32)
    scale = 0.7

    y, vjp = jax.vjp(lambda x: bst.masked_softmax(x, scale=scale),
                     jnp.asarray(X))
    (dx,) = vjp(jnp.asarray(DY))
    y_g = bst.masked_softmax_test(X, scale=scale)
    dx_g = bst.masked_softmax_grad_test(DY, y_g, scale=scale)
    # masked positions have zero grad in our impl; the reference golden
    # computes grads on masked y==0 anyway (zero product) — equivalent.
    np.testing.assert_allclose(np.asarray(dx), dx_g, rtol=1e-3, atol=1e-5)


def test_autoregress_at_key():
    heads, ctx_blks, batch, bsize = 1, 4, 1, 8
    bst = make_bst(ctx_blks, bsize, heads, masked=True)
    X = np.random.uniform(-1, 1, (batch, heads, bst.blocks, bsize,
                                  bsize)).astype(np.float32)
    key = 13
    y = bst.masked_softmax(jnp.asarray(X), scale=1.0, autoregress_at_key=key)
    y_g = bst.masked_softmax_test(X, scale=1.0, autoregress_at_key=key)
    np.testing.assert_allclose(np.asarray(y), y_g, rtol=1e-4, atol=1e-5)


def test_dense_vs_blocked_attention():
    """Full (dense layout, causal mask) blocked attention == dense
    softmax attention (reference test pattern)."""
    heads, ctx_blks, batch, hs, bsize = 2, 4, 2, 8, 16
    bst = make_bst(ctx_blks, bsize, heads, masked=True)
    ctx = ctx_blks * bsize
    state = heads * hs
    Q = np.random.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    K = np.random.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    V = np.random.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    scale = 1.0 / np.sqrt(hs)

    w = bst.query_key_op(jnp.asarray(Q), jnp.asarray(K))
    w = bst.masked_softmax(w, scale=scale)
    y = bst.weight_value_op(w, jnp.asarray(V))

    # dense reference
    q = Q.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
    k = K.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
    v = V.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
    scores = np.einsum("nhqc,nhkc->nhqk", q, k) * scale
    causal = np.tril(np.ones((ctx, ctx), bool))
    scores = np.where(causal, scores, -1e30)
    e = np.exp(scores - scores.max(axis=-1, keepdims=True))
    sm = e / e.sum(axis=-1, keepdims=True)
    y_d = np.einsum("nhqk,nhkc->nhqc", sm, v).transpose(0, 2, 1, 3) \
        .reshape(batch, ctx, state)
    np.testing.assert_allclose(np.asarray(y), y_d, rtol=1e-3, atol=1e-4)


def test_dense_softmax_family():
    x = np.random.uniform(-1, 1, (8, 64)).astype(np.float32)
    mask = (np.random.rand(1, 64) > 0.3).astype(np.float32)
    y = trans.masked_softmax(jnp.asarray(x), jnp.asarray(mask), scale=0.5)
    y_g = trans.masked_softmax_test(x, mask, scale=0.5)
    np.testing.assert_allclose(np.asarray(y), y_g, rtol=1e-4, atol=1e-6)

    dy = np.random.randn(8, 64).astype(np.float32)
    _, vjp = jax.vjp(
        lambda x: trans.masked_softmax(x, jnp.asarray(mask), scale=0.5),
        jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(dy))
    dx_g = trans.masked_softmax_grad_test(dy, y_g, mask, scale=0.5)
    np.testing.assert_allclose(np.asarray(dx), dx_g, rtol=1e-3, atol=1e-5)


def test_top_k_family():
    x = np.random.uniform(-1, 1, (8, 32)).astype(np.float32)
    y = trans.rectified_top_k(jnp.asarray(x), 5)
    y_g = trans.rectified_top_k_test(x, 5)
    np.testing.assert_allclose(np.asarray(y), y_g, rtol=1e-5, atol=1e-6)

    y2 = trans.masked_top_k_softmax(jnp.asarray(x), 5)
    y2_g = trans.masked_top_k_softmax_test(x, 5)
    np.testing.assert_allclose(np.asarray(y2), y2_g, rtol=1e-4, atol=1e-6)

    vals, idx = trans.top_k(jnp.asarray(x), 5)
    assert vals.shape == (8, 5)


def test_softmax_cross_entropy():
    logits = np.random.randn(16, 100).astype(np.float32)
    labels = np.random.randint(0, 100, 16)
    loss = trans.softmax_cross_entropy(logits=jnp.asarray(logits),
                                       labels=jnp.asarray(labels))
    sm = np.exp(logits - logits.max(-1, keepdims=True))
    sm /= sm.sum(-1, keepdims=True)
    expect = -np.log(sm[np.arange(16), labels])
    np.testing.assert_allclose(np.asarray(loss), expect, rtol=1e-4,
                               atol=1e-5)

    dy = np.random.rand(16).astype(np.float32)
    _, vjp = jax.vjp(
        lambda l: trans.softmax_cross_entropy(logits=l,
                                              labels=jnp.asarray(labels)),
        jnp.asarray(logits))
    (dx,) = vjp(jnp.asarray(dy))
    onehot = np.eye(100, dtype=np.float32)[labels]
    np.testing.assert_allclose(np.asarray(dx), (sm - onehot) * dy[:, None],
                               rtol=1e-4, atol=1e-5)


def test_transposes():
    x = np.random.randn(2, 3, 4, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(trans.transpose_0213(jnp.asarray(x))),
        x.transpose(0, 2, 1, 3))
    x2 = np.random.randn(3, 7).astype(np.float32)
    np.testing.assert_allclose(np.asarray(trans.transpose_2d(jnp.asarray(x2))),
                               x2.T)


def test_fused_attention_matches_unfused():
    heads, ctx_blks, batch, hs, bsize = 2, 4, 2, 16, 16
    bst = make_bst(ctx_blks, bsize, heads, masked=True)
    ctx = ctx_blks * bsize
    state = heads * hs
    rng = np.random.RandomState(3)
    Q = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    K = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    V = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    scale = 0.25

    y_fused = bst.attention(jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
                            scale=scale, use_fused=True)
    y_ref = bst.attention(jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
                          scale=scale, use_fused=False)
    # rtol covers TPU transcendental (exp) accuracy in the online softmax
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-3, atol=1e-5)

    # grads flow through the recompute backward
    DY = rng.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)

    def loss(q, k, v, fused):
        y = bst.attention(q, k, v, scale=scale, use_fused=fused)
        return jnp.sum(y * jnp.asarray(DY))

    g_f = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V), True)
    g_r = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V), False)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_fused_attention_unmasked_layout():
    # strided-ish sparse layout without mask callback
    heads, ctx_blks, batch, hs, bsize = 1, 6, 1, 8, 8
    layout = np.zeros((ctx_blks, ctx_blks), np.int32)
    for i in range(ctx_blks):
        layout[i, i] = 1
        layout[i, 0] = 1
        if i >= 2:
            layout[i, i - 2] = 1
    bst = BlocksparseTransformer(layout, block_size=bsize, heads=heads)
    ctx = ctx_blks * bsize
    state = heads * hs
    rng = np.random.RandomState(5)
    Q = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    K = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    V = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    y_fused = bst.attention(jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
                            scale=0.3, use_fused=True)
    y_ref = bst.attention(jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
                          scale=0.3, use_fused=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_backward_matches_unfused():
    heads, ctx_blks, batch, hs, bsize = 2, 4, 2, 16, 16
    bst = make_bst(ctx_blks, bsize, heads, masked=True)
    ctx = ctx_blks * bsize
    state = heads * hs
    rng = np.random.RandomState(7)
    Q = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    K = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    V = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    DY = rng.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    scale = 0.25

    def loss(q, k, v, flash):
        y = bst.attention(q, k, v, scale=scale, use_fused=True,
                          flash_bwd=flash)
        return jnp.sum(y * jnp.asarray(DY))

    g_flash = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V), True)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V), False)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{name}")


def test_flash_backward_unmasked():
    heads, ctx_blks, batch, hs, bsize = 1, 5, 1, 8, 8
    layout = np.zeros((ctx_blks, ctx_blks), np.int32)
    for i in range(ctx_blks):
        layout[i, max(0, i - 1):i + 1] = 1
        layout[i, 0] = 1
    bst = BlocksparseTransformer(layout, block_size=bsize, heads=heads)
    ctx = ctx_blks * bsize
    rng = np.random.RandomState(9)
    Q = rng.uniform(-0.5, 0.5, (batch, ctx, heads * hs)).astype(np.float32)

    def loss(q, flash):
        y = bst.attention(q, q, q, scale=0.3, use_fused=True,
                          flash_bwd=flash)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss)(jnp.asarray(Q), True)
    g2 = jax.grad(loss)(jnp.asarray(Q), False)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


def test_fused_attention_per_head_layouts():
    heads, ctx_blks, batch, hs, bsize = 2, 4, 2, 8, 16
    rng = np.random.RandomState(11)
    lays = []
    for h in range(heads):
        lay = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
        # drop a different off-diagonal block per head, keep counts equal
        lay[3, 1 + h] = 0
        lays.append(lay)
    layout = np.stack(lays)
    bst = BlocksparseTransformer(layout, block_size=bsize, heads=heads,
                                 mask_callback=causal_subblock_mask)
    assert bst.lut_heads == heads
    ctx = ctx_blks * bsize
    Q = rng.uniform(-0.5, 0.5, (batch, ctx, heads * hs)).astype(np.float32)
    K = rng.uniform(-0.5, 0.5, (batch, ctx, heads * hs)).astype(np.float32)
    V = rng.uniform(-0.5, 0.5, (batch, ctx, heads * hs)).astype(np.float32)

    y_f = bst.attention(jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
                        scale=0.3, use_fused=True)
    y_r = bst.attention(jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V),
                        scale=0.3, use_fused=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-4, atol=1e-5)

    # flash backward with per-head layouts
    def loss(q, flash):
        y = bst.attention(q, jnp.asarray(K), jnp.asarray(V), scale=0.3,
                          use_fused=True, flash_bwd=flash)
        return jnp.sum(y ** 2)

    g1 = jax.grad(lambda q: loss(q, True))(jnp.asarray(Q))
    g2 = jax.grad(lambda q: loss(q, False))(jnp.asarray(Q))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-4)


# ---------------- KV-cached incremental decode ----------------

def test_decode_step_parity():
    """decode_step == masked_softmax(autoregress_at_key=pos+1) at row pos
    (the reference's bst_partial_autoregressive_mask semantics)."""
    ctx_blks, bs, heads, hs, batch = 6, 16, 2, 32, 2
    lay = np.zeros((ctx_blks, ctx_blks), np.int32)
    for q in range(ctx_blks):
        lay[q, max(0, q - 2):q + 1] = 1
        lay[q, 0] = 1

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, bool)
        if qry == key:
            for r in range(blk_shape[0]):
                m[r, r + 1:] = 0
        return m

    bst = BlocksparseTransformer(lay, block_size=bs, heads=heads,
                                 mask_callback=cb)
    rng = np.random.RandomState(0)
    state = heads * hs
    ctx = ctx_blks * bs
    Q = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    K = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    V = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    scale = 0.2
    for pos in (0, 5, 16, 47, ctx - 1):
        w = bst.nt_op(Q, K)
        p = bst.masked_softmax(w, scale=scale, autoregress_at_key=pos + 1)
        y = bst.nn_op(p, V)
        yd = bst.decode_step(Q[:, pos:pos + 1], K, V, pos, scale=scale)
        np.testing.assert_allclose(np.asarray(yd[:, 0]),
                                   np.asarray(y[:, pos]),
                                   rtol=1e-5, atol=1e-5)


def test_generate_cached_matches_full():
    from blocksparse_tpu.models.sparse_transformer import (
        SparseTransformerLM, TransformerConfig, generate, generate_cached)

    c = TransformerConfig(n_vocab=64, n_embd=64, n_layer=2, n_head=2,
                          ctx=128, blk_size=16, attn_layout="fixed",
                          local_blocks=3, mlp_block_size=16,
                          mlp_density=0.6, dtype="float32",
                          recompute=False)
    m = SparseTransformerLM(c)
    params = m.init(jax.random.PRNGKey(0))
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, 64, (2, 10)), jnp.int32)
    key = jax.random.PRNGKey(7)
    t1 = np.asarray(generate(m, params, prompt, 8, key=key))
    t2 = np.asarray(generate_cached(m, params, prompt, 8, key=key))
    np.testing.assert_array_equal(t1, t2)


def test_fused_attention_streamed_matches_resident():
    """stream=True (per-slot DMA, no VMEM residency limit) computes the
    same fwd/lse/bwd as the resident kernels."""
    from blocksparse_tpu.kernels import bst_attn

    ctx_blks, bs, heads, hs, batch = 5, 16, 2, 32, 2
    lay = np.zeros((ctx_blks, ctx_blks), np.int32)
    for q in range(ctx_blks):
        lay[q, max(0, q - 2):q + 1] = 1

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, bool)
        if qry == key:
            for r in range(blk_shape[0]):
                m[r, r + 1:] = 0
        return m

    bst = BlocksparseTransformer(lay, block_size=bs, heads=heads,
                                 mask_callback=cb)
    rng = np.random.RandomState(0)
    ctx = ctx_blks * bs
    BH = batch * heads
    Q = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    K = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    V = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    dO = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    sched, sched_tn = bst.attn_schedule, bst.attn_schedule_tn
    y0, l0 = bst_attn.fused_attention_fwd_lse(Q, K, V, sched, heads, 0.2,
                                              stream=False)
    y1, l1 = bst_attn.fused_attention_fwd_lse(Q, K, V, sched, heads, 0.2,
                                              stream=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=1e-5)
    g0 = bst_attn.fused_attention_bwd(Q, K, V, y0, l0, dO, sched, sched_tn,
                                      heads, 0.2, stream=False)
    g1 = bst_attn.fused_attention_bwd(Q, K, V, y1, l1, dO, sched, sched_tn,
                                      heads, 0.2, stream=True)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_resident_budget_excludes_known_failing_config():
    """Regression (ADVICE r2): ctx 8192 x hs 64 x bf16 lands exactly on
    the 2 MiB budget and must stream — its dkv kernel's scoped-vmem
    allocation (24.19 MB) exceeds Mosaic's 16 MB limit when resident."""
    from blocksparse_tpu.ops.transformer import _resident_fits

    assert _resident_fits(64, 8192, 2) is False
    assert _resident_fits(64, 4096, 2) is True


def test_fused_bwd_long_ctx_large_bh_compiles():
    """VERDICT r2 #4: fused attention backward must compile (and run)
    at ctx 8192 / batch*heads 64 — the residency-budget fix routes this
    config to the streaming kernels (resident mode overflows Mosaic's
    16 MB scoped vmem there).  Full-size on real TPU (BS_TEST_TPU=1);
    a scaled-down shape with the same streaming path on CPU interpret."""
    import os
    from blocksparse_tpu.models.sparse_transformer import (
        fixed_layout, causal_subblock_mask)

    on_tpu = bool(os.environ.get("BS_TEST_TPU"))
    ctx, bs, heads, batch, hs = \
        (8192, 64, 8, 8, 64) if on_tpu else (512, 32, 2, 2, 32)
    lay = fixed_layout(ctx // bs, local_blocks=4)
    bst = BlocksparseTransformer(lay, block_size=bs, heads=heads,
                                 mask_callback=causal_subblock_mask)
    state = heads * hs
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dt)

    def loss(q):
        y = bst.attention(q, q, q, scale=1.0 / np.sqrt(hs),
                          use_fused=True)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    g = jax.jit(jax.grad(loss))(Q)
    jax.block_until_ready(g)
    assert g.shape == Q.shape
    assert bool(jnp.isfinite(jnp.sum(g.astype(jnp.float32))))


def test_fused_attention_streamed_per_head_layouts():
    """stream mode with per-head LUTs: the DMA gather indexes the
    schedule by h = bh % heads, so each head must fetch its own blocks."""
    from blocksparse_tpu.kernels import bst_attn

    heads, ctx_blks, batch, hs, bsize = 2, 4, 2, 16, 16
    lays = []
    for h in range(heads):
        lay = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
        lay[3, 1 + h] = 0
        lays.append(lay)
    bst = BlocksparseTransformer(np.stack(lays), block_size=bsize,
                                 heads=heads,
                                 mask_callback=causal_subblock_mask)
    rng = np.random.RandomState(3)
    ctx = ctx_blks * bsize
    BH = batch * heads
    Q = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    K = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    V = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    dO = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), jnp.float32)
    sched, sched_tn = bst.attn_schedule, bst.attn_schedule_tn
    y0, l0 = bst_attn.fused_attention_fwd_lse(Q, K, V, sched, heads, 0.2,
                                              stream=False)
    y1, l1 = bst_attn.fused_attention_fwd_lse(Q, K, V, sched, heads, 0.2,
                                              stream=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=1e-5)
    g0 = bst_attn.fused_attention_bwd(Q, K, V, y0, l0, dO, sched, sched_tn,
                                      heads, 0.2, stream=False)
    g1 = bst_attn.fused_attention_bwd(Q, K, V, y1, l1, dO, sched, sched_tn,
                                      heads, 0.2, stream=True)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_packed_schedule_smem_budget_32k():
    """Regression (round-4 ctx-16384 TPU failure): the schedule must ride
    packed — one int32 word per (kidx, mcode) slot and one word per
    (row, first, last) step — and a dense-causal ctx-32768 schedule must
    fit the ~1 MB SMEM budget (it was 1.22 MB unpacked, 2.7 MB with the
    16x lane padding of 3-D SMEM windows)."""
    from blocksparse_tpu.kernels import bst_attn
    from blocksparse_tpu.models.sparse_transformer import (
        causal_subblock_mask)
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    bs = 64
    ctx_blks = 32768 // bs
    lay = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
    bst = BlocksparseTransformer(lay, block_size=bs, heads=1,
                                 mask_callback=causal_subblock_mask)
    sched = bst.attn_schedule
    rfl, packed = bst_attn._sched_args(sched)
    # pack is bijective
    kidx = np.asarray(packed) // bst_attn._MCODE_MOD
    mcode = np.asarray(packed) % bst_attn._MCODE_MOD
    np.testing.assert_array_equal(kidx, np.asarray(sched.k_idx).ravel())
    np.testing.assert_array_equal(mcode, np.asarray(sched.mcode).ravel())
    np.testing.assert_array_equal(np.asarray(rfl) // 4,
                                  np.asarray(sched.row))
    np.testing.assert_array_equal(np.asarray(rfl) % 2,
                                  np.asarray(sched.last))
    np.testing.assert_array_equal((np.asarray(rfl) // 2) % 2,
                                  np.asarray(sched.first))
    # SMEM accounting: packed schedule + 3x-replicated prefetch word
    smem_bytes = packed.size * 4 + 3 * rfl.size * 4
    assert smem_bytes < 1_000_000, smem_bytes


def test_packed_schedule_numeric_parity_vs_unfused():
    """The packed-schedule kernels must agree with the unfused XLA path
    (same check the on-chip probe runs at ctx 16K/32K)."""
    from blocksparse_tpu.models.sparse_transformer import (
        fixed_layout, causal_subblock_mask)
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    ctx, bs, heads, hs, batch = 256, 16, 2, 32, 2
    lay = fixed_layout(ctx // bs, local_blocks=4)
    bst = BlocksparseTransformer(lay, block_size=bs, heads=heads,
                                 mask_callback=causal_subblock_mask)
    rng = np.random.RandomState(7)
    state = heads * hs
    Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)),
                    jnp.float32)
    y_f = bst.attention(Q, Q, Q, scale=0.2, use_fused=True)
    y_u = bst.attention(Q, Q, Q, scale=0.2, use_fused=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               atol=2e-5)


def test_fused_attention_fp16():
    """fp16 q/k/v through the fused kernel: bf16 compute, f16 out
    (see ops/transformer.py _bst_attention)."""
    from blocksparse_tpu.models.sparse_transformer import (
        fixed_layout, causal_subblock_mask)
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    bst = BlocksparseTransformer(fixed_layout(8, local_blocks=4),
                                 block_size=16, heads=2,
                                 mask_callback=causal_subblock_mask)
    rng = np.random.RandomState(11)
    Q = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 128, 64)), jnp.float16)

    def loss(q):
        y = bst.attention(q, q, q, scale=0.25, use_fused=True)
        return jnp.sum(jnp.square(y.astype(jnp.float32))), y

    (_, y), g = jax.value_and_grad(loss, has_aux=True)(Q)
    assert y.dtype == jnp.float16 and g.dtype == jnp.float16
    yu = bst.attention(Q, Q, Q, scale=0.25, use_fused=False)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yu, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_unfused_trio_fp16():
    """fp16 through the unfused nt/masked_softmax/nn trio and direct
    tn_op: the pallas dispatch casts f16->bf16 around the dots (Mosaic
    rejects f16 dots on TPU) and re-emits f16 — same shim as the fused
    branch (ops/transformer.py _nt_impl/_xn_impl)."""
    from blocksparse_tpu.models.sparse_transformer import (
        fixed_layout, causal_subblock_mask)
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    bst = BlocksparseTransformer(fixed_layout(8, local_blocks=4),
                                 block_size=16, heads=2,
                                 mask_callback=causal_subblock_mask)
    rng = np.random.RandomState(13)
    Qh = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 128, 64)), jnp.float16)
    Qf = Qh.astype(jnp.float32)

    w = bst.nt_op(Qh, Qh)
    assert w.dtype == jnp.float16
    p = bst.masked_softmax(w, scale=0.25)
    y = bst.nn_op(p, Qh)
    t = bst.tn_op(p, Qh)
    assert y.dtype == jnp.float16 and t.dtype == jnp.float16

    yf = bst.nn_op(bst.masked_softmax(bst.nt_op(Qf, Qf), scale=0.25), Qf)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(yf), rtol=2e-2, atol=2e-2)


def test_fused_attention_q_mult_pairing():
    """q-row pairing (AttnSchedule.q_mult=2): the paired fused path
    must match the unpaired one bit-for-tolerance on fwd AND flash
    grads, including per-head layouts with subblock masks and rows
    whose pair-halves have different k-block sets (union slots hit
    MASK_ABSENT halves)."""
    heads, ctx_blks, batch, hs, bsize = 2, 6, 2, 16, 16
    rng = np.random.RandomState(11)
    # per-head causal with a different block dropped per head (equal
    # totals — library constraint) so pair-halves differ across heads
    lays = []
    for h in range(heads):
        lay = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
        if h == 0:
            lay[3, 0] = 0
        else:
            lay[5, 1] = 0
        lays.append(lay)
    layout = np.array(lays)
    ctx = ctx_blks * bsize
    state = heads * hs
    Q = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    K = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    V = rng.uniform(-0.5, 0.5, (batch, ctx, state)).astype(np.float32)
    DY = rng.uniform(-1, 1, (batch, ctx, state)).astype(np.float32)
    scale = 0.25

    def run(q_mult):
        bst = BlocksparseTransformer(layout, block_size=bsize, heads=heads,
                                     mask_callback=causal_subblock_mask,
                                     q_mult=q_mult)
        if q_mult == 2:
            sched = bst.attn_schedule_q2
            assert sched.q_mult == 2 and sched.mcode2 is not None
            # pairing halves the step count (unions fit the same chunks)
            assert sched.num_steps <= bst.attn_schedule.num_steps

        def loss(q, k, v):
            y = bst.attention(q, k, v, scale=scale, use_fused=True)
            return jnp.sum(y * jnp.asarray(DY)), y

        (_, y), g = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                       has_aux=True)(
            jnp.asarray(Q), jnp.asarray(K), jnp.asarray(V))
        return y, g

    y1, g1 = run(1)
    y2, g2 = run(2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-3, atol=1e-5)
    for a, b in zip(g2, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_fused_attention_q_mult_odd_rows_falls_back():
    """Odd q block-row count: auto pairing must fall back to the
    unpaired schedule (and still match the unfused reference)."""
    heads, ctx_blks, batch, hs, bsize = 1, 5, 1, 8, 8
    layout = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
    bst = BlocksparseTransformer(layout, block_size=bsize, heads=heads)
    ctx = ctx_blks * bsize
    rng = np.random.RandomState(5)
    Q = rng.uniform(-0.5, 0.5, (batch, ctx, hs)).astype(np.float32)
    y_f = bst.attention(jnp.asarray(Q), jnp.asarray(Q), jnp.asarray(Q),
                        scale=0.5, use_fused=True)
    y_r = bst.attention(jnp.asarray(Q), jnp.asarray(Q), jnp.asarray(Q),
                        scale=0.5, use_fused=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                               rtol=1e-3, atol=1e-5)
