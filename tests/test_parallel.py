"""Collectives + mesh tests.

On the CPU backend this is the simulated 8-device mesh; under
BS_TEST_TPU=1 the same tests run on the real chip with a degenerate
1-device mesh (collectives still compile + execute on hardware).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from blocksparse_tpu.parallel import (
    make_mesh, allreduce, group_allreduce, reduce_scatter, all_gather,
    sync_variables_op, hierarchical_allreduce,
)

NDEV = jax.device_count()


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == NDEV
    if NDEV >= 8:
        mesh2 = make_mesh(dp=4, tp=2)
        assert mesh2.shape["dp"] == 4 and mesh2.shape["tp"] == 2


def test_allreduce():
    mesh = make_mesh()
    x = jnp.arange(NDEV * 4, dtype=jnp.float32).reshape(NDEV, 4)

    f = shard_map(lambda x: allreduce(x, axis="dp"), mesh=mesh,
                  in_specs=P("dp", None), out_specs=P("dp", None))
    y = f(x)
    expect = np.tile(np.asarray(x).sum(axis=0, keepdims=True), (NDEV, 1))
    np.testing.assert_allclose(np.asarray(y), expect)


def test_hierarchical_allreduce_two_axis():
    """The reference's prereduce (src/nccl_op.cc:174-191) as a two-level
    ICI/DCN reduction: reduce_scatter over the fast axis, psum over the
    slow axis, all_gather back — must equal the flat two-axis psum."""
    if NDEV < 4:
        import pytest
        pytest.skip("needs a 2x(N/2) mesh")
    dcn = 2
    ici = NDEV // dcn
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()).reshape(dcn, ici), ("dcn", "ici"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(NDEV, 2 * ici, 4), jnp.float32)

    def hier(x):
        return hierarchical_allreduce(x[0, 0], fast_axis="ici",
                                      slow_axis="dcn")[None, None]

    def flat(x):
        return jax.lax.psum(x[0, 0], ("ici", "dcn"))[None, None]

    spec = P("dcn", "ici", None, None)
    xs = x.reshape(dcn, ici, 2 * ici, 4)
    yh = shard_map(hier, mesh=mesh, in_specs=spec, out_specs=spec)(xs)
    yf = shard_map(flat, mesh=mesh, in_specs=spec, out_specs=spec)(xs)
    np.testing.assert_allclose(np.asarray(yh), np.asarray(yf), rtol=1e-5)
    expect = np.asarray(x).sum(axis=0)
    np.testing.assert_allclose(np.asarray(yh)[0, 0], expect, rtol=1e-5)

    # odd leading dim: falls back to the flat psum, same result
    xo = jnp.asarray(rng.randn(NDEV, 3, 4), jnp.float32)
    xos = xo.reshape(dcn, ici, 3, 4)
    yo = shard_map(hier, mesh=mesh, in_specs=spec, out_specs=spec)(xos)
    np.testing.assert_allclose(np.asarray(yo)[0, 0],
                               np.asarray(xo).sum(axis=0), rtol=1e-5)


def test_allreduce_prereduce_kwarg():
    """allreduce(prereduce=N, axis=(fast, slow)) routes through the
    hierarchical path (reference nccl.py allreduce prereduce arg)."""
    if NDEV < 4:
        import pytest
        pytest.skip("needs a 2x(N/2) mesh")
    dcn = 2
    ici = NDEV // dcn
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()).reshape(dcn, ici), ("dcn", "ici"))
    x = jnp.asarray(np.random.RandomState(1).randn(NDEV, ici, 4),
                    jnp.float32)

    def f(x):
        return allreduce(x[0, 0], prereduce=ici, axis=("ici", "dcn"))[
            None, None]

    spec = P("dcn", "ici", None, None)
    y = shard_map(f, mesh=mesh, in_specs=spec,
                  out_specs=spec)(x.reshape(dcn, ici, ici, 4))
    np.testing.assert_allclose(np.asarray(y)[0, 0],
                               np.asarray(x).sum(axis=0), rtol=1e-5)


def test_group_allreduce_cast():
    mesh = make_mesh()
    g1 = jnp.ones((NDEV, 4), jnp.float32)
    g2 = jnp.ones((NDEV, 2), jnp.float32)

    def step(g1, g2):
        out = group_allreduce([g1, g2], cast_all=jnp.bfloat16, axis="dp")
        return out[0], out[1]

    f = shard_map(step, mesh=mesh, in_specs=(P("dp", None), P("dp", None)),
                  out_specs=(P("dp", None), P("dp", None)))
    o1, o2 = f(g1, g2)
    assert o1.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o1, np.float32), float(NDEV))


def test_reduce_scatter_all_gather_roundtrip():
    mesh = make_mesh()
    # per-shard differing values of a "replicated-shape" tensor (the model
    # sharding use case in reference nccl.py:316-429)
    x = jnp.asarray(np.random.randn(NDEV, 2 * NDEV, 4), jnp.float32)

    def rs_ag(x):
        x = x[0]                                     # (2*NDEV, 4) per shard
        r = reduce_scatter(x, axis="dp", scatter_dimension=0)  # (2, 4)
        return all_gather(r, axis="dp", concat_dimension=0)[None]

    f = shard_map(rs_ag, mesh=mesh, in_specs=P("dp", None, None),
                  out_specs=P("dp", None, None))
    y = f(x)
    expect = np.tile(np.asarray(x).sum(axis=0, keepdims=True), (NDEV, 1, 1))
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5)


def test_reduce_scatter_grad_is_all_gather():
    mesh = make_mesh()
    x = jnp.asarray(np.random.randn(NDEV, 2 * NDEV), jnp.float32)

    def loss(x):
        def inner(x):
            return jnp.sum(reduce_scatter(x[0], axis="dp") ** 2)[None]
        f = shard_map(inner, mesh=mesh, in_specs=P("dp", None),
                      out_specs=P("dp"))
        return jnp.sum(f(x))

    g = jax.grad(loss)(x)
    assert g.shape == x.shape


def test_sync_variables():
    mesh = make_mesh()
    # each shard has different values; after sync all match shard 0
    x = jnp.asarray(np.random.randn(NDEV, 4), jnp.float32)

    f = shard_map(lambda p: sync_variables_op(p, axis="dp"), mesh=mesh,
                  in_specs=P("dp", None), out_specs=P("dp", None))
    y = np.asarray(f(x))
    for i in range(NDEV):
        np.testing.assert_allclose(y[i], np.asarray(x)[0])


def test_dp_training_step():
    """End-to-end: per-shard grads -> group_allreduce -> identical params."""
    from blocksparse_tpu.ops.optimize import adam_apply
    mesh = make_mesh()
    np.random.seed(0)
    W = jnp.asarray(np.random.randn(16, 16), jnp.float32)
    X = jnp.asarray(np.random.randn(NDEV, 4, 16), jnp.float32)

    def step(w, x):
        def loss(w):
            return jnp.mean((x @ w) ** 2)
        g = jax.grad(loss)(w)
        g = allreduce(g, axis="dp") / float(NDEV)
        m = jnp.zeros_like(w)
        v = jnp.zeros_like(w)
        w2, _, _ = adam_apply(g, w, m, v, 0.1)
        return w2

    f = shard_map(step, mesh=mesh, in_specs=(P(None, None), P("dp", None, None)),
                  out_specs=P(None, None), check_vma=False)
    w2 = f(W, X)
    # parameters stay replicated-consistent
    assert w2.shape == W.shape
    assert not np.allclose(np.asarray(w2), np.asarray(W))


def test_sequence_parallel_attention():
    """Context-sharded fused attention == full fused attention, outputs
    and grads (dK/dV psum_scatter back to their shards), on a causal
    per-block-masked layout with an arbitrary-mask block thrown in."""
    import pytest
    from jax.sharding import Mesh
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer
    from blocksparse_tpu.parallel import sequence_parallel_attention

    n_sp = min(NDEV, 4)
    if NDEV % n_sp:
        pytest.skip("device count not divisible")
    heads, ctx_blks, bs, hs, batch = 2, 8, 16, 16, 2
    lay = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, bool)
        if qry == key:
            for r in range(blk_shape[0]):
                m[r, r + 1:] = False
        if blk == 1:                      # one arbitrary (non-causal) block
            m[::2, 1::2] = False
        return m

    bst = BlocksparseTransformer(lay, block_size=bs, heads=heads,
                                 mask_callback=cb)
    ctx, state = ctx_blks * bs, heads * hs
    rng = np.random.RandomState(0)
    Q = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    K = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    V = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    DY = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    scale = 1.0 / np.sqrt(hs)

    mesh = Mesh(np.array(jax.devices()[:n_sp]), ("sp",))
    spec = P(None, "sp", None)

    def local(q, k, v):
        return sequence_parallel_attention(bst, q, k, v, axis="sp",
                                           n_shards=n_sp, scale=scale)

    f = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                  out_specs=spec, check_vma=False)

    def loss_sp(q, k, v):
        return jnp.sum(f(q, k, v) * DY)

    def loss_full(q, k, v):
        return jnp.sum(bst.attention(q, k, v, scale=scale,
                                     use_fused=True) * DY)

    y_sp = f(Q, K, V)
    y_full = bst.attention(Q, K, V, scale=scale, use_fused=True)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_full),
                               rtol=2e-4, atol=2e-4)

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(Q, K, V)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(Q, K, V)
    for a, b, name in zip(g_sp, g_full, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_ring_attention():
    """Ring attention (K/V rotate via ppermute, per-pair schedules,
    streaming-softmax merge) == full fused attention, outputs + grads."""
    import pytest
    from jax.sharding import Mesh
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer
    from blocksparse_tpu.parallel import ring_attention

    n_sp = min(NDEV, 4)
    if NDEV % n_sp:
        pytest.skip("device count not divisible")
    heads, ctx_blks, bs, hs, batch = 2, 8, 16, 16, 2
    lay = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, bool)
        if qry == key:
            for r in range(blk_shape[0]):
                m[r, r + 1:] = False
        if blk == 1:
            m[::2, 1::2] = False
        return m

    bst = BlocksparseTransformer(lay, block_size=bs, heads=heads,
                                 mask_callback=cb)
    ctx, state = ctx_blks * bs, heads * hs
    rng = np.random.RandomState(1)
    Q = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    K = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    V = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    DY = jnp.asarray(rng.uniform(-1, 1, (batch, ctx, state)), jnp.float32)
    scale = 1.0 / np.sqrt(hs)

    mesh = Mesh(np.array(jax.devices()[:n_sp]), ("sp",))
    spec = P(None, "sp", None)

    def local(q, k, v):
        return ring_attention(bst, q, k, v, axis="sp", n_shards=n_sp,
                              scale=scale)

    f = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                  out_specs=spec, check_vma=False)

    y_ring = f(Q, K, V)
    y_full = bst.attention(Q, K, V, scale=scale, use_fused=True)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_full),
                               rtol=2e-4, atol=2e-4)

    def loss_ring(q, k, v):
        return jnp.sum(f(q, k, v) * DY)

    def loss_full(q, k, v):
        return jnp.sum(bst.attention(q, k, v, scale=scale,
                                     use_fused=True) * DY)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(Q, K, V)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(Q, K, V)
    for a, b, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
