"""Aux coverage: conv-attention layouts, block_reduced_full_dw, sparse
LSTM model, profiling utils."""
import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.utils import bst_conv_layout, bst_deconv_layout
from blocksparse_tpu.ops.matmul import block_reduced_full_dw


def test_bst_conv_layout():
    layout, cb = bst_conv_layout(input_h=16, input_w=16, filter_h=3,
                                 filter_w=3, stride=1, blk_size=8)
    assert layout.shape == (32, 32)
    assert layout.any()
    # autoregressive: block-upper triangle is empty
    for q in range(32):
        assert not layout[q, q + 1:].any()
    mask = cb((8, 8), 0, 0, 0, 0)
    assert mask.shape == (8, 8)
    # diagonal block mask is causal-ish (no future pixels)
    assert not mask[0, 1:].any()


def test_bst_deconv_layout():
    layout, cb = bst_deconv_layout(output_h=16, output_w=16, filter_h=3,
                                   filter_w=3, stride=1, blk_size=8)
    assert layout.shape == (32, 32)
    assert layout.any()


def test_block_reduced_full_dw():
    """Block-norm-reduced full dw for network growth (reference
    BlocksparseReducedDW, blocksparse_reduced_dw_test.py)."""
    rng = np.random.RandomState(0)
    C, K, N, bsize = 64, 96, 32, 32
    xs = [jnp.asarray(rng.randn(C, N), jnp.float32) for _ in range(3)]
    gs = [jnp.asarray(rng.randn(K, N), jnp.float32) for _ in range(3)]
    out = block_reduced_full_dw(xs, gs, bsize=bsize, axis=0, norm="max",
                                scale=2.0)
    assert out.shape == (C // bsize, K // bsize)
    # golden
    dw = sum(np.asarray(x) @ np.asarray(g).T for x, g in zip(xs, gs))
    blk = dw.reshape(C // bsize, bsize, K // bsize, bsize)
    expect = np.abs(blk).max(axis=(1, 3)) * 2.0
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4)

    out2 = block_reduced_full_dw(xs, gs, bsize=bsize, axis=0, norm="l2")
    expect2 = np.sqrt((blk ** 2).sum(axis=(1, 3)))
    np.testing.assert_allclose(np.asarray(out2), expect2, rtol=1e-4)


def test_sparse_lstm_model():
    from blocksparse_tpu.models.sparse_lstm import SparseLSTM, LSTMConfig
    cfg = LSTMConfig(nhidden=128, nsteps=6, mask_kind="ws_2_20",
                     block_size=32, nproj_in=64, nproj_out=64, isteps=1)
    m = SparseLSTM(cfg)
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.randint(0, 256, (2, 6)))
    logits = m.forward(params, x)
    assert logits.shape == (2, 6, 256)
    loss1 = float(m.loss(params, x, x))
    assert np.isfinite(loss1)
    g = jax.grad(m.loss)(params, x, x)
    assert float(jnp.abs(g["layers"][0]["w_h"]).sum()) > 0
    assert float(jnp.abs(g["wte"]).sum()) > 0


def test_profiling_bench_op():
    from blocksparse_tpu.profiling import bench_op, Benchmark
    x = jnp.ones((128, 128))
    dt = bench_op(lambda x: x * 2.0, x, iters=3)
    assert dt > 0
    with Benchmark("test", bytes_accessed=1000, flops=1000):
        pass


def test_decode_autoregress_consistency():
    """Incremental decode: partial-autoregressive masking at key K equals
    full softmax on the first K keys."""
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, dtype=bool)
        if qry == key:
            for q in range(blk_shape[0]):
                m[q, q + 1:] = 0
        return m

    lay = np.tril(np.ones((4, 4), np.int32))
    bst = BlocksparseTransformer(lay, block_size=8, heads=1,
                                 mask_callback=cb)
    x = np.random.uniform(-1, 1, (1, 1, bst.blocks, 8, 8)).astype(np.float32)
    key = 20
    y = np.asarray(bst.masked_softmax(jnp.asarray(x), scale=1.0,
                                      autoregress_at_key=key))
    y_g = bst.masked_softmax_test(x, scale=1.0, autoregress_at_key=key)
    np.testing.assert_allclose(y, y_g, rtol=1e-4, atol=1e-6)


def test_sparsity_module():
    from blocksparse_tpu import sparsity
    lay = sparsity.fixed_layout(16, local_blocks=4)
    assert lay.shape == (16, 16)
    assert np.tril(lay, -1).sum() + np.diag(lay).sum() == lay.sum()  # causal
    lay2 = sparsity.strided_layout(16, local_blocks=4)
    assert lay2[15, 15] == 1
    lay3 = sparsity.random_layout(8, 8, 0.3, seed=1)
    assert lay3.any()
    stats = sparsity.layout_stats(lay)
    assert 0 < stats["density"] <= 1
    assert "supertile128_fill_b32" in stats
    m = sparsity.make_mask(16, "ba_4")
    assert m.shape == (16, 16)


def test_memory_tooling():
    from blocksparse_tpu.profiling import memory_analysis, live_buffers
    ma = memory_analysis(lambda x: jnp.dot(x, x), jnp.ones((64, 64)))
    if ma is not None:  # backend-dependent
        assert ma["argument_size"] >= 64 * 64 * 4
        assert ma["peak_estimate"] > 0
    keep = jnp.ones((32, 32))
    lb = live_buffers()
    assert lb["total_bytes"] >= keep.nbytes
    assert lb["per_device"]
