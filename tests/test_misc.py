"""Checkpoint, nccl alias, dw_matmul_large_n, transformer pickling."""
import os
import numpy as np
import jax
import jax.numpy as jnp


def test_checkpoint_roundtrip(tmp_path):
    from blocksparse_tpu import checkpoint
    params = {"w": jnp.asarray(np.random.randn(8, 8), jnp.float32),
              "b": jnp.zeros((8,))}
    layouts = {"mlp": np.tril(np.ones((4, 4), np.int32))}
    checkpoint.save(str(tmp_path / "ck"), params, step=42, layouts=layouts,
                    loss_scale=jnp.asarray(128.0),
                    config={"n_embd": 64})
    tree, meta = checkpoint.restore(str(tmp_path / "ck"))
    np.testing.assert_allclose(np.asarray(tree["params"]["w"]),
                               np.asarray(params["w"]))
    assert meta["step"] == 42
    np.testing.assert_array_equal(meta["layouts"]["mlp"], layouts["mlp"])
    assert float(tree["loss_scale"]) == 128.0


def test_nccl_alias():
    from blocksparse_tpu import nccl
    assert callable(nccl.allreduce)
    assert callable(nccl.reduce_scatter)
    assert nccl.serialize_nccl_ops is nccl.serialize_allreduce_ops


def test_dw_matmul_large_n():
    from blocksparse_tpu import dw_matmul_large_n
    x = np.random.randn(64, 16).astype(np.float32)
    dy = np.random.randn(64, 24).astype(np.float32)
    dw = dw_matmul_large_n(jnp.asarray(x, jnp.bfloat16),
                           jnp.asarray(dy, jnp.bfloat16))
    assert dw.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(dw),
        np.asarray(x.astype(np.float32)).T
        @ np.asarray(dy.astype(np.float32)), rtol=2e-2, atol=1e-1)


def test_transformer_pickle():
    import pickle
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, dtype=bool)
        if qry == key:
            for q in range(blk_shape[0]):
                m[q, q + 1:] = 0
        return m

    lay = np.tril(np.ones((4, 4), np.int32))
    bst = BlocksparseTransformer(lay, block_size=16, heads=2,
                                 mask_callback=cb)
    b2 = pickle.loads(pickle.dumps(bst))
    assert b2.blocks == bst.blocks
    np.testing.assert_array_equal(b2.nt_lut, bst.nt_lut)
    np.testing.assert_array_equal(b2.softmax_mask_np, bst.softmax_mask_np)
    x = np.random.uniform(-1, 1, (1, 2, bst.blocks, 16, 16)).astype(np.float32)
    y1 = bst.masked_softmax(jnp.asarray(x))
    y2 = b2.masked_softmax(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
