"""Validate fused sparse attention on TPU: correctness + perf vs dense."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops.transformer import BlocksparseTransformer


def causal_mask_cb(blk_shape, head, qry, key, blk):
    mask = np.ones(blk_shape, dtype=bool)
    if qry == key:
        for q in range(blk_shape[0]):
            mask[q, q + 1:] = 0
    return mask


def timeit(f, *args, reps=20):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def fixed_layout(ctx_blks, local=8, stride=8):
    """Sparse-transformer 'fixed' pattern: local band + column summary."""
    lay = np.zeros((ctx_blks, ctx_blks), np.int32)
    for q in range(ctx_blks):
        for k in range(max(0, q - local + 1), q + 1):
            lay[q, k] = 1
        for k in range(0, q, stride):
            lay[q, k] = 1
    return lay


def run(ctx, bsize, heads, hs, batch, dtype, local=8):
    ctx_blks = ctx // bsize
    lay = fixed_layout(ctx_blks, local=local)
    bst = BlocksparseTransformer(lay, block_size=bsize, heads=heads,
                                 mask_callback=causal_mask_cb)
    state = heads * hs
    rng = np.random.RandomState(0)
    Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)
    K = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)
    V = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)
    scale = 1.0 / np.sqrt(hs)

    f_fused = jax.jit(lambda q, k, v: bst.attention(q, k, v, scale=scale,
                                                    use_fused=True))
    y = f_fused(Q, K, V)
    # correctness vs unfused XLA path (small slice)
    if ctx <= 2048 and batch <= 2:
        f_ref = jax.jit(lambda q, k, v: bst.attention(q, k, v, scale=scale,
                                                      use_fused=False))
        y_ref = f_ref(Q, K, V)
        err = np.abs(np.asarray(y, np.float32)
                     - np.asarray(y_ref, np.float32)).max()
        scale_ref = np.abs(np.asarray(y_ref, np.float32)).max()
        print(f"  err vs unfused: {err/scale_ref:.2e}")

    dt = timeit(f_fused, Q, K, V)

    # dense attention baseline (XLA)
    def dense(q, k, v):
        q4 = q.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
        k4 = k.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
        v4 = v.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
        s = jnp.einsum("nhqc,nhkc->nhqk", q4, k4) * scale
        causal = jnp.tril(jnp.ones((ctx, ctx), bool))
        s = jnp.where(causal, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v4.dtype)
        y4 = jnp.einsum("nhqk,nhkc->nhqc", p, v4)
        return y4.transpose(0, 2, 1, 3).reshape(batch, ctx, state)

    f_dense = jax.jit(dense)
    dt_dense = timeit(f_dense, Q, K, V)

    density = bst.blocks / (ctx_blks * (ctx_blks + 1) / 2)
    print(f"ctx={ctx} bs={bsize} h={heads}x{hs} b={batch} {dtype.__name__}: "
          f"fused {dt*1e3:7.3f} ms  dense {dt_dense*1e3:7.3f} ms  "
          f"speedup {dt_dense/dt:4.1f}x  blocks={bst.blocks} "
          f"(density vs causal {density:.2f})")


print("backend:", jax.default_backend())
run(1024, 32, 4, 64, 2, jnp.float32)
run(2048, 64, 8, 64, 2, jnp.bfloat16)
run(4096, 64, 8, 64, 4, jnp.bfloat16)
run(8192, 64, 8, 64, 2, jnp.bfloat16)
