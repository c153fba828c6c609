#!/usr/bin/env python
"""On-chip parity check for the DMA-gather stream attention kernels.

Runs the fused flash fwd/lse/bwd kernels with stream=False vs
stream=True on small shapes (shared and per-head layouts) and compares.
Run BEFORE any large-ctx capture: it validates the Mosaic lowering of
the SMEM-schedule + explicit-DMA design (kernels/bst_attn.py) that the
ctx-16384 configs depend on.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops.transformer import BlocksparseTransformer
from blocksparse_tpu.kernels import bst_attn


def causal_cb(blk_shape, head, qry, key, blk):
    m = np.ones(blk_shape, bool)
    if qry == key:
        for r in range(blk_shape[0]):
            m[r, r + 1:] = 0
    return m


def check(name, bst, heads, hs, batch, dtype, atol):
    ctx = bst.ctx_blks_q * bst.blk_size
    BH = batch * heads
    rng = np.random.RandomState(0)
    Q = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), dtype)
    K = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), dtype)
    V = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), dtype)
    dO = jnp.asarray(rng.uniform(-1, 1, (BH, ctx, hs)), dtype)
    sched, sched_tn = bst.attn_schedule, bst.attn_schedule_tn

    def fb(stream):
        y, l = bst_attn.fused_attention_fwd_lse(Q, K, V, sched, heads,
                                                0.2, stream=stream)
        g = bst_attn.fused_attention_bwd(Q, K, V, y, l, dO, sched,
                                         sched_tn, heads, 0.2,
                                         stream=stream)
        return (y, l) + g

    r0 = jax.jit(lambda: fb(False))()
    r1 = jax.jit(lambda: fb(True))()
    errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
            for a, b in zip(r0, r1)]
    ok = all(e <= atol for e in errs)
    print(f"{name}: {'PASS' if ok else 'FAIL'} "
          f"errs={['%.2e' % e for e in errs]}", flush=True)
    return ok


def main():
    print("backend:", jax.default_backend(), flush=True)
    ok = True

    ctx_blks, bs = 16, 64
    lay = np.zeros((ctx_blks, ctx_blks), np.int32)
    for q in range(ctx_blks):
        lay[q, max(0, q - 3):q + 1] = 1
        lay[q, 0] = 1
    bst = BlocksparseTransformer(lay, block_size=bs, heads=2,
                                 mask_callback=causal_cb)
    ok &= check("shared-layout bf16 b64", bst, 2, 64, 2,
                jnp.bfloat16, 3e-2)

    lays = []
    for h in range(2):
        l2 = np.tril(np.ones((8, 8), np.int32))
        l2[7, 1 + h] = 0
        lays.append(l2)
    bst2 = BlocksparseTransformer(np.stack(lays), block_size=32, heads=2,
                                  mask_callback=causal_cb)
    ok &= check("per-head   f32  b32", bst2, 2, 32, 2, jnp.float32, 1e-4)

    print("ALL PASS" if ok else "SOME FAILED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
