#!/usr/bin/env python
"""Isolate the ctx=16384 fused-attention TPU worker crash (round 3).

benchmarks/attn_sweep.py's ctx-16384 pass killed the TPU worker
("kernel fault") during compile+warm of the first chained job.  This
probe runs ONE application per step, escalating: sparse fwd at batch 1,
batch 8, dense-flash fwd, then fwd+bwd — printing PASS/FAIL per stage
so the crashing kernel is identified even when the worker dies.

Usage: python tools/tpu_attn16k_probe.py [--ctx 16384] [--stage N]
(--stage runs a single stage; the worker does not survive a crash, so
run stages in separate processes when hunting.)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops.transformer import BlocksparseTransformer
from blocksparse_tpu.models.sparse_transformer import (
    fixed_layout, causal_subblock_mask)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=16384)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--hs", type=int, default=64)
    p.add_argument("--bsize", type=int, default=64)
    p.add_argument("--stage", type=int, default=-1)
    args = p.parse_args()

    ctx, heads, hs, bsize = args.ctx, args.heads, args.hs, args.bsize
    ctx_blks = ctx // bsize
    dtype = jnp.bfloat16
    state = heads * hs
    scale = 1.0 / np.sqrt(hs)

    def build(dense):
        lay = (np.tril(np.ones((ctx_blks, ctx_blks), np.int32)) if dense
               else fixed_layout(ctx_blks, local_blocks=8))
        return BlocksparseTransformer(lay, block_size=bsize, heads=heads,
                                      mask_callback=causal_subblock_mask)

    def run_fwd(bst, batch):
        rng = np.random.RandomState(0)
        Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)
        y = jax.jit(lambda q: bst.attention(q, q, q, scale=scale,
                                            use_fused=True))(Q)
        return float(jnp.sum(y.astype(jnp.float32) ** 2))

    def run_fb(bst, batch):
        rng = np.random.RandomState(0)
        Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)

        def loss(q):
            y = bst.attention(q, q, q, scale=scale, use_fused=True)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        g = jax.jit(jax.grad(loss))(Q)
        return float(jnp.sum(g.astype(jnp.float32) ** 2))

    stages = [
        ("sparse_fwd_b1", lambda: run_fwd(build(False), 1)),
        ("sparse_fwd_b8", lambda: run_fwd(build(False), 8)),
        ("dense_flash_fwd_b1", lambda: run_fwd(build(True), 1)),
        ("dense_flash_fwd_b8", lambda: run_fwd(build(True), 8)),
        ("sparse_fwdbwd_b8", lambda: run_fb(build(False), 8)),
        ("dense_flash_fwdbwd_b8", lambda: run_fb(build(True), 8)),
    ]
    for i, (name, fn) in enumerate(stages):
        if args.stage >= 0 and i != args.stage:
            continue
        print(f"[{i}] {name} ...", flush=True)
        try:
            v = fn()
            print(f"[{i}] {name}: PASS checksum {v:.3e}", flush=True)
        except Exception as e:
            print(f"[{i}] {name}: FAIL {str(e)[:300]}", flush=True)
            break


if __name__ == "__main__":
    main()
