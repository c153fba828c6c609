#!/usr/bin/env python
"""Probe the fused-attention dkv compile ceiling (VERDICT r2 #4).

Round-2 finding (BENCH_NOTES.md): at ctx >= 8192 the dkv kernel's
Mosaic scoped-vmem allocation overflows the 16 MB limit for
batch*heads > ~16 in resident mode; streaming mode was the fix for
BH <= 16 but reportedly still failed at BH >= 64.  This probe compiles
(not runs) the full fused bwd at the failing configs to find what
actually overflows, then executes one small step to prove the fix.

Usage: python tools/tpu_dkv_compile_probe.py [--ctx 8192] [--bh 64]
"""
import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops.transformer import BlocksparseTransformer
from blocksparse_tpu.models.sparse_transformer import (
    fixed_layout, causal_subblock_mask)
from blocksparse_tpu.kernels import bst_attn


def try_compile(label, fn, *args):
    try:
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        try:
            mem = compiled.memory_analysis()
            extra = f" (tmp {mem.temp_size_in_bytes / 1e6:.1f} MB)"
        except Exception:
            extra = ""
        print(f"{label}: COMPILES{extra}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{label}: FAIL {msg}", flush=True)
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=8192)
    p.add_argument("--bh_list", type=str, default="16,64")
    p.add_argument("--bsize", type=int, default=64)
    p.add_argument("--hs", type=int, default=64)
    args = p.parse_args()

    ctx, bs, hs = args.ctx, args.bsize, args.hs
    ctx_blks = ctx // bs
    lay = fixed_layout(ctx_blks, local_blocks=8)

    for BH in [int(b) for b in args.bh_list.split(",")]:
        heads = 8
        bst = BlocksparseTransformer(lay, block_size=bs, heads=heads,
                                     mask_callback=causal_subblock_mask)
        sched_nn = bst.attn_schedule
        sched_tn = bst.attn_schedule_tn
        rng = np.random.RandomState(0)
        shape = (BH, ctx, hs)
        Q = jnp.asarray(rng.uniform(-0.5, 0.5, shape), jnp.bfloat16)
        lse = jnp.zeros((BH, ctx, 1), jnp.float32)
        dvec = jnp.zeros((BH, ctx, 1), jnp.float32)

        for stream in (False, True):
            def dkv(q, k, v, do, lse, dvec, stream=stream):
                return bst_attn.fused_attention_dkv(
                    q, k, v, do, lse, dvec, sched_tn, heads, 0.125,
                    stream=stream, out_dtype=jnp.float32)
            try_compile(f"ctx{ctx} BH{BH} stream={stream} dkv",
                        dkv, Q, Q, Q, Q, lse, dvec)

        def full_bwd(q, k, v, y, lse, do):
            return bst_attn.fused_attention_bwd(
                q, k, v, y, lse, do, sched_nn, sched_tn, heads, 0.125,
                stream=True)
        try_compile(f"ctx{ctx} BH{BH} full bwd stream", full_bwd,
                    Q, Q, Q, Q, lse, Q)


if __name__ == "__main__":
    main()
