#!/usr/bin/env python
"""Sparse-attention sweep: fused flash kernel vs dense attention across
context lengths, forward and forward+backward.

Counterpart of the reference's transformer benchmarks (the README's
headline attention claim); writes benchmarks/results_attn.json.  The
layout is the fixed Sparse-Transformer pattern (local window + summary
columns) at block 64 — the flagship model's pattern — so sparsity vs a
causal baseline grows with ctx.  Timings are loop-inside-jit with
sparse/dense reps interleaved (see bench.py) to keep the ratio honest
on the time-sliced bench chip.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from blocksparse_tpu.ops.transformer import BlocksparseTransformer
from blocksparse_tpu.models.sparse_transformer import (
    fixed_layout, causal_subblock_mask)


def prepare(one_step, xs, iters):
    """Chained-scan timer on fresh inputs.  Two tunnel quirks dictate
    this shape (BENCH_NOTES.md round-2 late findings): repeat
    executions of the same (executable, args) pair are memoized, so
    every timed rep consumes a fresh input; and bare single calls
    return near the ~20 us dispatch floor regardless of work, so the
    step must be chained data-dependently inside one jit (lax.scan)."""
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    jax.block_until_ready(run(xs[0]))
    pool = list(xs[1:])

    def rep():
        x = pool.pop()
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        return (time.perf_counter() - t0) / iters
    return rep


def bench_one(step, xs, iters, reps=4):
    t = prepare(step, xs, iters)
    return min(t() for _ in range(reps))


def main():
    on_tpu = jax.default_backend() == "tpu"
    p = argparse.ArgumentParser()
    p.add_argument("--ctxs", type=str,
                   default="2048,4096,8192" if on_tpu else "256")
    # Sparse runs at a large batch so its step lands in the >=2 ms
    # regime where the tunnel measures honestly (BENCH_NOTES.md); dense
    # materializes ctx^2 scores, so it runs at a small batch that fits
    # HBM and the ratio scales it up (attention time is linear in
    # batch).  dense_batch is recorded in the JSON.
    p.add_argument("--batch", type=int, default=8 if on_tpu else 1)
    p.add_argument("--dense_batch", type=int, default=2 if on_tpu else 1)
    p.add_argument("--heads", type=int, default=8 if on_tpu else 2)
    p.add_argument("--hs", type=int, default=64 if on_tpu else 32)
    p.add_argument("--bsize", type=int, default=64)
    p.add_argument("--local_blocks", type=int, default=8)
    p.add_argument("--out", type=str,
                   default=os.path.join(os.path.dirname(
                       os.path.abspath(__file__)), "results_attn.json"))
    args = p.parse_args()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    results = {"backend": jax.default_backend(), "batch": args.batch,
               "dense_batch": args.dense_batch, "heads": args.heads,
               "head_size": args.hs, "bsize": args.bsize, "rows": []}
    print(f"{'ctx':>6} {'sparsity':>8} {'fwd sp ms':>9} {'fwd dn ms':>9} "
          f"{'fwd x':>6} {'fb sp ms':>8} {'fb dn ms':>8} {'fb x':>6}")

    for ctx in [int(c) for c in args.ctxs.split(",")]:
        ctx_blks = ctx // args.bsize
        lay = fixed_layout(ctx_blks, local_blocks=args.local_blocks)
        bst = BlocksparseTransformer(lay, block_size=args.bsize,
                                     heads=args.heads,
                                     mask_callback=causal_subblock_mask)
        state = args.heads * args.hs
        rng = np.random.RandomState(0)
        reps = 4
        Qs = [jnp.asarray(
            rng.uniform(-0.5, 0.5, (args.batch, ctx, state)), dtype)
            for _ in range(2 * (reps + 1))]
        Qd = [jnp.asarray(
            rng.uniform(-0.5, 0.5, (args.dense_batch, ctx, state)), dtype)
            for _ in range(2 * (reps + 1))]
        bscale = args.batch / args.dense_batch
        scale = 1.0 / np.sqrt(args.hs)
        sparsity = 1.0 - bst.blocks / (ctx_blks * (ctx_blks + 1) / 2)

        def sparse_fwd(q):
            return bst.attention(q, q, q, scale=scale, use_fused=True)

        def dense_fwd(q):
            q4 = q.reshape(args.dense_batch, ctx, args.heads, args.hs) \
                .transpose(0, 2, 1, 3)
            s = jnp.einsum("nhqc,nhkc->nhqk", q4, q4) * scale
            causal = jnp.tril(jnp.ones((ctx, ctx), bool))
            s = jnp.where(causal, s, -1e30)
            pp = jax.nn.softmax(s, axis=-1).astype(q4.dtype)
            y4 = jnp.einsum("nhqk,nhkc->nhqc", pp, q4)
            return y4.transpose(0, 2, 1, 3).reshape(args.dense_batch, ctx,
                                                    state)

        def fb(fwd):
            def step(q):
                y, vjp = jax.vjp(fwd, q)
                (dq,) = vjp(y)
                return (q * 0.999 + 1e-6 * dq).astype(dtype)
            return step

        iters = max(4, 2048 * 10 // ctx)
        sf = bench_one(lambda q: sparse_fwd(q).astype(dtype) * 0.999
                       + 1e-6 * q, Qs[:reps + 1], iters, reps)
        df = bench_one(lambda q: dense_fwd(q).astype(dtype) * 0.999
                       + 1e-6 * q, Qd[:reps + 1], iters, reps)
        sb = bench_one(fb(sparse_fwd), Qs[reps + 1:], iters, reps)
        db = bench_one(fb(dense_fwd), Qd[reps + 1:], iters, reps)
        df_eq = df * bscale          # dense time at the sparse batch
        db_eq = db * bscale
        row = {"ctx": ctx, "sparsity_vs_causal": round(float(sparsity), 3),
               "fwd_sparse_ms": round(sf * 1e3, 3),
               "fwd_dense_ms_batch_eq": round(df_eq * 1e3, 3),
               "fwd_speedup": round(df_eq / sf, 2),
               "fwdbwd_sparse_ms": round(sb * 1e3, 3),
               "fwdbwd_dense_ms_batch_eq": round(db_eq * 1e3, 3),
               "fwdbwd_speedup": round(db_eq / sb, 2)}
        results["rows"].append(row)
        print(f"{ctx:6d} {sparsity:8.3f} {sf*1e3:9.3f} {df_eq*1e3:9.3f} "
              f"{df_eq/sf:6.2f} {sb*1e3:8.3f} {db_eq*1e3:8.3f} "
              f"{db_eq/sb:6.2f}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
