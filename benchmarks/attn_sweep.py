#!/usr/bin/env python
"""Sparse-attention sweep: fused flash kernel vs dense baselines across
context lengths, forward and forward+backward.

Counterpart of the reference's transformer benchmarks (the README's
headline attention claim); writes benchmarks/results_attn.json.  The
layout is the fixed Sparse-Transformer pattern (local window + summary
columns) at block 64 — the flagship model's pattern — so sparsity vs a
causal baseline grows with ctx.

Baselines (VERDICT r2 #3): the PRIMARY control is a dense flash
attention built from the same Pallas machinery — the fused kernel on a
dense causal layout — so the sparse/dense ratio isolates sparsity
rather than kernel quality.  The naive score-materializing XLA
attention is also recorded (small batch, linearly rescaled; skipped at
ctx where its scores blow past HBM).

Timing: slope-based chained timing (see bench.py) — the bench chip
bills each kernel execution a fixed multi-ms quantum, which single-
application timing reports instead of the kernel.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from blocksparse_tpu.ops.transformer import BlocksparseTransformer
from blocksparse_tpu.models.sparse_transformer import (
    fixed_layout, causal_subblock_mask)
from bench import bench_slope, result_path


def main():
    on_tpu = jax.default_backend() == "tpu"
    p = argparse.ArgumentParser()
    p.add_argument("--ctxs", type=str,
                   default="2048,4096,8192,16384" if on_tpu else "256")
    p.add_argument("--batch", type=int, default=8 if on_tpu else 1)
    p.add_argument("--naive_batch", type=int, default=1)
    p.add_argument("--naive_max_ctx", type=int, default=8192)
    p.add_argument("--heads", type=int, default=8 if on_tpu else 2)
    p.add_argument("--hs", type=int, default=64 if on_tpu else 32)
    p.add_argument("--bsize", type=int, default=64)
    p.add_argument("--local_blocks", type=int, default=8)
    p.add_argument("--num_verts", type=int, default=4,
                   help="summary-column period of the fixed pattern; "
                        "larger = sparser (sparsity vs causal caps at "
                        "1 - 1/num_verts asymptotically)")
    p.add_argument("--out", type=str,
                   default=result_path("attn"))
    args = p.parse_args()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    results = {"backend": jax.default_backend(), "batch": args.batch,
               "naive_batch": args.naive_batch, "heads": args.heads,
               "head_size": args.hs, "bsize": args.bsize, "rows": []}
    print(f"{'ctx':>6} {'sparsity':>8} {'fwd sp':>8} {'fwd fl':>8} "
          f"{'x fl':>5} {'fb sp':>8} {'fb fl':>8} {'x fl':>5} "
          f"{'fwd nv':>8}")

    def flush():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    for ctx in [int(c) for c in args.ctxs.split(",")]:
        ctx_blks = ctx // args.bsize
        lay = fixed_layout(ctx_blks, local_blocks=args.local_blocks,
                           num_verts=args.num_verts)
        bst = BlocksparseTransformer(lay, block_size=args.bsize,
                                     heads=args.heads,
                                     mask_callback=causal_subblock_mask)
        lay_d = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
        bst_d = BlocksparseTransformer(lay_d, block_size=args.bsize,
                                       heads=args.heads,
                                       mask_callback=causal_subblock_mask)
        state = args.heads * args.hs
        rng = np.random.RandomState(0)
        Q = jnp.asarray(
            rng.uniform(-0.5, 0.5, (args.batch, ctx, state)), dtype)
        Qn = jnp.asarray(
            rng.uniform(-0.5, 0.5, (args.naive_batch, ctx, state)), dtype)
        scale = 1.0 / np.sqrt(args.hs)
        sparsity = 1.0 - bst.blocks / (ctx_blks * (ctx_blks + 1) / 2)

        def mk_fwd(b):
            def f(q):
                return (b.attention(q, q, q, scale=scale, use_fused=True)
                        .astype(dtype) * 0.999 + 1e-6 * q)
            return f

        def naive_fwd(q):
            nb = q.shape[0]
            q4 = q.reshape(nb, ctx, args.heads, args.hs) \
                .transpose(0, 2, 1, 3)
            s = jnp.einsum("nhqc,nhkc->nhqk", q4, q4) * scale
            causal = jnp.tril(jnp.ones((ctx, ctx), bool))
            s = jnp.where(causal, s, -1e30)
            pp = jax.nn.softmax(s, axis=-1).astype(q4.dtype)
            y4 = jnp.einsum("nhqk,nhkc->nhqc", pp, q4)
            return (y4.transpose(0, 2, 1, 3).reshape(nb, ctx, state)
                    .astype(dtype) * 0.999 + 1e-6 * q)

        def mk_fb(b):
            def att(q):
                return b.attention(q, q, q, scale=scale, use_fused=True)

            def step(q):
                y, vjp = jax.vjp(att, q)
                (dq,) = vjp(y)
                return (q * 0.999 + 1e-6 * dq).astype(dtype)
            return step

        # big ctx: keep the unrolled chain bodies small — compile time
        # through the remote tunnel scales with chain length x schedule
        # size, and per-app work (>=30 ms at 16K) dwarfs the scheduling
        # quantum, so short chains lose no fidelity
        if on_tpu and ctx >= 16384:
            iters, chains = 2, (1, 3)
        elif on_tpu:
            iters, chains = max(4, 2048 * 16 // ctx), (4, 16)
        else:
            iters, chains = 2, (1, 3)
        jobs = [(mk_fwd(bst), Q), (mk_fwd(bst_d), Q),
                (mk_fb(bst), Q), (mk_fb(bst_d), Q)]
        do_naive = ctx <= args.naive_max_ctx
        if do_naive:
            jobs.append((naive_fwd, Qn))
        try:
            times, anchor = bench_slope(jobs, chains=chains, iters=iters,
                                        reps=3, with_anchor=True,
                                        retries=3 if on_tpu else 0)
        except Exception as e:
            # a config can kill the TPU worker (ctx 16384 did, round 3);
            # record the failure and keep what we have — earlier rows
            # were already flushed
            results["rows"].append(
                {"ctx": ctx, "error": str(e).replace("\n", " ")[:300]})
            flush()
            print(f"{ctx:6d}  FAILED: {str(e)[:120]}", flush=True)
            continue
        sf, ff, sb, fbd = times[:4]
        nf = times[4] * args.batch / args.naive_batch if do_naive else None
        row = {"ctx": ctx, "sparsity_vs_causal": round(float(sparsity), 3),
               "anchor_ms": anchor["anchor_ms"],
               "timing_valid": anchor["timing_valid"],
               "fwd_sparse_ms": round(sf * 1e3, 3),
               "fwd_dense_flash_ms": round(ff * 1e3, 3),
               "fwd_speedup_vs_flash": round(ff / sf, 2),
               "fwdbwd_sparse_ms": round(sb * 1e3, 3),
               "fwdbwd_dense_flash_ms": round(fbd * 1e3, 3),
               "fwdbwd_speedup_vs_flash": round(fbd / sb, 2)}
        if do_naive:
            row["fwd_dense_naive_ms_batch_eq"] = round(nf * 1e3, 3)
            row["fwd_speedup_vs_naive"] = round(nf / sf, 2)
        results["rows"].append(row)
        flush()
        print(f"{ctx:6d} {sparsity:8.3f} {sf*1e3:8.3f} {ff*1e3:8.3f} "
              f"{ff/sf:5.2f} {sb*1e3:8.3f} {fbd*1e3:8.3f} {fbd/sb:5.2f} "
              f"{(nf or 0)*1e3:8.3f}")

    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
