#!/usr/bin/env python
"""Canonical bsmm density sweep.

Reproduces the reference's benchmark protocol
(/root/reference/test/blocksparse_matmul_bench.py:36-80): hidden sizes
k*80*32, densities from 100% down to ~1.4%, Barabasi-Albert and
Watts-Strogatz layouts, block sizes 32/16/8, minibatch 64 — measured
here as loop-inside-jit wall time and effective TFLOP/s on whatever
backend is active.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul
from blocksparse_tpu.models.sparse_lstm import make_mask


def bench_loop(one_step, x0, iters=20):
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y
    y = run(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = run(x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kmax", type=int, default=4,
                   help="hidden = k*80*32 for k=1..kmax")
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--bsizes", type=str, default="32,16")
    p.add_argument("--layout", type=str, default="ba",
                   choices=["ba", "ws", "random"])
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    print(f"backend {jax.default_backend()}  N={args.N}  {args.dtype}")
    print(f"{'hidden':>7} {'bsize':>5} {'density%':>8} {'blocks':>7} "
          f"{'ms':>8} {'eff TFLOP/s':>11}")

    for k in range(1, args.kmax + 1):
        hidden = k * 80 * 32
        for bsize in [int(b) for b in args.bsizes.split(",")]:
            nb = hidden // bsize
            # reference sweep densities via BA parameter m ~ degrees
            for m in (nb, nb // 8, nb // 16, max(nb // 64, 1)):
                if args.layout == "random":
                    d = m / nb
                    lay = (rng.rand(nb, nb) < d).astype(np.int32)
                    lay[np.arange(nb), np.arange(nb)] = 1
                elif args.layout == "ws":
                    lay = make_mask(nb, f"ws_{max(m // 2, 1)}_20")
                else:
                    lay = make_mask(nb, "dense" if m >= nb
                                    else f"ba_{max(m // 2, 1)}")
                bsmm = BlocksparseMatMul(lay, block_size=bsize,
                                         feature_axis=0,
                                         w_layout="fprop_packed")
                Wc = rng.uniform(-0.1, 0.1, (bsmm.blocks, bsize, bsize)) \
                    .astype(np.float32)
                W = jnp.asarray(bsmm.pack_weights(Wc), dtype)
                x0 = jnp.asarray(rng.uniform(-1, 1, bsmm.i_shape(args.N)),
                                 dtype)
                dt = bench_loop(lambda x: bsmm(x, W).astype(dtype), x0)
                fl = 2 * bsmm.blocks * bsize * bsize * args.N
                print(f"{hidden:7d} {bsize:5d} {100*bsmm.sparsity:8.2f} "
                      f"{bsmm.blocks:7d} {dt*1e3:8.3f} {fl/dt/1e12:11.2f}")


if __name__ == "__main__":
    main()
