#!/usr/bin/env python
"""Canonical bsmm density sweep.

Reproduces the reference's benchmark protocol
(/root/reference/test/blocksparse_matmul_bench.py:36-80): hidden sizes
k*80*32, densities from 100% down to ~1.4%, Barabasi-Albert /
Watts-Strogatz / uniform-random layouts, block sizes 32/16/8 — measured
as loop-inside-jit wall time, effective TFLOP/s, and the sparse/dense
ratio on whatever backend is active.  Writes results to
benchmarks/results_bsmm.json for round-over-round comparison.

Timing is the anchor-validated slope method from bench.py (shared-
tenant contention shows up in a known-cost anchor; invalid windows are
re-timed) — round 2's single-application timing reported the
contention quantum (~1.4 ms then) for every low-density row.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul
from blocksparse_tpu.models.sparse_lstm import make_mask
from bench import bench_slope, result_path


def bench_loop(one_step, x0, iters=8, reps=3):
    on_tpu = jax.default_backend() == "tpu"
    (t,), anchor = bench_slope([(one_step, x0)], chains=(2, 8),
                               iters=iters, reps=reps, with_anchor=True,
                               retries=3 if on_tpu else 0)
    return t, anchor


def make_layout(kind, nb, m, rng):
    if kind == "random":
        d = m / nb
        lay = (rng.rand(nb, nb) < d).astype(np.int32)
        lay[np.arange(nb), np.arange(nb)] = 1
        return lay
    if kind == "banded":
        lay = np.zeros((nb, nb), np.int32)
        for q in range(nb):
            lay[q, max(0, q - m + 1):q + 1] = 1
            lay[q, q:min(nb, q + m)] = 1
        return lay
    if kind == "ws":
        return make_mask(nb, f"ws_{max(m // 2, 1)}_20")
    return make_mask(nb, "dense" if m >= nb else f"ba_{max(m // 2, 1)}")


def main():
    on_tpu = jax.default_backend() == "tpu"
    p = argparse.ArgumentParser()
    p.add_argument("--hiddens", type=str,
                   default="4096,8192" if on_tpu else "512")
    p.add_argument("--N", type=int, default=2048 if on_tpu else 64)
    p.add_argument("--bsizes", type=str, default="32,16" if on_tpu else "32")
    p.add_argument("--layouts", type=str, default="random,banded,ba")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--out", type=str,
                   default=result_path("bsmm"))
    args = p.parse_args()

    dtype = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    results = {"backend": jax.default_backend(), "N": args.N,
               "dtype": args.dtype, "rows": []}
    print(f"backend {jax.default_backend()}  N={args.N}  {args.dtype}")
    print(f"{'layout':>7} {'hidden':>7} {'bsize':>5} {'density%':>8} "
          f"{'sparse ms':>9} {'dense ms':>8} {'speedup':>7} "
          f"{'eff TF/s':>8} {'flops%':>6}")

    dense_cache = {}
    for hidden in [int(h) for h in args.hiddens.split(",")]:
        # dense baseline per hidden size
        Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (hidden, hidden)), dtype)
        xd = jnp.asarray(rng.uniform(-1, 1, (hidden, args.N)), dtype)
        dt_dense, anch_d = bench_loop(lambda x: jax.lax.dot_general(
            Wd, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype), xd)
        dense_tf = 2 * hidden * hidden * args.N / dt_dense / 1e12
        dense_cache[hidden] = (dt_dense, dense_tf)
        del Wd, xd

        for bsize in [int(b) for b in args.bsizes.split(",")]:
            nb = hidden // bsize
            for m in (nb // 4, nb // 16, max(nb // 64, 1)):
                for kind in args.layouts.split(","):
                    lay = make_layout(kind, nb, m, rng)
                    bsmm = BlocksparseMatMul(lay, block_size=bsize,
                                             feature_axis=0,
                                             w_layout="fprop_packed")
                    Wc = rng.uniform(-0.1, 0.1,
                                     (bsmm.blocks, bsize, bsize)) \
                        .astype(np.float32)
                    W = jnp.asarray(bsmm.pack_weights(Wc), dtype)
                    x0 = jnp.asarray(
                        rng.uniform(-1, 1, bsmm.i_shape(args.N)), dtype)
                    dt, anch = bench_loop(
                        lambda x: bsmm(x, W).astype(dtype), x0)
                    fl = 2 * bsmm.blocks * bsize * bsize * args.N
                    eff = fl / dt / 1e12
                    row = {
                        "layout": kind, "hidden": hidden, "bsize": bsize,
                        "density": round(float(bsmm.sparsity), 4),
                        "blocks": bsmm.blocks,
                        "sparse_ms": round(dt * 1e3, 3),
                        "dense_ms": round(dt_dense * 1e3, 3),
                        "speedup_vs_dense": round(dt_dense / dt, 3),
                        "eff_tflops": round(eff, 2),
                        "flops_fraction": round(eff / dense_tf, 4),
                        "mode": bsmm.mode_f,
                        "anchor_ms": anch["anchor_ms"],
                        "timing_valid": anch["timing_valid"],
                    }
                    results["rows"].append(row)
                    print(f"{kind:>7} {hidden:7d} {bsize:5d} "
                          f"{100*bsmm.sparsity:8.2f} {dt*1e3:9.3f} "
                          f"{dt_dense*1e3:8.3f} {dt_dense/dt:7.2f} "
                          f"{eff:8.2f} {100*eff/dense_tf:6.1f}")
                    del W, x0, bsmm

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
