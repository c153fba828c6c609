#!/usr/bin/env python
"""Small-N (canonical N=64) efficiency diagnosis (VERDICT r4 #6).

The reference's canonical bench regime is N=64
(/root/reference/test/blocksparse_matmul_bench.py:75); the round-4
capture put even DENSE XLA matmul at ~0.16 of the FLOPs roofline there,
and sparse rows at 0.04-0.05.  This probe separates the candidate
costs by sweeping N at fixed hidden for three implementations:

  * XLA dense  (hidden, hidden) @ (hidden, N)
  * bsmm dense_tile at density 1.0 (same FLOPs, our kernel)
  * bsmm dense_tile at the BA density of the canonical row

and fitting   t(N) = t0 + c * N   per config.  The diagnosis rests on
the MXU's weight-load cost: each (128,128) weight tile costs ~128
cycles to load into the systolic array and N operand columns stream
through it in ~N cycles — below N~128 the array spends more cycles
LOADING weights than computing, so per-pass time pins at the load
floor and the FLOPs-roofline fraction is structurally <= ~N/(N+128)
x stream efficiency (t0 dominated by passes x load).  The fit makes
that quantitative: t0/passes ~ per-pass floor (cycles), c ~ per-lane
streaming cost; overhead beyond the model shows up as t0 inflation in
the sparse rows (per-chunk grid overhead).

Writes benchmarks/results_smalln.json.
"""
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


def dev_uniform(seed, shape, lo, hi, dtype):
    return jax.jit(lambda k: jax.random.uniform(
        k, shape, jnp.float32, lo, hi).astype(dtype))(
            jax.random.PRNGKey(seed))


def main():
    on_tpu = jax.default_backend() == "tpu"
    hidden = 7680 if on_tpu else 512
    Ns = (64, 128, 256, 512, 1024) if on_tpu else (64, 128)
    depth = 8
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    clock_ghz = 0.94          # v5e TensorCore clock for the cycles column

    # canonical BA row at hidden 7680: target 11.25% -> m from the
    # reference rule (canonical_bench.pick_m)
    n = hidden // 32
    m = 14  # BA m giving ~11% at n=240; recomputed below
    from benchmarks.canonical_bench import pick_m
    m, _ = pick_m(n, 11.25, "ba")
    lay_ba = make_mask(n, f"ba_{m}", seed=0)
    lay_dense = np.ones((n, n), np.int32)

    b_d1 = BlocksparseMatMul(lay_dense, block_size=32, feature_axis=0,
                             w_layout="fprop_packed")
    b_ba = BlocksparseMatMul(lay_ba, block_size=32, feature_axis=0,
                             w_layout="fprop_packed")
    # resident-x candidate fix: at small N the per-slot kernel's
    # chunks x G sub-KB slot DMAs dominate; the resident gather has no
    # per-slot DMAs at all (kernels/bsmm.py resident_pick_tile)
    b_rs = BlocksparseMatMul(lay_ba, block_size=32, feature_axis=0,
                             w_layout="fprop_packed", mode="resident")

    s = 0.5 / np.sqrt(hidden)
    Wd = dev_uniform(1, (hidden, hidden), -s, s, dtype)
    W1 = dev_uniform(2, b_d1.w_shape, -s, s, dtype)
    Wb = dev_uniform(3, b_ba.w_shape, -s, s, dtype)

    def mk_dense(N):
        x0 = dev_uniform(10 + N, (hidden, N), -1, 1, dtype)

        def f(x, w):
            for _ in range(depth):
                x = jax.lax.dot_general(
                    w, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
            return x * (1.0 / depth)
        return f, x0, Wd

    def mk_bsmm(b, W, N):
        x0 = dev_uniform(20 + N, b.i_shape(N), -1, 1, dtype)

        def f(x, w):
            for _ in range(depth):
                x = b(x, w).astype(dtype)
            return x * (1.0 / depth)
        return f, x0, W

    jobs, labels = [], []
    for N in Ns:
        jobs += [mk_dense(N), mk_bsmm(b_d1, W1, N), mk_bsmm(b_ba, Wb, N),
                 mk_bsmm(b_rs, Wb, N)]
        labels += [f"xla_dense_N{N}", f"dt_d100_N{N}", f"dt_ba_N{N}",
                   f"rs_ba_N{N}"]

    chains = (1, 4) if on_tpu else (1, 2)
    times, anchor = bench_slope(jobs, chains=chains,
                                iters=24 if on_tpu else 1,
                                reps=4 if on_tpu else 3, with_anchor=True,
                                retries=3 if on_tpu else 0)
    times = [t / depth for t in times]

    # MXU passes per application
    passes = {"xla_dense": (hidden // 128) ** 2,
              "dt_d100": b_d1.fprop_dt.mxu_passes(32)
              if b_d1.fprop_dt is not None else -1,
              "dt_ba": b_ba.fprop_dt.mxu_passes(32)
              if b_ba.fprop_dt is not None else -1}
    passes["rs_ba"] = passes["dt_ba"]
    chunks = {"xla_dense": (hidden // 128) ** 2,
              "dt_d100": b_d1.fprop_dt.num_chunks
              if b_d1.fprop_dt is not None else -1,
              "dt_ba": b_ba.fprop_dt.num_chunks
              if b_ba.fprop_dt is not None else -1}
    chunks["rs_ba"] = chunks["dt_ba"]

    rows = []
    for lab, t in zip(labels, times):
        kind, Ns_ = lab.rsplit("_N", 1)
        N = int(Ns_)
        fl = 2 * hidden * hidden * N if kind == "xla_dense" else \
            2 * (b_d1 if kind == "dt_d100" else b_ba).blocks * 32 * 32 * N
        rows.append({"label": lab, "kind": kind, "N": N,
                     "us_per_app": round(t * 1e6, 3),
                     "eff_tflops": round(fl / t / 1e12, 2)})
        print(json.dumps(rows[-1]), flush=True)

    fits = {}
    for kind in ("xla_dense", "dt_d100", "dt_ba", "rs_ba"):
        pts = [(r["N"], r["us_per_app"]) for r in rows
               if r["kind"] == kind]
        xs = np.array([p[0] for p in pts], np.float64)
        ys = np.array([p[1] for p in pts], np.float64)
        c, t0 = np.polyfit(xs, ys, 1)
        P = passes[kind]
        fits[kind] = {
            "t0_us": round(t0, 3), "us_per_lane": round(c, 4),
            "mxu_passes": int(P), "chunks": int(chunks[kind]),
            "t0_cycles_per_pass": round(t0 * 1e-6 * clock_ghz * 1e9 / P,
                                        1) if P > 0 else None,
            "t0_ns_per_chunk": round(t0 * 1e3 / chunks[kind], 1)
            if chunks[kind] > 0 else None}
        print(kind, json.dumps(fits[kind]), flush=True)

    out = {"backend": jax.default_backend(), "hidden": hidden,
           "depth": depth, "dtype": str(dtype),
           "ba_density": round(float(b_ba.sparsity), 4),
           "anchor_ms": anchor["anchor_ms"],
           "timing_valid": anchor["timing_valid"],
           "rows": rows, "fits": fits,
           "model": "t(N) = t0 + c*N per application; t0 ~ passes x "
                    "MXU weight-load floor (+ per-chunk grid overhead "
                    "for the pallas kernels)"}
    with open(result_path("smalln"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", result_path("smalln"))


if __name__ == "__main__":
    main()
