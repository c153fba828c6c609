"""Headline benchmark: block-sparse matmul vs density-scaled roofline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config follows the reference's canonical bsmm benchmark
(/root/reference/README.md:44-67, test/blocksparse_matmul_bench.py):
hidden 4096^2, block_size 32, random layout.  We measure effective
TFLOP/s (counting only nonzero-block FLOPs) of the Pallas bsmm fprop and
compare against the measured dense-matmul TFLOP/s on the same chip: the
density-scaled roofline says an ideal sparse kernel matches the dense
TFLOP/s number.  vs_baseline = fraction_of_roofline / 0.9 (the
BASELINE.json north-star target), so > 1.0 beats the target.

Timing is loop-inside-jit (lax.scan with data dependence) to exclude
the per-call dispatch overhead of the remote-tunnel setup.
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp


def bench_loop(one_step, x0, iters=40):
    """Chained scan so XLA can't elide or overlap iterations."""
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
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    from blocksparse_tpu import BlocksparseMatMul

    hidden, bsize, N, density = 4096, 32, 512, 0.25
    dtype = jnp.bfloat16
    CB = KB = hidden // bsize

    rng = np.random.RandomState(0)
    layout = (rng.rand(CB, KB) < density).astype(np.int32)
    layout[np.arange(CB), np.arange(CB)] = 1
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0,
                             impl="pallas"
                             if jax.default_backend() == "tpu" else "xla",
                             w_layout="fprop_packed")

    W_can = rng.uniform(-0.1, 0.1,
                        (bsmm.blocks, bsize, bsize)).astype(np.float32)
    W = jnp.asarray(bsmm.pack_weights(W_can), dtype)
    x0 = jnp.asarray(rng.uniform(-1, 1, bsmm.i_shape(N)), dtype)
    sparse_flops = 2 * bsmm.blocks * bsize * bsize * N

    dt_sparse = bench_loop(lambda x: bsmm(x, W).astype(dtype), x0)
    sparse_tflops = sparse_flops / dt_sparse / 1e12

    # dense roofline on the same shape
    Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (hidden, hidden)), dtype)
    dt_dense = bench_loop(
        lambda x: jax.lax.dot_general(
            Wd, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype), x0)
    dense_tflops = 2 * hidden * hidden * N / dt_dense / 1e12

    frac = sparse_tflops / dense_tflops
    result = {
        "metric": "bsmm_4096x4096_b32_d25_bf16_roofline_fraction",
        "value": round(float(frac), 4),
        "unit": "fraction_of_density_scaled_dense_roofline",
        "vs_baseline": round(float(frac / 0.90), 4),
        "detail": {
            "sparse_ms": round(dt_sparse * 1e3, 4),
            "sparse_eff_tflops": round(float(sparse_tflops), 2),
            "dense_ms": round(dt_dense * 1e3, 4),
            "dense_tflops": round(float(dense_tflops), 2),
            "density": density,
            "N": N,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
