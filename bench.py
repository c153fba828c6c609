"""Headline benchmark: block-sparse matmul vs density-scaled roofline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config follows the reference's canonical bsmm benchmark
(/root/reference/README.md:44-67, test/blocksparse_matmul_bench.py):
block_size 32, random layout, density 25%.  The hidden size is scaled to
8192 and the batch to 2048 so the workload resolves above the benchmark
chip's ~1 ms scheduling floor (at 4096^2/N512 every matmul-shaped kernel
measures 1.0-1.5 ms regardless of content — see BENCH_NOTES.md); the
round-1 number at the smaller shape was timing the floor, not the
kernel.

Roofline method: the north-star target (BASELINE.json) is >=90% of the
density-scaled dense roofline.  The achievable sparse ideal on this
chip is
  t_ideal = max(density * t_dense_compute, sparse_bytes / BW_eff)
with BW_eff measured from the dense run on the same shapes.  We report
fraction = t_ideal / t_sparse (1.0 = speed of light on this chip);
vs_baseline = fraction / 0.90.  detail includes the raw flops-roofline
fraction and the sparse-vs-dense attention step comparison.

A broader sweep (densities x block sizes x layout structures) lives in
benchmarks/bsmm_sweep.py and writes benchmarks/results_bsmm.json.

Timing is loop-inside-jit (chained lax.scan) to exclude dispatch
overhead of the remote-tunnel setup; sparse/dense reps are interleaved
(A/B/A/B, best-of-4 each) so slow drifts in the chip's time-slicing hit
both workloads equally and the ratio stays honest.
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
# honor an explicit CPU request (CI smoke) like tests/conftest.py does
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def bench_prepare(one_step, x0, iters=20, reps=4):
    """Compile + warm a chained-loop runner; returns a zero-arg timer
    for one rep (s per step).  Every timed rep runs on a FRESH input:
    the bench tunnel memoizes repeat executions of the same
    (executable, args) pair (a repeat can return in ~20 us regardless
    of size — see BENCH_NOTES.md), and a fresh argument defeats that."""
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    jax.block_until_ready(run(x0))
    key = jax.random.PRNGKey(17)
    pool = []
    for i in range(reps):
        key, sub = jax.random.split(key)
        eps = (jax.random.uniform(sub, x0.shape, jnp.float32, -1e-3, 1e-3)
               .astype(x0.dtype))
        pool.append(x0 + eps)
    jax.block_until_ready(pool)

    def rep():
        x = pool.pop()
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        return (time.perf_counter() - t0) / iters
    return rep


def bench_loop(one_step, x0, iters=20, reps=3):
    rep = bench_prepare(one_step, x0, iters, reps=reps)
    return min(rep() for _ in range(reps))


def bench_interleaved(steps_and_x0, iters=20, reps=4):
    """Best-of-reps for several workloads with reps interleaved
    (A/B/A/B...), so slow drifts in the chip's time-slicing hit all
    workloads equally and their ratio stays honest."""
    timers = [bench_prepare(s, x, iters, reps=reps)
              for (s, x) in steps_and_x0]
    best = [float("inf")] * len(timers)
    for _ in range(reps):
        for i, t in enumerate(timers):
            best[i] = min(best[i], t())
    return best


def bsmm_bench():
    from blocksparse_tpu import BlocksparseMatMul

    on_tpu = jax.default_backend() == "tpu"
    # full-size workload on hardware; tiny equivalent off-TPU (CI smoke)
    hidden, N = (8192, 2048) if on_tpu else (512, 128)
    bsize, density = 32, 0.25
    dtype = jnp.bfloat16
    isz = 2
    CB = KB = hidden // bsize

    rng = np.random.RandomState(0)
    layout = (rng.rand(CB, KB) < density).astype(np.int32)
    layout[np.arange(CB), np.arange(CB)] = 1
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0,
                             impl="pallas" if on_tpu else "xla",
                             w_layout="fprop_packed")

    W_can = rng.uniform(-0.1, 0.1,
                        (bsmm.blocks, bsize, bsize)).astype(np.float32)
    W = jnp.asarray(bsmm.pack_weights(W_can), dtype)
    x0 = jnp.asarray(rng.uniform(-1, 1, bsmm.i_shape(N)), dtype)
    sparse_flops = 2 * bsmm.blocks * bsize * bsize * N

    Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (hidden, hidden)), dtype)
    dt_sparse, dt_dense = bench_interleaved([
        (lambda x: bsmm(x, W).astype(dtype), x0),
        (lambda x: jax.lax.dot_general(
            Wd, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype), x0),
    ])
    sparse_tflops = sparse_flops / dt_sparse / 1e12
    dense_tflops = 2 * hidden * hidden * N / dt_dense / 1e12

    # measured effective bandwidth from the dense run
    dense_bytes = (hidden * hidden + 2 * hidden * N) * isz + hidden * N * 4
    bw_eff = dense_bytes / dt_dense
    # ideal sparse time on this chip: compute- or bandwidth-bound
    sparse_bytes = (W.size + 2 * hidden * N) * isz
    t_ideal = max(density * dt_dense, sparse_bytes / bw_eff)
    fraction = t_ideal / dt_sparse
    flops_fraction = sparse_tflops / dense_tflops
    return {
        "fraction": fraction,
        "detail": {
            "hidden": hidden,
            "batch": N,
            "sparse_ms": round(dt_sparse * 1e3, 4),
            "dense_ms": round(dt_dense * 1e3, 4),
            "sparse_vs_dense": round(dt_dense / dt_sparse, 3),
            "sparse_eff_tflops": round(float(sparse_tflops), 2),
            "dense_tflops": round(float(dense_tflops), 2),
            "flops_roofline_fraction": round(float(flops_fraction), 4),
            "bw_eff_gbps": round(bw_eff / 1e9, 1),
            "density": density,
        },
    }


def attn_bench():
    """Sparse-vs-dense attention step time at >=75% sparsity (north-star
    clause 2)."""
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    on_tpu = jax.default_backend() == "tpu"
    # full-size workload on hardware; tiny equivalent off-TPU (CI smoke)
    ctx, batch = (4096, 2) if on_tpu else (256, 1)
    bsize, heads, hs = 64, 8, 64
    dtype = jnp.bfloat16
    ctx_blks = ctx // bsize
    lay = np.zeros((ctx_blks, ctx_blks), np.int32)
    for q in range(ctx_blks):
        lay[q, max(0, q - 7):q + 1] = 1
        for k in range(0, q, 8):
            lay[q, k] = 1

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, dtype=bool)
        if qry == key:
            for q in range(blk_shape[0]):
                m[q, q + 1:] = 0
        return m

    bst = BlocksparseTransformer(lay, block_size=bsize, heads=heads,
                                 mask_callback=cb)
    rng = np.random.RandomState(0)
    state = heads * hs
    Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)
    scale = 1.0 / np.sqrt(hs)

    def sparse_step(q):
        return bst.attention(q, q, q, scale=scale, use_fused=True)

    def dense_step(q):
        q4 = q.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
        s = jnp.einsum("nhqc,nhkc->nhqk", q4, q4) * scale
        causal = jnp.tril(jnp.ones((ctx, ctx), bool))
        s = jnp.where(causal, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(q4.dtype)
        y4 = jnp.einsum("nhqk,nhkc->nhqc", p, q4)
        return y4.transpose(0, 2, 1, 3).reshape(batch, ctx, state)

    dt_sparse, dt_dense = bench_interleaved(
        [(sparse_step, Q), (dense_step, Q)], iters=10)
    sparsity = 1.0 - bst.blocks / (ctx_blks * (ctx_blks + 1) / 2)
    return {
        "attn_sparse_ms": round(dt_sparse * 1e3, 3),
        "attn_dense_ms": round(dt_dense * 1e3, 3),
        "attn_speedup": round(dt_dense / dt_sparse, 2),
        "attn_sparsity_vs_causal": round(float(sparsity), 3),
    }


def main():
    b = bsmm_bench()
    try:
        a = attn_bench()
    except Exception as e:  # attention bench is auxiliary
        a = {"attn_error": str(e)[:200]}
    detail = dict(b["detail"])
    detail.update(a)
    detail["backend"] = jax.default_backend()
    result = {
        "metric": "bsmm_8192x8192_b32_d25_bf16_achievable_roofline_fraction",
        "value": round(float(b["fraction"]), 4),
        "unit": "fraction_of_achievable_roofline",
        "vs_baseline": round(float(b["fraction"] / 0.90), 4),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
