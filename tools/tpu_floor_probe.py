#!/usr/bin/env python
"""Decompose the low-density per-step floor (VERDICT r2 #1).

Sweep rows at 8192^2/b32 show ~1.4 ms/step for schedules whose real
work is 25-200 us (d<=0.07), flat across a 3x FLOP range.  Hypotheses:
  H1 per-execution quantum: every kernel execution (even inside one
     jit program) is billed a ~1.3 ms time-slice by the shared chip.
  H2 MXU throttling: sustained MXU rate is ~10-20x below peak, so the
     padded-work estimate at low density is simply slow.
  H3 Pallas grid overhead: per-grid-step fixed cost dominates at small
     step counts.

Discriminating measurements (all scan-chained inside one jit):
  dense_big    8192^2 x 2048 matmul        (275 GFLOP/app)
  dense_small  2048^2 x 2048 matmul        ( 17 GFLOP/app)
  dense_tiny   1024^2 x 2048 matmul        (  4 GFLOP/app)
  chain8_small body = 8 chained 2048^2     (137 GFLOP/app, 8 kernels)
  copy_kernel  pallas x-identity, 64 grid steps over (8192, 2048)
  sparse_d02   dense_tile schedule, d~0.02 (S~64 grid steps)
  sparse_d02x8 body = 8 chained sparse applications

H1 predicts: dense_small ~= dense_tiny ~= floor; chain8_small ~= 8x
floor; sparse_d02x8 ~= 8x sparse_d02 (no amortization).
H2 predicts: times scale with (padded) FLOPs throughout.
H3 predicts: copy_kernel ~= sparse_d02 (grid steps, not FLOPs).
"""
import os
import sys
import time
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench_chain(one_step, x0, iters=10, reps=3):
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y
    jax.block_until_ready(run(x0))
    best = float("inf")
    for r in range(reps):
        xr = x0 + jnp.float32(1e-6 * (r + 1)).astype(x0.dtype)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        jax.block_until_ready(run(xr))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def copy_kernel_time(x, steps):
    C, N = x.shape
    rows = C // steps

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    fn = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec((rows, N), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, N), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), x.dtype),
    )
    return bench_chain(lambda a: fn(a), x)


def main():
    assert jax.default_backend() == "tpu"
    from blocksparse_tpu import BlocksparseMatMul

    rng = np.random.RandomState(0)
    N = 2048
    dt = jnp.bfloat16
    out = {}

    def dense_step(h):
        W = jnp.asarray(rng.uniform(-0.1, 0.1, (h, h)), dt)
        x = jnp.asarray(rng.uniform(-1, 1, (h, N)), dt)
        f = lambda a: jax.lax.dot_general(
            W, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        return f, x

    for name, h in (("dense_big", 8192), ("dense_small", 2048),
                    ("dense_tiny", 1024)):
        f, x = dense_step(h)
        t = bench_chain(f, x)
        out[name] = {"ms": round(t * 1e3, 4),
                     "gflop": round(2 * h * h * N / 1e9, 1),
                     "tflops": round(2 * h * h * N / t / 1e12, 1)}
        print(name, out[name], flush=True)

    f, x = dense_step(2048)
    def chain8(a):
        for _ in range(8):
            a = f(a)
        return a
    t = bench_chain(chain8, x)
    out["chain8_small"] = {"ms": round(t * 1e3, 4),
                           "ms_per_matmul": round(t * 1e3 / 8, 4)}
    print("chain8_small", out["chain8_small"], flush=True)

    x8 = jnp.asarray(rng.uniform(-1, 1, (8192, N)), dt)
    t = copy_kernel_time(x8, 64)
    out["copy64"] = {"ms": round(t * 1e3, 4),
                     "gb": round(2 * 8192 * N * 2 / 1e9, 3)}
    print("copy64", out["copy64"], flush=True)

    # sparse d~0.02 at 8192^2/b32
    nb = 8192 // 32
    lay = (rng.rand(nb, nb) < 0.02).astype(np.int32)
    lay[np.arange(nb), np.arange(nb)] = 1
    bsmm = BlocksparseMatMul(lay, block_size=32, feature_axis=0,
                             w_layout="fprop_packed")
    Wc = rng.uniform(-0.1, 0.1, (bsmm.blocks, 32, 32)).astype(np.float32)
    W = jnp.asarray(bsmm.pack_weights(Wc), dt)
    sp = lambda a: bsmm(a, W).astype(dt)
    sched = bsmm.fprop_dt
    out["sparse_d02_meta"] = {
        "blocks": bsmm.blocks,
        "S": int(sched.num_chunks), "G": int(sched.G),
        "gflop_nnz": round(2 * bsmm.blocks * 32 * 32 * N / 1e9, 2),
        "gflop_padded": round(
            2 * sched.num_chunks * 128 * sched.G * 32 * N / 1e9, 2)}
    print("sparse_d02_meta", out["sparse_d02_meta"], flush=True)

    # chain-length sweep: t(c) = quantum + c * work if the additive
    # model holds; the slope is the honest per-application time
    for label, f in (("sparse_d02", sp), ("dense_small", dense_step(2048)[0])):
        xs = x8 if label == "sparse_d02" else dense_step(2048)[1]
        chain_ms = {}
        for c in (1, 2, 4, 8, 16):
            def fc(a, c=c):
                for _ in range(c):
                    a = f(a)
                return a
            t = bench_chain(fc, xs)
            chain_ms[c] = round(t * 1e3, 4)
            print(f"{label} chain {c}: {t*1e3:.4f} ms/iter", flush=True)
        cs = sorted(chain_ms)
        slope = (chain_ms[cs[-1]] - chain_ms[cs[0]]) / (cs[-1] - cs[0])
        out[label + "_chains"] = {"ms": chain_ms,
                                  "slope_ms_per_app": round(slope, 4)}
        print(label, "slope", round(slope, 4), "ms/app", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "benchmarks", "results_floor_probe.json")
    with open(os.path.abspath(path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
