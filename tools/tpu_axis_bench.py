"""Measure the feature_axis=1 (NC) penalty vs feature_axis=0 (CN) for the
Pallas bsmm at bench scale.  VERDICT #8: axis=1 should be within 10% of
axis=0 — this tool resolves whether the transpose wrappers cost that much
or whether a native NC kernel is required.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul


def bench_loop(one_step, x0, iters=20):
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y
    y = run(x0)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x0)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    H = int(os.environ.get("BS_H", 8192))
    N = int(os.environ.get("BS_N", 2048))
    BS = int(os.environ.get("BS_BS", 32))
    D = float(os.environ.get("BS_D", 0.25))
    DT = jnp.bfloat16
    rng = np.random.RandomState(0)
    nb = H // BS
    lay = (rng.rand(nb, nb) < D).astype(np.int32)
    lay[np.arange(nb), np.arange(nb)] = 1
    print(f"H={H} N={N} bs={BS} d={lay.mean():.3f} dtype=bf16")

    x_cn = jnp.asarray(rng.uniform(-1, 1, (H, N)), DT)
    x_nc = jnp.asarray(x_cn.T)
    sflops = None

    results = {}
    for axis in (0, 1):
        bsmm = BlocksparseMatMul(lay, block_size=BS, feature_axis=axis,
                                 impl="pallas")
        W = jnp.asarray(rng.uniform(-0.1, 0.1, bsmm.w_shape), DT)
        sflops = 2 * bsmm.blocks * BS * BS * N
        x = x_cn if axis == 0 else x_nc
        # mix the output back into the input so no two chained iterations
        # are identical (the tunnel runtime memoizes repeated executions,
        # BENCH_NOTES.md)
        dt = bench_loop(
            lambda v: (v * 0.999 + 1e-6 * bsmm(v, W)).astype(DT), x)
        results[axis] = dt
        print(f"axis={axis} fprop: {dt*1e3:8.3f} ms  "
              f"{sflops/dt/1e12:6.2f} TF/s effective")

    ratio = results[1] / results[0]
    print(f"axis1/axis0 fprop ratio: {ratio:.3f}  "
          f"({'OK <=1.10' if ratio <= 1.10 else 'needs native NC path'})")

    # fprop+bprop (training shape): grad wrt x and w
    for axis in (0, 1):
        bsmm = BlocksparseMatMul(lay, block_size=BS, feature_axis=axis,
                                 impl="pallas")
        W = jnp.asarray(rng.uniform(-0.1, 0.1, bsmm.w_shape), DT)
        x = x_cn if axis == 0 else x_nc

        def loss(v, w):
            return jnp.sum(bsmm(v, w).astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1))

        def step(v):
            dx, dw = g(v, W)
            return (v + 1e-9 * dx.astype(DT)).astype(DT)

        dt = bench_loop(step, x, iters=10)
        print(f"axis={axis} fwd+bwd: {dt*1e3:8.3f} ms  "
              f"{3*sflops/dt/1e12:6.2f} TF/s effective")


if __name__ == "__main__":
    main()
