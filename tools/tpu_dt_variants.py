"""Dense-tile kernel variant bench at the headline shape.

Compares contraction-chunk widths G (slots per chunk: G*bsize MXU
contraction depth per grid step) for the flat-chunk dense-tile fprop
kernel, against the dense matmul measured in the same process.

Run on the TPU chip:  python tools/tpu_dt_variants.py [--hidden 8192]
"""
import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.kernels import bsmm as K


def bench_loop(one_step, x0, iters=20, reps=3):
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    y = run(x0)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(x0)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=8192)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--bsize", type=int, default=32)
    ap.add_argument("--density", type=float, default=0.25)
    ap.add_argument("--gs", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--windows", type=str, nargs="+", default=[],
                    help="WB,SG,G,TN specs for the window kernel")
    ap.add_argument("--tn", type=int, default=None)
    args = ap.parse_args()

    hidden, N, bsize, density = args.hidden, args.n, args.bsize, args.density
    dtype = jnp.bfloat16
    CB = KB = hidden // bsize
    rng = np.random.RandomState(0)
    layout = (rng.rand(CB, KB) < density).astype(np.int32)
    layout[np.arange(CB), np.arange(CB)] = 1
    cs, ks = np.nonzero(layout)
    blocks = len(cs)
    fprop_rows = [[] for _ in range(KB)]
    for w, (c, k) in enumerate(zip(cs.tolist(), ks.tolist())):
        fprop_rows[k].append((c, w))
    for r in fprop_rows:
        r.sort()

    w_can = jnp.asarray(
        rng.uniform(-0.1, 0.1, (blocks, bsize, bsize)), dtype)
    x0 = jnp.asarray(rng.uniform(-1, 1, (hidden, N)), dtype)
    real_flops = 2 * blocks * bsize * bsize * N

    # dense baseline
    Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (hidden, hidden)), dtype)
    dt_dense = bench_loop(
        lambda x: jax.lax.dot_general(
            Wd, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype), x0)
    dense_tflops = 2 * hidden * hidden * N / dt_dense / 1e12
    print(f"dense: {dt_dense*1e3:8.3f} ms  {dense_tflops:6.1f} TFLOP/s")

    for spec in args.windows:
        WB, SG, G, TN = (int(v) for v in spec.split(","))
        sched = K.build_window_schedule(fprop_rows, KB, CB, bsize, blocks,
                                        G=G, WB=WB, SG=SG)
        panels = K.dense_tile_panels(w_can, sched, trans_w=False)
        S = sched.num_chunks
        mxu_passes = S * max(1, G * bsize // 128)
        fill = real_flops / (2 * mxu_passes * 128 * 128 * N)
        nsg = -(-sched.groups // SG)
        x_gb = nsg * sched.num_windows * WB * bsize * N * 2 / 1e9 \
            * (N // TN) / (N // TN)  # slab bytes per n-pass
        x_gb = nsg * sched.num_windows * WB * bsize * TN * 2 * (N // TN) / 1e9
        w_mb = panels.size * 2 * (N // TN) / 1e6

        def step(x, panels=panels, sched=sched, TN=TN):
            return K.xprop_pallas_window(x, panels, sched, bsize, tile_n=TN)

        dt = bench_loop(step, x0)
        eff = real_flops / dt / 1e12
        print(f"win WB={WB:3d} SG={SG} G={G:2d} TN={TN}: {dt*1e3:8.3f} ms  "
              f"{eff:6.1f} eff-TFLOP/s  fill={fill:.3f}  chunks={S}  "
              f"x={x_gb:.2f}GB  W={w_mb:.0f}MB  vs_dense={dt_dense/dt:.3f}")

    for G in args.gs:
        sched = K.build_dense_tile_schedule(fprop_rows, KB, bsize, blocks,
                                            G=G)
        panels = K.dense_tile_panels(w_can, sched, trans_w=False)
        S = sched.num_chunks
        mxu_passes = S * max(1, G * bsize // 128)
        fill = real_flops / (2 * mxu_passes * 128 * 128 * N)
        x_gb = S * G * bsize * N * 2 / 1e9
        w_mb = panels.size * 2 / 1e6

        def step(x, panels=panels, sched=sched):
            return K.xprop_pallas_dense_tile(x, panels, sched, bsize,
                                             tile_n=args.tn)

        dt = bench_loop(step, x0)
        eff = real_flops / dt / 1e12
        print(f"G={G:3d}: {dt*1e3:8.3f} ms  {eff:6.1f} eff-TFLOP/s  "
              f"fill={fill:.3f}  chunks={S}  x={x_gb:.2f}GB  W={w_mb:.0f}MB  "
              f"vs_dense={dt_dense/dt:.3f}")


if __name__ == "__main__":
    main()
