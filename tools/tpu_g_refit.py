#!/usr/bin/env python
"""Re-fit the dense-tile chunk-width model with slope timing.

The round-2 STEP_OVERHEAD_LANES=128 was fitted to quantum-polluted
measurements (BENCH_NOTES round-3).  This probe slope-times the real
kernel at several G (slots/chunk) for banded and random layouts at
8192^2/b32 and b16, giving the honest per-step overhead and the best
G per layout shape.
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul
from bench import bench_slope, make_layout

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "benchmarks", "results_g_refit.json")


def main():
    assert jax.default_backend() == "tpu"
    hidden, N = 8192, 2048
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    out = {"rows": []}

    configs = [
        ("banded", 32, 0.25, (4, 8, 24)),
        ("random", 32, 0.02, (8, 24)),
        ("banded", 16, 0.25, (8, 32)),
    ]
    for kind, bsize, density, gs in configs:
        nb = hidden // bsize
        lay = make_layout(kind, nb, density, rng)
        for G in gs:
            bsmm = BlocksparseMatMul(lay, block_size=bsize, feature_axis=0,
                                     w_layout="fprop_packed",
                                     dense_tile_G=G)
            Wc = rng.uniform(-0.1, 0.1, (bsmm.blocks, bsize, bsize)) \
                .astype(np.float32)
            W = jnp.asarray(bsmm.pack_weights(Wc), dtype)
            x0 = jnp.asarray(rng.uniform(-1, 1, bsmm.i_shape(N)), dtype)
            (dt,) = bench_slope(
                [(lambda x: bsmm(x, W).astype(dtype), x0)], chains=(2, 8))
            sched = bsmm.fprop_dt
            S = int(sched.num_chunks)
            slots = S * int(sched.G)
            fl = 2 * bsmm.blocks * bsize * bsize * N
            R = int(sched.R)
            row = {"kind": kind, "bsize": bsize,
                   "density": round(bsmm.blocks / (nb * nb), 4), "G": G,
                   "steps": S, "slots": slots,
                   "ms": round(dt * 1e3, 4),
                   "eff_tflops": round(fl / dt / 1e12, 2),
                   "fill": round(bsmm.blocks / (R * slots), 4)}
            out["rows"].append(row)
            print(row, flush=True)
            del bsmm, W, x0

    with open(os.path.abspath(OUT), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
