#!/usr/bin/env python
"""Validate (or retire) the window-slab kernel mode (VERDICT r2 weak
#7: "ships as a mode nobody has seen win").

mode="window" streams x once per (super-group, column window), cutting
input HBM traffic 3-6x vs the dense-tile schedule's per-chunk slot
gathers.  Round 2 measured it neutral through the quantum; this
slope-times both modes honestly at compute-bound (N=2048) and
bandwidth-leaning (N=256) shapes.  Writes
benchmarks/results_window.json.
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


def main():
    assert jax.default_backend() == "tpu"
    hidden, bsize, density = 8192, 32, 0.25
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    nb = hidden // bsize
    lay = make_layout("random", nb, density, rng)
    out = {"rows": []}

    for N in (2048, 256):
        jobs, labels = [], []
        for mode in ("dense_tile", "window"):
            bsmm = BlocksparseMatMul(lay, block_size=bsize, feature_axis=0,
                                     w_layout="fprop_packed", mode=mode)
            Wc = rng.uniform(-0.1, 0.1, (bsmm.blocks, bsize, bsize)) \
                .astype(np.float32)
            W = jnp.asarray(bsmm.pack_weights(Wc), dtype)
            x0 = jnp.asarray(rng.uniform(-1, 1, bsmm.i_shape(N)), dtype)
            jobs.append((lambda x, b=bsmm, w=W: b(x, w).astype(dtype), x0))
            labels.append(mode)
        times, anchor = bench_slope(jobs, chains=(2, 8),
                                    with_anchor=True, retries=2)
        row = {"N": N, **anchor}
        for lab, t in zip(labels, times):
            row[lab + "_ms"] = round(t * 1e3, 4)
        row["window_vs_dense_tile"] = round(times[0] / times[1], 3)
        out["rows"].append(row)
        print(row, flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "benchmarks", "results_window.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
