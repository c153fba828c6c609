#!/usr/bin/env python
"""Measure achievable HBM read bandwidth on the bench chip.

The bsmm traffic model needs the real number: the dense-tile kernel's
measured per-slot time implies ~1.2 TB/s effective x-read bandwidth,
above the v5e spec sheet's 819 GB/s — either the chip is not a stock
v5e, or the model double-counts bytes.  This probe times:

  1. big-array reduce (pure streaming read): sum over a (H, W) bf16
     array, chained via a data dependency, slope-timed.
  2. copy (read+write): y = x * alpha chained.
  3. gathered-slot read: the bsmm access pattern — G (32, N) slices
     gathered by row index from a (H, N) array and summed — via the
     same per-slot BlockSpec DMA pattern (XLA take).

Prints GB/s for each against the readback-slope protocol from bench.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import bench_slope


def main():
    rng = np.random.RandomState(0)
    H, W = 16384, 8192                      # 256 MB bf16
    X = jnp.asarray(rng.uniform(-1, 1, (H, W)), jnp.bfloat16)
    nbytes = H * W * 2

    def reduce_step(x, big):
        # read all of `big`, seeded by x so chains are data-dependent
        s = jnp.sum((big + x[0, 0]).astype(jnp.float32))
        return x * 0.999 + (s * 1e-20).astype(x.dtype)

    def copy_step(x, big):
        y = big * (1.0 + x[0, 0] * 1e-9)
        return x * 0.999 + (jnp.sum(y.astype(jnp.float32)) * 1e-20) \
            .astype(x.dtype)

    # gathered-slot read: 256 random 32-row slices (d=0.25-ish pattern)
    idx = np.sort(rng.choice(H // 32, 192, replace=False)).astype(np.int32)
    idxj = jnp.asarray(idx)

    def gather_step(x, big):
        rows = big.reshape(H // 32, 32, W)[idxj]      # (192, 32, W)
        s = jnp.sum((rows + x[0, 0]).astype(jnp.float32))
        return x * 0.999 + (s * 1e-20).astype(x.dtype)

    x0 = jnp.asarray(rng.uniform(-1, 1, (8, 128)), jnp.bfloat16)
    (t_red, t_cp, t_ga), anchor = bench_slope(
        [(reduce_step, x0, X), (copy_step, x0, X), (gather_step, x0, X)],
        chains=(2, 6), iters=4, reps=3, with_anchor=True, retries=3)
    g_bytes = 192 * 32 * W * 2
    print(f"anchor {anchor['anchor_ms']} ms valid={anchor['timing_valid']}")
    print(f"reduce (read {nbytes/1e9:.2f} GB):  {t_red*1e3:8.3f} ms  "
          f"{nbytes/t_red/1e9:7.1f} GB/s")
    print(f"copy   (r+w {2*nbytes/1e9:.2f} GB):  {t_cp*1e3:8.3f} ms  "
          f"{2*nbytes/t_cp/1e9:7.1f} GB/s")
    print(f"gather (read {g_bytes/1e9:.2f} GB):  {t_ga*1e3:8.3f} ms  "
          f"{g_bytes/t_ga/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
