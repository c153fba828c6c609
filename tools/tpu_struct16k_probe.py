#!/usr/bin/env python
"""Structured-layout headline probe at hidden=16384 (VERDICT r2 #2).

Why 16384: at 8192^2 the banded configs sit exactly at the
compute/bandwidth crossover — the schedule re-reads each group's
column-support union from HBM (553 MB at b64/d0.25, ~0.40 ms at the
measured ~1.35 TB/s) while the quantization-padded MXU work is also
~0.40 ms, capping the roofline fraction near 0.86 no matter the
kernel.  Doubling hidden quadruples compute but only doubles the
re-read, so the kernel goes compute-bound and the measured fraction
approaches the pass-quantization fill:

  b128 banded d=0.25: R=1 (no row-union growth), union 32 blocks =
    exactly 32 MXU passes -> fill 1.00, step overhead ~9%.
  b64  banded d=0.25: union 65, best uniform chunking G=10 -> fill .914
  b32  banded d=0.25: union 131, fill .914 (the verdict's b32 ask)

Expected fractions ~0.85-0.95 depending on per-pass efficiency.
Measures each with the anchor-validated readback slope harness and a
same-process dense control.  Results -> benchmarks/results_struct16k.json
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
from bench import bench_slope, make_layout, result_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=16384)
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--bsizes", type=str, default="128,64,32")
    p.add_argument("--density", type=float, default=0.25)
    p.add_argument("--modes", type=str, default="dense_tile",
                   help="comma list of kernel modes; 'window' streams x "
                        "once per (super-group, window) — the x-traffic "
                        "fix for the banded crossover at hidden 8192")
    p.add_argument("--tag", type=str, default=None,
                   help="result file tag (default struct<hidden//1024>k)")
    args = p.parse_args()

    hidden, N = args.hidden, args.N
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    # generate all large operands ON DEVICE: host->device transfer of
    # the 512 MB dense weight through the bench tunnel is what blocked
    # the earlier hidden-16384 attempts (timing values are
    # data-independent, so random on-device contents are equivalent)
    def dev_uniform(seed, shape, lo, hi):
        return jax.jit(
            lambda k: jax.random.uniform(
                k, shape, jnp.float32, lo, hi).astype(dtype),
            static_argnums=())(jax.random.PRNGKey(seed))

    Wd = dev_uniform(1, (hidden, hidden), -0.1, 0.1)
    xd = dev_uniform(2, (hidden, N), -1.0, 1.0)

    def dense_step(x, w):
        return jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    # weights ride as params: a 16384^2 bf16 closure constant inlines
    # 536 MB of literal into the HLO and the tunnel's remote-compile
    # server rejects the request with HTTP 413
    jobs = [(dense_step, xd, Wd)]
    labels = ["dense"]
    keep = []
    for bs in [int(b) for b in args.bsizes.split(",")]:
        nb = hidden // bs
        lay = make_layout("banded", nb, args.density, rng)
        for mode in args.modes.split(","):
            bsmm = BlocksparseMatMul(lay, block_size=bs, feature_axis=0,
                                     w_layout="fprop_packed", mode=mode)
            # random contents directly in the packed layout (on device)
            W = dev_uniform(100 + bs, bsmm.w_shape, -0.1, 0.1)
            x0 = dev_uniform(200 + bs, bsmm.i_shape(N), -1.0, 1.0)
            jobs.append((lambda x, w, b=bsmm: b(x, w).astype(dtype),
                         x0, W))
            labels.append(f"banded_b{bs}_{mode}")
            keep.append((bs, bsmm))

    on_tpu = jax.default_backend() == "tpu"
    times, anchor = bench_slope(jobs, chains=(2, 6), iters=4,
                                with_anchor=True,
                                retries=3 if on_tpu else 0)
    dt_dense = times[0]
    dense_tf = 2 * hidden * hidden * N / dt_dense / 1e12
    rows = []
    print(f"dense {dt_dense*1e3:.3f} ms = {dense_tf:.0f} TF/s  "
          f"anchor {anchor}")
    for (bs, bsmm), lab, dt in zip(keep, labels[1:], times[1:]):
        nb = hidden // bs
        fl = 2 * bsmm.blocks * bs * bs * N
        d_eff = bsmm.blocks / (nb * nb)
        frac = (d_eff * dt_dense) / dt
        row = {"label": lab, "bsize": bs, "density": round(d_eff, 4),
               "blocks": bsmm.blocks, "mode": bsmm.mode_f,
               "sparse_ms": round(dt * 1e3, 4),
               "eff_tflops": round(fl / dt / 1e12, 2),
               "flops_roofline_fraction": round(float(frac), 4),
               "speedup_vs_dense": round(dt_dense / dt, 3)}
        rows.append(row)
        print(json.dumps(row))
    out = {"hidden": hidden, "N": N,
           "dense_ms": round(dt_dense * 1e3, 4),
           "dense_tflops": round(dense_tf, 2),
           "anchor_ms": anchor["anchor_ms"],
           "timing_valid": anchor["timing_valid"],
           "backend": jax.default_backend(), "rows": rows}
    tag = args.tag or f"struct{hidden // 1024}k"
    with open(result_path(tag), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", result_path(tag))


if __name__ == "__main__":
    main()
