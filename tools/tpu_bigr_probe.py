#!/usr/bin/env python
"""Tall output tiles (M = R*bsize > 128) as the x-traffic lever for the
>=0.90 roofline row (VERDICT r4 #4).

At fill 1.0 the dense-tile kernel's remaining gap to peak is the union
slot re-reads: x traffic = total_slots * bsize * N bytes, and
total_slots = groups * union_per_group.  Doubling R halves the group
count while an R-aligned band keeps union_per_group = width, so x
traffic HALVES at constant MXU passes (each chunk's dot is
(R*bsize, G*bsize) @ (G*bsize, TN) = (R*bsize/128)*(G*bsize/128)
passes — the MXU bills the same).  The accumulator/out tiles grow to
(R*bsize, TN); VMEM forces a smaller G at R=4/b64 (slots dominate).

This probes R in {2,4} x b64 and {4,8} x b32 on the aligned-band
layout at hidden 8192 / N 2048 bf16, parity-checked against the
NumPy golden, bypassing BlocksparseMatMul's hardcoded R = 128/bsize.
Writes benchmarks/results_bigr.json; a win wires a dense_tile_R
option into the op.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.kernels import bsmm as bk
from tools.tpu_struct90_probe import aligned_band_layout
from bench import bench_slope, result_path

PEAK_TF = 197.0


def entries_of(lay):
    ents = []
    w = 0
    wid = np.zeros(lay.shape, np.int64)
    for r in range(lay.shape[0]):
        row = []
        for c in range(lay.shape[1]):
            if lay[r, c]:
                row.append((c, w))
                wid[r, c] = w
                w += 1
        ents.append(row)
    return ents, w


def main():
    on_tpu = jax.default_backend() == "tpu"
    hidden = 8192 if on_tpu else 512
    N = 2048 if on_tpu else 128
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfgs = [("b64_R2", 64, 2, None), ("b64_R4", 64, 4, None),
            ("b64_R4_G8", 64, 4, 8),
            ("b32_R4", 32, 4, None), ("b32_R8", 32, 8, None)]
    if not on_tpu:
        cfgs = [("b32_R4", 32, 4, None), ("b32_R8", 32, 8, None)]

    def dev_uniform(seed, shape, lo, hi):
        return jax.jit(lambda k: jax.random.uniform(
            k, shape, jnp.float32, lo, hi).astype(dtype))(
                jax.random.PRNGKey(seed))

    jobs, meta = [], []
    for name, bs, R, G in cfgs:
        nb = hidden // bs
        lay = aligned_band_layout(nb, nb // 4, R)
        ents, blocks = entries_of(lay)
        sched = bk.build_dense_tile_schedule(ents, nb, bs, blocks,
                                             R=R, G=G, cluster=False)
        M = sched.R * bs
        passes = sched.mxu_passes(bs) * (M // 128 if M > 128 else 1) \
            if M > 128 else sched.mxu_passes(bs)
        slots = sched.num_chunks * sched.G
        W = dev_uniform(1, (blocks, bs, bs), -0.02, 0.02)
        x0 = dev_uniform(2, (hidden, N), -1.0, 1.0)

        def fwd(x, w, s=sched, bs_=bs):
            panels = bk.dense_tile_panels(w, s, False)
            return bk.xprop_pallas_dense_tile(x, panels, s, bs_) \
                .astype(dtype)

        # parity vs golden on a small slice of rows
        if not on_tpu or True:
            Wf = np.asarray(jax.device_get(W), np.float32)
            xf = np.asarray(jax.device_get(x0), np.float32)[:, :128]
            ref = np.zeros((nb * bs, 128), np.float32)
            for r, row in enumerate(ents):
                for (c, wdx) in row:
                    ref[r * bs:(r + 1) * bs] += \
                        Wf[wdx].T @ xf[c * bs:(c + 1) * bs]
            got = np.asarray(jax.device_get(
                fwd(x0[:, :128].astype(dtype), W)), np.float32)[:nb * bs]
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"{name}: parity rel err {err:.2e} "
                  f"(chunks {sched.num_chunks}, G {sched.G}, "
                  f"slots {slots}, M {M})", flush=True)
            assert err < 2e-2

        jobs.append((fwd, x0, W))
        meta.append((name, bs, R, blocks, sched.num_chunks, sched.G,
                     slots, M))

    times, anchor = bench_slope(jobs, chains=(2, 6) if on_tpu else (1, 3),
                                iters=6 if on_tpu else 2, reps=3,
                                with_anchor=True,
                                retries=3 if on_tpu else 0)
    rows = []
    for (name, bs, R, blocks, chunks, G, slots, M), dt in zip(meta, times):
        fl = 2 * blocks * bs * bs * N
        eff = fl / dt / 1e12
        rows.append({"layout": name, "bsize": bs, "R": R, "M": M,
                     "blocks": blocks, "chunks": chunks, "G": G,
                     "x_slot_loads": slots,
                     "ms": round(dt * 1e3, 4),
                     "eff_tflops": round(eff, 2),
                     "flops_roofline_fraction": round(eff / PEAK_TF, 4)})
        print(json.dumps(rows[-1]), flush=True)
    out = {"backend": jax.default_backend(), "hidden": hidden, "N": N,
           "dtype": str(dtype), "anchor_ms": anchor["anchor_ms"],
           "timing_valid": anchor["timing_valid"], "rows": rows}
    with open(result_path("bigr"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", result_path("bigr"))


if __name__ == "__main__":
    main()
