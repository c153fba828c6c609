#!/usr/bin/env python
"""A/B the phased (flexible-cover) dense-tile schedule against the fixed
partition on chip at the headline config (random 8192^2 / b32 / d=0.25 /
N=2048 / bf16), and time the canonical-row merge (segment-sum) alone.

bench.py r4 first capture measured the phased path at 2.25 ms where the
round-3 fixed partition ran 1.06 ms, despite 11% fewer MXU passes — the
cost model charges ~2 pass-equivalents per extra group for the merge,
which this probe calibrates against reality.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul
import blocksparse_tpu.ops.matmul as mm
from bench import bench_slope, make_layout


def main():
    assert jax.default_backend() == "tpu"
    hidden, bsize, density, N = 8192, 32, 0.25, 2048
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    nb = hidden // bsize
    lay = make_layout("random", nb, density, rng)

    real_phased = mm.build_dense_tile_schedule_phased
    real_charge = mm.PHASED_EXTRA_GROUP_PASSES

    def make(tag, patch):
        mm.build_dense_tile_schedule_phased = patch or real_phased
        # zero the extra-group charge so the cost model accepts the
        # phased cover regardless of calibration (A/B wants both arms)
        mm.PHASED_EXTRA_GROUP_PASSES = real_charge if patch else 0
        try:
            b = BlocksparseMatMul(lay, block_size=bsize, feature_axis=0,
                                  w_layout="fprop_packed", mode="dense_tile")
        finally:
            mm.build_dense_tile_schedule_phased = real_phased
            mm.PHASED_EXTRA_GROUP_PASSES = real_charge
        sf, sb = b.fprop_dt, b.bprop_dt
        print(tag, "fprop groups", sf.groups, "passes",
              sf.mxu_passes(bsize), "phased", sf.rows_at is not None,
              "| bprop groups", sb.groups, "passes", sb.mxu_passes(bsize),
              "phased", sb.rows_at is not None, flush=True)
        return b

    def no_phased(entries, n_out, bs, blocks, thresholds=(3, 2, 2), **kw):
        # fall back to the fixed partition: cost tie -> fixed kept
        return mm.build_dense_tile_schedule(entries, n_out, bs, blocks,
                                            cluster=True)

    b_fixed = make("fixed ", no_phased)
    b_phase = make("phased", None)

    jobs = []
    for b in (b_fixed, b_phase):
        Wc = rng.uniform(-0.1, 0.1, (b.blocks, bsize, bsize)) \
            .astype(np.float32)
        W = jnp.asarray(b.pack_weights(Wc), dtype)
        x0 = jnp.asarray(rng.uniform(-1, 1, b.i_shape(N)), dtype)

        def fwd(x, bb=b, w=W):
            return bb(x, w).astype(dtype)

        def fb(x, bb=b, w=W):
            y, vjp = jax.vjp(lambda xx: bb(xx, w), x)
            (dx,) = vjp(y)
            return (x * 0.999 + 1e-6 * dx).astype(dtype)

        jobs += [(fwd, x0), (fb, x0)]

    # merge cost alone: both merges of the phased fprop out tiles —
    # the old XLA scatter-add segment-sum vs the Pallas gather kernel
    sf = b_phase.fprop_dt
    if sf.rows_at is not None:
        from blocksparse_tpu.kernels import bsmm as K
        groups, R = sf.rows_at.shape
        ids = sf.rows_at.reshape(-1).astype(np.int32)
        ids = np.where(ids < 0, sf.n_out_blocks, ids)
        tiles0 = jnp.asarray(
            rng.uniform(-1, 1, (groups * R * bsize, N)), dtype)

        def merge_seg(tiles):
            out = jax.ops.segment_sum(
                tiles.reshape(groups * R, bsize, N).astype(jnp.float32),
                jnp.asarray(ids), num_segments=sf.n_out_blocks + 1)
            # data-dependent chain: feed back through a cheap scalar
            return (tiles * 0.999 + 1e-6 * out[0, 0, 0]).astype(dtype)

        def merge_gather(tiles):
            out = K.merge_phased_tiles(tiles, sf, bsize,
                                       K.dense_tile_pick_tile(N), dtype)
            return (tiles * 0.999 + 1e-6 * out[0, 0]).astype(dtype)

        jobs += [(merge_seg, tiles0), (merge_gather, tiles0)]

    times, anchor = bench_slope(jobs, chains=(2, 6), with_anchor=True,
                                retries=2)
    labels = ["fixed_fwd", "fixed_fb", "phased_fwd", "phased_fb",
              "merge_segsum", "merge_gather"][:len(times)]
    row = {k: round(t * 1e3, 4) for k, t in zip(labels, times)}
    row.update(anchor)
    eg_f = b_phase.fprop_dt.groups - b_fixed.fprop_dt.groups
    row["extra_fprop_groups"] = int(eg_f)
    print(json.dumps(row, indent=1), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "results_phased_ab.json")
    with open(path, "w") as f:
        json.dump(row, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
