#!/usr/bin/env python
"""Fused-attention efficiency breakdown at the sp75 config (VERDICT r4
#10).

At 81.7% sparsity the block-billed ideal speedup vs the dense-flash
control is blocks_causal/blocks_sparse ~ 5.5x; the captured row
(benchmarks/results_attn_sp75.json) measures 3.63x fwd (~66% of ideal).
This probe decomposes the gap:

1. PER-ROW FIXED COST vs PER-BLOCK COST.  All layouts at one ctx share
   the q-row count, so timing the fused fwd across layouts of varying
   block count and fitting time = F_tot + B*blocks splits the cost: B
   is the marginal block cost (the MXU + stream-DMA work), F_tot the
   per-row overhead (q load, softmax state init, output write,
   schedule walk) billed once per (batch, head, q-row).  A sparse row
   amortizes F over ~12 blocks where causal amortizes over ~64 — the
   fixed cost therefore inflates the sparse side's per-block price.
   Implied ceiling at the sp75 layout:
       (F_tot + B*blocks_causal) / (F_tot + B*blocks_sparse)
   compared against the measured speedup; the remainder is class (2).

2. MASK-CLASS MIX.  causal_subblock_mask bit-masks the diagonal
   blocks; the kernel still bills their full bs x bs FLOPs and applies
   the mask as an additive bias load.  Two band layouts with the SAME
   block count — one on the diagonal (every row has one masked block),
   one strictly below it (zero masked blocks) — price the masked-block
   premium directly.

Writes benchmarks/results_attn_breakdown.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops.transformer import BlocksparseTransformer
from blocksparse_tpu.models.sparse_transformer import (
    fixed_layout, causal_subblock_mask)
from bench import bench_slope, result_path


def band_layout(nb, width, include_diag):
    lay = np.zeros((nb, nb), np.int32)
    for q in range(nb):
        hi = q + 1 if include_diag else q
        lo = max(0, hi - width)
        lay[q, lo:hi] = 1
    lay[0, 0] = 1  # row 0 must attend to something
    return lay


def main():
    on_tpu = jax.default_backend() == "tpu"
    ctx, bsize, heads, hs, batch = 8192, 64, 8, 64, 8
    if not on_tpu:
        ctx, batch, heads = 1024, 1, 2
    nb = ctx // bsize
    state = heads * hs
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    scale = 1.0 / np.sqrt(hs)
    rng = np.random.RandomState(0)
    Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)

    # --- fit set: fixed patterns of varying block count + causal ------
    cfgs = [("sp75", dict(local_blocks=8, num_verts=16)),
            ("local4_nv16", dict(local_blocks=4, num_verts=16)),
            ("local16_nv16", dict(local_blocks=16, num_verts=16)),
            ("local8_nv4", dict(local_blocks=8, num_verts=4)),
            ("local8_nv8", dict(local_blocks=8, num_verts=8))]
    lays = [(name, fixed_layout(nb, **kw)) for name, kw in cfgs]
    lays.append(("causal", np.tril(np.ones((nb, nb), np.int32))))
    # mask-class pair: same block count, with/without diagonal masking
    lays.append(("band_diag", band_layout(nb, 12, True)))
    lays.append(("band_nodiag", band_layout(nb, 12, False)))

    jobs, meta = [], []
    for name, lay in lays:
        bst = BlocksparseTransformer(lay, block_size=bsize, heads=heads,
                                     mask_callback=causal_subblock_mask)
        n_masked = sum(1 for h in range(bst.lut_heads)
                       for (q, k) in bst.nt_list[h] if q == k) \
            if hasattr(bst, "nt_list") else int(np.trace(lay))

        def fwd(q, b=bst):
            return (b.attention(q, q, q, scale=scale, use_fused=True)
                    .astype(dtype) * 0.999 + 1e-6 * q)

        jobs.append((fwd, Q))
        meta.append((name, int(bst.blocks), int(n_masked)))

    iters, chains = (6, (4, 16)) if on_tpu else (2, (1, 3))
    times, anchor = bench_slope(jobs, chains=chains, iters=iters, reps=3,
                                with_anchor=True,
                                retries=3 if on_tpu else 0)

    rows = []
    for (name, blocks, n_masked), dt in zip(meta, times):
        rows.append({"layout": name, "blocks": blocks,
                     "masked_blocks": n_masked,
                     "fwd_ms": round(dt * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # linear fit over the unmasked-mix fit set (exclude the band pair)
    fit = [(r["blocks"], times[i]) for i, r in enumerate(rows)
           if r["layout"] not in ("band_diag", "band_nodiag")]
    xs = np.array([b for b, _ in fit], np.float64)
    ys = np.array([t for _, t in fit], np.float64)
    B, F = np.polyfit(xs, ys, 1)          # time = B*blocks + F
    blocks_s = rows[0]["blocks"]
    blocks_c = [r for r in rows if r["layout"] == "causal"][0]["blocks"]
    t_s, t_c = times[0], times[[r["layout"] for r in rows].index("causal")]
    ideal = blocks_c / blocks_s
    ceiling = (F + B * blocks_c) / (F + B * blocks_s)
    measured = t_c / t_s
    bd = [r for r in rows if r["layout"] == "band_diag"][0]
    bn = [r for r in rows if r["layout"] == "band_nodiag"][0]
    i_bd = [r["layout"] for r in rows].index("band_diag")
    i_bn = [r["layout"] for r in rows].index("band_nodiag")
    masked_premium_us = (times[i_bd] - times[i_bn]) * 1e6 / max(
        1, bd["masked_blocks"] - bn["masked_blocks"])

    out = {"backend": jax.default_backend(), "ctx": ctx, "bsize": bsize,
           "heads": heads, "head_size": hs, "batch": batch,
           "anchor_ms": anchor["anchor_ms"],
           "timing_valid": anchor["timing_valid"],
           "rows": rows,
           "fit": {"per_block_us": round(B * 1e6, 4),
                   "fixed_ms": round(F * 1e3, 4),
                   "fixed_share_of_sparse": round(F / t_s, 4)},
           "speedups": {"ideal_block_billed": round(ideal, 2),
                        "ceiling_with_fixed_cost": round(ceiling, 2),
                        "measured": round(measured, 2)},
           "masked_block_premium_us": round(masked_premium_us, 4)}
    with open(result_path("attn_breakdown"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("fit", "speedups",
                                          "masked_block_premium_us")}))
    print("wrote", result_path("attn_breakdown"))


if __name__ == "__main__":
    main()
