#!/usr/bin/env python
"""q-row pairing (AttnSchedule.q_mult=2) on-chip A/B.

The round-5 breakdown (results_attn_breakdown.json) measured the fused
kernel's per-row fixed cost at 41% of the sp75 row — amortizing it over
two q rows (one (2bs, hs) q tile per step, union k chunks, per-half
masks) should buy ~20% on the sparse side and ~6% on the causal-flash
control, lifting the sp75 headline from its unpaired 3.63x fixed-cost
ceiling toward the 5.47x block-billed ideal.

Measures fused fwd and fwd+bwd at the sp75 config (ctx 8192/b64/h8/
hs64/batch 8 — STREAM mode) and the causal control, q_mult 1 vs 2,
plus on-chip parity between the two.  Writes results_qpair_ab.json.
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

    lays = [("sp75", fixed_layout(nb, local_blocks=8, num_verts=16)),
            ("causal", np.tril(np.ones((nb, nb), np.int32)))]

    jobs, meta, parity = [], [], {}
    for name, lay in lays:
        for qm in (1, 2):
            bst = BlocksparseTransformer(
                lay, block_size=bsize, heads=heads,
                mask_callback=causal_subblock_mask, q_mult=qm)

            def fwd(q, b=bst):
                return (b.attention(q, q, q, scale=scale, use_fused=True)
                        .astype(dtype) * 0.999 + 1e-6 * q)

            def fb(q, b=bst):
                def chain(x):
                    return b.attention(x, x, x, scale=scale,
                                       use_fused=True)
                y, vjp = jax.vjp(chain, q)
                (dq,) = vjp(y)
                return (q * 0.999 + 1e-6 * dq).astype(dtype)

            if qm == 1:
                parity[name] = np.asarray(
                    jax.jit(lambda q, b=bst: b.attention(
                        q, q, q, scale=scale, use_fused=True))(Q)
                    .astype(jnp.float32))
            else:
                y2 = np.asarray(
                    jax.jit(lambda q, b=bst: b.attention(
                        q, q, q, scale=scale, use_fused=True))(Q)
                    .astype(jnp.float32))
                err = np.abs(y2 - parity[name]).max() / max(
                    1e-6, np.abs(parity[name]).max())
                print(f"{name}: q_mult=2 vs 1 parity rel err {err:.2e}",
                      flush=True)
                assert err < 3e-2, err
            jobs.append((fwd, Q))
            jobs.append((fb, Q))
            meta.append((name, qm))

    iters, chains = (6, (4, 16)) if on_tpu else (2, (1, 3))
    times, anchor = bench_slope(jobs, chains=chains, iters=iters, reps=3,
                                with_anchor=True,
                                retries=3 if on_tpu else 0)

    rows = []
    for i, (name, qm) in enumerate(meta):
        rows.append({"layout": name, "q_mult": qm,
                     "fwd_ms": round(times[2 * i] * 1e3, 3),
                     "fwdbwd_ms": round(times[2 * i + 1] * 1e3, 3)})
        print(json.dumps(rows[-1]), flush=True)

    def t(name, qm, key):
        return [r for r in rows
                if r["layout"] == name and r["q_mult"] == qm][0][key]

    out = {"backend": jax.default_backend(), "ctx": ctx, "bsize": bsize,
           "heads": heads, "head_size": hs, "batch": batch,
           "anchor_ms": anchor["anchor_ms"],
           "timing_valid": anchor["timing_valid"],
           "rows": rows,
           "pair_speedup_sparse_fwd": round(
               t("sp75", 1, "fwd_ms") / t("sp75", 2, "fwd_ms"), 3),
           "pair_speedup_causal_fwd": round(
               t("causal", 1, "fwd_ms") / t("causal", 2, "fwd_ms"), 3),
           "sp75_vs_flash_fwd_unpaired": round(
               t("causal", 1, "fwd_ms") / t("sp75", 1, "fwd_ms"), 2),
           "sp75_vs_flash_fwd_paired": round(
               t("causal", 2, "fwd_ms") / t("sp75", 2, "fwd_ms"), 2),
           "sp75_vs_flash_fwdbwd_paired": round(
               t("causal", 2, "fwdbwd_ms") / t("sp75", 2, "fwdbwd_ms"), 2)}
    with open(result_path("qpair_ab"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    print("wrote", result_path("qpair_ab"))


if __name__ == "__main__":
    main()
