#!/usr/bin/env python
"""On-chip fp16 (IEEE half, the reference's ehalf) parity + perf row
(VERDICT r4 #9).

The design decision (ops/matmul.py:695-700): TPU's MXU has no IEEE-f16
format and Mosaic rejects f16 dots, so f16 tensors run the same bf16
MXU path with f16 IO/grad dtypes.  The CPU-interpret suite covers the
plumbing (test_fp16_pallas_fwd_bwd, test_fused_attention_fp16,
test_unfused_trio_fp16); this captures the missing ON-CHIP evidence:

  * bsmm 8192^2/b32/d0.25: f16 vs bf16 fwd time (should be ~equal: the
    kernels cast at the boundary) + parity vs an f32 golden
  * fused sparse attention at ctx 4096: f16 vs bf16 fwd time + parity

Match: /root/reference/src/gpu_types.h:15 (ehalf is the reference's
primary compute type).  Writes benchmarks/results_fp16.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul
from blocksparse_tpu.ops.transformer import BlocksparseTransformer
from blocksparse_tpu.models.sparse_transformer import (
    fixed_layout, causal_subblock_mask)
from bench import bench_slope, make_layout, result_path


def main():
    on_tpu = jax.default_backend() == "tpu"
    hidden, N = (8192, 2048) if on_tpu else (512, 128)
    ctx, heads, hs, batch = (4096, 8, 64, 8) if on_tpu else (512, 2, 32, 1)
    rng = np.random.RandomState(0)

    lay = make_layout("random", hidden // 32, 0.25, np.random.RandomState(7))
    bsmm = BlocksparseMatMul(lay, block_size=32, feature_axis=0,
                             w_layout="fprop_packed")

    def dev_uniform(seed, shape, lo, hi, dtype):
        return jax.jit(lambda k: jax.random.uniform(
            k, shape, jnp.float32, lo, hi).astype(dtype))(
                jax.random.PRNGKey(seed))

    Wh = dev_uniform(1, bsmm.w_shape, -0.02, 0.02, jnp.float16)
    xh = dev_uniform(2, bsmm.i_shape(N), -1.0, 1.0, jnp.float16)
    Wb, xb = Wh.astype(jnp.bfloat16), xh.astype(jnp.bfloat16)

    # parity: f16 output vs f32 reference of the same (f16-representable)
    # operands through the XLA fallback impl
    y16 = bsmm(xh, Wh)
    assert y16.dtype == jnp.float16
    y32 = bsmm(xh.astype(jnp.float32), Wh.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(y16.astype(jnp.float32) - y32))
                / (jnp.max(jnp.abs(y32)) + 1e-9))
    print(f"bsmm f16 parity vs f32: rel err {err:.2e}")
    assert err < 3e-2

    bst = BlocksparseTransformer(
        fixed_layout(ctx // 64, local_blocks=8, num_verts=4),
        block_size=64, heads=heads, mask_callback=causal_subblock_mask)
    state = heads * hs
    Qh = dev_uniform(3, (batch, ctx, state), -0.5, 0.5, jnp.float16)
    Qb = Qh.astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(hs)

    a16 = bst.attention(Qh, Qh, Qh, scale=scale, use_fused=True)
    assert a16.dtype == jnp.float16
    a32 = np.asarray(bst.attention(Qb, Qb, Qb, scale=scale,
                                   use_fused=True), np.float32)
    aerr = float(np.max(np.abs(np.asarray(a16, np.float32) - a32))
                 / (np.max(np.abs(a32)) + 1e-9))
    print(f"attention f16 parity vs bf16: rel err {aerr:.2e}")
    assert aerr < 3e-2

    def mm(dtype):
        def f(x, w):
            return bsmm(x, w).astype(dtype)
        return f

    def att(dtype):
        def f(q):
            return (bst.attention(q, q, q, scale=scale, use_fused=True)
                    .astype(dtype) * 0.999 + 1e-6 * q)
        return f

    jobs = [(mm(jnp.float16), xh, Wh), (mm(jnp.bfloat16), xb, Wb),
            (att(jnp.float16), Qh), (att(jnp.bfloat16), Qb)]
    labels = ["bsmm_f16", "bsmm_bf16", "attn_f16", "attn_bf16"]
    times, anchor = bench_slope(jobs, chains=(2, 6) if on_tpu else (1, 3),
                                iters=6 if on_tpu else 2,
                                with_anchor=True,
                                retries=3 if on_tpu else 0)
    rows = [{"label": lab, "ms": round(t * 1e3, 4)}
            for lab, t in zip(labels, times)]
    for r in rows:
        print(json.dumps(r))
    out = {"backend": jax.default_backend(), "hidden": hidden, "N": N,
           "ctx": ctx, "bsmm_parity_rel_err": err,
           "attn_parity_rel_err": aerr,
           "anchor_ms": anchor["anchor_ms"],
           "timing_valid": anchor["timing_valid"], "rows": rows,
           "f16_over_bf16_bsmm": round(times[0] / times[1], 3),
           "f16_over_bf16_attn": round(times[2] / times[3], 3)}
    with open(result_path("fp16"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", result_path("fp16"))


if __name__ == "__main__":
    main()
