#!/usr/bin/env python
"""Round-5 follow-up probe: (a) bsmm-conv forward after the
channel-first tap-stack fix (was 10 ms, bare bsmm 1.23 ms);
(b) the same conv with the bsmm pinned to grouped/supertile —
cb-major tap tiling makes each base block a contiguous 9-block-row
run, supertile-friendly; (c) fwd+bwd for the auto pick."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from blocksparse_tpu.ops.conv import BlocksparseConv
from blocksparse_tpu.ops.matmul import BlocksparseMatMul
from bench import bench_slope

rng = np.random.RandomState(0)
C = 512; b = 32; HW = 32; N = 32
nb = C // b
BCK = []
for kb in range(nb):
    for cb in range(nb):
        if cb == kb % nb or rng.rand() < 0.25:
            BCK.append((tuple(range(cb*b, (cb+1)*b)), tuple(range(kb*b, (kb+1)*b))))
bsc = BlocksparseConv(BCK, (3, 3), (HW, HW), padding="SAME", impl="bsmm")
op = bsc._bsmm_op
print("auto modes", op.mode_f, op.mode_b, op.mode_u,
      "st_inflation", op.supertile_inflation, flush=True)

dt = jnp.bfloat16
def dev_uniform(seed, shape, lo, hi):
    return jax.jit(lambda k: jax.random.uniform(
        k, shape, jnp.float32, lo, hi).astype(dt))(jax.random.PRNGKey(seed))

F = dev_uniform(1, (bsc.blocks, b, b, 3, 3), -0.1, 0.1)
x0 = dev_uniform(2, tuple(bsc.i_shape(N)), -1.0, 1.0)

def full(x, F):
    return (bsc(F, x) * 0.01).astype(dt)

def fwdbwd(x, F):
    def f(xx):
        return jnp.sum(jnp.square(bsc(F, xx).astype(jnp.float32)))
    return (x * 0.999 + 1e-6 * jax.grad(f)(x)).astype(dt)

op_g = BlocksparseMatMul(op.layout.astype(np.int32), block_size=b,
                         feature_axis=0, mode="grouped")
print("grouped fprop: contig", getattr(op_g.fprop_grouped, "contiguous", False),
      "CH", op_g.fprop_grouped.CH, "G", op_g.fprop_grouped.G, flush=True)

def full_g(x, F):
    bsc._bsmm_op = op_g
    try:
        return (bsc(F, x) * 0.01).astype(dt)
    finally:
        bsc._bsmm_op = op
probes = [("full_auto", full, (x0, F)), ("full_grouped", full_g, (x0, F)),
          ("fwdbwd_auto", fwdbwd, (x0, F))]
for name, fn, args in probes:
    (t,), anch = bench_slope([(fn,) + args], chains=(1, 3), iters=6,
                             with_anchor=True, retries=2)
    print(f"{name:12s} {t*1e3:8.3f} ms  anchor {anch['anchor_ms']:.4f} "
          f"valid {anch['timing_valid']}", flush=True)
