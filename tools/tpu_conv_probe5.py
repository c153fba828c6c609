#!/usr/bin/env python
"""Full bsmm-conv fwd / fwd+bwd on chip with the Pallas im2col."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from blocksparse_tpu.ops.conv import BlocksparseConv
from blocksparse_tpu.kernels.im2col import im2col_supported
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
print("im2col kernel:", im2col_supported(bsc.TRS, bsc.DHW, bsc.MPQ,
      list(bsc.strides), list(bsc.dilates), list(bsc.padding), C, b), flush=True)
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

# parity vs vmapped-conv impl on chip
bsc_ref = BlocksparseConv(BCK, (3, 3), (HW, HW), padding="SAME", impl="conv")
y1 = np.asarray(jax.jit(full)(x0, F), np.float32)
y2 = np.asarray(jax.jit(lambda x, F: (bsc_ref(F, x) * 0.01).astype(dt))(x0, F),
                np.float32)
print("parity bsmm-vs-conv on chip:",
      np.abs(y1 - y2).max() / max(1e-6, np.abs(y2).max()), flush=True)

for name, fn in [("fwd", full), ("fwd+bwd", fwdbwd)]:
    (t,), anch = bench_slope([(fn, x0, F)], chains=(1, 3), iters=6,
                             with_anchor=True, retries=2)
    print(f"{name:8s} {t*1e3:8.3f} ms  anchor {anch['anchor_ms']:.4f} "
          f"valid {anch['timing_valid']}", flush=True)
