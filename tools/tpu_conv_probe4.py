#!/usr/bin/env python
"""X-build variants for the bsmm conv lowering, on chip.

The slice+stack build measured ~8.4 ms (64 B strided runs from
SAME-pad windowing).  Variants:
  (a) depthwise identity conv (feature_group_count=C, 9 one-hot
      3x3 filters) -> (N, C*9, H, W), then moveaxis to feature-major
  (b) same but from channel-first input (C as batch: (C, N*? ...))
Each ends chained back to x's shape via a tap-sum (anti-DCE).
Then (c): full conv fwd = depthwise im2col + bsmm + post, for real.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from blocksparse_tpu.ops.conv import BlocksparseConv
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
dt = jnp.bfloat16
npix = HW * HW

def dev_uniform(seed, shape, lo, hi):
    return jax.jit(lambda k: jax.random.uniform(
        k, shape, jnp.float32, lo, hi).astype(dt))(jax.random.PRNGKey(seed))

F = dev_uniform(1, (bsc.blocks, b, b, 3, 3), -0.1, 0.1)
x0 = dev_uniform(2, (N, C, HW, HW), -1.0, 1.0)

# one-hot depthwise filters: out channel (c, tap) = tap-shift of c
eye9 = np.zeros((9, 1, 3, 3), np.float32)
for t in range(9):
    eye9[t, 0, t // 3, t % 3] = 1.0
EYE = jnp.asarray(np.tile(eye9, (C, 1, 1, 1)), dt)     # (C*9, 1, 3, 3)
dn = jax.lax.conv_dimension_numbers((N, C, HW, HW), (C * 9, 1, 3, 3),
                                    ("NCHW", "OIHW", "NCHW"))

def dw_im2col(x):
    p = jax.lax.conv_general_dilated(
        x, EYE, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        feature_group_count=C)                          # (N, C*9, H, W)
    X = jnp.moveaxis(p.reshape(N, C * 9, npix), 0, 1)   # (C9, N, npix)
    return X.reshape(C * 9, N * npix)

def build_a(x):
    X = dw_im2col(x)
    y = X.reshape(C, 9, N * npix).sum(1)                # anti-DCE
    return (y.reshape(C, N, npix).swapaxes(0, 1)
            .reshape(N, C, HW, HW) * 0.01).astype(dt)

def full_dw(x, F):
    X = dw_im2col(x)
    Fb = F.reshape(bsc.blocks, b, b, 9)
    W0 = jnp.transpose(Fb[bsc._bsmm_wb, :, :, bsc._bsmm_wt], (0, 2, 1))
    y = op(X, W0.astype(X.dtype))
    y = jnp.moveaxis(y.reshape(C, N, npix), 0, 1).reshape(N, C, HW, HW)
    return (y * 0.01).astype(dt)

def full_dw_bwd(x, F):
    def f(xx):
        return jnp.sum(jnp.square(full_dw(xx, F).astype(jnp.float32)))
    return (x * 0.999 + 1e-6 * jax.grad(f)(x)).astype(dt)

# parity vs the existing impl once
ynew = np.asarray(jax.jit(full_dw)(x0, F), np.float32)
yref = np.asarray(jax.jit(lambda x, F: (bsc(F, x.reshape(N, C, 1, HW, HW))
                                        * 0.01).astype(dt))(x0, F),
                  np.float32).reshape(N, C, HW, HW)
err = np.abs(ynew - yref).max() / max(1e-6, np.abs(yref).max())
print("depthwise-im2col parity vs impl=bsmm:", err, flush=True)

for name, fn, args in [("build_dw", build_a, (x0,)),
                       ("full_dw", full_dw, (x0, F)),
                       ("full_dw_fb", full_dw_bwd, (x0, F))]:
    (t,), anch = bench_slope([(fn,) + args], chains=(1, 3), iters=6,
                             with_anchor=True, retries=2)
    print(f"{name:10s} {t*1e3:8.3f} ms  anchor {anch['anchor_ms']:.4f} "
          f"valid {anch['timing_valid']}", flush=True)
