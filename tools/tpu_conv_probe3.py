#!/usr/bin/env python
"""Isolate the ~9 ms wrapper cost around the 1.23 ms bare bsmm:
(a) X build (pad + 9 tap slices + stack) alone;
(b) weight gather + bsmm + y postprocess on a prebuilt X;
(c) y postprocess alone."""
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
x0 = dev_uniform(2, tuple(bsc.i_shape(N)), -1.0, 1.0)
Xpre = dev_uniform(3, (C * 9, N * npix), -1.0, 1.0)

def xbuild(x):
    # replicate _conv_fwd_bsmm's X construction on the 5-D i_shape
    I3 = x.reshape((N, C, 1, HW, HW))
    Ic = jnp.moveaxis(I3, 1, 0)
    Ipad = jnp.pad(Ic, [(0, 0), (0, 0), (0, 0), (1, 1), (1, 1)])
    xs = []
    for r in range(3):
        for s in range(3):
            sl = jax.lax.slice(Ipad, (0, 0, 0, r, s),
                               (C, N, 1, r + HW, s + HW))
            xs.append(sl.reshape(C // b, b, N * npix))
    X = jnp.stack(xs, axis=1).reshape(C * 9, N * npix)
    y = X.reshape(C // b, 9, b, N * npix).sum(1)        # anti-DCE
    return jnp.moveaxis(y.reshape(C, N, 1, HW, HW), 0, 1) * 0.01

def mm_post(w5, X):
    Fb = w5.reshape(bsc.blocks, b, b, 9)
    W0 = jnp.transpose(Fb[bsc._bsmm_wb, :, :, bsc._bsmm_wt], (0, 2, 1))
    y = op(X, W0)                                        # (K, N*npix)
    y = jnp.moveaxis(y.reshape(C, N, 1, HW, HW), 0, 1)   # (N,K,1,H,W)
    return (w5 * 0.999
            + (y[0, :, 0, :1, :1] * 1e-6).reshape(C, 1, 1, 1, 1)[
                :bsc.blocks % C + 76].sum() * 0).astype(dt) \
        + y[0, 0, 0, 0, 0].astype(dt) * 1e-6

def post_only(yflat):
    y = jnp.moveaxis(yflat.reshape(C, N, 1, HW, HW), 0, 1)
    return jnp.moveaxis(y, 1, 0).reshape(C, N * npix) * 0.999

Yflat = dev_uniform(4, (C, N * npix), -1.0, 1.0)
for name, fn, args in [("xbuild", xbuild, (x0,)),
                       ("mm+post", mm_post, (F, Xpre)),
                       ("post2x", post_only, (Yflat,))]:
    (t,), anch = bench_slope([(fn,) + args], chains=(1, 3), iters=6,
                             with_anchor=True, retries=2)
    print(f"{name:8s} {t*1e3:8.3f} ms  anchor {anch['anchor_ms']:.4f} "
          f"valid {anch['timing_valid']}", flush=True)
