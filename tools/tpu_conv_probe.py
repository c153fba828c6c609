#!/usr/bin/env python
"""Per-component probe of the bsmm conv lowering on chip.

bench_slope chains y = fn(y, *rest), so each probe maps its first arg
to an identically-shaped output.  Components at the conv bench
C=512/d~0.3 config: (a) full impl='bsmm' forward; (b) the bsmm alone
on a pre-materialized im2col X (chained on w); (c) im2col alone
(tap-sum keeps every tap live against DCE); (d) tap-stack without the
per-block (b, trs) transpose."""
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
print("blocks", bsc.blocks, "bsmm blocks", op.blocks,
      "modes", op.mode_f, op.mode_b, op.mode_u, flush=True)
fd = op.fprop_dt
if fd is not None:
    print("fprop_dt: R", fd.R, "G", fd.G, "chunks", fd.num_chunks,
          "groups", fd.groups, "mxu_passes", fd.mxu_passes(op.bsize),
          "fill", round(op.blocks * 9 / max(1, fd.num_chunks * fd.G * 1.0), 3),
          flush=True)
gs = op.fprop_grouped
print("grouped: CH", gs.CH, "G", gs.G, "groups", gs.groups,
      "contig", getattr(gs, "contiguous", False), flush=True)

dt = jnp.bfloat16

def dev_uniform(seed, shape, lo, hi):
    return jax.jit(lambda k: jax.random.uniform(
        k, shape, jnp.float32, lo, hi).astype(dt))(jax.random.PRNGKey(seed))

F = dev_uniform(1, (bsc.blocks, b, b, 3, 3), -0.1, 0.1)
x0 = dev_uniform(2, tuple(bsc.i_shape(N)), -1.0, 1.0)
npix = HW * HW

def full(x, F):
    return (bsc(F, x) * 0.01).astype(dt)

Xbig = dev_uniform(3, (C * 9, N * npix), -1.0, 1.0)
Fb = F.reshape(bsc.blocks, b, b, 9)
W0 = jnp.transpose(Fb[bsc._bsmm_wb, :, :, bsc._bsmm_wt], (0, 2, 1)).astype(dt)

def bare(w, xb):
    y = op(xb, w)
    return (w * 0.999 + y[:b, :b].astype(w.dtype) * 1e-6).astype(dt)

def taps(x):
    Ipad = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)])
    return [jax.lax.slice(Ipad, (0, 0, t, r), (N, C, t + HW, r + HW))
            .reshape(N, C, npix) for t in range(3) for r in range(3)]

def im2col(x):
    X = jnp.stack(taps(x)).reshape(9, N, C // b, b, npix)
    X = jnp.transpose(X, (2, 0, 3, 1, 4)).reshape(C * 9, N * npix)
    # tap-sum: forces every row of X to materialize (anti-DCE)
    y = X.reshape(C // b, 9, b, N, npix).sum(1)         # (CB, b, N, npix)
    return (jnp.transpose(y, (2, 0, 1, 3)).reshape(N, C, HW, HW)
            * 0.01).astype(dt)

def stack_only(x):
    X = jnp.stack(taps(x))                               # (9, N, C, npix)
    return (X.sum(0).reshape(N, C, HW, HW) * 0.01).astype(dt)

for name, fn, args in [("full", full, (x0, F)), ("bare_bsmm", bare, (W0, Xbig)),
                       ("im2col+sum", im2col, (x0,)),
                       ("stack+sum", stack_only, (x0,))]:
    (t,), anch = bench_slope([(fn,) + args], chains=(1, 3), iters=6,
                             with_anchor=True, retries=2)
    print(f"{name:10s} {t*1e3:8.3f} ms  anchor {anch['anchor_ms']:.4f} "
          f"valid {anch['timing_valid']}", flush=True)
