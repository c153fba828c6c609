"""Pallas im2col / col2im for the bsmm-backed block-sparse conv.

Why a kernel: the XLA tap-window builds (pad + 9 strided slices +
stack, or a one-hot depthwise conv) materialize the (C*trs, N*npix)
im2col tensor in 64-byte strided runs and measured ~8.5 ms at the
conv bench C=512/32^2 config — 6x the entire block-sparse matmul
(tools/tpu_conv_probe{3,4}.py, round 5).  Here each grid step loads a
(bC, NG*npix) channel-block image tile once and emits all trs tap
shifts as lane-rolls + boundary masks (pure VPU work), writing
2 KB-contiguous runs: one bandwidth-speed pass (measured: full conv
fwd 10 ms -> 1.7 ms, tools/tpu_conv_probe5.py).

Everything stays 2-D — (channels, n*pix) with pixels on lanes.  The
lane roll wraps across image boundaries, but every wrapped position
has an out-of-image (h, w) and is masked to zero, so the wrap is
harmless; a 3-D (bC, NG, npix) variant hit Mosaic's unimplemented
sublane-broadcast relayout.

Scope: 2-D convs with stride 1, dilation 1, and output dims equal to
input dims (the SAME-family the reference benches its conv kernels
at, /root/reference/src/blocksparse_conv_op.cc:261); the caller falls
back to the XLA tap-slice build otherwise.

Row order matches ops/conv.py:_build_bsmm's tiled layout: row
(cb*trs + tap)*bC + ci; columns (n, pix).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blocksparse_tpu.kernels.common import use_interpret


def _tap_shifts(H, W, R, S, pt, pl_):
    """Lane shift and (dh, dw) per tap: out pix (h, w) reads in pix
    (h + dh, w + dw) with dh = r - pt, dw = s - pl."""
    return [((r - pt) * W + (s - pl_), r - pt, s - pl_)
            for r in range(R) for s in range(S)]


def _masks(shape, H, W, npix):
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1) % npix
    return lane // W, lane % W


def _im2col_kernel(H, W, R, S, pt, pl_, bC, x_ref, out_ref):
    npix = H * W
    x = x_ref[...]                                   # (bC, NG*npix)
    hh, ww = _masks(x.shape, H, W, npix)
    for t, (delta, dh, dw) in enumerate(_tap_shifts(H, W, R, S, pt, pl_)):
        v = jnp.roll(x, -delta, axis=1) if delta else x
        m = (hh + dh >= 0) & (hh + dh < H) & (ww + dw >= 0) & (ww + dw < W)
        out_ref[pl.ds(t * bC, bC), :] = jnp.where(m, v, jnp.zeros_like(v))


def _col2im_kernel(H, W, R, S, pt, pl_, bC, dx_ref, out_ref):
    npix = H * W
    hh, ww = _masks((bC, dx_ref.shape[1]), H, W, npix)
    acc = jnp.zeros((bC, dx_ref.shape[1]), jnp.float32)
    for t, (delta, dh, dw) in enumerate(_tap_shifts(H, W, R, S, pt, pl_)):
        g = dx_ref[pl.ds(t * bC, bC), :]
        m = (hh + dh >= 0) & (hh + dh < H) & (ww + dw >= 0) & (ww + dw < W)
        g = jnp.where(m, g, jnp.zeros_like(g)).astype(jnp.float32)
        acc = acc + (jnp.roll(g, delta, axis=1) if delta else g)
    out_ref[...] = acc.astype(out_ref.dtype)


def im2col_supported(TRS, DHW, MPQ, strides, dilates, padding, C, bC,
                     npix_align=128):
    T, R, S = TRS
    return (T == 1 and list(strides) == [1, 1, 1]
            and list(dilates) == [1, 1, 1]
            and list(MPQ)[1:] == list(DHW)[1:] and MPQ[0] == 1
            and padding[0] == 0 and 0 <= padding[1] < R
            and 0 <= padding[2] < S and C % bC == 0
            and (DHW[1] * DHW[2]) % npix_align == 0)


def _pick_ng(N, npix, bC, trs, itemsize):
    """Images per grid step: biggest divisor of N whose (trs+1) tile
    working set stays within ~6 MB of VMEM."""
    budget = 6 * 1024 * 1024
    ng = N
    while ng > 1 and (trs + 1) * bC * ng * npix * itemsize > budget:
        ng -= 1
        while ng > 1 and N % ng:
            ng -= 1
    return max(1, ng)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def im2col(xc, H, W, R, S, pt, pl_, bC):
    """xc (C, N*npix) channel-major -> (C*R*S, N*npix) with row order
    (cb, tap, ci)."""
    return _im2col_fwd_impl(xc, H, W, R, S, pt, pl_, bC)


def _im2col_fwd_impl(xc, H, W, R, S, pt, pl_, bC):
    C, NP = xc.shape
    npix = H * W
    N = NP // npix
    trs = R * S
    NG = _pick_ng(N, npix, bC, trs, xc.dtype.itemsize)
    fn = pl.pallas_call(
        functools.partial(_im2col_kernel, H, W, R, S, pt, pl_, bC),
        grid=(C // bC, N // NG),
        in_specs=[pl.BlockSpec((bC, NG * npix), lambda c, n: (c, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((trs * bC, NG * npix), lambda c, n: (c, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C * trs, NP), xc.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=(trs + 1) * xc.size * xc.dtype.itemsize),
        interpret=use_interpret(),
    )
    return fn(xc)


def col2im(dX, H, W, R, S, pt, pl_, bC):
    Ctrs, NP = dX.shape
    npix = H * W
    trs = R * S
    C = Ctrs // trs
    N = NP // npix
    NG = _pick_ng(N, npix, bC, trs, dX.dtype.itemsize)
    fn = pl.pallas_call(
        functools.partial(_col2im_kernel, H, W, R, S, pt, pl_, bC),
        grid=(C // bC, N // NG),
        in_specs=[pl.BlockSpec((trs * bC, NG * npix), lambda c, n: (c, n),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bC, NG * npix), lambda c, n: (c, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, NP), dX.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, transcendentals=0,
            bytes_accessed=(trs + 1) * C * NP * dX.dtype.itemsize),
        interpret=use_interpret(),
    )
    return fn(dX)


def _im2col_vjp_fwd(xc, H, W, R, S, pt, pl_, bC):
    return _im2col_fwd_impl(xc, H, W, R, S, pt, pl_, bC), None


def _im2col_vjp_bwd(H, W, R, S, pt, pl_, bC, _res, dX):
    return (col2im(dX, H, W, R, S, pt, pl_, bC),)


im2col.defvjp(_im2col_vjp_fwd, _im2col_vjp_bwd)
