"""Block-sparse matmul Pallas kernels.

TPU-native replacement for the reference's bsmm kernel zoo
(/root/reference/src/blocksparse_matmul_op_gpu.cu,
 /root/reference/src/blocksparse_hgemm_cn_64_op_gpu.cu,
 /root/reference/src/blocksparse_hgemm_nc_op_gpu.cu and the SASS
 xgemm_blocksparse_* kernels).

Design (TPU-first, not a translation):

* The host precomputes a *step schedule* from the 0/1 block layout
  (`build_xprop_schedule`).  Each grid step processes ``G = 128 // bsize``
  LUT-consecutive blocks of one output block-row, so the MXU always
  contracts over a full 128-deep gathered stack regardless of block size.
  This replaces the reference's per-block LUT walk + spin-lock
  accumulation (matmul.py:172-270): the TPU grid is sequential per core,
  so revisiting the same output block *is* the accumulator.

* All compute runs feature-major ("CN", feature_axis=0): the output tile
  is (bsize, TN) with the batch dim N on lanes, so output lanes stay full
  for any block size (Mosaic also requires lane-sized minor block dims).
  The NC orientation (feature_axis=1) transposes around these kernels.

* Weights are gathered into schedule order on-device before the kernel
  (one XLA gather; padding slots zeroed).  This keeps the scalar-prefetch
  footprint tiny — Mosaic replicates prefetch arrays per operand in SMEM,
  which capsizes at large layouts if every slot carries its own index
  arrays.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blocksparse_tpu.kernels.common import use_interpret, pick_tile

CONTRACT = 128  # MXU contraction depth we pack blocks up to


def dot_precision(dtype, precision=None):
    """f32 inputs default to exact (6-pass) MXU matmuls for parity with the
    reference's fp32 CUDA path; low-precision inputs run native."""
    if precision is not None:
        return precision
    if dtype in (jnp.float32, np.float32):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


# ------------------------------------------------------------------
# Host-side scheduling
# ------------------------------------------------------------------

@dataclass
class XpropSchedule:
    """Step schedule for fprop or bprop of one layout direction.

    For each step s (grid dim), slot i in [0, G):
      out_idx[s]      output block-row
      in_idx[s, i]    input block-row gathered into contraction slot i
      w_idx[s, i]     weight block id for slot i
      w_valid[s, i]   0 for padding slots (their weight block is zeroed)
    """
    out_idx: np.ndarray
    in_idx: np.ndarray
    w_idx: np.ndarray
    w_valid: np.ndarray
    n_out_blocks: int
    G: int

    @property
    def num_steps(self):
        return self.out_idx.shape[0]


def build_xprop_schedule(entries_per_row, n_out_blocks: int, G: int) -> XpropSchedule:
    """entries_per_row: list (len n_out_blocks) of lists of (in_blk, w_id)."""
    out_idx, in_idx, w_idx, w_valid = [], [], [], []
    for r in range(n_out_blocks):
        ents = entries_per_row[r]
        nsteps = max(1, -(-len(ents) // G))
        for s in range(nsteps):
            chunk = ents[s * G:(s + 1) * G]
            out_idx.append(r)
            row_in, row_w, row_v = [], [], []
            for i in range(G):
                if i < len(chunk):
                    row_in.append(chunk[i][0])
                    row_w.append(chunk[i][1])
                    row_v.append(1)
                else:
                    row_in.append(0)
                    row_w.append(0)
                    row_v.append(0)
            in_idx.append(row_in)
            w_idx.append(row_w)
            w_valid.append(row_v)
    return XpropSchedule(
        out_idx=np.asarray(out_idx, np.int32),
        in_idx=np.asarray(in_idx, np.int32),
        w_idx=np.asarray(w_idx, np.int32),
        w_valid=np.asarray(w_valid, np.int32),
        n_out_blocks=n_out_blocks,
        G=G,
    )


def gather_w_sched(w, sched: XpropSchedule, trans_w: bool):
    """Reorder weight blocks into schedule order (padding slots zeroed).

    fprop: (S, G*b, b) — vertical stack, contraction on rows.
    bprop: (S, b, G*b) — horizontal stack of the same blocks.
    """
    S, G = sched.w_idx.shape
    b = w.shape[1]
    flat = w[jnp.asarray(sched.w_idx.reshape(-1))]          # (S*G, b, b)
    mask = jnp.asarray(sched.w_valid.reshape(-1, 1, 1), w.dtype)
    flat = flat * mask
    blocks4 = flat.reshape(S, G, b, b)
    if trans_w:
        return blocks4.transpose(0, 2, 1, 3).reshape(S, b, G * b)
    return blocks4.reshape(S, G * b, b)


# ------------------------------------------------------------------
# xprop kernel (fprop and bprop share it; bprop passes trans_w weights)
# ------------------------------------------------------------------

def _xprop_kernel(G, trans_w, precision, *refs):
    # refs: [out_idx, in_idx] + xs(G) + [w_sched, out]
    out_idx_ref, in_idx_ref = refs[:2]
    xs = refs[2:2 + G]
    w_ref = refs[2 + G]
    out_ref = refs[3 + G]

    s = pl.program_id(1)
    prev = out_idx_ref[jnp.maximum(s - 1, 0)]
    is_first = jnp.logical_or(s == 0, out_idx_ref[s] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xcat = jnp.concatenate([x[...] for x in xs], axis=0)       # (G*b, TN)
    wcat = w_ref[0]                                            # (G*b,b)|(b,G*b)
    dims = (((1,), (0,)), ((), ())) if trans_w else (((0,), (0,)), ((), ()))
    out_ref[...] += jax.lax.dot_general(
        wcat, xcat, dims, preferred_element_type=jnp.float32,
        precision=precision)


def xprop_pallas(x, w, sched: XpropSchedule, bsize: int, trans_w: bool,
                 out_blocks: int, tile_n: int | None = None, precision=None):
    """One xprop direction in CN orientation: x (C, N) -> out (K', N) f32."""
    G = sched.G
    C, N = x.shape
    TN = tile_n or pick_tile(N)
    assert N % TN == 0, (N, TN)
    S = sched.num_steps
    grid = (N // TN, S)
    prec = dot_precision(x.dtype, precision)

    w_sched = gather_w_sched(w, sched, trans_w)

    def x_index(slot):
        return lambda n, s, oi, ii, slot=slot: (ii[s, slot], n)

    in_specs = [
        pl.BlockSpec((bsize, TN), x_index(i), memory_space=pltpu.VMEM)
        for i in range(G)
    ]
    in_specs.append(pl.BlockSpec(
        (1,) + w_sched.shape[1:],
        lambda n, s, oi, ii: (s, 0, 0), memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec(
        (bsize, TN), lambda n, s, oi, ii: (oi[s], n),
        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
    )

    flops = 2 * S * N * bsize * bsize * G
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=x.size * x.dtype.itemsize
        + w_sched.size * w_sched.dtype.itemsize + out_blocks * bsize * N * 4,
        transcendentals=0,
    )

    fn = pl.pallas_call(
        functools.partial(_xprop_kernel, G, trans_w, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_blocks * bsize, N), jnp.float32),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    return fn(jnp.asarray(sched.out_idx), jnp.asarray(sched.in_idx),
              *([x] * G), w_sched)


# ------------------------------------------------------------------
# updat (dw) kernel — CN orientation
# ------------------------------------------------------------------

def _updat_kernel(precision, cb_ref, kb_ref, x_ref, dy_ref, out_ref):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # x (b, TN), dy (b, TN): dw = x @ dy^T -> contract lanes
    out_ref[0] += jax.lax.dot_general(
        x_ref[...], dy_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def updat_pallas(x, dy, updat_lut: np.ndarray, bsize: int,
                 tile_n: int | None = None, precision=None):
    """dw[e] = x_block(cb_e) · dy_block(kb_e)^T contracted over N (CN)."""
    blocks = updat_lut.shape[0]
    C, N = x.shape
    TN = tile_n or pick_tile(N)
    assert N % TN == 0
    prec = dot_precision(x.dtype, precision)

    x_spec = pl.BlockSpec((bsize, TN), lambda e, n, cb, kb: (cb[e], n),
                          memory_space=pltpu.VMEM)
    dy_spec = pl.BlockSpec((bsize, TN), lambda e, n, cb, kb: (kb[e], n),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, bsize, bsize), lambda e, n, cb, kb: (e, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(blocks, N // TN),
        in_specs=[x_spec, dy_spec],
        out_specs=out_spec,
    )
    cost = pl.CostEstimate(
        flops=2 * blocks * bsize * bsize * N,
        bytes_accessed=x.size * x.dtype.itemsize
        + dy.size * dy.dtype.itemsize + blocks * bsize * bsize * 4,
        transcendentals=0,
    )
    fn = pl.pallas_call(
        functools.partial(_updat_kernel, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((blocks, bsize, bsize), jnp.float32),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    return fn(jnp.asarray(updat_lut[:, 0]), jnp.asarray(updat_lut[:, 1]), x, dy)


# ------------------------------------------------------------------
# Pure-XLA reference implementations (gather + segment-sum).  Used as
# the CPU fallback and as an independent correctness oracle for the
# Pallas kernels.  Entries must be sorted by output block.
# ------------------------------------------------------------------

def xprop_xla(x, w, in_blk, w_blk, out_blk, n_out_blocks, bsize, axis, trans_w,
              out_dtype=None, precision=None):
    """in_blk/w_blk/out_blk: (nnz,) int arrays, sorted by out_blk."""
    out_dtype = out_dtype or x.dtype
    f32 = jnp.float32
    prec = dot_precision(x.dtype, precision)
    if axis == 0:
        C, N = x.shape
        xb = x.reshape(C // bsize, bsize, N)
        xg = xb[in_blk]                       # (nnz, b, N)
        wg = w[w_blk]                         # (nnz, b, b)
        if trans_w:
            prod = jnp.einsum("ekn,eck->ecn", xg.astype(f32), wg.astype(f32),
                              precision=prec)
        else:
            prod = jnp.einsum("ecn,eck->ekn", xg.astype(f32), wg.astype(f32),
                              precision=prec)
        out = jax.ops.segment_sum(prod, out_blk, num_segments=n_out_blocks,
                                  indices_are_sorted=True)
        return out.reshape(n_out_blocks * bsize, N).astype(out_dtype)
    else:
        N, C = x.shape
        xb = x.reshape(N, C // bsize, bsize)
        xg = xb[:, in_blk]                    # (N, nnz, b)
        wg = w[w_blk]
        if trans_w:
            prod = jnp.einsum("nek,eck->nec", xg.astype(f32), wg.astype(f32),
                              precision=prec)
        else:
            prod = jnp.einsum("nec,eck->nek", xg.astype(f32), wg.astype(f32),
                              precision=prec)
        out = jax.ops.segment_sum(prod.swapaxes(0, 1), out_blk,
                                  num_segments=n_out_blocks,
                                  indices_are_sorted=True)
        return out.swapaxes(0, 1).reshape(N, n_out_blocks * bsize).astype(out_dtype)


def updat_xla(x, dy, updat_lut, bsize, axis, precision=None):
    f32 = jnp.float32
    prec = dot_precision(x.dtype, precision)
    cb = jnp.asarray(updat_lut[:, 0])
    kb = jnp.asarray(updat_lut[:, 1])
    if axis == 0:
        C, N = x.shape
        xb = x.reshape(C // bsize, bsize, N)[cb]
        yb = dy.reshape(-1, bsize, N)[kb]
        return jnp.einsum("ecn,ekn->eck", xb.astype(f32), yb.astype(f32),
                          precision=prec)
    else:
        N, C = x.shape
        xb = x.reshape(N, C // bsize, bsize)[:, cb]
        yb = dy.reshape(N, -1, bsize)[:, kb]
        return jnp.einsum("nec,nek->eck", xb.astype(f32), yb.astype(f32),
                          precision=prec)
