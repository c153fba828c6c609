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


# ------------------------------------------------------------------
# Resident-x variants.  When the full (C, TN) activation stripe fits in
# VMEM, keep it resident across all schedule steps: the only per-step DMA
# is the (contract, bsize) weight panel, so steps are no longer
# DMA-latency bound.  This is the speed-of-light path for the canonical
# 4096^2 configs (x stripe 1-8 MB).
# ------------------------------------------------------------------

VMEM_RESIDENT_BUDGET = 6 * 1024 * 1024


def choose_contract_blocks(bsize: int, entries_per_row, max_contract=512,
                           max_waste=0.15) -> int:
    """Pick G (blocks packed per step) balancing MXU depth vs padding waste.

    Mirrors the role of the reference's column segmenting heuristic
    (matmul.py:94-105): big fused steps amortize control/DMA overhead, but
    padding each row to a multiple of G wastes FLOPs at low row degree.
    """
    total = sum(max(1, len(r)) for r in entries_per_row)
    best = max(1, CONTRACT // bsize)
    for contract in (max_contract, 256, 128):
        if contract < bsize:
            continue
        G = max(1, contract // bsize)
        padded = sum(max(1, -(-len(r) // G)) * G for r in entries_per_row)
        waste = (padded - total) / padded
        if waste <= max_waste:
            return G
    return best


def _xprop_resident_kernel(G, bsize, trans_w, precision, out_idx_ref,
                           in_idx_ref, x_ref, w_ref, out_ref):
    s = pl.program_id(1)
    prev = out_idx_ref[jnp.maximum(s - 1, 0)]
    is_first = jnp.logical_or(s == 0, out_idx_ref[s] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xcat = jnp.concatenate(
        [x_ref[pl.ds(in_idx_ref[s, i] * bsize, bsize), :] for i in range(G)],
        axis=0)                                                # (G*b, TN)
    wcat = w_ref[0]
    dims = (((1,), (0,)), ((), ())) if trans_w else (((0,), (0,)), ((), ()))
    out_ref[...] += jax.lax.dot_general(
        wcat, xcat, dims, preferred_element_type=jnp.float32,
        precision=precision)


def xprop_pallas_resident(x, w, sched: XpropSchedule, bsize: int,
                          trans_w: bool, out_blocks: int,
                          tile_n: int | None = None, precision=None):
    G = sched.G
    C, N = x.shape
    TN = tile_n or pick_tile(N)
    assert N % TN == 0, (N, TN)
    S = sched.num_steps
    prec = dot_precision(x.dtype, precision)

    w_sched = gather_w_sched(w, sched, trans_w)

    in_specs = [
        pl.BlockSpec((C, TN), lambda n, s, oi, ii: (0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + w_sched.shape[1:],
                     lambda n, s, oi, ii: (s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((bsize, TN), lambda n, s, oi, ii: (oi[s], n),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // TN, S),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    flops = 2 * S * N * bsize * bsize * G
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=x.size * x.dtype.itemsize
        + (N // TN) * w_sched.size * w_sched.dtype.itemsize
        + out_blocks * bsize * N * 4,
        transcendentals=0,
    )
    fn = pl.pallas_call(
        functools.partial(_xprop_resident_kernel, G, bsize, trans_w, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_blocks * bsize, N), jnp.float32),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    return fn(jnp.asarray(sched.out_idx), jnp.asarray(sched.in_idx),
              x, w_sched)


def resident_fits(C, N, itemsize, tile_n=None,
                  budget=VMEM_RESIDENT_BUDGET) -> bool:
    TN = tile_n or pick_tile(N)
    return C * TN * itemsize <= budget


# ------------------------------------------------------------------
# Packed updat: steps of G entries sharing one input block-row cb,
# emitting a (b, G*b) panel of dw blocks per step (full output lanes).
# Result is unpacked to (blocks, b, b) with one gather.
# ------------------------------------------------------------------

@dataclass
class UpdatSchedule:
    cb: np.ndarray        # (S,) shared input block-row per step
    kb: np.ndarray        # (S, G) dy block-rows per slot
    perm: np.ndarray      # (blocks,) flat (step*G + slot) position per block id
    G: int

    @property
    def num_steps(self):
        return self.cb.shape[0]


def build_updat_schedule(updat_list, G: int) -> UpdatSchedule:
    blocks = len(updat_list)
    by_cb = {}
    for w, (c, k) in enumerate(updat_list):
        by_cb.setdefault(c, []).append((k, w))
    cb_arr, kb_arr = [], []
    perm = np.zeros(blocks, np.int64)
    step = 0
    for c in sorted(by_cb):
        ents = sorted(by_cb[c])
        for s0 in range(0, len(ents), G):
            chunk = ents[s0:s0 + G]
            cb_arr.append(c)
            row_k = []
            for i in range(G):
                if i < len(chunk):
                    k, w = chunk[i]
                    row_k.append(k)
                    perm[w] = step * G + i
                else:
                    row_k.append(0)
            kb_arr.append(row_k)
            step += 1
    return UpdatSchedule(
        cb=np.asarray(cb_arr, np.int32),
        kb=np.asarray(kb_arr, np.int32),
        perm=perm.astype(np.int32),
        G=G,
    )


def _updat_packed_kernel(G, bsize, precision, cb_ref, kb_ref, x_ref, dy_ref,
                         out_ref):
    n = pl.program_id(1)
    s = pl.program_id(0)

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xblk = x_ref[pl.ds(cb_ref[s] * bsize, bsize), :]           # (b, TN)
    dycat = jnp.concatenate(
        [dy_ref[pl.ds(kb_ref[s, i] * bsize, bsize), :] for i in range(G)],
        axis=0)                                                # (G*b, TN)
    out_ref[0] += jax.lax.dot_general(
        xblk, dycat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def updat_pallas_packed(x, dy, sched: UpdatSchedule, bsize: int, blocks: int,
                        tile_n: int | None = None, precision=None):
    """x (C, N), dy (K, N) feature-major; returns dw (blocks, b, b) f32."""
    G = sched.G
    C, N = x.shape
    K, _ = dy.shape
    TN = tile_n or pick_tile(N)
    assert N % TN == 0
    S = sched.num_steps
    prec = dot_precision(x.dtype, precision)

    in_specs = [
        pl.BlockSpec((C, TN), lambda s, n, cb, kb: (0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, TN), lambda s, n, cb, kb: (0, n),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, bsize, G * bsize),
                            lambda s, n, cb, kb: (s, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, N // TN),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    cost = pl.CostEstimate(
        flops=2 * S * G * bsize * bsize * N,
        bytes_accessed=x.size * x.dtype.itemsize
        + dy.size * dy.dtype.itemsize + S * bsize * G * bsize * 4,
        transcendentals=0,
    )
    fn = pl.pallas_call(
        functools.partial(_updat_packed_kernel, G, bsize, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, bsize, G * bsize), jnp.float32),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    packed = fn(jnp.asarray(sched.cb),
                jnp.asarray(sched.kb.reshape(sched.groups, -1)), x, dy)
    flat = packed.reshape(S, bsize, G, bsize).transpose(0, 2, 1, 3) \
                 .reshape(S * G, bsize, bsize)
    return flat[jnp.asarray(sched.perm)]


# ------------------------------------------------------------------
# Grouped kernels (the fast path).  One grid step = R output block-rows
# with their ENTIRE reduction unrolled in-kernel:
#   * x stripe (C, TN) resident in VMEM across all groups,
#   * the group's whole weight panel fetched as ONE BlockSpec block
#     (Mosaic double-buffers it against the previous group's compute),
#   * CH unrolled chunk-dots of (G*b contraction) each.
# Grid steps are few and fat, so the ~us fixed cost per step vanishes.
# Padding chunks carry zeroed weights and are numerically inert.
# ------------------------------------------------------------------

@dataclass
class GroupedSchedule:
    rows: np.ndarray      # (groups, CH) local out-row (0..R-1) per chunk
    in_idx: np.ndarray    # (groups, CH, G) input block-rows per slot
    w_idx: np.ndarray     # (groups, CH, G) weight block ids
    w_valid: np.ndarray   # (groups, CH, G)
    n_out_blocks: int
    R: int
    G: int

    @property
    def groups(self):
        return self.rows.shape[0]

    @property
    def CH(self):
        return self.rows.shape[1]


NATIVE_MIN_NNZ = 20000  # below this the Python builders are fine


def build_grouped_schedule(entries_per_row, n_out_blocks: int, G: int,
                           R: int, flat=None) -> GroupedSchedule:
    """flat: optional (in_blk, w_id, row_of) arrays (entries sorted by
    row) enabling the native C++ builder for large layouts."""
    if flat is not None and flat[0].shape[0] >= NATIVE_MIN_NNZ:
        from blocksparse_tpu import native
        out = native.grouped_schedule(flat[2], flat[0], flat[1],
                                      n_out_blocks, G, R)
        if out is not None:
            rows, in_idx, w_idx, w_valid = out
            return GroupedSchedule(rows=rows, in_idx=in_idx, w_idx=w_idx,
                                   w_valid=w_valid,
                                   n_out_blocks=n_out_blocks, R=R, G=G)
    groups = -(-n_out_blocks // R)
    per_group = []
    for g in range(groups):
        chunks = []
        for r in range(R):
            row = g * R + r
            if row >= n_out_blocks:
                break  # out-of-range rows in the last group emit nothing
            ents = entries_per_row[row]
            # every in-range row emits >=1 chunk (empty rows stay zeroed
            # by the kernel's accumulator init)
            nch = max(1, -(-len(ents) // G))
            for s in range(nch):
                chunk = ents[s * G:(s + 1) * G]
                ii = [chunk[i][0] if i < len(chunk) else 0 for i in range(G)]
                wi = [chunk[i][1] if i < len(chunk) else 0 for i in range(G)]
                wv = [1 if i < len(chunk) else 0 for i in range(G)]
                chunks.append((r, ii, wi, wv))
        per_group.append(chunks)
    CH = max(len(c) for c in per_group)
    rows = np.zeros((groups, CH), np.int32)
    in_idx = np.zeros((groups, CH, G), np.int32)
    w_idx = np.zeros((groups, CH, G), np.int32)
    w_valid = np.zeros((groups, CH, G), np.int32)
    for g, chunks in enumerate(per_group):
        for j, (r, ii, wi, wv) in enumerate(chunks):
            rows[g, j] = r
            in_idx[g, j] = ii
            w_idx[g, j] = wi
            w_valid[g, j] = wv
        # padding chunks: row 0, all-invalid weights (zeroed -> add nothing)
    return GroupedSchedule(rows=rows, in_idx=in_idx, w_idx=w_idx,
                           w_valid=w_valid, n_out_blocks=n_out_blocks,
                           R=R, G=G)


def default_rows_per_group(bsize: int, n_out_blocks: int,
                           avg_entries: float = 8.0,
                           panel_budget: int = 1536 * 1024) -> int:
    """Aim for a 256-row output tile, but cap the per-group weight panel
    (double-buffered in VMEM) at ``panel_budget`` bytes."""
    R = min(max(1, 256 // bsize), n_out_blocks)
    while R > 1 and R * avg_entries * bsize * bsize * 4 > panel_budget:
        R //= 2
    return R


def grouped_vmem_estimate(C, TN, itemsize, sched: GroupedSchedule, bsize,
                          out_itemsize=4):
    panel = sched.CH * sched.G * bsize * bsize * itemsize
    out_tile = sched.R * bsize * TN
    return (2 * C * TN * itemsize          # x block (conservatively x2)
            + 2 * panel                    # double-buffered panels
            + out_tile * (out_itemsize + 4)  # out block + f32 scratch
            + sched.G * bsize * TN * itemsize)  # xcat temporaries


def _gather_w_grouped(w, sched: GroupedSchedule, trans_w: bool):
    S = sched.groups * sched.CH
    pseudo = XpropSchedule(
        out_idx=np.zeros(S, np.int32),
        in_idx=sched.in_idx.reshape(S, sched.G),
        w_idx=sched.w_idx.reshape(S, sched.G),
        w_valid=sched.w_valid.reshape(S, sched.G),
        n_out_blocks=sched.n_out_blocks, G=sched.G)
    b = w.shape[1]
    panels = gather_w_sched(w, pseudo, trans_w)   # (S, Gb, b) or (S, b, Gb)
    if trans_w:
        return panels.reshape(sched.groups, sched.CH * b, sched.G * b)
    return panels.reshape(sched.groups, sched.CH * sched.G * b, b)


UNROLL_MAX_CH = 16  # above this, loop in-kernel to bound compile time


def _xprop_grouped_kernel(CH, G, R, bsize, trans_w, precision,
                          rows_ref, idx_ref, x_ref, w_ref, out_ref, acc_ref):
    # idx_ref is (groups, CH*G): SMEM scalar arrays are lane-padded to
    # 128, so a small minor dim would inflate 128/G x.
    g = pl.program_id(1)
    Gb = G * bsize
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def chunk(j):
        xcat = jnp.concatenate(
            [x_ref[pl.ds(idx_ref[g, j * G + i] * bsize, bsize), :]
             for i in range(G)], axis=0)                       # (Gb, TN)
        if trans_w:
            wch = w_ref[0, pl.ds(j * bsize, bsize), :]         # (b, Gb)
            acc = jax.lax.dot_general(
                wch, xcat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        else:
            wch = w_ref[0, pl.ds(j * Gb, Gb), :]               # (Gb, b)
            acc = jax.lax.dot_general(
                wch, xcat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        off = rows_ref[g, j] * bsize
        acc_ref[pl.ds(off, bsize), :] += acc

    if CH <= UNROLL_MAX_CH:
        for j in range(CH):
            chunk(j)
    else:
        def body(j, carry):
            chunk(j)
            return carry
        jax.lax.fori_loop(0, CH, body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def xprop_pallas_grouped(x, w, sched: GroupedSchedule, bsize: int,
                         trans_w: bool, tile_n: int | None = None,
                         precision=None, out_dtype=None):
    w_panels = _gather_w_grouped(w, sched, trans_w)
    return xprop_pallas_grouped_panels(
        x, w_panels, sched, bsize, trans_w, tile_n=tile_n,
        precision=precision, out_dtype=out_dtype)


# ---- grouped updat: grid step = one cb-group, CH chunks of G dw blocks ---

@dataclass
class UpdatGroupedSchedule:
    cb: np.ndarray       # (groups, CH) input block-row per chunk
    kb: np.ndarray       # (groups, CH, G) dy block-rows
    valid: np.ndarray    # (groups, CH, G)
    perm: np.ndarray     # (blocks,) flat (g*CH*G + j*G + i) position
    G: int

    @property
    def groups(self):
        return self.cb.shape[0]

    @property
    def CH(self):
        return self.cb.shape[1]


def build_updat_grouped_schedule(updat_list, G: int,
                                 chunks_per_group: int = 16) -> UpdatGroupedSchedule:
    blocks = len(updat_list)
    by_cb = {}
    for wid, (c, k) in enumerate(updat_list):
        by_cb.setdefault(c, []).append((k, wid))
    # flat chunk list, then fold into groups of chunks_per_group
    flat = []
    for c in sorted(by_cb):
        ents = sorted(by_cb[c])
        for s0 in range(0, len(ents), G):
            flat.append((c, ents[s0:s0 + G]))
    CH = chunks_per_group
    groups = -(-len(flat) // CH)
    cb = np.zeros((groups, CH), np.int32)
    kb = np.zeros((groups, CH, G), np.int32)
    valid = np.zeros((groups, CH, G), np.int32)
    perm = np.zeros(blocks, np.int64)
    for p, (c, chunk) in enumerate(flat):
        g, j = divmod(p, CH)
        cb[g, j] = c
        for i, (k, wid) in enumerate(chunk):
            kb[g, j, i] = k
            valid[g, j, i] = 1
            perm[wid] = (g * CH + j) * G + i
    return UpdatGroupedSchedule(cb=cb, kb=kb, valid=valid,
                                perm=perm.astype(np.int32), G=G)


def _updat_grouped_kernel(CH, G, bsize, precision, cb_ref, kb_ref,
                          x_ref, dy_ref, out_ref):
    g = pl.program_id(0)
    n = pl.program_id(1)
    Gb = G * bsize

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def chunk(j):
        xblk = x_ref[pl.ds(cb_ref[g, j] * bsize, bsize), :]    # (b, TN)
        dycat = jnp.concatenate(
            [dy_ref[pl.ds(kb_ref[g, j * G + i] * bsize, bsize), :]
             for i in range(G)], axis=0)                       # (Gb, TN)
        out_ref[0, pl.ds(j * bsize, bsize), :] += jax.lax.dot_general(
            xblk, dycat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    if CH <= UNROLL_MAX_CH:
        for j in range(CH):
            chunk(j)
    else:
        def body(j, carry):
            chunk(j)
            return carry
        jax.lax.fori_loop(0, CH, body, 0)


def updat_pallas_grouped(x, dy, sched: UpdatGroupedSchedule, bsize: int,
                         blocks: int, tile_n: int | None = None,
                         precision=None):
    """x (C, N), dy (K, N); returns dw (blocks, b, b) f32."""
    G, CH = sched.G, sched.CH
    groups = sched.groups
    C, N = x.shape
    K, _ = dy.shape
    TN = tile_n or pick_tile(N)
    assert N % TN == 0
    prec = dot_precision(x.dtype, precision)

    in_specs = [
        pl.BlockSpec((C, TN), lambda g, n, cb, kb: (0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, TN), lambda g, n, cb, kb: (0, n),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, CH * bsize, G * bsize),
                            lambda g, n, cb, kb: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(groups, N // TN),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    cost = pl.CostEstimate(
        flops=2 * groups * CH * G * bsize * bsize * N,
        bytes_accessed=x.size * x.dtype.itemsize
        + dy.size * dy.dtype.itemsize + groups * CH * bsize * G * bsize * 4,
        transcendentals=0,
    )
    fn = pl.pallas_call(
        functools.partial(_updat_grouped_kernel, CH, G, bsize, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups, CH * bsize, G * bsize),
                                       jnp.float32),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    packed = fn(jnp.asarray(sched.cb),
                jnp.asarray(sched.kb.reshape(sched.groups, -1)), x, dy)
    flat = packed.reshape(groups * CH, bsize, G, bsize).transpose(0, 2, 1, 3) \
                 .reshape(groups * CH * G, bsize, bsize)
    if getattr(sched, "pad_zero", False):
        flat = jnp.concatenate(
            [flat, jnp.zeros((1, bsize, bsize), flat.dtype)], axis=0)
    return flat[jnp.asarray(sched.perm)]


# ------------------------------------------------------------------
# Packed-weight support: weights stored in fprop grouped-schedule order
# (padding blocks included as zeros).  The fprop panel view is then a
# free reshape — no per-call gather, saving ~3 W-sized HBM passes per
# fprop on bandwidth-bound parts.
# ------------------------------------------------------------------

def packed_len(sched: GroupedSchedule) -> int:
    return sched.groups * sched.CH * sched.G


def packed_positions(sched: GroupedSchedule, blocks: int) -> np.ndarray:
    """pos[w_id] = flat slot of canonical block id in the packed layout."""
    pos = np.full(blocks, -1, np.int64)
    G = sched.G
    flat_w = sched.w_idx.reshape(-1)
    flat_v = sched.w_valid.reshape(-1)
    for p in range(flat_w.shape[0]):
        if flat_v[p]:
            pos[flat_w[p]] = p
    assert (pos >= 0).all()
    return pos.astype(np.int32)


def fprop_panels_from_packed(w_packed, sched: GroupedSchedule):
    """(packed_blocks, b, b) -> (groups, CH*G*b, b), zero copies."""
    b = w_packed.shape[1]
    return w_packed.reshape(sched.groups, sched.CH * sched.G * b, b)


def xprop_pallas_grouped_panels(x, w_panels, sched: GroupedSchedule,
                                bsize: int, trans_w: bool,
                                tile_n: int | None = None, precision=None,
                                out_dtype=None):
    """Same as xprop_pallas_grouped but takes pre-built weight panels."""
    C, N = x.shape
    TN = tile_n or pick_tile(N)
    assert N % TN == 0
    prec = dot_precision(x.dtype, precision)
    R, G, CH = sched.R, sched.G, sched.CH
    groups = sched.groups
    out_rows_padded = groups * R
    out_dtype = out_dtype or x.dtype

    in_specs = [
        pl.BlockSpec((C, TN), lambda n, g, rr, ii: (0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + w_panels.shape[1:],
                     lambda n, g, rr, ii: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((R * bsize, TN), lambda n, g, rr, ii: (g, n),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * groups * CH * G * bsize * bsize * N,
        bytes_accessed=x.size * x.dtype.itemsize
        + (N // TN) * w_panels.size * w_panels.dtype.itemsize
        + out_rows_padded * bsize * N * 4,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // TN, groups),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((R * bsize, TN), jnp.float32)],
    )
    kernel = _xprop_grouped_contig_kernel \
        if getattr(sched, "contiguous", False) else _xprop_grouped_kernel
    fn = pl.pallas_call(
        functools.partial(kernel, CH, G, R, bsize, trans_w, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows_padded * bsize, N),
                                       out_dtype),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    out = fn(jnp.asarray(sched.rows),
             jnp.asarray(sched.in_idx.reshape(sched.groups, -1)),
             x, w_panels)
    if out_rows_padded != sched.n_out_blocks:
        out = out[:sched.n_out_blocks * bsize]
    return out


# ------------------------------------------------------------------
# Supertile schedules: each chunk covers V = 128/bsize CONSECUTIVE input
# block-rows (absent blocks carry zero weights), so the kernel loads one
# contiguous (128, TN) x-slice per chunk — no per-slot gather or VPU
# concat.  Wins whenever the layout has input-side locality (banded,
# local, small-world, dense-ish); the padding FLOPs are free on the MXU
# when the kernel is bandwidth-bound.  `supertile_inflation` estimates
# the weight-traffic blowup for auto-selection.
# ------------------------------------------------------------------

def supertile_rows(entries_per_row, bsize):
    """Rewrite per-row entry lists onto the supertile grid.

    Returns (new_rows, inflation): new_rows[r] = list over present
    supertiles of (first_in_blk, [slot -> w_id or -1])."""
    V = max(1, CONTRACT // bsize)
    total = 0
    kept = 0
    new_rows = []
    for ents in entries_per_row:
        by_st = {}
        for (cb, w) in ents:
            by_st.setdefault(cb // V, {})[cb % V] = w
        row = []
        for st in sorted(by_st):
            slots = [by_st[st].get(i, -1) for i in range(V)]
            row.append((st * V, slots))
            total += V
        kept += len(ents)
        new_rows.append(row)
    inflation = total / max(kept, 1)
    return new_rows, inflation


def build_supertile_schedule(entries_per_row, n_out_blocks, bsize, R,
                             flat=None):
    """GroupedSchedule where every chunk is one contiguous supertile."""
    V = max(1, CONTRACT // bsize)
    if flat is not None and flat[0].shape[0] >= NATIVE_MIN_NNZ:
        from blocksparse_tpu import native
        out = native.supertile_schedule(flat[2], flat[0], flat[1],
                                        n_out_blocks, V, R)
        if out is not None:
            rows, in_idx, w_idx, w_valid, padded = out
            sched = GroupedSchedule(rows=rows, in_idx=in_idx, w_idx=w_idx,
                                    w_valid=w_valid,
                                    n_out_blocks=n_out_blocks, R=R, G=V)
            sched.contiguous = True
            inflation = padded / max(flat[0].shape[0], 1)
            return sched, inflation
    st_rows, inflation = supertile_rows(entries_per_row, bsize)
    groups = -(-n_out_blocks // R)
    per_group = []
    for g in range(groups):
        chunks = []
        for r in range(R):
            row = g * R + r
            if row >= n_out_blocks:
                break
            tiles = st_rows[row]
            if not tiles:
                tiles = [(0, [-1] * V)]
            for (start, slots) in tiles:
                chunks.append((r, start, slots))
        per_group.append(chunks)
    CH = max(len(c) for c in per_group)
    rows = np.zeros((groups, CH), np.int32)
    in_idx = np.zeros((groups, CH, V), np.int32)
    w_idx = np.zeros((groups, CH, V), np.int32)
    w_valid = np.zeros((groups, CH, V), np.int32)
    for g, chunks in enumerate(per_group):
        for j, (r, start, slots) in enumerate(chunks):
            rows[g, j] = r
            in_idx[g, j] = [start + i for i in range(V)]
            for i, w in enumerate(slots):
                if w >= 0:
                    w_idx[g, j, i] = w
                    w_valid[g, j, i] = 1
    sched = GroupedSchedule(rows=rows, in_idx=in_idx, w_idx=w_idx,
                            w_valid=w_valid, n_out_blocks=n_out_blocks,
                            R=R, G=V)
    sched.contiguous = True
    return sched, inflation


def _xprop_grouped_contig_kernel(CH, G, R, bsize, trans_w, precision,
                                 rows_ref, idx_ref, x_ref, w_ref, out_ref,
                                 acc_ref):
    g = pl.program_id(1)
    Gb = G * bsize
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def chunk(j):
        xs = x_ref[pl.ds(idx_ref[g, j * G] * bsize, Gb), :]    # (Gb, TN)
        if trans_w:
            wch = w_ref[0, pl.ds(j * bsize, bsize), :]         # (b, Gb)
            acc = jax.lax.dot_general(
                wch, xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        else:
            wch = w_ref[0, pl.ds(j * Gb, Gb), :]               # (Gb, b)
            acc = jax.lax.dot_general(
                wch, xs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        off = rows_ref[g, j] * bsize
        acc_ref[pl.ds(off, bsize), :] += acc

    if CH <= UNROLL_MAX_CH:
        for j in range(CH):
            chunk(j)
    else:
        def body(j, carry):
            chunk(j)
            return carry
        jax.lax.fori_loop(0, CH, body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)
