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
# Dense-tile schedules: fill ALL 128 MXU output lanes for bsize < 128.
#
# A single MXU pass computes a (128, Gb) x (Gb, TN) product.  Arranged as
# R = 128/bsize output block-rows times G = 128/bsize input block-columns,
# that one pass covers an (R x G) *rectangle* of layout cells: cell (r, i)
# holds the weight block connecting input column i to output row r, or
# zeros when the layout has no block there.  The host groups R consecutive
# output block-rows, takes the union of their input columns, and tiles the
# union into G-column chunks; every chunk is one full-width MXU pass that
# advances all R rows at once.
#
# Effective MXU utilization = nnz / (R * |union|): ~1.0 for layouts with
# row locality (banded, local, strided) and density/(1-(1-density)^R) for
# random layouts — always >= the per-row grouped kernel's bsize/128, which
# this mode supersedes for fine blocks (the reference gets the same
# effect for free from 8x8..32x32 GPU tensor-core tiles; the 128x128 MXU
# needs the rectangle packing).  Replaces the per-block LUT walk of
# /root/reference/src/blocksparse_matmul_op_gpu.cu at full lane occupancy.
# ------------------------------------------------------------------

@dataclass
class DenseTileSchedule:
    """Flat chunk schedule: chunk s belongs to output group grp[s] (R
    output block-rows); consecutive chunks of one group accumulate into
    the same (128, TN) out tile (the sequential grid is the accumulator).
    slot[s, i] names the input block gathered into contraction lane band
    i — per-slot BlockSpec DMA, so the batch tile TN is not capped by
    whole-x VMEM residency (big TN amortizes MXU weight-tile loads;
    measured 1.8x over the resident-x variant on v5e at 8192^2/d0.25).

    ``perm`` (optional) is a row permutation from union-minimizing
    clustering (`cluster_rows`): groups take R *consecutive rows of
    perm*, the kernel writes tiles in perm order, and the wrapper
    gathers rows back to canonical order (one cheap XLA take)."""
    grp: np.ndarray       # (S,) output group per chunk (sorted)
    last: np.ndarray      # (S,) 1 on the group's final chunk
    slot: np.ndarray      # (S, G) input block-row per contraction slot
    wpos: np.ndarray      # (S, R, G) block id, or `blocks` (zero cell)
    n_out_blocks: int
    R: int
    G: int
    blocks: int           # sentinel id for the appended zero block
    perm: np.ndarray | None = None   # (n_out_blocks,) row at each position
    # pass-quantized width ladder (generalizes the round-3 two-width
    # tails): a group's final chunk runs a (M, wcls[s]*128) dot — its
    # contraction depth quantized to MXU passes — instead of padding to
    # the full G slots.  The single static tail width Gt billed every
    # small-union group the LARGEST remainder; per-chunk classes bill
    # each group its own pass-quantized depth (critical for phased
    # schedules, whose residual phases are full of small unions).
    # Narrow chunks' unused slot lanes repeat the previous chunk's
    # index so Mosaic's revisit logic skips their DMA.
    wcls: np.ndarray | None = None   # (S,) chunk MXU pass count (1..P)
    # Phased (flexible-cover) schedules: groups are arbitrary row-sets
    # that may revisit a row across phases; rows_at[g, r] is the
    # canonical output block-row of group g's lane band r (-1: padding).
    # The wrapper segment-sums group tiles into canonical rows instead
    # of permuting (build_dense_tile_schedule_phased).
    rows_at: np.ndarray | None = None   # (groups, R) canonical row or -1

    @property
    def groups(self):
        if self.rows_at is not None:
            return self.rows_at.shape[0]
        return -(-self.n_out_blocks // self.R)

    @property
    def num_chunks(self):
        return self.grp.shape[0]

    def mxu_passes(self, bsize: int):
        """128-deep MXU pass-equivalents (chunks x ceil(depth/128) x
        ceil(out_rows/128) — tall output tiles at R*bsize > 128 bill
        one pass per 128-row band)."""
        full = -(-(self.G * bsize) // CONTRACT)
        rows = max(1, (self.R * bsize) // CONTRACT)
        if self.wcls is None:
            return self.num_chunks * full * rows
        return int(np.minimum(self.wcls, full).sum()) * rows


def cluster_rows(entries_per_row, R: int) -> np.ndarray:
    """Greedy union-minimizing grouping of output block-rows.

    Returns a permutation: consecutive R entries form one dense-tile
    group.  Each group's MXU/DMA cost is its column-support *union*, so
    packing rows with shared support raises fill.  Greedy seed-by-degree
    + min-union-growth; measured 8-12% union reduction on random
    layouts at d=0.07-0.25 (neutral on banded, where consecutive rows
    already share support).  Plays the role the reference's segment
    autotuning plays on GPU (matmul.py:94-127) — scheduling, not a
    kernel change."""
    n = len(entries_per_row)
    n_cols = 0
    for ents in entries_per_row:
        for (cb, _w) in ents:
            n_cols = max(n_cols, cb + 1)

    from blocksparse_tpu import native
    flat_r, flat_c = [], []
    for r, ents in enumerate(entries_per_row):
        for (cb, _w) in ents:
            flat_r.append(r)
            flat_c.append(cb)
    perm = native.cluster_rows_native(
        np.asarray(flat_r, np.int32), np.asarray(flat_c, np.int32),
        n, max(n_cols, 1), R)
    if perm is not None:
        return perm
    return cluster_rows_py(entries_per_row, R, n_cols)


def cluster_rows_py(entries_per_row, R: int, n_cols: int) -> np.ndarray:
    """Pure-Python `cluster_rows` core (bit-parity oracle for the native
    path; see tests/test_matmul.py)."""
    n = len(entries_per_row)
    sup = np.zeros((n, max(n_cols, 1)), bool)
    for r, ents in enumerate(entries_per_row):
        for (cb, _w) in ents:
            sup[r, cb] = True
    used = np.zeros(n, bool)
    order = np.argsort(-sup.sum(1), kind="stable")
    perm = []
    for seed in order:
        if used[seed]:
            continue
        used[seed] = True
        u = sup[seed].copy()
        perm.append(int(seed))
        for _ in range(R - 1):
            cand = np.nonzero(~used)[0]
            if len(cand) == 0:
                break
            growth = (sup[cand] & ~u).sum(1)
            pick = cand[int(np.argmin(growth))]
            used[pick] = True
            u |= sup[pick]
            perm.append(int(pick))
    perm = np.asarray(perm, np.int64)
    _refine_swaps_py(sup, R, perm, passes=2)
    return perm


def _refine_swaps_py(sup, R, perm, passes=2):
    """Deterministic swap local search (bit-parity with the native
    refine_swaps): ascending row order, best strict-improvement partner
    by ascending id, applied greedily in place."""
    n = sup.shape[0]
    pos_of = np.empty(n, np.int64)
    pos_of[perm] = np.arange(n)

    def union_size(g, skip=-1, add=-1):
        rows = [int(perm[p]) for p in range(g * R, min((g + 1) * R, n))
                if perm[p] != skip]
        if add >= 0:
            rows.append(add)
        if not rows:
            return 0
        return int(np.any(sup[rows], axis=0).sum())

    for _ in range(passes):
        improved = False
        for r in range(n):
            g = pos_of[r] // R
            base_g = union_size(g)
            best_delta, best = 0, -1
            base_cache = {}
            for r2 in range(r + 1, n):
                g2 = pos_of[r2] // R
                if g2 == g:
                    continue
                if g2 not in base_cache:
                    base_cache[g2] = union_size(g2)
                delta = (union_size(g, skip=r, add=r2)
                         + union_size(g2, skip=r2, add=r)
                         - base_g - base_cache[g2])
                if delta < best_delta:
                    best_delta, best = delta, r2
            if best >= 0:
                pa, pb = pos_of[r], pos_of[best]
                perm[pa], perm[pb] = perm[pb], perm[pa]
                pos_of[r], pos_of[best] = pb, pa
                improved = True
        if not improved:
            break


# Per-grid-step fixed cost in MXU-lane-equivalents (DMA issue + scalar
# control + accumulator touch), used to trade chunk width G against step
# count.  Round-3 re-fit with SLOPE timing (tools/tpu_g_refit.py,
# benchmarks/results_g_refit.json — the round-2 value 128 was fitted to
# quantum-polluted data, BENCH_NOTES round-3): solving
#   t = a*steps + b*slots + passes*t_pass
# across banded-b32 G in {4,8,24} at 8192^2/N2048 gives a ~= 0.14 us
# per step ~= 52 lanes at the measured 193 TF/s, with the per-slot DMA
# term fully hidden by the auto-pipeline (b ~= 0.008 us/slot).
STEP_OVERHEAD_LANES = 52


def choose_dense_tile_G(bsize: int, union_sizes) -> int:
    """Pick the contraction slot count per chunk.

    Cost model per group: ceil(union/G) grid steps; each step's MXU
    time is its contraction depth QUANTIZED to 128 lanes (the MXU pads
    partial passes — a 704-deep dot costs the same 6 passes as 768),
    plus a fixed per-step overhead.  Wide chunks amortize overhead but
    pad the union to a G multiple; depth is capped at 768 (VMEM fit at
    TN=2048/bf16 within the wrapper's budget — measured round 2, and
    768 beat 512 by ~5% at 8192^2/b32/d0.25).  All G in range are
    candidates (round 2 tried only {768,512,256,128}/bsize, which
    wastes a full extra pass per step on layouts whose unions sit just
    above a pass boundary — e.g. banded b32 union 66)."""
    u = np.asarray([max(int(x), 1) for x in union_sizes], np.int64)
    g_max = max(1, 768 // bsize)
    best_g, best_cost = g_max, None
    for G in range(1, g_max + 1):
        ch = np.maximum(1, -(-u // G))
        # every chunk (incl. the group's last, zero-padded to G) runs a
        # full (M, G*b) dot; depth quantizes to 128-lane passes
        depth_lanes = -(-(G * bsize) // CONTRACT) * CONTRACT
        steps = int(ch.sum())
        cost = steps * depth_lanes + steps * STEP_OVERHEAD_LANES
        if best_cost is None or cost < best_cost:
            best_g, best_cost = G, cost
    return int(best_g)


def choose_dense_tile_G_ladder(bsize: int, union_sizes):
    """Pick the full-chunk slot count G for a width-ladder schedule.

    Each group emits floor(u/G) full-width chunks plus one remainder
    chunk whose depth is quantized to MXU passes (the ladder) — so the
    only G-dependent costs are the per-chunk overhead (large G
    amortizes) and the full-chunk VMEM/panel width (capped at depth
    768, measured round 2).  G is kept a multiple of the slots-per-pass
    so full chunks bill whole passes."""
    u = np.asarray([max(int(x), 1) for x in union_sizes], np.int64)
    spp = max(1, CONTRACT // bsize)
    g_max = max(spp, (768 // bsize) // spp * spp)
    best_g, best_cost = g_max, None
    for G in range(spp, g_max + 1, spp):
        full = u // G
        rem = u - full * G
        rem_lanes = -(-(rem * bsize) // CONTRACT) * CONTRACT
        steps = full + (rem > 0)
        steps = np.maximum(steps, 1)
        lanes = full * G * bsize + np.where(rem > 0, rem_lanes, 0)
        lanes = np.maximum(lanes, CONTRACT)   # empty group: 1 pass
        cost = int(lanes.sum()) + int(steps.sum()) * STEP_OVERHEAD_LANES
        if best_cost is None or cost < best_cost:
            best_g, best_cost = G, cost
    return int(best_g)


def build_dense_tile_schedule(entries_per_row, n_out_blocks: int, bsize: int,
                              blocks: int, R: int | None = None,
                              G: int | None = None,
                              cluster: bool = False,
                              tails: bool = True) -> DenseTileSchedule:
    """entries_per_row: list (len n_out_blocks) of lists of (in_blk, w_id).

    tails=True (and G auto) enables pass-quantized width-ladder final
    chunks: each group's remainder runs one narrow (M, wcls*128) dot
    instead of zero-padding to the full chunk width (see
    :func:`choose_dense_tile_G_ladder`)."""
    R = R or max(1, CONTRACT // bsize)
    groups = -(-n_out_blocks // R)
    perm = None
    row_at = lambda p: p  # noqa: E731
    if cluster and n_out_blocks > R:
        perm = cluster_rows(entries_per_row, R)
        row_at = lambda p: int(perm[p])  # noqa: E731

    # first pass: per-group row lists and column unions
    group_rows, group_cols = [], []
    for g in range(groups):
        ents_g, cols = [], set()
        for r in range(R):
            p = g * R + r
            if p >= n_out_blocks:
                break
            ents = entries_per_row[row_at(p)]
            ents_g.append((r, ents))
            for (cb, _w) in ents:
                cols.add(cb)
        group_rows.append(ents_g)
        group_cols.append(sorted(cols))
    ladder = tails
    if G is None:
        if ladder:
            G = choose_dense_tile_G_ladder(
                bsize, [len(c) for c in group_cols])
        else:
            G = choose_dense_tile_G(bsize, [len(c) for c in group_cols])

    return _emit_dense_tile_chunks(group_rows, group_cols, n_out_blocks,
                                   bsize, blocks, R, G, ladder=ladder,
                                   perm=perm)


def _emit_dense_tile_chunks(group_rows, group_cols, n_out_blocks, bsize,
                            blocks, R, G, ladder=False, perm=None,
                            rows_at=None):
    """Chunk emission shared by the partition and phased builders.
    group_rows[g]: list of (lane band r, covered entries); group_cols[g]:
    sorted column union of the covered entries.

    ladder=True emits each group's remainder as ONE chunk whose width is
    the remainder quantized to MXU passes (wcls = pass count); full
    chunks carry wcls = G*bsize/128."""
    groups = len(group_rows)
    spp = max(1, CONTRACT // bsize)
    grp, last, wcls, slot, wpos = [], [], [], [], []
    for g in range(groups):
        cols = group_cols[g]
        u = len(cols)
        if ladder:
            nfull = u // G
            rem = u - nfull * G
            nch = max(1, nfull + (1 if rem > 0 else 0))
            rem_slots = -(-max(rem, 1) // spp) * spp
        else:
            nfull = nch = max(1, -(-u // G))
            rem = 0
            rem_slots = G
        slot_of = {cb: p for p, cb in enumerate(cols)}
        base = len(grp)
        for j in range(nch):
            is_rem = ladder and j >= nfull
            width = rem_slots if is_rem else G
            grp.append(g)
            last.append(1 if j == nch - 1 else 0)
            wcls.append(-(-(width * bsize) // CONTRACT))
            row = []
            for i in range(G):
                p = j * G + i
                if p < u and i < width:
                    row.append(cols[p])
                elif len(slot) > 0:
                    # repeat the previous chunk's slot: Mosaic's revisit
                    # logic skips the DMA for an unchanged block index,
                    # and the cell weight is zero (sentinel) anyway
                    row.append(slot[-1][i])
                else:
                    row.append(0)
            slot.append(row)
            wpos.append(np.full((R, G), blocks, np.int64))
        for r, ents in group_rows[g]:
            for (cb, w) in ents:
                p = slot_of[cb]
                wpos[base + p // G][r, p % G] = w
    return DenseTileSchedule(
        grp=np.asarray(grp, np.int32), last=np.asarray(last, np.int32),
        slot=np.asarray(slot, np.int32),
        wpos=np.stack(wpos).astype(np.int32),
        n_out_blocks=n_out_blocks, R=R, G=G, blocks=blocks, perm=perm,
        wcls=np.asarray(wcls, np.int32) if ladder else None,
        rows_at=(None if rows_at is None
                 else np.asarray(rows_at, np.int32)))


def build_dense_tile_schedule_phased(entries_per_row, n_out_blocks: int,
                                     bsize: int, blocks: int,
                                     R: int | None = None,
                                     thresholds=(3, 2, 2),
                                     G: int | None = None,
                                     tails: bool = True) -> DenseTileSchedule:
    """Flexible-cover dense-tile schedule for low-locality layouts.

    The fixed-partition builder's fill ceiling on iid-random layouts is
    density/(1-(1-d)^R): ~62% of a group's union columns serve only ONE
    of its R rows at d=0.25/R=4.  This builder covers the layout in
    PHASES: each phase clusters the rows that still have uncovered
    cells, groups them, and keeps only columns with >= threshold cells
    in the group — the rest defer to the next phase, whose re-clustering
    gives them a fresh chance at multiplicity.  The final phase takes
    everything.  Measured ceilings at d=0.25 (tools/cover_study.py):
    0.407 partition -> 0.518 with thresholds (3,2,2).

    A row's output tile is now touched by up to len(thresholds)+1
    groups, so the wrapper segment-sums group tiles into canonical rows
    (rows_at) instead of permuting — the extra output traffic is one
    (128, N) tile write + read per extra group, ~8 slot-equivalents,
    which the slot savings repay several times over at bench shapes."""
    R = R or max(1, CONTRACT // bsize)
    residual = [list(ents) for ents in entries_per_row]
    group_rows, group_cols, rows_at = [], [], []
    for t in list(thresholds) + [1]:
        active = [r for r in range(n_out_blocks) if residual[r]]
        if not active:
            break
        ents_active = [residual[r] for r in active]
        if len(active) > R:
            perm = cluster_rows(ents_active, R)
        else:
            perm = np.arange(len(active))
        for g0 in range(0, len(active), R):
            prows = [active[int(perm[p])]
                     for p in range(g0, min(g0 + R, len(active)))]
            mult = {}
            for row in prows:
                for (cb, _w) in residual[row]:
                    mult[cb] = mult.get(cb, 0) + 1
            keep = {cb for cb, m in mult.items() if m >= t}
            if not keep:
                continue
            ents_g, rat = [], []
            for slot_r, row in enumerate(prows):
                take = [e for e in residual[row] if e[0] in keep]
                if take:
                    residual[row] = [e for e in residual[row]
                                     if e[0] not in keep]
                ents_g.append((slot_r, take))
                # all-zero tiles (no cells taken in this phase) stay out
                # of the merge fan-in: a -1 sentinel keeps the slot lane
                # assignment but drops the tile from phased_merge_idx
                rat.append(row if take else -1)
            group_rows.append(ents_g)
            group_cols.append(sorted(keep))
            rows_at.append(rat + [-1] * (R - len(rat)))
    if G is None:
        if tails:
            G = choose_dense_tile_G_ladder(
                bsize, [len(c) for c in group_cols])
        else:
            G = choose_dense_tile_G(bsize, [len(c) for c in group_cols])
    return _emit_dense_tile_chunks(group_rows, group_cols, n_out_blocks,
                                   bsize, blocks, R, G, ladder=tails,
                                   rows_at=rows_at)


def dense_tile_panels(w, sched: DenseTileSchedule, trans_w: bool,
                      wpos=None, trans_cells=None):
    """Gather weight blocks into per-chunk MXU panels.

    Returns (S, R*bsize, G*bsize): row band r x column band i of chunk s
    holds the block for layout cell (r, i).  fprop (trans_w=False) needs
    the per-cell transpose (y_r += W_cell^T x_i in CN orientation); bprop
    (trans_w=True) uses the blocks as stored.

    wpos overrides sched.wpos (e.g. remapped into a packed block store);
    absent cells must then use sentinel id == len(w).  trans_cells
    overrides the cell transpose (for stores whose cells are already
    transposed).
    """
    b = w.shape[1]
    S, R, G = sched.wpos.shape
    if wpos is None:
        wpos = sched.wpos
    if trans_cells is None:
        trans_cells = not trans_w
    w_ext = jnp.concatenate(
        [w, jnp.zeros((1, b, b), w.dtype)], axis=0)
    cells = w_ext[jnp.asarray(wpos)]                # (S, R, G, b, b)
    if trans_cells:
        cells = cells.swapaxes(-1, -2)
    # -> (s, R, brow, G, bcol)
    panels = cells.transpose(0, 1, 3, 2, 4)
    return panels.reshape(S, R * b, G * b)


def dense_tile_flat_pos(sched: DenseTileSchedule) -> np.ndarray:
    """pos[w_id] = flat cell index (s*R + r)*G + i in the fprop panel
    store (matches the block order of ``dense_tile_blocks_view``)."""
    pos = np.full(sched.blocks, -1, np.int64)
    s, r, i = np.nonzero(sched.wpos != sched.blocks)
    w = sched.wpos[s, r, i]
    pos[w] = (s * sched.R + r) * sched.G + i
    assert (pos >= 0).all(), "layout block missing from dense-tile schedule"
    return pos.astype(np.int32)


def dense_tile_blocks_view(panels, sched: DenseTileSchedule, bsize: int):
    """Panel store -> (S*R*G, b, b) cell array in flat-pos order.
    Cells keep the store's per-cell transpose (W^T for fprop panels)."""
    S, R, G = sched.wpos.shape
    return panels.reshape(S, R, bsize, G, bsize) \
                 .transpose(0, 1, 3, 2, 4) \
                 .reshape(S * R * G, bsize, bsize)


def _xprop_dense_tile_kernel(G, bsize, precision, grp_ref, last_ref,
                             slot_ref, *refs):
    xs = refs[:G]
    w_ref, out_ref, acc_ref = refs[G], refs[G + 1], refs[G + 2]
    s = pl.program_id(1)
    prev = grp_ref[jnp.maximum(s - 1, 0)]

    @pl.when(jnp.logical_or(s == 0, grp_ref[s] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xcat = jnp.concatenate([x[...] for x in xs], axis=0)       # (Gb, TN)
    # w delivered as a 2-D (M, Gb) block — a leading singleton block dim
    # costs ~3% (measured, tools/tpu_dt_probe.py)
    acc_ref[...] += jax.lax.dot_general(
        w_ref[...], xcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _xprop_dense_tile_ladder_kernel(G, bsize, precision, grp_ref,
                                    last_ref, wcls_ref, slot_ref, *refs):
    """Dense-tile kernel with pass-quantized chunk widths: chunk s runs
    a (M, wcls[s]*128) dot, billing exactly its quantized contraction
    depth instead of the full G*bsize.  Narrow steps still carry G slot
    operands, but the schedule repeats the previous chunk's block index
    on unused lanes so Mosaic skips their DMA."""
    xs = refs[:G]
    w_ref, out_ref, acc_ref = refs[G], refs[G + 1], refs[G + 2]
    s = pl.program_id(1)
    prev = grp_ref[jnp.maximum(s - 1, 0)]
    spp = max(1, CONTRACT // bsize)
    p_full = max(1, (G * bsize) // CONTRACT)

    @pl.when(jnp.logical_or(s == 0, grp_ref[s] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for k in range(1, p_full):
        @pl.when(wcls_ref[s] == k)
        def _(k=k):
            w = k * spp
            xcat = jnp.concatenate([x[...] for x in xs[:w]], axis=0)
            acc_ref[...] += jax.lax.dot_general(
                w_ref[:, :w * bsize], xcat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

    @pl.when(wcls_ref[s] >= p_full)
    def _():
        xcat = jnp.concatenate([x[...] for x in xs], axis=0)   # (Gb, TN)
        acc_ref[...] += jax.lax.dot_general(
            w_ref[...], xcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _xprop_dense_tile_resident_kernel(G, bsize, precision, with_ladder,
                                      TN, TN_IS_N, *refs):
    """Dense-tile kernel with the x column-tile RESIDENT in VMEM.

    The per-slot BlockSpec kernels re-read every union slot's (bsize,
    TN) x block from HBM — at the headline random 8192^2/b32/d=0.25
    config that is ~1.4 GB of x traffic per matmul (42x amplification).
    Here the whole (C, TN) x column tile is DMA'd ONCE per n-tile into
    a VMEM scratch and chunks gather their slots with dynamic sublane
    slices — x HBM traffic drops to C*N bytes total.

    MEASURED OUTCOME (round 5, benchmarks/results_resident_ab.json +
    BENCH_NOTES resident close-out): this kernel LOSES to the per-slot
    variant at every bench config (random b32 1.38 vs 1.02 ms) and the
    per-slot kernel sits AT its x-traffic bound already, because (a)
    Mosaic's revisit-skip plus double-buffering hide the HBM re-reads
    under the MXU at full HBM bandwidth, and (b) every explicit gather
    engine measured no faster: a pipelined VMEM->VMEM async-copy
    variant moved its 2.78 GB at ~1.4 TB/s == HBM bandwidth and lost
    revisit-skip (1.95 ms); this inline-slice gather is unoverlapped
    vector work (1.38 ms).  Residency cannot beat re-reads on this
    chip — fewer slot VISITS (schedule fill) is the only lever.  The
    mode is kept as an explicit option (it wins nothing today but is
    the right base for future chips where local copy bandwidth beats
    HBM); auto never selects it.  The schedule (and the billed MXU
    passes) is identical to the per-slot variant."""
    if with_ladder:
        grp_ref, last_ref, wcls_ref, slot_ref = refs[:4]
        rest = refs[4:]
    else:
        grp_ref, last_ref, slot_ref = refs[:3]
        wcls_ref = None
        rest = refs[3:]
    x_ref, w_ref, out_ref, acc_ref, xbuf, sem = rest
    n, s = pl.program_id(0), pl.program_id(1)

    # one 8-ish MB HBM->VMEM copy per n-tile (a few us, amortized over
    # the whole chunk stream of this n-tile).  When TN == N (the
    # small-N regime) copy the whole ref: Mosaic requires lane slices
    # be 128-aligned and TN < 128 there.
    @pl.when(s == 0)
    def _():
        src = x_ref if TN_IS_N else x_ref.at[:, pl.ds(n * TN, TN)]
        cp = pltpu.make_async_copy(src, xbuf, sem)
        cp.start()
        cp.wait()

    prev = grp_ref[jnp.maximum(s - 1, 0)]

    @pl.when(jnp.logical_or(s == 0, grp_ref[s] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def xcat_of(nslots):
        return jnp.concatenate(
            [xbuf[pl.ds(slot_ref[s * G + i] * bsize, bsize), :]
             for i in range(nslots)], axis=0)

    spp = max(1, CONTRACT // bsize)
    p_full = max(1, (G * bsize) // CONTRACT)
    if with_ladder:
        for k in range(1, p_full):
            @pl.when(wcls_ref[s] == k)
            def _(k=k):
                w = k * spp
                acc_ref[...] += jax.lax.dot_general(
                    w_ref[:, :w * bsize], xcat_of(w),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)

        @pl.when(wcls_ref[s] >= p_full)
        def _():
            acc_ref[...] += jax.lax.dot_general(
                w_ref[...], xcat_of(G), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
    else:
        acc_ref[...] += jax.lax.dot_general(
            w_ref[...], xcat_of(G), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


# VMEM budget for the resident x scratch (the chip has ~16 MB VMEM; the
# panels + accumulator + out tile double-buffers need the rest).  Used
# when the caller can't supply the schedule for a full working-set
# estimate (resident_vmem_estimate).
RESIDENT_X_BUDGET = 9 * 1024 * 1024
VMEM_LIMIT = 14 * 1024 * 1024


def resident_vmem_estimate(C, TN, itemsize, sched, bsize, out_itemsize=4):
    """Full resident-kernel working set: the (C, TN) x scratch plus the
    same panel / accumulator / out / xcat terms as the per-slot kernel
    (minus its per-slot x double-buffers)."""
    M = sched.R * bsize
    Gb = sched.G * bsize
    return (C * TN * itemsize                 # resident x scratch
            + 2 * M * Gb * itemsize           # double-buffered panel
            + M * TN * 4                      # f32 accumulator
            + 2 * M * TN * out_itemsize       # out tile
            + Gb * TN * itemsize)             # xcat temporary


def resident_pick_tile(C, N, itemsize, min_tn=256, max_tn=2048,
                       budget=None, sched=None, bsize=None,
                       out_itemsize=4):
    """Largest 128-multiple divisor TN of N such that the resident
    working set fits VMEM; None if even min_tn does not fit (fall back
    to the per-slot kernel).  With ``sched``/``bsize`` the FULL working
    set (resident_vmem_estimate) is checked against VMEM_LIMIT — the
    x-scratch-only RESIDENT_X_BUDGET check alone can pick a TN whose
    accumulator + panels + out tiles overflow VMEM (e.g. f32 at small
    C picking TN=2048).

    Small N (< 128, the reference's canonical N=64 regime) uses TN=N:
    x is tiny there (C*N*2 ~ 1 MB at hidden 7680) and residency is
    where the mode actually WINS — the per-slot kernel issues
    chunks x G sub-KB slot DMAs whose issue overhead dominates at
    N=64, while the resident gather is cheap VPU work (see BENCH_NOTES
    resident close-out)."""
    cands = (2048, 1024, 512, 256, 128) if N >= 128 else (N,)
    for t in cands:
        if N >= 128 and (t > max_tn or t < min_tn or N % t):
            continue
        if sched is not None:
            if resident_vmem_estimate(C, t, itemsize, sched, bsize,
                                      out_itemsize) <= VMEM_LIMIT:
                return t
        elif C * t * itemsize <= (budget or RESIDENT_X_BUDGET):
            return t
    return None


def dense_tile_pick_tile(N, max_tn=2048):
    """Largest divisor of N that is a multiple of 128 (or N itself when
    smaller), capped at max_tn: long MXU streams amortize the per-chunk
    weight-tile load (128 cycles per (128,128) tile)."""
    best = None
    for t in (2048, 1024, 512, 256, 128):
        if t <= max_tn and N % t == 0:
            best = t
            break
    return best or pick_tile(N)


def xprop_pallas_dense_tile(x, w_panels, sched: DenseTileSchedule,
                            bsize: int, tile_n: int | None = None,
                            precision=None, out_dtype=None,
                            resident: bool = False):
    """x (C, N) feature-major; w_panels from ``dense_tile_panels`` (or
    packed storage).  Returns (n_out_blocks*bsize, N).

    resident=True runs the VMEM-resident-x kernel (one x column-tile
    copy per n-tile, slots gathered by dynamic slice) — same schedule,
    ~union/C-fold lower x HBM traffic; see
    :func:`_xprop_dense_tile_resident_kernel`."""
    C, N = x.shape
    if resident:
        TN = tile_n or resident_pick_tile(C, N, x.dtype.itemsize)
        assert TN is not None, "resident x scratch does not fit VMEM"
    else:
        TN = tile_n or dense_tile_pick_tile(N)
    assert N % TN == 0
    prec = dot_precision(x.dtype, precision)
    R, G = sched.R, sched.G
    S = sched.num_chunks
    groups = sched.groups
    M = R * bsize
    out_dtype = out_dtype or x.dtype
    # phased covers re-sum per-group partial tiles in f32 inside the
    # merge kernel: keep the pre-merge partials unrounded (a bf16
    # round per phase would add error the partition path doesn't have)
    pallas_out_dtype = jnp.float32 if sched.rows_at is not None \
        else out_dtype

    with_ladder = sched.wcls is not None

    if with_ladder:
        def x_index(i):
            return lambda n, s, gr, la, wc, sl, i=i: (sl[s * G + i], n)
        w_index = lambda n, s, gr, la, wc, sl: (s, 0)           # noqa: E731
        o_index = lambda n, s, gr, la, wc, sl: (gr[s], n)       # noqa: E731
    else:
        def x_index(i):
            return lambda n, s, gr, la, sl, i=i: (sl[s * G + i], n)
        w_index = lambda n, s, gr, la, sl: (s, 0)               # noqa: E731
        o_index = lambda n, s, gr, la, sl: (gr[s], n)           # noqa: E731

    if resident:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        x_bytes = C * N
    else:
        in_specs = [
            pl.BlockSpec((bsize, TN), x_index(i), memory_space=pltpu.VMEM)
            for i in range(G)
        ]
        x_bytes = S * G * bsize * N
    in_specs.append(pl.BlockSpec(
        (M, G * bsize), w_index, memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((M, TN), o_index, memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * S * M * G * bsize * N,
        bytes_accessed=(x_bytes + w_panels.size * (N // TN))
        * x.dtype.itemsize + groups * M * N * 4,
        transcendentals=0,
    )
    scratch = [pltpu.VMEM((M, TN), jnp.float32)]
    if resident:
        scratch += [pltpu.VMEM((C, TN), x.dtype), pltpu.SemaphoreType.DMA]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4 if with_ladder else 3,
        grid=(N // TN, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    if with_ladder:
        prefetch = (jnp.asarray(sched.grp), jnp.asarray(sched.last),
                    jnp.asarray(sched.wcls),
                    jnp.asarray(sched.slot.reshape(-1)))
    else:
        prefetch = (jnp.asarray(sched.grp), jnp.asarray(sched.last),
                    jnp.asarray(sched.slot.reshape(-1)))
    if resident:
        kernel = functools.partial(_xprop_dense_tile_resident_kernel,
                                   G, bsize, prec, with_ladder, TN,
                                   TN == N)
    elif with_ladder:
        kernel = functools.partial(_xprop_dense_tile_ladder_kernel,
                                   G, bsize, prec)
    else:
        kernel = functools.partial(_xprop_dense_tile_kernel, G, bsize, prec)
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups * M, N), pallas_out_dtype),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    x_args = [x] if resident else [x] * G
    out = fn(*prefetch, *x_args, w_panels.reshape(S * M, G * bsize))
    if sched.rows_at is not None:
        # phased cover: a canonical row owns tiles in several groups —
        # gather-sum them (a scatter-add segment_sum serializes on TPU)
        out = merge_phased_tiles(out, sched, bsize, TN, out_dtype)
    elif sched.perm is not None:
        pos_of = np.empty(sched.n_out_blocks, np.int64)
        pos_of[sched.perm] = np.arange(sched.n_out_blocks)
        out = out.reshape(groups * R, bsize, N)[jnp.asarray(pos_of)]
        out = out.reshape(sched.n_out_blocks * bsize, N)
    elif groups * R != sched.n_out_blocks:
        out = out[:sched.n_out_blocks * bsize]
    return out


def phased_merge_idx(sched: DenseTileSchedule) -> np.ndarray:
    """(n_out_blocks, P) flat tile ids (g*R + slot) contributing to each
    canonical row; sentinel = groups*R points at an appended zeros tile.
    P = max groups touching one row (phase count bound).  Cached on the
    schedule — host-side, built once."""
    if getattr(sched, "_merge_idx", None) is not None:
        return sched._merge_idx
    groups, R = sched.rows_at.shape
    contrib = [[] for _ in range(sched.n_out_blocks)]
    for g in range(groups):
        for r in range(R):
            row = int(sched.rows_at[g, r])
            if row >= 0:
                contrib[row].append(g * R + r)
    P = max(1, max(len(c) for c in contrib))
    idx = np.full((sched.n_out_blocks, P), groups * R, np.int32)
    for q, c in enumerate(contrib):
        idx[q, :len(c)] = c
    object.__setattr__(sched, "_merge_idx", idx)
    return idx


def _merge_tiles_kernel(P, idx_ref, *refs):
    ins, out_ref = refs[:P], refs[P]
    acc = ins[0][...].astype(jnp.float32)
    for p in range(1, P):
        acc += ins[p][...].astype(jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def merge_phased_tiles(out, sched: DenseTileSchedule, bsize: int,
                       TN: int, out_dtype):
    """Sum per-group out tiles into canonical rows with a gather-style
    Pallas kernel: grid (N//TN, n_out_blocks); input p of row q is tile
    idx[q, p] of the padded tile stack (sentinel -> zeros).  Pure
    sequential reads + one write — a scatter-add segment_sum over the
    same tiles serializes on TPU (measured ~ms-scale at bench shapes)."""
    groups, R = sched.rows_at.shape
    N = out.shape[1]
    idx = phased_merge_idx(sched)
    P = idx.shape[1]
    padded = jnp.concatenate(
        [out, jnp.zeros((bsize, N), out.dtype)], axis=0)

    def in_index(p):
        return lambda n, q, ix, p=p: (ix[q * P + p], n)

    in_specs = [pl.BlockSpec((bsize, TN), in_index(p),
                             memory_space=pltpu.VMEM) for p in range(P)]
    out_spec = pl.BlockSpec(
        (bsize, TN), lambda n, q, ix: (q, n), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TN, sched.n_out_blocks),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    fn = pl.pallas_call(
        functools.partial(_merge_tiles_kernel, P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (sched.n_out_blocks * bsize, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=P * sched.n_out_blocks * bsize * N,
            bytes_accessed=(P + 1) * sched.n_out_blocks * bsize * N
            * out.dtype.itemsize,
            transcendentals=0),
        interpret=use_interpret(),
    )
    return fn(jnp.asarray(idx.reshape(-1)), *([padded] * P))


def dense_tile_vmem_estimate(C, TN, itemsize, sched: DenseTileSchedule,
                             bsize, out_itemsize=4):
    M = sched.R * bsize
    Gb = sched.G * bsize
    return (2 * sched.G * bsize * TN * itemsize   # double-buffered slots
            + 2 * M * Gb * itemsize               # double-buffered panel
            + M * TN * 4                          # f32 accumulator
            + 2 * M * TN * out_itemsize           # out tile
            + Gb * TN * itemsize)                 # xcat temporary


# ---- window-slab xprop: x streamed once per column window ---------------

@dataclass
class WindowSchedule:
    """Window-major dense-tile schedule.

    The flat-chunk dense-tile kernel re-fetches every gathered x slot from
    HBM per chunk (~S*G*bsize*N bytes — 1.5 GB at 8192^2/d0.25/N2048, the
    measured co-bottleneck with the MXU).  Here the input is streamed as
    contiguous *window slabs* of WB block-rows, fetched once per
    (super-group, window): chunks are ordered window-major within a
    super-group of SG output groups, whose f32 accumulators all live in
    VMEM scratch.  Slot gathers become dynamic slices out of the resident
    slab, so x HBM traffic drops from O(S*G*bsize*N) to
    O(nsg * x_bytes) while MXU pass count (fill) is unchanged up to
    per-window chunk rounding.

    Output tiles are written once: the out BlockSpec holds the tile of the
    next-completing group (`pend`) resident until that group's final
    chunk writes it, so no partial flushes hit HBM.
    """
    win: np.ndarray       # (S,) input window index per chunk
    pend: np.ndarray      # (S,) out tile held resident (next group to finish)
    gl: np.ndarray        # (S,) accumulator slot (group local to super-group)
    zero: np.ndarray      # (S,) 1 on a group's first chunk overall
    last: np.ndarray      # (S,) 1 on a group's final chunk overall
    slot: np.ndarray      # (S, G) window-relative input block per lane band
    wpos: np.ndarray      # (S, R, G) block id, or `blocks` (zero cell)
    n_out_blocks: int
    n_in_blocks: int
    R: int
    G: int
    WB: int
    SG: int
    blocks: int           # sentinel id for the appended zero block

    @property
    def groups(self):
        return -(-self.n_out_blocks // self.R)

    @property
    def num_chunks(self):
        return self.win.shape[0]

    @property
    def num_windows(self):
        return -(-self.n_in_blocks // self.WB)


def window_pick_params(bsize: int, n_in_blocks: int, N: int, itemsize: int,
                       vmem_budget: int = 12 * 1024 * 1024):
    """Pick (WB, SG, G, TN) under the VMEM budget.

    Preferences: TN large (amortize weight-tile loads), then SG large
    (fewer slab re-fetches), then WB large (less chunk rounding).  The
    slab is double-buffered; accumulators are f32.
    """
    G = max(1, CONTRACT // bsize)
    M = max(CONTRACT, bsize)
    for TN in (1024, 512, 256, 128):
        if TN > N:
            continue
        if N % TN != 0:
            continue
        for WB in (2048 // bsize, 1024 // bsize, 512 // bsize):
            WB = max(WB, G)
            for SG in (8, 4, 2, 1):
                slab = 2 * WB * bsize * TN * itemsize
                acc = SG * M * TN * 4
                panel = 2 * M * G * bsize * itemsize
                out = 2 * M * TN * itemsize
                xcat = G * bsize * TN * itemsize
                if slab + acc + panel + out + xcat <= vmem_budget:
                    return WB, SG, G, TN
    return max(1, 512 // bsize), 1, G, min(N, 128)


def build_window_schedule(entries_per_row, n_out_blocks: int,
                          n_in_blocks: int, bsize: int, blocks: int,
                          R: int | None = None, G: int | None = None,
                          WB: int = 64, SG: int = 8) -> WindowSchedule:
    """entries_per_row: list (len n_out_blocks) of lists of (in_blk, w_id)."""
    R = R or max(1, CONTRACT // bsize)
    G = G or max(1, CONTRACT // bsize)
    groups = -(-n_out_blocks // R)
    nwin = -(-n_in_blocks // WB)
    nsg = -(-groups // SG)

    # group -> per-window sorted column lists
    gw_cols = []
    for g in range(groups):
        per_win = [[] for _ in range(nwin)]
        seen = set()
        for r in range(R):
            row = g * R + r
            if row >= n_out_blocks:
                break
            for (cb, _w) in entries_per_row[row]:
                if cb not in seen:
                    seen.add(cb)
                    per_win[cb // WB].append(cb)
        for lst in per_win:
            lst.sort()
        gw_cols.append(per_win)

    win, gl, zero, last, slot, wpos = [], [], [], [], [], []
    first_of = np.full(groups, -1, np.int64)
    last_of = np.full(groups, -1, np.int64)
    for sg in range(nsg):
        sg_groups = range(sg * SG, min((sg + 1) * SG, groups))
        for w in range(nwin):
            for g in sg_groups:
                cols = gw_cols[g][w]
                if not cols and not (w == 0 and
                                     not any(gw_cols[g][v]
                                             for v in range(nwin))):
                    continue
                # empty group: emit one dummy chunk in window 0 so its
                # out tile is still written (with zeros)
                nch = max(1, -(-len(cols) // G))
                slot_of = {cb: p for p, cb in enumerate(cols)}
                base = len(win)
                for j in range(nch):
                    win.append(w)
                    gl.append(g - sg * SG)
                    zero.append(0)
                    last.append(0)
                    slot.append([cols[j * G + i] - w * WB
                                 if j * G + i < len(cols) else 0
                                 for i in range(G)])
                    wpos.append(np.full((R, G), blocks, np.int64))
                for r in range(R):
                    row = g * R + r
                    if row >= n_out_blocks:
                        break
                    for (cb, wid) in entries_per_row[row]:
                        if cb // WB == w:
                            p = slot_of[cb]
                            wpos[base + p // G][r, p % G] = wid
                if first_of[g] < 0:
                    first_of[g] = base
                last_of[g] = base + nch - 1
    S = len(win)
    zero = np.zeros(S, np.int32)
    last = np.zeros(S, np.int32)
    zero[first_of] = 1
    last[last_of] = 1
    # out tile resident per step: the next group (in step order) to finish
    pend = np.zeros(S, np.int32)
    order = np.argsort(last_of)
    nxt_write = 0
    for s in range(S):
        pend[s] = order[nxt_write]
        if last_of[order[nxt_write]] == s:
            nxt_write += 1
    return WindowSchedule(
        win=np.asarray(win, np.int32), pend=pend,
        gl=np.asarray(gl, np.int32), zero=zero, last=last,
        slot=np.asarray(slot, np.int32),
        wpos=np.stack(wpos).astype(np.int32),
        n_out_blocks=n_out_blocks, n_in_blocks=n_in_blocks,
        R=R, G=G, WB=WB, SG=SG, blocks=blocks)


def _xprop_window_kernel(G, SG, M, bsize, precision,
                         win_ref, pend_ref, gl_ref, zero_ref, last_ref,
                         slot_ref, slab_ref, w_ref, out_ref, acc_ref):
    s = pl.program_id(1)
    base = pl.multiple_of(gl_ref[s] * M, M)
    xcat = jnp.concatenate(
        [slab_ref[pl.ds(pl.multiple_of(slot_ref[s * G + i] * bsize, bsize),
                        bsize), :]
         for i in range(G)], axis=0)                            # (Gb, TN)
    contrib = jax.lax.dot_general(
        w_ref[0], xcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    acc = jnp.where(zero_ref[s] == 1, contrib,
                    acc_ref[pl.ds(base, M), :] + contrib)
    acc_ref[pl.ds(base, M), :] = acc

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[...] = acc.astype(out_ref.dtype)


def xprop_pallas_window(x, w_panels, sched: WindowSchedule, bsize: int,
                        tile_n: int | None = None, precision=None,
                        out_dtype=None):
    """x (C, N) feature-major; w_panels from ``dense_tile_panels`` on the
    window schedule.  Returns (n_out_blocks*bsize, N)."""
    C, N = x.shape
    R, G, WB, SG = sched.R, sched.G, sched.WB, sched.SG
    M = R * bsize
    S = sched.num_chunks
    groups = sched.groups
    nwin = sched.num_windows
    out_dtype = out_dtype or x.dtype
    if tile_n is None:
        _, _, _, TN = window_pick_params(bsize, sched.n_in_blocks, N,
                                         x.dtype.itemsize)
    else:
        TN = tile_n
    assert N % TN == 0
    prec = dot_precision(x.dtype, precision)
    pad_rows = nwin * WB * bsize - C
    if pad_rows > 0:
        x = jnp.pad(x, ((0, pad_rows), (0, 0)))

    in_specs = [
        pl.BlockSpec((WB * bsize, TN),
                     lambda n, s, wi, pe, gl, ze, la, sl: (wi[s], n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, G * bsize),
                     lambda n, s, wi, pe, gl, ze, la, sl: (s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((M, TN),
                            lambda n, s, wi, pe, gl, ze, la, sl: (pe[s], n),
                            memory_space=pltpu.VMEM)
    nsg = -(-groups // SG)
    cost = pl.CostEstimate(
        flops=2 * S * M * G * bsize * N,
        bytes_accessed=(nsg * nwin * WB * bsize * N
                        + w_panels.size * (N // TN)) * x.dtype.itemsize
        + groups * M * N * np.dtype(out_dtype).itemsize,
        transcendentals=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(N // TN, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((SG * M, TN), jnp.float32)],
    )
    fn = pl.pallas_call(
        functools.partial(_xprop_window_kernel, G, SG, M, bsize, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups * M, N), out_dtype),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    out = fn(jnp.asarray(sched.win), jnp.asarray(sched.pend),
             jnp.asarray(sched.gl), jnp.asarray(sched.zero),
             jnp.asarray(sched.last), jnp.asarray(sched.slot.reshape(-1)),
             x, w_panels)
    if groups * R != sched.n_out_blocks:
        out = out[:sched.n_out_blocks * bsize]
    return out


def window_vmem_estimate(TN, itemsize, sched: WindowSchedule, bsize,
                         out_itemsize=2):
    M = sched.R * bsize
    Gb = sched.G * bsize
    return (2 * sched.WB * bsize * TN * itemsize   # double-buffered slab
            + sched.SG * M * TN * 4                # group accumulators
            + 2 * M * Gb * itemsize                # double-buffered panel
            + 2 * M * TN * out_itemsize            # out tile
            + Gb * TN * itemsize)                  # xcat temporary


# ---- dense-tile updat: one pass emits an (R x G) rectangle of dw blocks --

@dataclass
class UpdatDenseTileSchedule:
    kdx: np.ndarray       # (groups, CH, G) dy block-row per slot
    epos: np.ndarray      # (blocks,) flat (g, r, j, i) position per block id
    cnt: np.ndarray       # (groups,) real chunk count (<= CH)
    n_cb: int             # number of input (C) block-rows
    R: int
    G: int

    @property
    def groups(self):
        return self.kdx.shape[0]

    @property
    def CH(self):
        return self.kdx.shape[1]

    @property
    def num_chunks(self):
        return int(self.cnt.sum())


def build_updat_dense_tile_schedule(updat_list, n_cb: int, bsize: int,
                                    R: int | None = None,
                                    G: int | None = None) -> UpdatDenseTileSchedule:
    R = R or max(1, CONTRACT // bsize)
    G = G or max(1, CONTRACT // bsize)
    groups = -(-n_cb // R)
    per_row = [[] for _ in range(n_cb)]
    for w, (c, k) in enumerate(updat_list):
        per_row[c].append((k, w))
    unions = []
    for g in range(groups):
        cols = set()
        for r in range(R):
            row = g * R + r
            if row >= n_cb:
                break
            for (k, _w) in per_row[row]:
                cols.add(k)
        unions.append(sorted(cols))
    CH = max(1, max(-(-len(u) // G) for u in unions))
    kdx = np.zeros((groups, CH, G), np.int32)
    cnt = np.array([-(-len(u) // G) for u in unions], np.int32)
    epos = np.zeros(len(updat_list), np.int64)
    for g, cols in enumerate(unions):
        slot_of = {}
        for p, k in enumerate(cols):
            kdx[g, p // G, p % G] = k
            slot_of[k] = p
        for r in range(R):
            row = g * R + r
            if row >= n_cb:
                break
            for (k, w) in per_row[row]:
                epos[w] = (g * R + r) * (CH * G) + slot_of[k]
    return UpdatDenseTileSchedule(kdx=kdx, epos=epos.astype(np.int32),
                                  cnt=cnt, n_cb=n_cb, R=R, G=G)


def _updat_dense_tile_kernel(CH, G, R, bsize, precision, cnt_ref, kdx_ref,
                             x_ref, dy_ref, out_ref):
    g = pl.program_id(0)
    n = pl.program_id(1)
    Gb = G * bsize
    M = R * bsize
    n_ch = cnt_ref[g]

    @pl.when(n == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xstack = x_ref[...]                                        # (M, TN)

    def chunk(j):
        dycat = jnp.concatenate(
            [dy_ref[pl.ds(kdx_ref[g, j * G + i] * bsize, bsize), :]
             for i in range(G)], axis=0)                       # (Gb, TN)
        out_ref[0, pl.ds(j * M, M), :] += jax.lax.dot_general(
            xstack, dycat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    if CH <= UNROLL_MAX_CH:
        for j in range(CH):
            @pl.when(j < n_ch)
            def _(j=j):
                chunk(j)
    else:
        def body(j, carry):
            chunk(j)
            return carry
        jax.lax.fori_loop(0, n_ch, body, 0)


def updat_pallas_dense_tile(x, dy, sched: UpdatDenseTileSchedule, bsize: int,
                            tile_n: int | None = None, precision=None):
    """x (C, N), dy (K, N) feature-major; returns dw (blocks, b, b) f32.

    One grid step computes x-rows [g*128, (g+1)*128) against every dy
    column chunk in the group's union — an (R x G) rectangle of candidate
    dw blocks per MXU pass; the layout's blocks are gathered out of the
    packed panel afterwards.
    """
    G, CH, R = sched.G, sched.CH, sched.R
    groups = sched.groups
    C, N = x.shape
    K, _ = dy.shape
    M = R * bsize
    Gb = G * bsize
    TN = tile_n or pick_tile(N)
    assert N % TN == 0
    prec = dot_precision(x.dtype, precision)
    # contiguous (g*M, M) x slices must stay in bounds
    pad_rows = groups * M - C
    if pad_rows > 0:
        x = jnp.pad(x, ((0, pad_rows), (0, 0)))

    in_specs = [
        pl.BlockSpec((M, TN), lambda g, n, cc, kd: (g, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, TN), lambda g, n, cc, kd: (0, n),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, CH * M, Gb), lambda g, n, cc, kd: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(groups, N // TN),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    cost = pl.CostEstimate(
        flops=2 * sched.num_chunks * M * Gb * N,
        bytes_accessed=x.size * x.dtype.itemsize
        + dy.size * dy.dtype.itemsize + groups * CH * M * Gb * 4,
        transcendentals=0,
    )
    fn = pl.pallas_call(
        functools.partial(_updat_dense_tile_kernel, CH, G, R, bsize, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups, CH * M, Gb), jnp.float32),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    packed = fn(jnp.asarray(sched.cnt),
                jnp.asarray(sched.kdx.reshape(groups, -1)), x, dy)
    # (groups, CH, R, b, G, b) -> (groups, R, CH, G, b, b), flat block order
    # (g, r, j, i) matching epos
    flat = packed.reshape(groups, CH, R, bsize, G, bsize) \
                 .transpose(0, 2, 1, 4, 3, 5) \
                 .reshape(groups * R * CH * G, bsize, bsize)
    return flat[jnp.asarray(sched.epos)]


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


# ------------------------------------------------------------------
# Fine-block (b8/b16) kernel: per-output-row gathered panels from a
# VMEM-resident x — SURVEY §7 hard-part 2
# ------------------------------------------------------------------

@dataclass
class FineSchedule:
    """Chunk stream for the fine-block kernel.

    The dense-tile rectangle schedule dies at bsize <= 16: a full
    128-row output tile needs R = 128/bsize = 16 rows whose column
    UNION a random layout blows up, so MXU fill lands at 0.008-0.03
    and b8 runs slower than dense (results_canonical_p2.json; VERDICT
    r4 missing-item 5).  Here every chunk serves ONE output block-row
    with exactly its own Gf slots — fill is 1.0 by construction (only
    the <= Gf-1 slot pad of each row's last chunk is waste) — and the
    kernel keeps x AND the whole f32 accumulator resident in VMEM
    (both are tiny in the reference's canonical N=64 regime,
    test/blocksparse_matmul_bench.py:75), so slot gathers are VPU
    sublane slices and W streams from HBM exactly once, packed.
    Reference capability: hgemm_blocksparse_8x64x8_xprop
    (src/blocksparse_matmul_op_gpu.cu:9).

      rows[j]     output block-row of chunk j (sentinel n_out_blocks
                  for pad chunks)
      slot[j, i]  x block-row gathered into contraction slot i
      wmap[j, i]  weight block id for slot i (0 for pad: masked)
      valid[j, i] 0/1 pad mask
    """
    rows: np.ndarray
    slot: np.ndarray
    wmap: np.ndarray
    valid: np.ndarray
    Gf: int
    CH: int
    n_out_blocks: int

    @property
    def num_chunks(self):
        return self.rows.shape[0]

    @property
    def num_steps(self):
        return self.rows.shape[0] // self.CH

    def mxu_passes(self, bsize):
        return self.num_chunks * max(1, (self.Gf * bsize) // CONTRACT)


# target W tile per grid step (double-buffered by the auto-pipeline)
FINE_W_TILE_BYTES = 256 * 1024


def build_fine_schedule(entries_per_row, n_out_blocks: int, bsize: int,
                        Gf: int | None = None,
                        CH: int | None = None) -> FineSchedule:
    """entries_per_row: list (len n_out_blocks) of lists of
    (in_blk, w_id), as for the other builders."""
    Gf = Gf or max(1, CONTRACT // bsize)
    rows, slot, wmap, valid = [], [], [], []
    for r in range(n_out_blocks):
        ents = entries_per_row[r]
        for i in range(0, len(ents), Gf):
            chunk = ents[i:i + Gf]
            pad = Gf - len(chunk)
            rows.append(r)
            slot.append([e[0] for e in chunk] + [0] * pad)
            wmap.append([e[1] for e in chunk] + [0] * pad)
            valid.append([1] * len(chunk) + [0] * pad)
    if CH is None:
        CH = max(8, FINE_W_TILE_BYTES // (bsize * Gf * bsize * 2))
        CH = min(CH, max(1, len(rows)))
    # pad the chunk stream to a CH multiple with sentinel-row chunks
    while len(rows) % CH:
        rows.append(n_out_blocks)
        slot.append([0] * Gf)
        wmap.append([0] * Gf)
        valid.append([0] * Gf)
    return FineSchedule(
        rows=np.asarray(rows, np.int32),
        slot=np.asarray(slot, np.int32),
        wmap=np.asarray(wmap, np.int32),
        valid=np.asarray(valid, np.int32),
        Gf=Gf, CH=CH, n_out_blocks=n_out_blocks)


def fine_panels(w, sched: FineSchedule, trans_w: bool):
    """Chunk-order weight panels: (num_chunks*bsize, Gf*bsize); chunk j
    rows [j*b, (j+1)*b), slot i columns [i*b, (i+1)*b).
    trans_w=True (fprop, w blocks stored (c, k)) transposes each block.
    """
    b = w.shape[1]
    flat = w[jnp.asarray(sched.wmap.reshape(-1))]       # (NC*Gf, b, b)
    flat = flat * jnp.asarray(sched.valid.reshape(-1, 1, 1), w.dtype)
    g = flat.reshape(sched.num_chunks, sched.Gf, b, b)
    if trans_w:
        g = g.transpose(0, 3, 1, 2)                     # [j, k, i, c]
    else:
        g = g.transpose(0, 2, 1, 3)                     # [j, c, i, k]
    return g.reshape(sched.num_chunks * b, sched.Gf * b)


def fine_vmem_estimate(C, KB_pad, TN, itemsize, sched: FineSchedule,
                       bsize, out_itemsize=2):
    return (C * TN * itemsize                     # resident x
            + KB_pad * bsize * TN * 4             # resident f32 acc
            + KB_pad * bsize * TN * out_itemsize  # out block
            + 2 * sched.CH * bsize * sched.Gf * bsize * itemsize)  # w


def _xprop_fine_kernel(Gf, CH, bsize, precision, S, TN, TN_IS_N,
                       rows_ref, slot_ref, x_ref, w_ref, out_ref,
                       acc_ref, xbuf, sem):
    n, s = pl.program_id(0), pl.program_id(1)

    @pl.when(s == 0)
    def _():
        src = x_ref if TN_IS_N else x_ref.at[:, pl.ds(n * TN, TN)]
        cp = pltpu.make_async_copy(src, xbuf, sem)
        cp.start()
        cp.wait()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def chunk(j):
        base = s * CH + j
        xcat = jnp.concatenate(
            [xbuf[pl.ds(slot_ref[base * Gf + i] * bsize, bsize), :]
             for i in range(Gf)], axis=0)                 # (Gf*b, TN)
        wj = w_ref[pl.ds(j * bsize, bsize), :]            # (b, Gf*b)
        off = rows_ref[base] * bsize
        acc_ref[pl.ds(off, bsize), :] += jax.lax.dot_general(
            wj, xcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def body(j, carry):
        chunk(j)
        return carry
    jax.lax.fori_loop(0, CH, body, 0)

    @pl.when(s == S - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def xprop_pallas_fine(x, w_panels, sched: FineSchedule, bsize: int,
                      precision=None, out_dtype=None):
    """x (C, N) feature-major; w_panels from :func:`fine_panels`.
    Returns (n_out_blocks*bsize, N).  N must be <= 128 or a multiple
    of 128 (the whole x column tile goes resident)."""
    C, N = x.shape
    TN = N if N <= 128 else 128
    assert N % TN == 0
    prec = dot_precision(x.dtype, precision)
    out_dtype = out_dtype or x.dtype
    S = sched.num_steps
    CH, Gf = sched.CH, sched.Gf
    KB_pad = sched.n_out_blocks + 1
    M = KB_pad * bsize

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // TN, S),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((CH * bsize, Gf * bsize),
                         lambda n, s, rw, sl: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda n, s, rw, sl: (0, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, TN), jnp.float32),
            pltpu.VMEM((C, TN), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    cost = pl.CostEstimate(
        flops=2 * sched.num_chunks * bsize * Gf * bsize * N,
        bytes_accessed=(C * N + w_panels.size * (N // TN))
        * x.dtype.itemsize + M * N * 4,
        transcendentals=0,
    )
    fn = pl.pallas_call(
        functools.partial(_xprop_fine_kernel, Gf, CH, bsize, prec, S,
                          TN, TN == N),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    out = fn(jnp.asarray(sched.rows), jnp.asarray(sched.slot.reshape(-1)),
             x, w_panels)
    return out[:sched.n_out_blocks * bsize]
