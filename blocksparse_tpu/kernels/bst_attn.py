"""Fused block-sparse flash attention kernel.

TPU-native replacement for the reference's three-op attention pipeline
(bst_hgemm NT -> bst_masked_softmax -> bst_hgemm NN,
/root/reference/src/bst_hgemm_op_gpu.cu, src/bst_softmax_op_gpu.cu).

Design (TPU-first):
* One kernel computes softmax(scale * Q K^T + mask) V for a layout-driven
  block-sparse attention pattern with a streaming (online) softmax — the
  blocked score tensor is never materialized, which removes the
  reference's 32K-keys-per-row softmax limit (src/bst_op.cc:383) and its
  2^32-element score tensor limit (src/bst_op.cc:214).
* Grid is (batch*heads, schedule steps).  Each step processes a chunk of
  E key-blocks of one query block-row, gathered by LUT index.
* Schedule arrays ride PACKED into ONE flattened 1-D whole-array SMEM
  operand (kidx*4096+mcode), NOT as scalar prefetch: Mosaic replicates
  scalar-prefetch arrays per operand in SMEM, and 2-D/3-D SMEM windows
  are lane-padded 16x — both capsize at large layouts (the ctx-16K
  failure).  Only one packed O(S) row/first/last word (needed by the
  q/out BlockSpec index maps) stays in scalar prefetch.  Dense-causal
  ctx 32768 (S=16640) fits in ~0.6 MB SMEM under this packing.
* Two K/V residency modes:
  - resident (default, small ctx): K and V live whole in VMEM for the
    head (ctx 8K x hs 64 bf16 = 1 MB) and blocks are gathered in-VMEM.
  - stream (large ctx): K/V stay in HBM (ANY memory space) and each
    step's E blocks are gathered by explicit double-buffered DMA — the
    next chunk's copies start before this chunk's compute, so gather
    overlaps the MXU work.  No ctx*hs size limit.

Stream-mode lane folding (round 4): Mosaic only DMAs HBM slices whose
lane (minor) dim is 128-aligned, and hs=64 tensors are lane-padded
64->128 in HBM, so a (bs, hs<128) block cannot be gathered directly
(measured: "Slice shape along dimension 2 must be aligned to tiling
(128)"; value/ref-level lane slicing and lane-splitting reshapes crash
the compiler outright — tools/tpu_dma_variants.py).  The streamed
kernels therefore work on a FOLDED operand layout:
  * K/V (and q/do for the dkv pass) are riffle-folded outside the
    kernel to (BH, ctx*hs//128, 128): with F = 128//hs parts and
    g = bs//F folded rows per block, folded row r of a block carries
    rows {r + f*g : f} of the block in its F lane-parts — so lane-part
    f of a gathered chunk is rows [f*g, (f+1)*g) in natural order.
  * Scores are computed per part with a zero-padded q (q placed at
    lanes [f*hs, (f+1)*hs)) dotted against the folded chunk; the
    online softmax runs across the F part-score tiles jointly.
  * p@V dots emit (bs, 128) tiles whose lane-part f holds part-f keys'
    true contribution; a lane mask keeps it and the folded f32
    accumulator sums parts in place.
  * Outputs are emitted FOLDED, (.., 128) wide, and unfolded outside
    the kernel by summing the F hs-wide lane slices (plain XLA).
At hs=128 (F=1) the folded math degenerates to the natural math with
no extra work; at hs<128 the QK^T/PV dots run F x the MACs (padded
operands), which hides under the DMA gather that dominates stream
mode.  The riffle-fold itself is one XLA gather over K/V per call.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blocksparse_tpu.kernels.common import use_interpret

_NEG_INF = -1e30


# Per-slot mask codes (replaces the round-1 dense int8 mask stream,
# which moved bs*E*bs bytes per step from HBM — rivaling the K/V traffic
# the flash design saves).  Codes are tiny SMEM data; the (bs, E*bs)
# mask is regenerated in-kernel from iota, with a small table of
# deduplicated arbitrary blocks for callback masks that are neither
# full nor (anti)causal.  Matches the information content of the
# reference's bit-packed masks (transformer.py:135-159) at even lower
# traffic for the common cases.
MASK_ABSENT = 0   # padding slot: fully masked
MASK_FULL = 1     # all-visible block
MASK_TRIL = 2     # q >= k within the block (causal diagonal)
MASK_TRIU = 3     # q <= k (transposed causal; appears in tn schedules)
MASK_UNIQ0 = 4    # >=4: index code-4 into the unique-block table


@dataclass
class AttnSchedule:
    """Arrays may be numpy (host-built) or traced jnp (e.g. a per-shard
    slice selected by axis_index inside shard_map — sequence parallel);
    every consumer only relies on shapes and passes them through to
    pallas_call as operands."""
    row: np.ndarray       # (S,) q block-row (or row-GROUP, q_mult>1)
    first: np.ndarray     # (S,)
    last: np.ndarray      # (S,)
    k_idx: np.ndarray     # (lut_heads, S, E) k block ctx index
    mcode: np.ndarray     # (lut_heads, S, E) int32 mask codes
    muniq: np.ndarray     # (n_uniq*bs, bs) int8 unique arbitrary blocks
    E: int
    bs: int
    # q-row pairing (q_mult=2): each step serves a GROUP of q_mult
    # adjacent q block-rows with one (q_mult*bs, hs) q tile, amortizing
    # the per-row fixed cost (q load, softmax state, out write — 41% of
    # the sp75 row, results_attn_breakdown.json) over q_mult rows.
    # k_idx holds the union of the group's k blocks; mcode masks the
    # FIRST row's visibility per slot, mcode2 the second's
    # (MASK_ABSENT where a row lacks the block).
    q_mult: int = 1
    mcode2: np.ndarray = None

    @property
    def num_steps(self):
        return self.row.shape[0]

    @property
    def num_blocks_scheduled(self):
        if isinstance(self.mcode, np.ndarray):
            n = int((self.mcode != MASK_ABSENT).sum())
            if self.mcode2 is not None:
                n += int((self.mcode2 != MASK_ABSENT).sum())
            return n
        # traced schedule: upper bound (cost-estimate use only)
        return int(np.prod(self.mcode.shape)) * self.q_mult


def classify_mask_blocks(mask_blocks, bs):
    """(lut_heads, blocks, bs, bs) bool -> (codes (lut_heads, blocks),
    uniq table (n_uniq*bs, bs) int8)."""
    mb = np.asarray(mask_blocks, bool)
    tril = np.tril(np.ones((bs, bs), bool))
    triu = tril.T
    lut_heads, blocks = mb.shape[:2]
    codes = np.zeros((lut_heads, blocks), np.int32)
    uniq, uniq_of = [], {}
    for h in range(lut_heads):
        for b in range(blocks):
            m = mb[h, b]
            if m.all():
                codes[h, b] = MASK_FULL
            elif (m == tril).all():
                codes[h, b] = MASK_TRIL
            elif (m == triu).all():
                codes[h, b] = MASK_TRIU
            else:
                key = m.tobytes()
                if key not in uniq_of:
                    uniq_of[key] = len(uniq)
                    uniq.append(m)
                codes[h, b] = MASK_UNIQ0 + uniq_of[key]
    if uniq:
        table = np.concatenate([m.astype(np.int8) for m in uniq], axis=0)
    else:
        table = np.zeros((bs, bs), np.int8)
    return codes, table


def build_attn_schedule(nn_list_per_head, ctx_blks_q, bs,
                        mask_blocks=None, E=None, classified=None,
                        q_mult=1):
    """nn_list_per_head: [heads][q_row] -> list of (block_id, k_blk).
    mask_blocks: (lut_heads, blocks, bs, bs) bool or None (None = all
    scheduled blocks fully visible).  classified: optional pre-computed
    (blk_codes, muniq) from classify_mask_blocks — lets many schedules
    (e.g. per ring pair) share one unique-block table.

    q_mult=2 pairs adjacent q block-rows: each step's k_idx is the
    UNION of the pair's k blocks, mcode the first row's per-slot
    visibility and mcode2 the second's (MASK_ABSENT where that row
    lacks the block).  Requires ctx_blks_q % 2 == 0.  Union slots a
    row lacks bill its half of the (2bs, bs) score tile for nothing —
    cheap for layouts where adjacent rows share most k blocks (local
    windows shift by one block, verticals are identical)."""
    if E is None:
        E = max(1, 512 // bs)
    lut_heads = len(nn_list_per_head)
    assert q_mult in (1, 2), q_mult
    if q_mult == 2:
        assert ctx_blks_q % 2 == 0, \
            "q_mult=2 requires an even q block-row count"

    if classified is not None:
        blk_codes, muniq = classified
    elif mask_blocks is not None:
        blk_codes, muniq = classify_mask_blocks(mask_blocks, bs)
    else:
        blk_codes, muniq = None, np.zeros((bs, bs), np.int8)

    def code_of(h, bid):
        return MASK_FULL if blk_codes is None else blk_codes[h, bid]

    if q_mult == 2:
        # per pair and head: ordered union keyed by k block, with the
        # per-half codes
        n_groups = ctx_blks_q // 2
        unions = []       # [h][g] -> list of (kb, code_top, code_bot)
        for h in range(lut_heads):
            per_g = []
            for g in range(n_groups):
                top = {kb: code_of(h, bid)
                       for bid, kb in nn_list_per_head[h][2 * g]}
                bot = {kb: code_of(h, bid)
                       for bid, kb in nn_list_per_head[h][2 * g + 1]}
                kbs = list(top.keys()) \
                    + [kb for kb in bot if kb not in top]
                per_g.append([(kb, top.get(kb, MASK_ABSENT),
                               bot.get(kb, MASK_ABSENT)) for kb in kbs])
            unions.append(per_g)
        chunks_per_row = []
        for g in range(n_groups):
            n = max(max(len(u[g]) for u in unions), 1)
            chunks_per_row.append(-(-n // E))
        S = sum(chunks_per_row)
        row = np.zeros(S, np.int32)
        first = np.zeros(S, np.int32)
        last = np.zeros(S, np.int32)
        k_idx = np.zeros((lut_heads, S, E), np.int32)
        mcode = np.zeros((lut_heads, S, E), np.int32)
        mcode2 = np.zeros((lut_heads, S, E), np.int32)
        s = 0
        for g in range(n_groups):
            nch = chunks_per_row[g]
            for c in range(nch):
                row[s] = g
                first[s] = 1 if c == 0 else 0
                last[s] = 1 if c == nch - 1 else 0
                for h in range(lut_heads):
                    ents = unions[h][g][c * E:(c + 1) * E]
                    for i, (kb, ct, cb) in enumerate(ents):
                        k_idx[h, s, i] = kb
                        mcode[h, s, i] = ct
                        mcode2[h, s, i] = cb
                s += 1
        return AttnSchedule(row=row, first=first, last=last, k_idx=k_idx,
                            mcode=mcode, muniq=muniq, E=E, bs=bs,
                            q_mult=2, mcode2=mcode2)

    # step layout shared across heads: rows can differ per head, so pad
    # to the max chunk count per row across heads
    chunks_per_row = []
    for q in range(ctx_blks_q):
        n = max(max(len(h[q]) for h in nn_list_per_head), 1)
        chunks_per_row.append(-(-n // E))
    S = sum(chunks_per_row)

    row = np.zeros(S, np.int32)
    first = np.zeros(S, np.int32)
    last = np.zeros(S, np.int32)
    k_idx = np.zeros((lut_heads, S, E), np.int32)
    mcode = np.zeros((lut_heads, S, E), np.int32)

    s = 0
    for q in range(ctx_blks_q):
        nch = chunks_per_row[q]
        for c in range(nch):
            row[s] = q
            first[s] = 1 if c == 0 else 0
            last[s] = 1 if c == nch - 1 else 0
            for h in range(lut_heads):
                ents = nn_list_per_head[h][q][c * E:(c + 1) * E]
                for i, (bid, kb) in enumerate(ents):
                    k_idx[h, s, i] = kb
                    mcode[h, s, i] = (MASK_FULL if blk_codes is None
                                      else blk_codes[h, bid])
            s += 1

    return AttnSchedule(row=row, first=first, last=last, k_idx=k_idx,
                        mcode=mcode, muniq=muniq, E=E, bs=bs)


def _gen_mask(mcode_ref, um_ref, h, s, E, bs):
    """Regenerate the (bs, E*bs) mask (int32, nonzero = visible) from
    per-slot codes.  Integer scalar*vector selects — Mosaic cannot
    relayout i1 vectors produced by scalar/vector `where` chains."""
    r = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    tril = (r >= c).astype(jnp.int32)
    triu = (r <= c).astype(jnp.int32)
    ones = jnp.ones((bs, bs), jnp.int32)
    cols = []
    for i in range(E):
        code = mcode_ref[h, s, i]
        uo = jnp.maximum(code - MASK_UNIQ0, 0) * bs
        um = um_ref[pl.ds(uo, bs), :].astype(jnp.int32)
        mi = ((code == MASK_FULL).astype(jnp.int32) * ones
              + (code == MASK_TRIL).astype(jnp.int32) * tril
              + (code == MASK_TRIU).astype(jnp.int32) * triu
              + (code >= MASK_UNIQ0).astype(jnp.int32) * um)
        cols.append(mi)
    return jnp.concatenate(cols, axis=1)


def _gen_mask_qm(qm, mcode_ref, sched2_ref, um_ref, h, s, S, E, bs):
    """(qm*bs, E*bs) mask: the first row-half's codes from the packed
    word, the second's from the plain mcode2 SMEM array."""
    m = _gen_mask(mcode_ref, um_ref, h, s, E, bs)
    if qm == 1:
        return m
    m2 = _gen_mask(_Plain2(sched2_ref, S, E), um_ref, h, s, E, bs)
    return jnp.concatenate([m, m2], axis=0)


def _vmem_gather(ref, kidx_ref, h, s, E, bs):
    """Gather E (bs, hs) blocks from a whole-VMEM (1, ctx, hs) ref by
    the SMEM schedule -> (E*bs, hs)."""
    return jnp.concatenate(
        [ref[0, pl.ds(kidx_ref[h, s, i] * bs, bs), :] for i in range(E)],
        axis=0)


def _row_gather(ref2, kidx_ref, h, s, E, bs):
    """Gather E (1, bs) rows from a whole-VMEM (1, ctx_blks, bs) ref of
    per-position scalars (lse/dvec in block-row form) -> (1, E*bs).
    The (ctx_blks, bs) form keeps bs on the lane axis; a (ctx, 1) form
    would pad each row to 128 lanes (8 MB VMEM at ctx 16K)."""
    return jnp.concatenate(
        [ref2[0, pl.ds(kidx_ref[h, s, i], 1), :] for i in range(E)],
        axis=1)


def _fold_factor(hs):
    """Stream-mode lane-fold factor.  hs must divide 128: larger or
    non-dividing head sizes cannot be DMA-gathered block-wise on TPU
    (see module doc); use the resident path or split/pad heads."""
    if hs == 128:
        return 1
    if hs > 128 or 128 % hs != 0:
        raise ValueError(
            f"stream-mode fused attention needs head_state dividing 128; "
            f"got {hs}.  Use the resident path or split/pad the head "
            f"dimension.")
    return 128 // hs


def _stream_fold(a, bs):
    """(BH, ctx, hs) -> riffle-folded (BH, ctx*hs//128, 128).  Folded
    row r of block kb carries natural rows {kb*bs + r + f*g : f} in its
    F lane-parts (g = bs//F).  One XLA gather; identity when hs=128."""
    BH, ctx, hs = a.shape
    F = _fold_factor(hs)
    if F == 1:
        return a.reshape(BH, ctx * hs // 128, 128)
    g = bs // F
    a5 = a.reshape(BH, ctx // bs, F, g, hs)
    a5 = jnp.swapaxes(a5, 2, 3)                  # (BH, nblk, g, F, hs)
    return a5.reshape(BH, ctx * hs // 128, 128)


def _unfold_out(out_folded, hs):
    """Sum the F hs-wide lane-parts of a folded (.., 128) output.  The
    parts are disjoint addends (part f holds part-f keys'/queries'
    contribution), so this completes the reduction the kernel could not
    express lane-wise."""
    F = 128 // hs
    if F == 1:
        return out_folded
    return sum(out_folded[..., f * hs:(f + 1) * hs] for f in range(F))


def _split_uniq_parts(muniq, bs, F):
    """Reorder the (n_uniq*bs, bs) unique-mask table into per-part
    column strips (n_uniq*F*bs, g) so the kernel can read part f of
    unique block u at rows [(u*F + f)*bs, +bs) — 128-aligned lane
    slicing inside the kernel is unavailable."""
    if F == 1:
        return muniq
    g = bs // F
    n = muniq.shape[0] // bs
    if isinstance(muniq, np.ndarray):
        t = muniq.reshape(n, bs, F, g).transpose(0, 2, 1, 3)
        return np.ascontiguousarray(t).reshape(n * F * bs, g)
    t = jnp.swapaxes(muniq.reshape(n, bs, F, g), 1, 2)
    return t.reshape(n * F * bs, g)


def _gen_mask_part(mcode_ref, ump_ref, h, s, E, bs, g, F, f):
    """Part-f mask tile (bs, E*g) in folded column order: column
    (i, r) is slot i's within-block key/query index r + f*g.  Codes are
    evaluated arithmetically; UNIQ blocks read their part strip from
    the _split_uniq_parts table."""
    r = jax.lax.broadcasted_iota(jnp.int32, (bs, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bs, g), 1) + f * g
    tril = (r >= c).astype(jnp.int32)
    triu = (r <= c).astype(jnp.int32)
    ones = jnp.ones((bs, g), jnp.int32)
    cols = []
    for i in range(E):
        code = mcode_ref[h, s, i]
        uo = (jnp.maximum(code - MASK_UNIQ0, 0) * F + f) * bs
        um = ump_ref[pl.ds(uo, bs), :].astype(jnp.int32)
        mi = ((code == MASK_FULL).astype(jnp.int32) * ones
              + (code == MASK_TRIL).astype(jnp.int32) * tril
              + (code == MASK_TRIU).astype(jnp.int32) * triu
              + (code >= MASK_UNIQ0).astype(jnp.int32) * um)
        cols.append(mi)
    return jnp.concatenate(cols, axis=1)


def _pad_part(x, f, F):
    """Place (bs, hs) x at lane-part f of a (bs, 128) zero tile."""
    if F == 1:
        return x
    z = jnp.zeros_like(x)
    return jnp.concatenate([x if j == f else z for j in range(F)], axis=1)


def _part_keep(tile, hs, f):
    """Zero all lane-parts of a (bs, 128) f32 tile except part f."""
    if hs == 128:
        return tile
    lane = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    return jnp.where(lane // hs == f, tile, 0.0)


def _row_gather_part(ref3, kidx_ref, h, s, E, F, g, f):
    """Gather E (1, g) part-f rows of per-position scalars stored in
    (ctx_blks*F, g) part-split block-row form -> (1, E*g)."""
    return jnp.concatenate(
        [ref3[0, pl.ds(kidx_ref[h, s, i] * F + f, 1), :] for i in range(E)],
        axis=1)


def _stream_gather(srcs, bufs, sems, kidx_ref, h, s, S, bh, E, g):
    """Double-buffered DMA gather of E folded blocks (g rows x 128
    lanes each) per source from ANY-space (HBM) refs, indexed by the
    SMEM schedule.  Starts step s+1's copies before waiting on step
    s's, so the next chunk's gather overlaps this chunk's compute.
    Every started copy is waited exactly once (warm-up copies at
    s == 0; step t's copies in step t)."""
    def descs(step, slot):
        out = []
        for t, (src, buf) in enumerate(zip(srcs, bufs)):
            for i in range(E):
                kb = kidx_ref[h, step, i]
                out.append(pltpu.make_async_copy(
                    src.at[bh, pl.ds(kb * g, g), :],
                    buf.at[slot, pl.ds(i * g, g), :],
                    sems.at[slot, t, i]))
        return out

    slot = jax.lax.rem(s, 2)

    @pl.when(s == 0)
    def _():
        for d in descs(0, 0):
            d.start()

    @pl.when(s + 1 < S)
    def _():
        for d in descs(s + 1, 1 - slot):
            d.start()

    for d in descs(s, slot):
        d.wait()
    return [buf[slot] for buf in bufs]


# SMEM budget engineering (the round-3 ctx-16384 failure was an SMEM
# overflow).  Three measures keep the schedule within the ~1 MB budget:
#   1. FLATTEN to 1-D: a 3-D s32[(H, S, E)] SMEM window is lane-padded
#      E->128 by Mosaic (16x at E=8; 672 KB per operand at ctx 16K).
#      1-D SMEM arrays are stored densely.
#   2. PACK (k_idx, mcode) into ONE int32 word kidx*4096 + mcode
#      (kidx < 2^19 block-rows, mcode < 4096 codes) — halves the big
#      schedule operand.
#   3. PACK (row, first, last) prefetch scalars into one word
#      row*4 + first*2 + last — prefetched operands are replicated
#      per-operand by Mosaic, so 3 -> 1 saves 2*4*S bytes.
# Net at dense-causal ctx 32768 (S=16640, E=8): 1.22 MB -> ~0.6 MB.
_MCODE_BITS = 12           # mcode < 4096 (incl. unique-table codes)
_MCODE_MOD = 1 << _MCODE_BITS


def _sched_smem_specs(qm=1):
    """Whole-array SMEM spec(s) for the packed (kidx, mcode) schedule
    (+ the second-row mcode2 array when q_mult > 1)."""
    return [pl.BlockSpec(memory_space=pltpu.SMEM)] * (2 if qm > 1 else 1)


class _PackedHi:
    """kidx view: scalar [h, s, i] reads -> packed_ref[...] // 4096."""

    __slots__ = ("ref", "S", "E")

    def __init__(self, ref, S, E):
        self.ref, self.S, self.E = ref, S, E

    def __getitem__(self, idx):
        h, s, i = idx
        return self.ref[(h * self.S + s) * self.E + i] // _MCODE_MOD


class _PackedLo:
    """mcode view: scalar [h, s, i] reads -> packed_ref[...] % 4096."""

    __slots__ = ("ref", "S", "E")

    def __init__(self, ref, S, E):
        self.ref, self.S, self.E = ref, S, E

    def __getitem__(self, idx):
        h, s, i = idx
        return jax.lax.rem(self.ref[(h * self.S + s) * self.E + i],
                           _MCODE_MOD)


class _Plain2:
    """mcode2 view: scalar [h, s, i] -> second-codes SMEM ref."""

    __slots__ = ("ref", "S", "E")

    def __init__(self, ref, S, E):
        self.ref, self.S, self.E = ref, S, E

    def __getitem__(self, idx):
        h, s, i = idx
        return self.ref[(h * self.S + s) * self.E + i]


def _sched_args(sched: AttnSchedule):
    """(packed row/first/last prefetch scalar, packed kidx/mcode
    [, mcode2]) operands for a schedule."""
    row = jnp.asarray(sched.row)
    first = jnp.asarray(sched.first)
    last = jnp.asarray(sched.last)
    kidx = jnp.asarray(sched.k_idx).reshape(-1)
    mcode = jnp.asarray(sched.mcode).reshape(-1)
    if isinstance(sched.k_idx, np.ndarray):
        assert int(sched.k_idx.max(initial=0)) < (1 << 19), \
            "k_idx exceeds 2^19 block-rows (packed-schedule limit)"
        assert int(sched.mcode.max(initial=0)) < _MCODE_MOD, \
            "mcode exceeds 4095 (too many unique mask blocks)"
    rfl = row * 4 + first * 2 + last
    args = (rfl.astype(jnp.int32),
            (kidx * _MCODE_MOD + mcode).astype(jnp.int32))
    if sched.q_mult > 1:
        args += (jnp.asarray(sched.mcode2).reshape(-1).astype(jnp.int32),)
    return args


# index-map helpers: signature (bh, s, rfl) with rfl = row*4+first*2+last
def _row_blk(bh, s, rfl):
    return (bh, rfl[s] // 4, 0)


def _whole(bh, s, rfl):
    return (bh, 0, 0)


def _fixed(bh, s, rfl):
    return (0, 0)


def _rfl_first(rfl_ref, s):
    return jax.lax.rem(rfl_ref[s] // 2, 2)


def _rfl_last(rfl_ref, s):
    return jax.lax.rem(rfl_ref[s], 2)


def _stream_scores_parts(q, kfold, mcode_ref, um_ref, h, s, E, bs, hs,
                         scale, precision, mcode2_ref=None):
    """Per-part masked score tiles [(qm*bs, E*g)] from a folded K
    chunk.  mcode2_ref (q_mult=2): second row-half's codes; the mask
    halves stack on the q-row axis like the q tile does."""
    F = 128 // hs
    g = bs // F
    parts = []
    for f in range(F):
        qp = _pad_part(q, f, F)
        sf = jax.lax.dot_general(
            qp, kfold, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision) * scale
        mf = _gen_mask_part(mcode_ref, um_ref, h, s, E, bs, g, F, f)
        if mcode2_ref is not None:
            mf2 = _gen_mask_part(mcode2_ref, um_ref, h, s, E, bs, g, F, f)
            mf = jnp.concatenate([mf, mf2], axis=0)
        parts.append(jnp.where(mf != 0, sf, _NEG_INF))
    return parts


def _attn_kernel(E, bs, hs, scale, lut_heads, heads, precision, stream, S,
                 qm, rfl_ref, sched_ref, *refs):
    sched2_ref = None
    if qm > 1:
        sched2_ref, refs = refs[0], refs[1:]
    if stream:
        (q_ref, k_ref, v_ref, um_ref, out_ref,
         acc_ref, m_ref, l_ref, kbuf, vbuf, sems) = refs
    else:
        (q_ref, k_ref, v_ref, um_ref, out_ref,
         acc_ref, m_ref, l_ref) = refs
    kidx_ref = _PackedHi(sched_ref, S, E)
    mcode_ref = _PackedLo(sched_ref, S, E)
    s = pl.program_id(1)
    bh = pl.program_id(0)
    h = 0 if lut_heads == 1 else jax.lax.rem(bh, heads)

    @pl.when(_rfl_first(rfl_ref, s) == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                                    # (bs, hs)
    m_prev = m_ref[...]                             # (bs, 1)
    if stream:
        F = 128 // hs
        g = bs // F
        kfold, vfold = _stream_gather([k_ref, v_ref], [kbuf, vbuf], sems,
                                      kidx_ref, h, s, S, bh, E, g)
        vdt = vbuf.dtype
        mc2 = _Plain2(sched2_ref, S, E) if qm > 1 else None
        s_parts = _stream_scores_parts(q, kfold, mcode_ref, um_ref, h, s,
                                       E, bs, hs, scale, precision,
                                       mcode2_ref=mc2)
        m_new = m_prev
        for sf in s_parts:
            m_new = jnp.maximum(m_new, jnp.max(sf, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[...] * alpha
        pv = jnp.zeros_like(acc_ref)
        for f, sf in enumerate(s_parts):
            pf = jnp.exp(sf - m_new)
            l_new = l_new + jnp.sum(pf, axis=1, keepdims=True)
            gf = jax.lax.dot_general(
                pf.astype(vdt), vfold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            pv = pv + _part_keep(gf, hs, f)
        acc_new = acc_ref[...] * alpha + pv
    else:
        kcat = _vmem_gather(k_ref, kidx_ref, h, s, E, bs)   # (E*bs, hs)
        vcat = _vmem_gather(v_ref, kidx_ref, h, s, E, bs)
        vdt = v_ref.dtype
        scores = jax.lax.dot_general(
            q, kcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision) * scale
        mask = _gen_mask_qm(qm, mcode_ref, sched2_ref, um_ref,
                            h, s, S, E, bs)
        scores = jnp.where(mask != 0, scores, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                 # (qm*bs, E*bs)
        l_new = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(vdt), vcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc_new = acc_ref[...] * alpha + pv

    m_ref[...] = m_new
    l_ref[...] = l_new
    acc_ref[...] = acc_new

    @pl.when(_rfl_last(rfl_ref, s) == 1)
    def _():
        out_ref[0] = (acc_new / jnp.maximum(l_new, 1e-30)) \
            .astype(out_ref.dtype)


def _kv_in_specs(ctxk, hs, stream):
    if stream:
        sp = pl.BlockSpec(memory_space=pl.ANY)
        return [sp, sp]
    whole = pl.BlockSpec((1, ctxk, hs), _whole, memory_space=pltpu.VMEM)
    return [whole, whole]


def _kv_stream_scratch(E, bs, hs, dtype, n_bufs=2):
    """2-slot double buffers for n_bufs folded gathered streams +
    semaphores.  Folded blocks are (g, 128) with g = bs*hs//128."""
    g = bs // _fold_factor(hs)
    return [pltpu.VMEM((2, E * g, 128), dtype) for _ in range(n_bufs)] \
        + [pltpu.SemaphoreType.DMA((2, n_bufs, E))]


def fused_attention_fwd(q, k, v, sched: AttnSchedule, heads: int,
                        scale=1.0, precision=None, stream=False):
    """q: (BH, ctx_q, hs); k, v: (BH, ctx_k, hs).  Returns (BH, ctx_q, hs).

    BH = batch*heads with head minor (bh = n*heads + h).  stream=True
    swaps whole-head K/V VMEM residency for explicit double-buffered DMA
    gather from HBM (no ctx*hs size limit; pays a column-degree refetch
    factor on K/V traffic)."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs, E = sched.bs, sched.E
    qm = sched.q_mult
    bq = bs * qm          # q/out tile height (q_mult pairs rows)
    S = sched.num_steps
    lut_heads = sched.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    q_spec = pl.BlockSpec((1, bq, hs), _row_blk, memory_space=pltpu.VMEM)
    if stream:
        F = _fold_factor(hs)
        k = _stream_fold(k, bs)
        v = _stream_fold(v, bs)
        muniq = _split_uniq_parts(sched.muniq, bs, F)
        out_w = 128
    else:
        muniq = sched.muniq
        out_w = hs
    uniq_spec = pl.BlockSpec(muniq.shape, _fixed, memory_space=pltpu.VMEM)
    in_specs = _sched_smem_specs(qm) + [q_spec] \
        + _kv_in_specs(ctxk, hs, stream) + [uniq_spec]
    out_spec = pl.BlockSpec((1, bq, out_w), _row_blk,
                            memory_space=pltpu.VMEM)

    scratch = [
        pltpu.VMEM((bq, out_w), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
    ]
    if stream:
        scratch += _kv_stream_scratch(E, bs, hs, k.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    nblocks = sched.num_blocks_scheduled
    cost = pl.CostEstimate(
        flops=4 * BH * nblocks * bs * bs * hs,
        bytes_accessed=(q.size + 2 * k.size) * q.dtype.itemsize,
        transcendentals=BH * S * bq * E * bs,
    )
    fn = pl.pallas_call(
        functools.partial(_attn_kernel, E, bs, hs, scale, lut_heads, heads,
                          precision, stream, S, qm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, ctxq, out_w), q.dtype),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    out = fn(*_sched_args(sched), q, k, v, jnp.asarray(muniq))
    return _unfold_out(out, hs) if stream else out


# ------------------------------------------------------------------
# Flash backward.  The forward additionally emits the log-sum-exp per
# query position; the backward recomputes probabilities chunk-by-chunk:
#   dq kernel walks the nn (query-row) schedule,
#   dk/dv kernel walks the tn (key-row) schedule,
# never materializing the blocked score tensor (the reference's
# backward ran three blocked GEMMs over it, transformer.py:391-465).
# ------------------------------------------------------------------

def _attn_fwd_lse_kernel(E, bs, hs, scale, lut_heads, heads, precision,
                         stream, S, qm, rfl_ref, sched_ref, *refs):
    sched2_ref = None
    if qm > 1:
        sched2_ref, refs = refs[0], refs[1:]
    if stream:
        (q_ref, k_ref, v_ref, um_ref, out_ref, lse_ref,
         acc_ref, m_ref, l_ref, kbuf, vbuf, sems) = refs
    else:
        (q_ref, k_ref, v_ref, um_ref, out_ref, lse_ref,
         acc_ref, m_ref, l_ref) = refs
    kidx_ref = _PackedHi(sched_ref, S, E)
    mcode_ref = _PackedLo(sched_ref, S, E)
    s = pl.program_id(1)
    bh = pl.program_id(0)
    h = 0 if lut_heads == 1 else jax.lax.rem(bh, heads)

    @pl.when(_rfl_first(rfl_ref, s) == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    m_prev = m_ref[...]
    if stream:
        F = 128 // hs
        g = bs // F
        kfold, vfold = _stream_gather([k_ref, v_ref], [kbuf, vbuf], sems,
                                      kidx_ref, h, s, S, bh, E, g)
        vdt = vbuf.dtype
        mc2 = _Plain2(sched2_ref, S, E) if qm > 1 else None
        s_parts = _stream_scores_parts(q, kfold, mcode_ref, um_ref, h, s,
                                       E, bs, hs, scale, precision,
                                       mcode2_ref=mc2)
        m_new = m_prev
        for sf in s_parts:
            m_new = jnp.maximum(m_new, jnp.max(sf, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[...] * alpha
        pv = jnp.zeros_like(acc_ref)
        for f, sf in enumerate(s_parts):
            pf = jnp.exp(sf - m_new)
            l_new = l_new + jnp.sum(pf, axis=1, keepdims=True)
            gf = jax.lax.dot_general(
                pf.astype(vdt), vfold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            pv = pv + _part_keep(gf, hs, f)
        acc_ref[...] = acc_ref[...] * alpha + pv
    else:
        kcat = _vmem_gather(k_ref, kidx_ref, h, s, E, bs)
        vcat = _vmem_gather(v_ref, kidx_ref, h, s, E, bs)
        vdt = v_ref.dtype
        scores = jax.lax.dot_general(
            q, kcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision) * scale
        mask = _gen_mask_qm(qm, mcode_ref, sched2_ref, um_ref,
                            h, s, S, E, bs)
        scores = jnp.where(mask != 0, scores, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(vdt), vcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new
    l_ref[...] = l_new

    @pl.when(_rfl_last(rfl_ref, s) == 1)
    def _():
        l_safe = jnp.maximum(l_new, 1e-30)
        out_ref[0] = (acc_ref[...] / l_safe).astype(out_ref.dtype)
        lse_ref[0] = m_new + jnp.log(l_safe)


def fused_attention_fwd_lse(q, k, v, sched: AttnSchedule, heads: int,
                            scale=1.0, precision=None, stream=False):
    """Forward emitting (out, lse); lse shape (BH, ctx_q, 1) float32."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs, E = sched.bs, sched.E
    qm = sched.q_mult
    bq = bs * qm
    S = sched.num_steps
    lut_heads = sched.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    q_spec = pl.BlockSpec((1, bq, hs), _row_blk, memory_space=pltpu.VMEM)
    if stream:
        F = _fold_factor(hs)
        k = _stream_fold(k, bs)
        v = _stream_fold(v, bs)
        muniq = _split_uniq_parts(sched.muniq, bs, F)
        out_w = 128
    else:
        muniq = sched.muniq
        out_w = hs
    uniq_spec = pl.BlockSpec(muniq.shape, _fixed, memory_space=pltpu.VMEM)
    in_specs = _sched_smem_specs(qm) + [q_spec] \
        + _kv_in_specs(ctxk, hs, stream) + [uniq_spec]
    out_specs = (
        pl.BlockSpec((1, bq, out_w), _row_blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 1), _row_blk, memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((bq, out_w), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
    ]
    if stream:
        scratch += _kv_stream_scratch(E, bs, hs, k.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    fn = pl.pallas_call(
        functools.partial(_attn_fwd_lse_kernel, E, bs, hs, scale, lut_heads,
                          heads, precision, stream, S, qm),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((BH, ctxq, out_w), q.dtype),
            jax.ShapeDtypeStruct((BH, ctxq, 1), jnp.float32),
        ),
        interpret=use_interpret(),
    )
    out, lse = fn(*_sched_args(sched), q, k, v, jnp.asarray(muniq))
    return (_unfold_out(out, hs), lse) if stream else (out, lse)


def _attn_dq_kernel(E, bs, hs, scale, lut_heads, heads, precision, stream,
                    S, qm, rfl_ref, sched_ref, *refs):
    sched2_ref = None
    if qm > 1:
        sched2_ref, refs = refs[0], refs[1:]
    if stream:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, um_ref,
         dq_ref, acc_ref, kbuf, vbuf, sems) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, um_ref,
         dq_ref, acc_ref) = refs
    kidx_ref = _PackedHi(sched_ref, S, E)
    mcode_ref = _PackedLo(sched_ref, S, E)
    s = pl.program_id(1)
    bh = pl.program_id(0)
    h = 0 if lut_heads == 1 else jax.lax.rem(bh, heads)

    @pl.when(_rfl_first(rfl_ref, s) == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                    # (bs, hs)
    do = do_ref[0]                                  # (bs, hs)
    lse = lse_ref[0]                                # (bs, 1) f32
    dvec = dvec_ref[0]                              # (bs, 1) f32

    if stream:
        F = 128 // hs
        g = bs // F
        kfold, vfold = _stream_gather([k_ref, v_ref], [kbuf, vbuf], sems,
                                      kidx_ref, h, s, S, bh, E, g)
        kdt = kbuf.dtype
        mc2 = _Plain2(sched2_ref, S, E) if qm > 1 else None
        s_parts = _stream_scores_parts(q, kfold, mcode_ref, um_ref, h, s,
                                       E, bs, hs, scale, precision,
                                       mcode2_ref=mc2)
        for f, sf in enumerate(s_parts):
            pf = jnp.exp(sf - lse)                  # (bs, E*g)
            dop = _pad_part(do, f, F)
            dpf = jax.lax.dot_general(
                dop, vfold, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            dsf = pf * (dpf - dvec) * scale
            gf = jax.lax.dot_general(
                dsf.astype(kdt), kfold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            acc_ref[...] += _part_keep(gf, hs, f)
    else:
        kcat = _vmem_gather(k_ref, kidx_ref, h, s, E, bs)   # (E*bs, hs)
        vcat = _vmem_gather(v_ref, kidx_ref, h, s, E, bs)
        kdt = k_ref.dtype

        scores = jax.lax.dot_general(
            q, kcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision) * scale
        mask = _gen_mask_qm(qm, mcode_ref, sched2_ref, um_ref,
                            h, s, S, E, bs)
        scores = jnp.where(mask != 0, scores, _NEG_INF)
        p = jnp.exp(scores - lse)                   # (qm*bs, E*bs)

        dp = jax.lax.dot_general(
            do, vcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        ds = p * (dp - dvec) * scale                # (bs, E*bs)

        acc_ref[...] += jax.lax.dot_general(
            ds.astype(kdt), kcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(_rfl_last(rfl_ref, s) == 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _attn_dkv_kernel(E, bs, hs, scale, lut_heads, heads, precision, stream,
                     S, qm, rfl_ref, sched_ref, *refs):
    sched2_ref = None
    if qm > 1:
        sched2_ref, refs = refs[0], refs[1:]
    if stream:
        (k_ref, v_ref, q_ref, do_ref, lse_ref, dvec_ref, um_ref,
         dk_ref, dv_ref, dk_acc, dv_acc, qbuf, dobuf, sems) = refs
    else:
        (k_ref, v_ref, q_ref, do_ref, lse_ref, dvec_ref, um_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    qidx_ref = _PackedHi(sched_ref, S, E)
    mcode_ref = _PackedLo(sched_ref, S, E)
    s = pl.program_id(1)
    bh = pl.program_id(0)
    h = 0 if lut_heads == 1 else jax.lax.rem(bh, heads)

    @pl.when(_rfl_first(rfl_ref, s) == 1)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kb = k_ref[0]                                   # (bs, hs)
    vb = v_ref[0]

    if stream:
        F = 128 // hs
        g = bs // F
        qfold, dofold = _stream_gather([q_ref, do_ref], [qbuf, dobuf],
                                       sems, qidx_ref, h, s, S, bh, E, g)
        qdt, dodt = qbuf.dtype, dobuf.dtype
        for f in range(F):
            kbp = _pad_part(kb, f, F)
            s_t_f = jax.lax.dot_general(
                kbp, qfold, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision) * scale        # (bs_k, E*g)
            m_t_f = _gen_mask_part(mcode_ref, um_ref, h, s, E, bs, g, F, f)
            if qm > 1:
                m2 = _gen_mask_part(_Plain2(sched2_ref, S, E), um_ref,
                                    h, s, E, bs, g, F, f)
                m_t_f = jnp.concatenate([m_t_f, m2], axis=0)
            s_t_f = jnp.where(m_t_f != 0, s_t_f, _NEG_INF)
            # lse/dvec ride whole-VMEM in part-split (ctx_blks*F, g) form
            lsecat = _row_gather_part(lse_ref, qidx_ref, h, s, E, F, g, f)
            dveccat = _row_gather_part(dvec_ref, qidx_ref, h, s, E, F, g, f)
            p_t_f = jnp.exp(s_t_f - lsecat)
            gv = jax.lax.dot_general(
                p_t_f.astype(dodt), dofold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            dv_acc[...] += _part_keep(gv, hs, f)
            vbp = _pad_part(vb, f, F)
            dp_t_f = jax.lax.dot_general(
                vbp, dofold, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            ds_t_f = p_t_f * (dp_t_f - dveccat) * scale
            gk = jax.lax.dot_general(
                ds_t_f.astype(qdt), qfold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            dk_acc[...] += _part_keep(gk, hs, f)
    else:
        qcat = _vmem_gather(q_ref, qidx_ref, h, s, E, bs)   # (E*bs, hs)
        docat = _vmem_gather(do_ref, qidx_ref, h, s, E, bs)
        qdt, dodt = q_ref.dtype, do_ref.dtype
        # lse/dvec ride whole-VMEM in (ctx_blks, bs) block-row form
        # (tiny; see _row_gather for why not (ctx, 1))
        lsecat = _row_gather(lse_ref, qidx_ref, h, s, E, bs)    # (1, E*bs)
        dveccat = _row_gather(dvec_ref, qidx_ref, h, s, E, bs)

        # scores^T: (bs_k, E*bs_q)
        s_t = jax.lax.dot_general(
            kb, qcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision) * scale
        mask_t = _gen_mask_qm(qm, mcode_ref, sched2_ref, um_ref,
                              h, s, S, E, bs)        # (qm*bs_k, E*bs_q)
        s_t = jnp.where(mask_t != 0, s_t, _NEG_INF)
        p_t = jnp.exp(s_t - lsecat)                 # (bs_k, E*bs_q)

        dv_acc[...] += jax.lax.dot_general(
            p_t.astype(dodt), docat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

        dp_t = jax.lax.dot_general(
            vb, docat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        ds_t = p_t * (dp_t - dveccat) * scale

        dk_acc[...] += jax.lax.dot_general(
            ds_t.astype(qdt), qcat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    @pl.when(_rfl_last(rfl_ref, s) == 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def fused_attention_bwd(q, k, v, out, lse, do, sched_nn: AttnSchedule,
                        sched_tn: AttnSchedule, heads: int, scale=1.0,
                        precision=None, stream=False):
    """Returns (dq, dk, dv).  sched_nn walks query rows (same schedule as
    forward); sched_tn walks key rows with transposed masks.  stream=True
    trades whole-tensor VMEM residency for explicit DMA gather."""
    # D = rowsum(do * out) per query position
    dvec = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)          # (BH, ctxq, 1)
    dq = fused_attention_dq(q, k, v, do, lse, dvec, sched_nn, heads,
                            scale, precision, stream)
    # dk/dv emit f32 and cast outside the kernel: XLA's buffer promoter
    # otherwise places a large bf16 output in scoped VMEM and busts the
    # 16 MB limit at ctx >= 8192 (measured; f32 outputs exceed the
    # promotion size and stay in HBM).  f32 accumulation is also the
    # more accurate order for the chunk sums.
    dk, dv = fused_attention_dkv(q, k, v, do, lse, dvec, sched_tn, heads,
                                 scale, precision, stream,
                                 out_dtype=jnp.float32)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def fused_attention_dq(q, k, v, do, lse, dvec, sched_nn: AttnSchedule,
                       heads: int, scale=1.0, precision=None,
                       stream=False, out_dtype=None):
    """dq over the nn (query-row) schedule; callable standalone (ring
    attention runs it once per key chunk and sums)."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs = sched_nn.bs
    qm = sched_nn.q_mult
    bq = bs * qm
    lut_heads = sched_nn.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    E = sched_nn.E
    S = sched_nn.num_steps
    q_spec = pl.BlockSpec((1, bq, hs), _row_blk, memory_space=pltpu.VMEM)
    if stream:
        F = _fold_factor(hs)
        k = _stream_fold(k, bs)
        v = _stream_fold(v, bs)
        muniq = _split_uniq_parts(sched_nn.muniq, bs, F)
        out_w = 128
    else:
        muniq = sched_nn.muniq
        out_w = hs
    small = [
        pl.BlockSpec((1, bq, hs), _row_blk, memory_space=pltpu.VMEM),   # do
        pl.BlockSpec((1, bq, 1), _row_blk, memory_space=pltpu.VMEM),    # lse
        pl.BlockSpec((1, bq, 1), _row_blk, memory_space=pltpu.VMEM),    # dvec
        pl.BlockSpec(muniq.shape, _fixed, memory_space=pltpu.VMEM),
    ]
    in_specs = _sched_smem_specs(qm) + [q_spec] \
        + _kv_in_specs(ctxk, hs, stream) + small
    scratch = [pltpu.VMEM((bq, out_w), jnp.float32)]
    if stream:
        scratch += _kv_stream_scratch(E, bs, hs, k.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, out_w), _row_blk,
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    dq = pl.pallas_call(
        functools.partial(_attn_dq_kernel, E, bs, hs, scale, lut_heads,
                          heads, precision, stream, S, qm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, ctxq, out_w),
                                       out_dtype or q.dtype),
        interpret=use_interpret(),
    )(*_sched_args(sched_nn), q, k, v, do, lse, dvec,
      jnp.asarray(muniq))
    return _unfold_out(dq, hs) if stream else dq


def fused_attention_dkv(q, k, v, do, lse, dvec, sched_tn: AttnSchedule,
                        heads: int, scale=1.0, precision=None,
                        stream=False, out_dtype=None):
    """dk/dv over the tn (key-row) schedule; callable standalone (ring
    attention runs it once per circulating q shard and sums)."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs = sched_tn.bs
    qm = sched_tn.q_mult          # here: K-row pairing
    bk = bs * qm
    lut_heads = sched_tn.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    E2 = sched_tn.E
    S2 = sched_tn.num_steps
    ctx_blks_q = ctxq // bs
    kv_specs = [
        pl.BlockSpec((1, bk, hs), _row_blk, memory_space=pltpu.VMEM),   # k
        pl.BlockSpec((1, bk, hs), _row_blk, memory_space=pltpu.VMEM),   # v
    ]
    if stream:
        F = _fold_factor(hs)
        g = bs // F
        q = _stream_fold(q, bs)
        do = _stream_fold(do, bs)
        muniq = _split_uniq_parts(sched_tn.muniq, bs, F)
        # part-split (ctx_blks*F, g) layout for the per-position
        # scalars, matching the folded gathered-q column order
        lse2 = lse.reshape(BH, ctx_blks_q * F, g)
        dvec2 = dvec.reshape(BH, ctx_blks_q * F, g)
        scal_blk = (1, ctx_blks_q * F, g)
        out_w = 128
        qdo_specs = [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
    else:
        muniq = sched_tn.muniq
        # block-row (ctx_blks, bs) layout for the per-position scalars;
        # a (ctx, 1) whole-VMEM operand would tile-pad each position's
        # row to 128 lanes (8 MB at ctx 16K)
        lse2 = lse.reshape(BH, ctx_blks_q, bs)
        dvec2 = dvec.reshape(BH, ctx_blks_q, bs)
        scal_blk = (1, ctx_blks_q, bs)
        out_w = hs
        qdo_specs = [
            pl.BlockSpec((1, ctxq, hs), _whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctxq, hs), _whole, memory_space=pltpu.VMEM),
        ]
    scal_specs = [
        pl.BlockSpec(scal_blk, _whole, memory_space=pltpu.VMEM),   # lse
        pl.BlockSpec(scal_blk, _whole, memory_space=pltpu.VMEM),   # dvec
    ]
    uniq2 = pl.BlockSpec(muniq.shape, _fixed, memory_space=pltpu.VMEM)
    in_specs2 = _sched_smem_specs(qm) + kv_specs + qdo_specs \
        + scal_specs + [uniq2]
    scratch2 = [pltpu.VMEM((bk, out_w), jnp.float32),
                pltpu.VMEM((bk, out_w), jnp.float32)]
    if stream:
        scratch2 += _kv_stream_scratch(E2, bs, hs, q.dtype)
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, S2),
        in_specs=in_specs2,
        out_specs=(
            pl.BlockSpec((1, bk, out_w), _row_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, out_w), _row_blk, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch2,
    )
    dk, dv = pl.pallas_call(
        functools.partial(_attn_dkv_kernel, E2, bs, hs, scale, lut_heads,
                          heads, precision, stream, S2, qm),
        grid_spec=grid_spec2,
        out_shape=(jax.ShapeDtypeStruct((BH, ctxk, out_w),
                                        out_dtype or k.dtype),
                   jax.ShapeDtypeStruct((BH, ctxk, out_w),
                                        out_dtype or v.dtype)),
        interpret=use_interpret(),
    )(*_sched_args(sched_tn), k, v, q, do, lse2, dvec2,
      jnp.asarray(muniq))
    if stream:
        return _unfold_out(dk, hs), _unfold_out(dv, hs)
    return dk, dv


def build_attn_schedule_tn(tn_list_per_head, nt_list_per_head, ctx_blks_k,
                           bs, mask_blocks=None, E=None, q_mult=1):
    """Schedule over KEY block-rows for the dk/dv kernel: entries are
    (block_id, q_blk) from the tn LUT; mask codes are classified on the
    TRANSPOSED blocks (tril <-> triu swap; arbitrary blocks get their
    own transposed unique table).  q_mult=2 pairs adjacent KEY rows
    (one (2bs, hs) k/v tile per step — same fixed-cost amortization as
    the forward's q pairing)."""
    if E is None:
        E = max(1, 512 // bs)
    mask_t = None
    if mask_blocks is not None:
        mask_t = np.transpose(np.asarray(mask_blocks), (0, 1, 3, 2))
    return build_attn_schedule(tn_list_per_head, ctx_blks_k, bs, mask_t,
                               E=E, q_mult=q_mult)
