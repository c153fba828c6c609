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
* Grid is (batch*heads, schedule steps).  K and V stay fully resident in
  VMEM for the whole head (typical head: ctx 8K x hs 64 bf16 = 1 MB), so
  per-step DMA is just the mask chunk.
* Each step processes a chunk of E key-blocks of one query block-row,
  gathered from resident K/V by LUT index.  Per-block masks stream in
  schedule order; padding chunks carry all-zero masks, which the -inf
  masking makes numerically inert.
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
# the flash design saves).  Codes are tiny scalar-prefetch data; the
# (bs, E*bs) mask is regenerated in-kernel from iota, with a small table
# of deduplicated arbitrary blocks for callback masks that are neither
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
    pallas_call as scalar-prefetch operands."""
    row: np.ndarray       # (S,) q block-row of each step
    first: np.ndarray     # (S,)
    last: np.ndarray      # (S,)
    k_idx: np.ndarray     # (lut_heads, S, E) k block ctx index
    mcode: np.ndarray     # (lut_heads, S, E) int32 mask codes
    muniq: np.ndarray     # (n_uniq*bs, bs) int8 unique arbitrary blocks
    E: int
    bs: int

    @property
    def num_steps(self):
        return self.row.shape[0]

    @property
    def num_blocks_scheduled(self):
        if isinstance(self.mcode, np.ndarray):
            return int((self.mcode != MASK_ABSENT).sum())
        # traced schedule: upper bound (cost-estimate use only)
        return int(np.prod(self.mcode.shape))


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
                        mask_blocks=None, E=None, classified=None):
    """nn_list_per_head: [heads][q_row] -> list of (block_id, k_blk).
    mask_blocks: (lut_heads, blocks, bs, bs) bool or None (None = all
    scheduled blocks fully visible).  classified: optional pre-computed
    (blk_codes, muniq) from classify_mask_blocks — lets many schedules
    (e.g. per ring pair) share one unique-block table."""
    if E is None:
        E = max(1, 512 // bs)
    lut_heads = len(nn_list_per_head)

    if classified is not None:
        blk_codes, muniq = classified
    elif mask_blocks is not None:
        blk_codes, muniq = classify_mask_blocks(mask_blocks, bs)
    else:
        blk_codes, muniq = None, np.zeros((bs, bs), np.int8)

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
        code = mcode_ref[h, s * E + i]
        uo = jnp.maximum(code - MASK_UNIQ0, 0) * bs
        um = um_ref[pl.ds(uo, bs), :].astype(jnp.int32)
        mi = ((code == MASK_FULL).astype(jnp.int32) * ones
              + (code == MASK_TRIL).astype(jnp.int32) * tril
              + (code == MASK_TRIU).astype(jnp.int32) * triu
              + (code >= MASK_UNIQ0).astype(jnp.int32) * um)
        cols.append(mi)
    return jnp.concatenate(cols, axis=1)


def _slot_specs(E, bs, hs, S, lut_heads, heads, n_prefetch_before=3):
    """Per-slot BlockSpecs streaming E gathered (bs, hs) blocks per step
    from HBM (the index map gathers by the flattened k_idx prefetch).
    Used when whole-tensor VMEM residency doesn't fit (huge ctx*hs)."""
    def ix(i):
        def f(bh, s, row, fi, la, ki, mc, i=i):
            h = 0 if lut_heads == 1 else jax.lax.rem(bh, heads)
            return (bh, ki[h * (S * E) + s * E + i], 0)
        return f
    return [pl.BlockSpec((1, bs, hs), ix(i), memory_space=pltpu.VMEM)
            for i in range(E)]


def _attn_kernel(E, bs, hs, scale, lut_heads, heads, precision, stream,
                 row_ref, first_ref, last_ref, kidx_ref, mcode_ref, *refs):
    if stream:
        q_ref = refs[0]
        ks = refs[1:1 + E]
        vs = refs[1 + E:1 + 2 * E]
        um_ref, out_ref, acc_ref, m_ref, l_ref = refs[1 + 2 * E:]
    else:
        q_ref, k_ref, v_ref, um_ref, out_ref, acc_ref, m_ref, l_ref = refs
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                                    # (bs, hs)
    if stream:
        kcat = jnp.concatenate([kr[0] for kr in ks], axis=0)
        vcat = jnp.concatenate([vr[0] for vr in vs], axis=0)
        vdt = vs[0].dtype
    else:
        kcat = jnp.concatenate(
            [k_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)],
            axis=0)                                 # (E*bs, hs)
        vcat = jnp.concatenate(
            [v_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)],
            axis=0)
        vdt = v_ref.dtype
    scores = jax.lax.dot_general(
        q, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask = _gen_mask(mcode_ref, um_ref, h, s, E, bs)
    scores = jnp.where(mask != 0, scores, _NEG_INF)

    m_prev = m_ref[...]                             # (bs, 1)
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                     # (bs, E*bs)
    l_new = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(vdt), vcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    acc_new = acc_ref[...] * alpha + pv

    m_ref[...] = m_new
    l_ref[...] = l_new
    acc_ref[...] = acc_new

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[0] = (acc_new / jnp.maximum(l_new, 1e-30)) \
            .astype(out_ref.dtype)


def fused_attention_fwd(q, k, v, sched: AttnSchedule, heads: int,
                        scale=1.0, precision=None, stream=False):
    """q: (BH, ctx_q, hs); k, v: (BH, ctx_k, hs).  Returns (BH, ctx_q, hs).

    BH = batch*heads with head minor (bh = n*heads + h).  stream=True
    swaps whole-head K/V VMEM residency for per-step slot DMA (no ctx*hs
    size limit; pays a column-degree refetch factor on K/V traffic)."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs, E = sched.bs, sched.E
    S = sched.num_steps
    lut_heads = sched.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    q_spec = pl.BlockSpec((1, bs, hs),
                          lambda bh, s, row, fi, la, ki, mc: (bh, row[s], 0),
                          memory_space=pltpu.VMEM)
    uniq_spec = pl.BlockSpec(sched.muniq.shape,
                             lambda bh, s, row, fi, la, ki, mc: (0, 0),
                             memory_space=pltpu.VMEM)
    if stream:
        slots = _slot_specs(E, bs, hs, S, lut_heads, heads)
        in_specs = [q_spec] + slots + slots + [uniq_spec]
        operands = (q,) + (k,) * E + (v,) * E
    else:
        whole = pl.BlockSpec((1, ctxk, hs),
                             lambda bh, s, row, fi, la, ki, mc: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
        in_specs = [q_spec, whole, whole, uniq_spec]
        operands = (q, k, v)
    out_spec = pl.BlockSpec((1, bs, hs),
                            lambda bh, s, row, fi, la, ki, mc:
                            (bh, row[s], 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((bs, hs), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
        ],
    )
    nblocks = sched.num_blocks_scheduled
    cost = pl.CostEstimate(
        flops=4 * BH * nblocks * bs * bs * hs,
        bytes_accessed=(q.size + 2 * k.size) * q.dtype.itemsize,
        transcendentals=BH * S * bs * E * bs,
    )
    fn = pl.pallas_call(
        functools.partial(_attn_kernel, E, bs, hs, scale, lut_heads, heads,
                          precision, stream),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, ctxq, hs), q.dtype),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    kidx = sched.k_idx.reshape(-1) if stream \
        else sched.k_idx.reshape(lut_heads, -1)
    return fn(jnp.asarray(sched.row), jnp.asarray(sched.first),
              jnp.asarray(sched.last), jnp.asarray(kidx),
              jnp.asarray(sched.mcode.reshape(lut_heads, -1)),
              *operands, jnp.asarray(sched.muniq))


# ------------------------------------------------------------------
# Flash backward.  The forward additionally emits the log-sum-exp per
# query position; the backward recomputes probabilities chunk-by-chunk:
#   dq kernel walks the nn (query-row) schedule,
#   dk/dv kernel walks the tn (key-row) schedule,
# never materializing the blocked score tensor (the reference's
# backward ran three blocked GEMMs over it, transformer.py:391-465).
# ------------------------------------------------------------------

def _attn_fwd_lse_kernel(E, bs, hs, scale, lut_heads, heads, precision,
                         stream, row_ref, first_ref, last_ref, kidx_ref,
                         mcode_ref, *refs):
    if stream:
        q_ref = refs[0]
        ks = refs[1:1 + E]
        vs = refs[1 + E:1 + 2 * E]
        um_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref = refs[1 + 2 * E:]
    else:
        (q_ref, k_ref, v_ref, um_ref, out_ref, lse_ref,
         acc_ref, m_ref, l_ref) = refs
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    if stream:
        kcat = jnp.concatenate([kr[0] for kr in ks], axis=0)
        vcat = jnp.concatenate([vr[0] for vr in vs], axis=0)
        vdt = vs[0].dtype
    else:
        kcat = jnp.concatenate(
            [k_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)
        vcat = jnp.concatenate(
            [v_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)
        vdt = v_ref.dtype
    scores = jax.lax.dot_general(
        q, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask = _gen_mask(mcode_ref, um_ref, h, s, E, bs)
    scores = jnp.where(mask != 0, scores, _NEG_INF)

    m_prev = m_ref[...]
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

    @pl.when(last_ref[s] == 1)
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
    S = sched.num_steps
    lut_heads = sched.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    q_spec = pl.BlockSpec((1, bs, hs),
                          lambda bh, s, row, fi, la, ki, mc: (bh, row[s], 0),
                          memory_space=pltpu.VMEM)
    uniq_spec = pl.BlockSpec(sched.muniq.shape,
                             lambda bh, s, row, fi, la, ki, mc: (0, 0),
                             memory_space=pltpu.VMEM)
    if stream:
        slots = _slot_specs(E, bs, hs, S, lut_heads, heads)
        in_specs = [q_spec] + slots + slots + [uniq_spec]
        operands = (q,) + (k,) * E + (v,) * E
    else:
        whole = pl.BlockSpec((1, ctxk, hs),
                             lambda bh, s, row, fi, la, ki, mc: (bh, 0, 0),
                             memory_space=pltpu.VMEM)
        in_specs = [q_spec, whole, whole, uniq_spec]
        operands = (q, k, v)
    out_specs = (
        pl.BlockSpec((1, bs, hs),
                     lambda bh, s, row, fi, la, ki, mc: (bh, row[s], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bs, 1),
                     lambda bh, s, row, fi, la, ki, mc: (bh, row[s], 0),
                     memory_space=pltpu.VMEM),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((bs, hs), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_attn_fwd_lse_kernel, E, bs, hs, scale, lut_heads,
                          heads, precision, stream),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((BH, ctxq, hs), q.dtype),
            jax.ShapeDtypeStruct((BH, ctxq, 1), jnp.float32),
        ),
        interpret=use_interpret(),
    )
    kidx = sched.k_idx.reshape(-1) if stream \
        else sched.k_idx.reshape(lut_heads, -1)
    return fn(jnp.asarray(sched.row), jnp.asarray(sched.first),
              jnp.asarray(sched.last), jnp.asarray(kidx),
              jnp.asarray(sched.mcode.reshape(lut_heads, -1)),
              *operands, jnp.asarray(sched.muniq))


def _attn_dq_kernel(E, bs, hs, scale, lut_heads, heads, precision, stream,
                    row_ref, first_ref, last_ref, kidx_ref, mcode_ref,
                    *refs):
    if stream:
        q_ref = refs[0]
        ks = refs[1:1 + E]
        vs = refs[1 + E:1 + 2 * E]
        (do_ref, lse_ref, dvec_ref, um_ref, dq_ref,
         acc_ref) = refs[1 + 2 * E:]
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, um_ref,
         dq_ref, acc_ref) = refs
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                    # (bs, hs)
    do = do_ref[0]                                  # (bs, hs)
    lse = lse_ref[0]                                # (bs, 1) f32
    dvec = dvec_ref[0]                              # (bs, 1) f32

    if stream:
        kcat = jnp.concatenate([kr[0] for kr in ks], axis=0)
        vcat = jnp.concatenate([vr[0] for vr in vs], axis=0)
        kdt = ks[0].dtype
    else:
        kcat = jnp.concatenate(
            [k_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)            # (E*bs, hs)
        vcat = jnp.concatenate(
            [v_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)
        kdt = k_ref.dtype

    scores = jax.lax.dot_general(
        q, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask = _gen_mask(mcode_ref, um_ref, h, s, E, bs)
    scores = jnp.where(mask != 0, scores, _NEG_INF)
    p = jnp.exp(scores - lse)                       # (bs, E*bs)

    dp = jax.lax.dot_general(
        do, vcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - dvec) * scale                    # (bs, E*bs)

    acc_ref[...] += jax.lax.dot_general(
        ds.astype(kdt), kcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(last_ref[s] == 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _attn_dkv_kernel(E, bs, hs, scale, lut_heads, heads, precision, stream,
                     row_ref, first_ref, last_ref, qidx_ref, mcode_ref,
                     *refs):
    if stream:
        k_ref, v_ref = refs[0], refs[1]
        qs = refs[2:2 + E]
        dos = refs[2 + E:2 + 2 * E]
        lses = refs[2 + 2 * E:2 + 3 * E]
        dvecs = refs[2 + 3 * E:2 + 4 * E]
        um_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs[2 + 4 * E:]
    else:
        (k_ref, v_ref, q_ref, do_ref, lse_ref, dvec_ref, um_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kb = k_ref[0]                                   # (bs, hs)
    vb = v_ref[0]

    if stream:
        qcat = jnp.concatenate([r[0] for r in qs], axis=0)
        docat = jnp.concatenate([r[0] for r in dos], axis=0)
        lsecat = jnp.concatenate([r[0] for r in lses], axis=0)
        dveccat = jnp.concatenate([r[0] for r in dvecs], axis=0)
        qdt, dodt = qs[0].dtype, dos[0].dtype
    else:
        qcat = jnp.concatenate(
            [q_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)            # (E*bs, hs)
        docat = jnp.concatenate(
            [do_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)
        lsecat = jnp.concatenate(
            [lse_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)            # (E*bs, 1)
        dveccat = jnp.concatenate(
            [dvec_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
             for i in range(E)], axis=0)
        qdt, dodt = q_ref.dtype, do_ref.dtype

    # scores^T: (bs_k, E*bs_q)
    s_t = jax.lax.dot_general(
        kb, qcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask_t = _gen_mask(mcode_ref, um_ref, h, s, E, bs)  # (bs_k, E*bs_q)
    s_t = jnp.where(mask_t != 0, s_t, _NEG_INF)
    p_t = jnp.exp(s_t - lsecat.reshape(1, -1))      # (bs_k, E*bs_q)

    dv_acc[...] += jax.lax.dot_general(
        p_t.astype(dodt), docat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    dp_t = jax.lax.dot_general(
        vb, docat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ds_t = p_t * (dp_t - dveccat.reshape(1, -1)) * scale

    dk_acc[...] += jax.lax.dot_general(
        ds_t.astype(qdt), qcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(last_ref[s] == 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def fused_attention_bwd(q, k, v, out, lse, do, sched_nn: AttnSchedule,
                        sched_tn: AttnSchedule, heads: int, scale=1.0,
                        precision=None, stream=False):
    """Returns (dq, dk, dv).  sched_nn walks query rows (same schedule as
    forward); sched_tn walks key rows with transposed masks.  stream=True
    trades whole-tensor VMEM residency for per-step slot DMA."""
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
    lut_heads = sched_nn.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    E = sched_nn.E
    S = sched_nn.num_steps
    row_blk = lambda bh, s, row, fi, la, ki, mc: (bh, row[s], 0)
    whole_k = lambda bh, s, row, fi, la, ki, mc: (bh, 0, 0)
    uniq_ix = lambda bh, s, row, fi, la, ki, mc: (0, 0)
    q_spec = pl.BlockSpec((1, bs, hs), row_blk, memory_space=pltpu.VMEM)
    small = [
        pl.BlockSpec((1, bs, hs), row_blk, memory_space=pltpu.VMEM),   # do
        pl.BlockSpec((1, bs, 1), row_blk, memory_space=pltpu.VMEM),    # lse
        pl.BlockSpec((1, bs, 1), row_blk, memory_space=pltpu.VMEM),    # dvec
        pl.BlockSpec(sched_nn.muniq.shape, uniq_ix,
                     memory_space=pltpu.VMEM),
    ]
    if stream:
        slots = _slot_specs(E, bs, hs, S, lut_heads, heads)
        in_specs = [q_spec] + slots + slots + small
        operands = (q,) + (k,) * E + (v,) * E
        kidx_nn = sched_nn.k_idx.reshape(-1)
    else:
        in_specs = [
            q_spec,
            pl.BlockSpec((1, ctxk, hs), whole_k, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctxk, hs), whole_k, memory_space=pltpu.VMEM),
        ] + small
        operands = (q, k, v)
        kidx_nn = sched_nn.k_idx.reshape(lut_heads, -1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bs, hs), row_blk,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bs, hs), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_attn_dq_kernel, E, bs, hs, scale, lut_heads,
                          heads, precision, stream),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, ctxq, hs),
                                       out_dtype or q.dtype),
        interpret=use_interpret(),
    )(jnp.asarray(sched_nn.row), jnp.asarray(sched_nn.first),
      jnp.asarray(sched_nn.last), jnp.asarray(kidx_nn),
      jnp.asarray(sched_nn.mcode.reshape(lut_heads, -1)),
      *operands, do, lse, dvec, jnp.asarray(sched_nn.muniq))


def fused_attention_dkv(q, k, v, do, lse, dvec, sched_tn: AttnSchedule,
                        heads: int, scale=1.0, precision=None,
                        stream=False, out_dtype=None):
    """dk/dv over the tn (key-row) schedule; callable standalone (ring
    attention runs it once per circulating q shard and sums)."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs = sched_tn.bs
    lut_heads = sched_tn.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    E2 = sched_tn.E
    S2 = sched_tn.num_steps
    row_blk2 = lambda bh, s, row, fi, la, ki, mc: (bh, row[s], 0)
    whole_q = lambda bh, s, row, fi, la, ki, mc: (bh, 0, 0)
    uniq_ix2 = lambda bh, s, row, fi, la, ki, mc: (0, 0)
    kv_specs = [
        pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),   # k
        pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),   # v
    ]
    uniq2 = pl.BlockSpec(sched_tn.muniq.shape, uniq_ix2,
                         memory_space=pltpu.VMEM)
    if stream:
        qslots = _slot_specs(E2, bs, hs, S2, lut_heads, heads)
        oneslots = [pl.BlockSpec((1, bs, 1), sp.index_map,
                                 memory_space=pltpu.VMEM) for sp in qslots]
        in_specs2 = kv_specs + qslots + qslots + oneslots + oneslots \
            + [uniq2]
        operands2 = (k, v) + (q,) * E2 + (do,) * E2 + (lse,) * E2 \
            + (dvec,) * E2
        kidx_tn = sched_tn.k_idx.reshape(-1)
    else:
        in_specs2 = kv_specs + [
            pl.BlockSpec((1, ctxq, hs), whole_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctxq, hs), whole_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctxq, 1), whole_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctxq, 1), whole_q, memory_space=pltpu.VMEM),
        ] + [uniq2]
        operands2 = (k, v, q, do, lse, dvec)
        kidx_tn = sched_tn.k_idx.reshape(lut_heads, -1)
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(BH, S2),
        in_specs=in_specs2,
        out_specs=(
            pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bs, hs), jnp.float32),
                        pltpu.VMEM((bs, hs), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_attn_dkv_kernel, E2, bs, hs, scale, lut_heads,
                          heads, precision, stream),
        grid_spec=grid_spec2,
        out_shape=(jax.ShapeDtypeStruct((BH, ctxk, hs),
                                        out_dtype or k.dtype),
                   jax.ShapeDtypeStruct((BH, ctxk, hs),
                                        out_dtype or v.dtype)),
        interpret=use_interpret(),
    )(jnp.asarray(sched_tn.row), jnp.asarray(sched_tn.first),
      jnp.asarray(sched_tn.last), jnp.asarray(kidx_tn),
      jnp.asarray(sched_tn.mcode.reshape(lut_heads, -1)),
      *operands2, jnp.asarray(sched_tn.muniq))


def build_attn_schedule_tn(tn_list_per_head, nt_list_per_head, ctx_blks_k,
                           bs, mask_blocks=None, E=None):
    """Schedule over KEY block-rows for the dk/dv kernel: entries are
    (block_id, q_blk) from the tn LUT; mask codes are classified on the
    TRANSPOSED blocks (tril <-> triu swap; arbitrary blocks get their
    own transposed unique table)."""
    if E is None:
        E = max(1, 512 // bs)
    mask_t = None
    if mask_blocks is not None:
        mask_t = np.transpose(np.asarray(mask_blocks), (0, 1, 3, 2))
    return build_attn_schedule(tn_list_per_head, ctx_blks_k, bs, mask_t, E=E)
