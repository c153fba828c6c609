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


@dataclass
class AttnSchedule:
    row: np.ndarray       # (S,) q block-row of each step
    first: np.ndarray     # (S,)
    last: np.ndarray      # (S,)
    k_idx: np.ndarray     # (lut_heads, S, E) k block ctx index
    mask_sched: np.ndarray  # (lut_heads, S, bs, E*bs) int8; None if no mask
    E: int
    bs: int

    @property
    def num_steps(self):
        return self.row.shape[0]


def build_attn_schedule(nn_list_per_head, ctx_blks_q, bs,
                        mask_blocks=None, E=None):
    """nn_list_per_head: [heads][q_row] -> list of (block_id, k_blk).
    mask_blocks: (lut_heads, blocks, bs, bs) bool or None."""
    if E is None:
        E = max(1, 512 // bs)
    lut_heads = len(nn_list_per_head)

    # step layout shared across heads (reference requires equal block
    # counts per row? no — equal totals; rows can differ per head, so pad
    # to the max chunk count per row across heads)
    steps = []          # (q_row, chunk_index)
    chunks_per_row = []
    for q in range(ctx_blks_q):
        n = max(max(len(h[q]) for h in nn_list_per_head), 1)
        chunks_per_row.append(-(-n // E))
    S = sum(chunks_per_row)

    row = np.zeros(S, np.int32)
    first = np.zeros(S, np.int32)
    last = np.zeros(S, np.int32)
    k_idx = np.zeros((lut_heads, S, E), np.int32)
    mask_sched = None
    if mask_blocks is not None:
        mask_sched = np.zeros((lut_heads, S, bs, E * bs), np.int8)

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
                    if mask_blocks is not None:
                        mask_sched[h, s, :, i * bs:(i + 1) * bs] = \
                            mask_blocks[h, bid]
                    else:
                        pass
                if mask_blocks is None and len(ents) < E:
                    pass  # handled by valid mask below
            s += 1

    if mask_blocks is None:
        # build a pure validity mask (all-visible blocks, zero padding)
        mask_sched = np.zeros((lut_heads, S, bs, E * bs), np.int8)
        s = 0
        for q in range(ctx_blks_q):
            nch = chunks_per_row[q]
            for c in range(nch):
                for h in range(lut_heads):
                    ents = nn_list_per_head[h][q][c * E:(c + 1) * E]
                    for i in range(len(ents)):
                        mask_sched[h, s, :, i * bs:(i + 1) * bs] = 1
                s += 1
    else:
        # zero out mask for padding slots beyond each row's entries
        s = 0
        for q in range(ctx_blks_q):
            nch = chunks_per_row[q]
            for c in range(nch):
                for h in range(lut_heads):
                    n_ents = len(nn_list_per_head[h][q][c * E:(c + 1) * E])
                    mask_sched[h, s, :, n_ents * bs:] = 0
                s += 1

    return AttnSchedule(row=row, first=first, last=last, k_idx=k_idx,
                        mask_sched=mask_sched, E=E, bs=bs)


def _attn_kernel(E, bs, hs, scale, lut_heads, heads, precision,
                 row_ref, first_ref, last_ref, kidx_ref,
                 q_ref, k_ref, v_ref, mask_ref, out_ref,
                 acc_ref, m_ref, l_ref):
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                                    # (bs, hs)
    kcat = jnp.concatenate(
        [k_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)],
        axis=0)                                     # (E*bs, hs)
    scores = jax.lax.dot_general(
        q, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask = mask_ref[0, 0]                           # (bs, E*bs) int8
    scores = jnp.where(mask != 0, scores, _NEG_INF)

    m_prev = m_ref[...]                             # (bs, 1)
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)                     # (bs, E*bs)
    l_new = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)

    vcat = jnp.concatenate(
        [v_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)],
        axis=0)                                     # (E*bs, hs)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), vcat, (((1,), (0,)), ((), ())),
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
                        scale=1.0, precision=None):
    """q: (BH, ctx_q, hs); k, v: (BH, ctx_k, hs).  Returns (BH, ctx_q, hs).

    BH = batch*heads with head minor (bh = n*heads + h)."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs, E = sched.bs, sched.E
    S = sched.num_steps
    lut_heads = sched.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    def lh_of(bh):
        return 0 if lut_heads == 1 else jax.lax.rem(bh, heads)

    in_specs = [
        pl.BlockSpec((1, bs, hs),
                     lambda bh, s, row, fi, la, ki: (bh, row[s], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ctxk, hs), lambda bh, s, row, fi, la, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ctxk, hs), lambda bh, s, row, fi, la, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, E * bs),
                     lambda bh, s, row, fi, la, ki:
                     (0 if lut_heads == 1 else jax.lax.rem(bh, heads), s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, bs, hs),
                            lambda bh, s, row, fi, la, ki: (bh, row[s], 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((bs, hs), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
            pltpu.VMEM((bs, 1), jnp.float32),
        ],
    )
    nblocks = int((sched.mask_sched != 0).any(axis=(2, 3)).sum())
    cost = pl.CostEstimate(
        flops=4 * BH * nblocks * bs * bs * hs,
        bytes_accessed=(q.size + 2 * k.size) * q.dtype.itemsize
        + BH * S * bs * E * bs,
        transcendentals=BH * S * bs * E * bs,
    )
    fn = pl.pallas_call(
        functools.partial(_attn_kernel, E, bs, hs, scale, lut_heads, heads,
                          precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, ctxq, hs), q.dtype),
        cost_estimate=cost,
        interpret=use_interpret(),
    )
    return fn(jnp.asarray(sched.row), jnp.asarray(sched.first),
              jnp.asarray(sched.last),
              jnp.asarray(sched.k_idx.reshape(lut_heads, -1)),
              q, k, v, jnp.asarray(sched.mask_sched))


# ------------------------------------------------------------------
# Flash backward.  The forward additionally emits the log-sum-exp per
# query position; the backward recomputes probabilities chunk-by-chunk:
#   dq kernel walks the nn (query-row) schedule,
#   dk/dv kernel walks the tn (key-row) schedule,
# never materializing the blocked score tensor (the reference's
# backward ran three blocked GEMMs over it, transformer.py:391-465).
# ------------------------------------------------------------------

def _attn_fwd_lse_kernel(E, bs, hs, scale, lut_heads, heads, precision,
                         row_ref, first_ref, last_ref, kidx_ref,
                         q_ref, k_ref, v_ref, mask_ref, out_ref, lse_ref,
                         acc_ref, m_ref, l_ref):
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    kcat = jnp.concatenate(
        [k_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)
    scores = jax.lax.dot_general(
        q, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask = mask_ref[0, 0]
    scores = jnp.where(mask != 0, scores, _NEG_INF)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    l_new = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)

    vcat = jnp.concatenate(
        [v_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), vcat, (((1,), (0,)), ((), ())),
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
                            scale=1.0, precision=None):
    """Forward emitting (out, lse); lse shape (BH, ctx_q, 1) float32."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs, E = sched.bs, sched.E
    S = sched.num_steps
    lut_heads = sched.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    in_specs = [
        pl.BlockSpec((1, bs, hs),
                     lambda bh, s, row, fi, la, ki: (bh, row[s], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ctxk, hs), lambda bh, s, row, fi, la, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ctxk, hs), lambda bh, s, row, fi, la, ki: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, E * bs),
                     lambda bh, s, row, fi, la, ki:
                     (0 if lut_heads == 1 else jax.lax.rem(bh, heads),
                      s, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, bs, hs),
                     lambda bh, s, row, fi, la, ki: (bh, row[s], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bs, 1),
                     lambda bh, s, row, fi, la, ki: (bh, row[s], 0),
                     memory_space=pltpu.VMEM),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
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
                          heads, precision),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((BH, ctxq, hs), q.dtype),
            jax.ShapeDtypeStruct((BH, ctxq, 1), jnp.float32),
        ),
        interpret=use_interpret(),
    )
    return fn(jnp.asarray(sched.row), jnp.asarray(sched.first),
              jnp.asarray(sched.last),
              jnp.asarray(sched.k_idx.reshape(lut_heads, -1)),
              q, k, v, jnp.asarray(sched.mask_sched))


def _attn_dq_kernel(E, bs, hs, scale, lut_heads, heads, precision,
                    row_ref, first_ref, last_ref, kidx_ref,
                    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref,
                    mask_ref, dq_ref, acc_ref):
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                    # (bs, hs)
    do = do_ref[0]                                  # (bs, hs)
    lse = lse_ref[0]                                # (bs, 1) f32
    dvec = dvec_ref[0]                              # (bs, 1) f32

    kcat = jnp.concatenate(
        [k_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)                # (E*bs, hs)
    vcat = jnp.concatenate(
        [v_ref[0, pl.ds(kidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)

    scores = jax.lax.dot_general(
        q, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask = mask_ref[0, 0]
    scores = jnp.where(mask != 0, scores, _NEG_INF)
    p = jnp.exp(scores - lse)                       # (bs, E*bs)

    dp = jax.lax.dot_general(
        do, vcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ds = p * (dp - dvec) * scale                    # (bs, E*bs)

    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), kcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(last_ref[s] == 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _attn_dkv_kernel(E, bs, hs, scale, lut_heads, heads, precision,
                     row_ref, first_ref, last_ref, qidx_ref,
                     k_ref, v_ref, q_ref, do_ref, lse_ref, dvec_ref,
                     mask_ref, dk_ref, dv_ref, dk_acc, dv_acc):
    s = pl.program_id(1)
    h = 0 if lut_heads == 1 else jax.lax.rem(pl.program_id(0), heads)

    @pl.when(first_ref[s] == 1)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kb = k_ref[0]                                   # (bs, hs)
    vb = v_ref[0]

    qcat = jnp.concatenate(
        [q_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)                # (E*bs, hs)
    docat = jnp.concatenate(
        [do_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)
    lsecat = jnp.concatenate(
        [lse_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)                # (E*bs, 1)
    dveccat = jnp.concatenate(
        [dvec_ref[0, pl.ds(qidx_ref[h, s * E + i] * bs, bs), :]
         for i in range(E)], axis=0)

    # scores^T: (bs_k, E*bs_q)
    s_t = jax.lax.dot_general(
        kb, qcat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision) * scale
    mask_t = mask_ref[0, 0]                         # (bs_k, E*bs_q)
    s_t = jnp.where(mask_t != 0, s_t, _NEG_INF)
    p_t = jnp.exp(s_t - lsecat.reshape(1, -1))      # (bs_k, E*bs_q)

    dv_acc[...] += jax.lax.dot_general(
        p_t.astype(do_ref.dtype), docat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    dp_t = jax.lax.dot_general(
        vb, docat, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    ds_t = p_t * (dp_t - dveccat.reshape(1, -1)) * scale

    dk_acc[...] += jax.lax.dot_general(
        ds_t.astype(q_ref.dtype), qcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(last_ref[s] == 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def fused_attention_bwd(q, k, v, out, lse, do, sched_nn: AttnSchedule,
                        sched_tn: AttnSchedule, heads: int, scale=1.0,
                        precision=None):
    """Returns (dq, dk, dv).  sched_nn walks query rows (same schedule as
    forward); sched_tn walks key rows with transposed masks."""
    BH, ctxq, hs = q.shape
    _, ctxk, _ = k.shape
    bs = sched_nn.bs
    lut_heads = sched_nn.k_idx.shape[0]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

    # D = rowsum(do * out) per query position
    dvec = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)          # (BH, ctxq, 1)

    def head_ix(bh):
        return 0 if lut_heads == 1 else jax.lax.rem(bh, heads)

    # ---- dq over the nn schedule ----
    E = sched_nn.E
    S = sched_nn.num_steps
    row_blk = lambda bh, s, row, fi, la, ki: (bh, row[s], 0)
    whole_k = lambda bh, s, row, fi, la, ki: (bh, 0, 0)
    mask_ix = lambda bh, s, row, fi, la, ki: \
        (0 if lut_heads == 1 else jax.lax.rem(bh, heads), s, 0, 0)
    in_specs = [
        pl.BlockSpec((1, bs, hs), row_blk, memory_space=pltpu.VMEM),   # q
        pl.BlockSpec((1, ctxk, hs), whole_k, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, ctxk, hs), whole_k, memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, bs, hs), row_blk, memory_space=pltpu.VMEM),   # do
        pl.BlockSpec((1, bs, 1), row_blk, memory_space=pltpu.VMEM),    # lse
        pl.BlockSpec((1, bs, 1), row_blk, memory_space=pltpu.VMEM),    # dvec
        pl.BlockSpec((1, 1, bs, E * bs), mask_ix, memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(BH, S),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bs, hs), row_blk,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bs, hs), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_attn_dq_kernel, E, bs, hs, scale, lut_heads,
                          heads, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, ctxq, hs), q.dtype),
        interpret=use_interpret(),
    )(jnp.asarray(sched_nn.row), jnp.asarray(sched_nn.first),
      jnp.asarray(sched_nn.last),
      jnp.asarray(sched_nn.k_idx.reshape(lut_heads, -1)),
      q, k, v, do, lse, dvec, jnp.asarray(sched_nn.mask_sched))

    # ---- dk/dv over the tn schedule ----
    E2 = sched_tn.E
    S2 = sched_tn.num_steps
    row_blk2 = lambda bh, s, row, fi, la, ki: (bh, row[s], 0)
    whole_q = lambda bh, s, row, fi, la, ki: (bh, 0, 0)
    mask_ix2 = lambda bh, s, row, fi, la, ki: \
        (0 if lut_heads == 1 else jax.lax.rem(bh, heads), s, 0, 0)
    in_specs2 = [
        pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),   # k
        pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),   # v
        pl.BlockSpec((1, ctxq, hs), whole_q, memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, ctxq, hs), whole_q, memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((1, ctxq, 1), whole_q, memory_space=pltpu.VMEM),   # lse
        pl.BlockSpec((1, ctxq, 1), whole_q, memory_space=pltpu.VMEM),   # dvec
        pl.BlockSpec((1, 1, bs, E2 * bs), mask_ix2,
                     memory_space=pltpu.VMEM),
    ]
    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(BH, S2),
        in_specs=in_specs2,
        out_specs=(
            pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hs), row_blk2, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((bs, hs), jnp.float32),
                        pltpu.VMEM((bs, hs), jnp.float32)],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_attn_dkv_kernel, E2, bs, hs, scale, lut_heads,
                          heads, precision),
        grid_spec=grid_spec2,
        out_shape=(jax.ShapeDtypeStruct((BH, ctxk, hs), k.dtype),
                   jax.ShapeDtypeStruct((BH, ctxk, hs), v.dtype)),
        interpret=use_interpret(),
    )(jnp.asarray(sched_tn.row), jnp.asarray(sched_tn.first),
      jnp.asarray(sched_tn.last),
      jnp.asarray(sched_tn.k_idx.reshape(lut_heads, -1)),
      k, v, q, do, lse, dvec, jnp.asarray(sched_tn.mask_sched))

    return dq, dk, dv


def build_attn_schedule_tn(tn_list_per_head, nt_list_per_head, ctx_blks_k,
                           bs, mask_blocks=None, E=None):
    """Schedule over KEY block-rows for the dk/dv kernel: entries are
    (block_id, q_blk) from the tn LUT; masks are the TRANSPOSED blocks
    in schedule order."""
    if E is None:
        E = max(1, 512 // bs)
    lut_heads = len(tn_list_per_head)
    mask_t = None
    if mask_blocks is not None:
        mask_t = np.transpose(np.asarray(mask_blocks), (0, 1, 3, 2))
    nn_like = tn_list_per_head
    sched = build_attn_schedule(nn_like, ctx_blks_k, bs, mask_t, E=E)
    return sched
