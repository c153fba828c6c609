"""Sequence-parallel block-sparse attention.

Shards the *context* dimension over a mesh axis ("sp"): every device
keeps its slice of Q/K/V and of all activations; attention is the only
op that needs remote context, so K/V are all-gathered along the axis
(bf16, overlapped by XLA) and each device runs the fused flash kernel
over its own query rows.  dK/dV localize back through psum_scatter —
produced automatically by the custom VJP below.

This has no reference equivalent (openai/blocksparse scales long
context by sparsity alone; its nccl layer stubbed reduce_scatter /
all_gather "for sharding models accross gpus", nccl.py:316-429) — it is
the TPU-native composition of that intent with the sparse attention
kernel: ICI collectives + per-shard Pallas schedules.

Mechanics: the host builds one schedule per shard (this shard's query
block-rows for the forward/dq walk; key block-rows restricted to this
shard's queries for the dk/dv walk), pads them to a common step count
with inert steps, and stacks them.  Inside shard_map each device
selects its slice by ``jax.lax.axis_index`` — the stacked schedules are
ordinary int32 operands, so a single SPMD program serves every shard.
Inert steps carry MASK_ABSENT in every slot: the finite -1e30 mask
sentinel makes their contribution exactly zero in all four kernels.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from blocksparse_tpu.kernels import bst_attn
from blocksparse_tpu.ops.transformer import _resident_fits


def _pad_sched(s: bst_attn.AttnSchedule, S: int) -> bst_attn.AttnSchedule:
    """Append inert steps (not first, not last, all slots MASK_ABSENT)
    up to S total.  row repeats the final real row so the out BlockSpec
    keeps addressing an already-written tile (never rewritten: the
    kernels only store on last==1)."""
    pad = S - s.num_steps
    if pad == 0:
        return s
    lut_heads, _, E = s.k_idx.shape
    return bst_attn.AttnSchedule(
        row=np.concatenate([s.row, np.full(pad, s.row[-1], np.int32)]),
        first=np.concatenate([s.first, np.zeros(pad, np.int32)]),
        last=np.concatenate([s.last, np.zeros(pad, np.int32)]),
        k_idx=np.concatenate(
            [s.k_idx, np.zeros((lut_heads, pad, E), np.int32)], axis=1),
        mcode=np.concatenate(
            [s.mcode,
             np.full((lut_heads, pad, E), bst_attn.MASK_ABSENT, np.int32)],
            axis=1),
        muniq=s.muniq, E=E, bs=s.bs)


@dataclass
class SpSchedules:
    """Stacked per-shard schedules (leading dim = shard)."""
    nn: dict          # row/first/last/k_idx/mcode/muniq np arrays
    tn: dict
    E: int
    bs: int
    n_shards: int

    @staticmethod
    def _stack(scheds):
        S = max(s.num_steps for s in scheds)
        scheds = [_pad_sched(s, S) for s in scheds]
        U = max(s.muniq.shape[0] for s in scheds)
        mu = [np.concatenate(
            [s.muniq, np.zeros((U - s.muniq.shape[0], s.bs), np.int8)])
            for s in scheds]
        return {
            "row": np.stack([s.row for s in scheds]),
            "first": np.stack([s.first for s in scheds]),
            "last": np.stack([s.last for s in scheds]),
            "k_idx": np.stack([s.k_idx for s in scheds]),
            "mcode": np.stack([s.mcode for s in scheds]),
            "muniq": np.stack(mu),
        }

    def at(self, stack, i):
        """Traced per-shard AttnSchedule at shard index i."""
        take = lambda a: jnp.take(jnp.asarray(a), i, axis=0)  # noqa: E731
        return bst_attn.AttnSchedule(
            row=take(stack["row"]), first=take(stack["first"]),
            last=take(stack["last"]), k_idx=take(stack["k_idx"]),
            mcode=take(stack["mcode"]), muniq=take(stack["muniq"]),
            E=self.E, bs=self.bs)


def build_sp_schedules(bst, n_shards: int) -> SpSchedules:
    """Per-shard schedules for query-row sharding.

    Shard i owns query block-rows [i*B, (i+1)*B), B = ctx_blks_q / n.
    nn schedules index q rows *locally* (the q operand is the local
    shard) and k blocks *globally* (K/V are gathered).  tn schedules
    cover every key block-row but only the entries whose q block lives
    on this shard (q index remapped to local); key rows with no local
    queries become a single all-masked chunk that stores zeros.
    """
    assert bst.ctx_blks_q % n_shards == 0, \
        (bst.ctx_blks_q, n_shards, "ctx block-rows must divide by shards")
    B = bst.ctx_blks_q // n_shards
    nn_s, tn_s = [], []
    for i in range(n_shards):
        lo, hi = i * B, (i + 1) * B
        nn_local = [[h[q] for q in range(lo, hi)] for h in bst.nn_list]
        nn_s.append(bst_attn.build_attn_schedule(
            nn_local, B, bst.blk_size, bst._mask_blocks))
        tn_local = [[[(bid, qb - lo) for (bid, qb) in row if lo <= qb < hi]
                     for row in h] for h in bst.tn_list]
        tn_s.append(bst_attn.build_attn_schedule_tn(
            tn_local, None, bst.ctx_blks_k, bst.blk_size,
            bst._mask_blocks))
    return SpSchedules(nn=SpSchedules._stack(nn_s),
                       tn=SpSchedules._stack(tn_s),
                       E=nn_s[0].E, bs=bst.blk_size, n_shards=n_shards)


def _to_flat(a, heads):
    batch, ctx, state = a.shape
    hs = state // heads
    return a.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3) \
            .reshape(batch * heads, ctx, hs)


def _from_flat(af, heads):
    bh, ctx, hs = af.shape
    batch = bh // heads
    return af.reshape(batch, heads, ctx, hs).transpose(0, 2, 1, 3) \
             .reshape(batch, ctx, heads * hs)


def sequence_parallel_attention(bst, q, k, v, axis="sp", n_shards=None,
                                scale=1.0):
    """Fused sparse attention with the context sharded over mesh axis
    ``axis``.  Call inside shard_map/pjit: q, k, v are the LOCAL context
    shards (batch, ctx/n, state); returns the local output shard.

    Forward all-gathers K/V along the axis (ICI); backward re-gathers
    for the flash recomputation and psum_scatters dK/dV back to their
    shards.  n_shards must equal the mesh axis size (it parameterizes
    the host-side schedules, which is also why it cannot be read off a
    traced value here).
    """
    assert n_shards is not None, "pass n_shards = mesh.shape[axis]"
    sp = getattr(bst, "_sp_sched_cache", None)
    if sp is None or sp.n_shards != n_shards:
        sp = build_sp_schedules(bst, n_shards)
        bst._sp_sched_cache = sp
    heads = bst.heads
    hs = q.shape[-1] // heads
    ctx_k = bst.ctx_blks_k * bst.blk_size
    # share the one validated scoped-vmem budget with the single-device
    # fused path (ops/transformer._resident_fits) — the gathered K/V here
    # is full-context, exactly the regime that overflows the dkv kernel.
    stream = not _resident_fits(hs, ctx_k, q.dtype.itemsize)

    @jax.custom_vjp
    def att(q, k, v):
        y, _ = _fwd(q, k, v)
        return y

    def _fwd(q, k, v):
        i = lax.axis_index(axis)
        nn = sp.at(sp.nn, i)
        kf = lax.all_gather(k, axis, axis=1, tiled=True)
        vf = lax.all_gather(v, axis, axis=1, tiled=True)
        yf, lse = bst_attn.fused_attention_fwd_lse(
            _to_flat(q, heads), _to_flat(kf, heads), _to_flat(vf, heads),
            nn, heads, scale, stream=stream)
        return _from_flat(yf, heads), (q, k, v, yf, lse)

    def _bwd(res, dy):
        q, k, v, yf, lse = res
        i = lax.axis_index(axis)
        nn = sp.at(sp.nn, i)
        tn = sp.at(sp.tn, i)
        kf = lax.all_gather(k, axis, axis=1, tiled=True)
        vf = lax.all_gather(v, axis, axis=1, tiled=True)
        dqf, dkf, dvf = bst_attn.fused_attention_bwd(
            _to_flat(q, heads), _to_flat(kf, heads), _to_flat(vf, heads),
            yf, lse, _to_flat(dy, heads), nn, tn, heads, scale,
            stream=stream)
        dk = lax.psum_scatter(_from_flat(dkf, heads), axis,
                              scatter_dimension=1, tiled=True)
        dv = lax.psum_scatter(_from_flat(dvf, heads), axis,
                              scatter_dimension=1, tiled=True)
        return (_from_flat(dqf, heads).astype(q.dtype),
                dk.astype(k.dtype), dv.astype(v.dtype))

    att.defvjp(_fwd, _bwd)
    return att(q, k, v)


# ------------------------------------------------------------------
# Ring attention: K/V stay sharded and rotate around the ring
# (lax.ppermute) while every device keeps its query shard.  No full
# K/V gather: per-device memory is O(ctx/n) for K/V, and the permute
# of the next chunk overlaps with compute on the current one (XLA's
# latency-hiding scheduler; the collective rides ICI neighbor links).
# The per-(q-shard, k-chunk) block-sparse schedules are stacked and
# selected by pair id = q_shard * n + k_chunk — one SPMD program, one
# Pallas compilation, n^2 schedules as data.  Partial outputs merge
# with the standard streaming-softmax combine on (out, lse); the
# backward circulates (q, do, lse, dvec, dq-accumulator) instead,
# with dK/dV accumulated at home.  Cf. Liu et al., "Ring Attention
# with Blockwise Transformers" — here composed with layout-driven
# block sparsity: empty (q-shard, k-chunk) pairs cost one inert
# kernel launch, and the mask/LUT machinery is unchanged.
# ------------------------------------------------------------------

def build_ring_schedules(bst, n_shards: int):
    """Stacked (n*n, ...) nn and tn schedules, pair id = qi * n + kj.

    nn pair (qi, kj): query rows local to shard qi, entries restricted
    to key blocks in chunk kj, key indices localized to the chunk.
    tn pair (qi, kj): key rows local to chunk kj, entries restricted to
    query blocks in shard qi, query indices localized.  All pairs share
    one globally-classified mask table.
    """
    n = n_shards
    assert bst.ctx_blks_q % n == 0 and bst.ctx_blks_k % n == 0, \
        (bst.ctx_blks_q, bst.ctx_blks_k, n)
    Bq = bst.ctx_blks_q // n
    Bk = bst.ctx_blks_k // n
    bs = bst.blk_size

    cls = cls_t = None
    if bst._mask_blocks is not None:
        cls = bst_attn.classify_mask_blocks(bst._mask_blocks, bs)
        mask_t = np.transpose(np.asarray(bst._mask_blocks), (0, 1, 3, 2))
        cls_t = bst_attn.classify_mask_blocks(mask_t, bs)

    nn_s, tn_s = [], []
    for qi in range(n):
        qlo, qhi = qi * Bq, (qi + 1) * Bq
        for kj in range(n):
            klo, khi = kj * Bk, (kj + 1) * Bk
            nn_pair = [[[(bid, kb - klo) for (bid, kb) in h[q]
                         if klo <= kb < khi]
                        for q in range(qlo, qhi)] for h in bst.nn_list]
            nn_s.append(bst_attn.build_attn_schedule(
                nn_pair, Bq, bs, classified=cls))
            tn_pair = [[[(bid, qb - qlo) for (bid, qb) in h[kr]
                         if qlo <= qb < qhi]
                        for kr in range(klo, khi)] for h in bst.tn_list]
            tn_s.append(bst_attn.build_attn_schedule(
                tn_pair, Bk, bs, classified=cls_t))
    return SpSchedules(nn=SpSchedules._stack(nn_s),
                       tn=SpSchedules._stack(tn_s),
                       E=nn_s[0].E, bs=bs, n_shards=n)


def ring_attention(bst, q, k, v, axis="sp", n_shards=None, scale=1.0):
    """Fused sparse attention with Q *and* K/V sharded over ``axis``.

    Call inside shard_map: q, k, v are local context shards
    (batch, ctx/n, state); returns the local output shard.  Unlike
    `sequence_parallel_attention` (which all-gathers K/V), K/V chunks
    rotate around the ring, so per-device K/V memory is O(ctx/n) —
    the right regime for very long context.
    """
    assert n_shards is not None, "pass n_shards = mesh.shape[axis]"
    n = n_shards
    rs = getattr(bst, "_ring_sched_cache", None)
    if rs is None or rs.n_shards != n:
        rs = build_ring_schedules(bst, n)
        bst._ring_sched_cache = rs
    heads = bst.heads
    perm = [(r, (r + 1) % n) for r in range(n)]
    # per-chunk K/V context is ctx/n; stream when even that exceeds the
    # validated scoped-vmem residency budget (very long per-shard ctx)
    hs_ring = q.shape[-1] // heads
    ctx_chunk = (bst.ctx_blks_k // n) * bst.blk_size
    stream = not _resident_fits(hs_ring, ctx_chunk, q.dtype.itemsize)

    def pair_sched(stack, qi, kj):
        return rs.at(stack, qi * n + kj)

    @jax.custom_vjp
    def att(q, k, v):
        y, _ = _fwd(q, k, v)
        return y

    def _fwd(q, k, v):
        i = lax.axis_index(axis)
        qf = _to_flat(q, heads)
        kf = _to_flat(k, heads)
        vf = _to_flat(v, heads)
        BH, Lq, hs = qf.shape

        out0 = jnp.zeros((BH, Lq, hs), jnp.float32)
        lse0 = jnp.full((BH, Lq, 1), -1e30, jnp.float32)

        def body(carry, t):
            kb, vb, out, lse = carry
            j = jax.lax.rem(i - t + n, n)
            o_t, lse_t = bst_attn.fused_attention_fwd_lse(
                qf, kb, vb, pair_sched(rs.nn, i, j), heads, scale,
                stream=stream)
            m = jnp.maximum(lse, lse_t)
            lse_new = m + jnp.log(jnp.exp(lse - m) + jnp.exp(lse_t - m))
            out = (jnp.exp(lse - lse_new) * out
                   + jnp.exp(lse_t - lse_new) * o_t.astype(jnp.float32))
            kb = lax.ppermute(kb, axis, perm)
            vb = lax.ppermute(vb, axis, perm)
            return (kb, vb, out, lse_new), None

        (_, _, out, lse), _ = lax.scan(
            body, (kf, vf, out0, lse0), jnp.arange(n))
        y = _from_flat(out.astype(q.dtype), heads)
        return y, (q, k, v, out, lse)

    def _bwd(res, dy):
        q, k, v, outf, lse = res
        i = lax.axis_index(axis)
        qf = _to_flat(q, heads)
        kf = _to_flat(k, heads)
        vf = _to_flat(v, heads)
        dof = _to_flat(dy, heads)
        dvec = jnp.sum(dof.astype(jnp.float32) * outf, axis=-1,
                       keepdims=True)
        dq0 = jnp.zeros(qf.shape, jnp.float32)
        dk0 = jnp.zeros(kf.shape, jnp.float32)
        dv0 = jnp.zeros(vf.shape, jnp.float32)

        def body(carry, t):
            qt, dot, lset, dvect, dqa, dka, dva = carry
            j = jax.lax.rem(i - t + n, n)    # q shard currently held
            nn = pair_sched(rs.nn, j, i)
            tn = pair_sched(rs.tn, j, i)
            dq_t = bst_attn.fused_attention_dq(
                qt, kf, vf, dot, lset, dvect, nn, heads, scale,
                out_dtype=jnp.float32, stream=stream)
            dk_t, dv_t = bst_attn.fused_attention_dkv(
                qt, kf, vf, dot, lset, dvect, tn, heads, scale,
                out_dtype=jnp.float32, stream=stream)
            dqa = dqa + dq_t
            dka = dka + dk_t
            dva = dva + dv_t
            qt = lax.ppermute(qt, axis, perm)
            dot = lax.ppermute(dot, axis, perm)
            lset = lax.ppermute(lset, axis, perm)
            dvect = lax.ppermute(dvect, axis, perm)
            dqa = lax.ppermute(dqa, axis, perm)
            return (qt, dot, lset, dvect, dqa, dka, dva), None

        (_, _, _, _, dqa, dka, dva), _ = lax.scan(
            body, (qf, dof, lse, dvec, dq0, dk0, dv0), jnp.arange(n))
        return (_from_flat(dqa, heads).astype(q.dtype),
                _from_flat(dka, heads).astype(k.dtype),
                _from_flat(dva, heads).astype(v.dtype))

    att.defvjp(_fwd, _bwd)
    return att(q, k, v)
