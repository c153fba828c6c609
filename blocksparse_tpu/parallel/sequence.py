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
    stream = 2 * ctx_k * hs * q.dtype.itemsize > 10 * 1024 * 1024

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
