"""Sparse Transformer language model (the flagship model family).

TPU-native re-design of the reference's enwik8 Sparse Transformer
(/root/reference/examples/transformer/enwik8.py): layout-driven
block-sparse attention (fixed/strided patterns with causal sub-block
masks), optionally block-sparse MLPs, fused layer norm, fast-gelu,
gradient recompute per block, mixed precision with dynamic loss scaling,
and fused Adam with global-norm clipping.

Parallelism (beyond the reference, which was data-parallel only):
* dp: batch sharding, gradient psum.
* tp: Megatron-style tensor parallelism — attention heads and MLP hidden
  dim sharded over "tp"; the per-shard block-sparse layouts are identical
  (SPMD requires one static schedule), so the global sparsity pattern is
  the tp-tiling of the per-shard layout.
* sp: sequence (context) parallelism — activations sharded over "sp"
  along ctx; attention runs `sequence_parallel_attention` (all-gathered
  K/V, per-shard fused-kernel schedules, psum_scatter dK/dV); everything
  else is per-position and stays local.  Composes with dp and tp.
* pp: GPipe pipeline parallelism — layer params stacked (leading
  n_layer dim) and sharded over "pp"; microbatches stream through the
  stages via parallel.pipeline.gpipe (scan + ppermute; the backward
  pipeline is jax.grad's transpose).  Composes with dp and tp
  (tp psums run inside each stage).

All functions are pure; parameters are a flat dict pytree with a
matching PartitionSpec tree for shard_map.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from blocksparse_tpu.ops.transformer import (
    BlocksparseTransformer, softmax_cross_entropy,
)
from blocksparse_tpu.ops.matmul import BlocksparseMatMul
from blocksparse_tpu.ops.norms import layer_norm
from blocksparse_tpu.ops.ewops import fast_gelu, float_cast, dropout
from blocksparse_tpu.ops.embed import embedding_lookup
from blocksparse_tpu.ops import optimize as opt


def causal_subblock_mask(blk_shape, head, qry, key, blk):
    """Sub-block causal mask on the diagonal (reference enwik8.py:66-80)."""
    mask = np.ones(blk_shape, dtype=bool)
    if qry == key:
        for q in range(blk_shape[0]):
            mask[q, q + 1:] = 0
    return mask


def fixed_layout(ctx_blks, local_blocks=32, num_verts=4):
    """'Fixed' Sparse-Transformer attention pattern (blockwise causal
    local window + periodic summary columns), cf. reference
    enwik8.py:82-94."""
    layout = np.zeros((ctx_blks, ctx_blks), dtype=np.int32)
    for q in range(ctx_blks):
        lo = max(0, q - local_blocks + 1)
        layout[q, lo:q + 1] = 1
        for k in range(0, q, num_verts):
            layout[q, k] = 1
    return layout


def strided_layout(ctx_blks, local_blocks=32, stride=None):
    """'Strided' pattern: local band + strided history."""
    stride = stride or max(1, int(np.sqrt(ctx_blks)))
    layout = np.zeros((ctx_blks, ctx_blks), dtype=np.int32)
    for q in range(ctx_blks):
        lo = max(0, q - local_blocks + 1)
        layout[q, lo:q + 1] = 1
        k = q - stride
        while k >= 0:
            layout[q, k] = 1
            k -= stride
    return layout


def dense_causal_layout(ctx_blks):
    return np.tril(np.ones((ctx_blks, ctx_blks), dtype=np.int32))


_LAYOUTS = {
    "fixed": fixed_layout,
    "strided": strided_layout,
    "dense": dense_causal_layout,
}


@dataclass
class TransformerConfig:
    n_vocab: int = 256
    n_embd: int = 512
    n_layer: int = 6
    n_head: int = 8
    ctx: int = 2048
    blk_size: int = 64
    attn_layout: str = "fixed"        # fixed | strided | dense
    local_blocks: int = 8
    mlp_ratio: int = 4
    mlp_block_size: int = 0           # 0 => dense MLP; else bsmm block size
    mlp_density: float = 1.0
    dtype: str = "bfloat16"           # compute dtype
    recompute: bool = True
    resid_pdrop: float = 0.0
    tp: int = 1                       # tensor-parallel shards
    sp: int = 1                       # sequence(context)-parallel shards
    sp_mode: str = "gather"           # "gather" (all-gather K/V) | "ring"
    pp: int = 1                       # pipeline stages
    pp_microbatch: int = 0            # microbatches (0 => pp)
    stack_layers: bool = False        # stacked layer params + lax.scan
                                      # (forced on when pp > 1)
    moe_experts: int = 0              # >0: MoE MLP (Switch/GShard),
                                      # block-sparse when mlp_block_size
    moe_k: int = 1                    # experts per token
    moe_capacity_factor: float = 1.25
    moe_aux_coef: float = 0.01        # load-balance loss coefficient
    ep: int = 1                       # expert-parallel shards


class SparseTransformerLM:
    """Functional model object: builds static layouts/op objects once,
    exposes init / loss / train_step builders."""

    def __init__(self, config: TransformerConfig):
        c = self.config = config
        assert c.ctx % c.blk_size == 0
        assert c.n_head % c.tp == 0
        assert (c.ctx // c.blk_size) % c.sp == 0, \
            "ctx block-rows must divide by sp shards"
        assert c.n_layer % c.pp == 0, (c.n_layer, c.pp)
        assert not (c.pp > 1 and c.sp > 1), \
            "pp x sp composition not supported (pick one of pipeline/" \
            "sequence parallelism; both compose with dp and tp)"
        self.stack = c.stack_layers or c.pp > 1
        self.heads_local = c.n_head // c.tp
        self.hs = c.n_embd // c.n_head
        ctx_blks = c.ctx // c.blk_size

        layout = _LAYOUTS[c.attn_layout](
            ctx_blks, **({} if c.attn_layout == "dense"
                         else {"local_blocks": c.local_blocks}))
        self.bst = BlocksparseTransformer(
            layout, block_size=c.blk_size, heads=self.heads_local,
            mask_callback=causal_subblock_mask)

        self.hidden = c.mlp_ratio * c.n_embd
        self.hidden_local = self.hidden // c.tp
        if c.moe_experts:
            # pp x ep composes via gpipe(with_aux=True) — each pipeline
            # stage accumulates its own MoE load-balance aux (loss_pp).
            assert c.tp == 1 and c.sp == 1, \
                "MoE composes with dp x ep x pp (tp/sp + MoE: future)"
            assert c.moe_experts % c.ep == 0, (c.moe_experts, c.ep)
            from blocksparse_tpu.ops.moe import BlocksparseMoE
            self.moe = BlocksparseMoE(
                c.moe_experts, c.n_embd, self.hidden,
                block_size=c.mlp_block_size, density=c.mlp_density,
                capacity_factor=c.moe_capacity_factor, k=c.moe_k,
                ep=c.ep)
            self.bsmm1 = self.bsmm2 = None
        else:
            assert c.ep == 1, "ep needs moe_experts > 0"
            self.moe = None
        if c.mlp_block_size and not c.moe_experts:
            bs = c.mlp_block_size
            CB = c.n_embd // bs
            KB = self.hidden_local // bs
            rng = np.random.RandomState(0)
            lay1 = (rng.rand(CB, KB) < c.mlp_density).astype(np.int32)
            lay1[np.arange(CB), np.arange(CB) % KB] = 1   # no empty rows
            lay1[np.arange(KB) % CB, np.arange(KB)] = 1
            self.bsmm1 = BlocksparseMatMul(lay1, block_size=bs,
                                           feature_axis=1)
            self.bsmm2 = BlocksparseMatMul(lay1.T.copy(), block_size=bs,
                                           feature_axis=1)
        else:
            self.bsmm1 = self.bsmm2 = None

    # ---------------- params ----------------

    def init(self, key):
        c = self.config
        keys = jax.random.split(key, 4 + 4 * c.n_layer)
        std = 0.02
        params = {
            "wte": jax.random.normal(keys[0], (c.n_vocab, c.n_embd)) * std,
            "wpe": jax.random.normal(keys[1], (c.ctx, c.n_embd)) * std,
            "lnf_g": jnp.ones((c.n_embd,)),
            "lnf_b": jnp.zeros((c.n_embd,)),
        }
        layers = []
        for l in range(c.n_layer):
            k = keys[4 + 4 * l: 8 + 4 * l]
            proj_std = std / np.sqrt(2 * c.n_layer)
            layer = {
                "ln1_g": jnp.ones((c.n_embd,)),
                "ln1_b": jnp.zeros((c.n_embd,)),
                "ln2_g": jnp.ones((c.n_embd,)),
                "ln2_b": jnp.zeros((c.n_embd,)),
                # qkv sharded on output over tp
                "w_qkv": jax.random.normal(
                    k[0], (c.n_embd, 3 * c.n_embd)) * std,
                "b_qkv": jnp.zeros((3 * c.n_embd,)),
                # out proj sharded on input over tp
                "w_out": jax.random.normal(
                    k[1], (c.n_embd, c.n_embd)) * proj_std,
                "b_out": jnp.zeros((c.n_embd,)),
            }
            if self.moe is not None:
                layer["moe"] = self.moe.init(k[2])
            elif self.bsmm1 is not None:
                layer["w_fc"] = jax.random.normal(
                    k[2], (c.tp,) + self.bsmm1.w_shape) * std
                layer["w_proj"] = jax.random.normal(
                    k[3], (c.tp,) + self.bsmm2.w_shape) * proj_std
            else:
                layer["w_fc"] = jax.random.normal(
                    k[2], (c.n_embd, self.hidden)) * std
                layer["w_proj"] = jax.random.normal(
                    k[3], (self.hidden, c.n_embd)) * proj_std
            if self.moe is None:
                layer["b_fc"] = jnp.zeros((self.hidden,))
                layer["b_proj"] = jnp.zeros((c.n_embd,))
            layers.append(layer)
        if self.stack:
            # one stacked pytree, leading dim n_layer (sharded over
            # "pp" when pp > 1; scanned over otherwise)
            params["hs"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *layers)
        else:
            for l, layer in enumerate(layers):
                params[f"h{l}"] = layer
        return params

    def _layer(self, params, l):
        """Layer l's param dict, whether stacked or flat (decode paths)."""
        if self.stack:
            return jax.tree_util.tree_map(lambda a: a[l], params["hs"])
        return params[f"h{l}"]

    def param_specs(self):
        """PartitionSpec tree for shard_map over mesh axes (dp, tp)."""
        c = self.config
        spec = {
            "wte": P(None, None),
            "wpe": P(None, None),
            "lnf_g": P(None),
            "lnf_b": P(None),
        }
        layer = {
            "ln1_g": P(None), "ln1_b": P(None),
            "ln2_g": P(None), "ln2_b": P(None),
            "w_qkv": P(None, "tp"), "b_qkv": P("tp"),
            "w_out": P("tp", None), "b_out": P(None),
        }
        if self.moe is not None:
            layer["moe"] = self.moe.param_specs()
        else:
            layer["b_fc"] = P("tp")
            layer["b_proj"] = P(None)
            if self.bsmm1 is not None:
                layer["w_fc"] = P("tp", None, None, None)
                layer["w_proj"] = P("tp", None, None, None)
            else:
                layer["w_fc"] = P(None, "tp")
                layer["w_proj"] = P("tp", None)
        if self.stack:
            lead = "pp" if c.pp > 1 else None
            spec["hs"] = jax.tree_util.tree_map(
                lambda p: P(*((lead,) + tuple(p))), layer,
                is_leaf=lambda x: isinstance(x, P))
        else:
            for l in range(c.n_layer):
                spec[f"h{l}"] = dict(layer)
        return spec

    def grad_reduce_axes(self, include_sp=False):
        """For each param: mesh axes to psum grads over.  tp-sharded
        params reduce over dp (their tp shards hold distinct grads);
        replicated params additionally over tp (partial sums).  With
        sequence parallelism every param also reduces over sp (each ctx
        shard contributes a partial of the position-mean).  With
        pipeline parallelism, non-stage params (embeddings, final LN)
        additionally reduce over pp — exact because loss_pp scales the
        per-shard loss by 1/pp (parallel/pipeline.py docstring);
        pp-sharded stage stacks hold distinct layers and never reduce
        over pp."""
        specs = self.param_specs()
        sp = ("sp",) if include_sp else ()
        active = ["dp", "tp"]
        if self.config.pp > 1:
            active.append("pp")
        if self.config.ep > 1:
            # ep shards hold distinct experts; gate/shared params see
            # distinct tokens per ep shard (batch is split dp x ep) so
            # they reduce over ep; expert grads already accumulated
            # across ep by the transposed all_to_all
            active.append("ep")

        def axes(p):
            named = {a for s in p if s for a in (s if isinstance(s, tuple)
                                                else (s,))}
            return tuple(a for a in active if a not in named) + sp
        return jax.tree_util.tree_map(axes, specs,
                                      is_leaf=lambda x: isinstance(x, P))

    def param_shard_axes(self):
        """Mesh axes each param is SHARDED over (distinct values per
        shard).  The global grad norm must psum each such param's
        squared contribution over these axes — a shard-local norm would
        give tp/pp shards different norm_scale values and silently
        diverge the replicated params once clipping activates."""
        specs = self.param_specs()

        def axes(p):
            out = []
            for s in p:
                for a in (s if isinstance(s, tuple) else (s,)) if s else ():
                    if a not in out:
                        out.append(a)
            return tuple(out)
        return jax.tree_util.tree_map(axes, specs,
                                      is_leaf=lambda x: isinstance(x, P))

    # ---------------- forward ----------------

    def _block(self, layer, x, dtype, tp_axis, drop_key=None,
               sp_axis=None, ep_axis=None):
        """One transformer block; returns (x, aux) where aux is the MoE
        load-balance loss (zero for dense/bsmm MLPs)."""
        c = self.config
        nd = jnp.dtype(dtype)

        def resid_drop(h, key):
            if c.resid_pdrop and key is not None:
                h, _ = dropout(h, 1.0 - c.resid_pdrop, key=key)
            return h

        def attn(x):
            h = layer_norm(x, layer["ln1_g"], layer["ln1_b"], axis=-1)
            h = float_cast(h, nd)
            wq = float_cast(layer["w_qkv"], nd)
            qkv = h @ wq + layer["b_qkv"].astype(nd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            scale = 1.0 / np.sqrt(self.hs)
            if sp_axis is not None and c.sp > 1:
                from blocksparse_tpu.parallel import sequence as seq
                sp_fn = (seq.ring_attention if c.sp_mode == "ring"
                         else seq.sequence_parallel_attention)
                a = sp_fn(self.bst, q, k, v, axis=sp_axis, n_shards=c.sp,
                          scale=scale)
            else:
                a = self.bst.attention(q, k, v, scale=scale)
            wo = float_cast(layer["w_out"], nd)
            y = a @ wo
            if tp_axis is not None:
                y = jax.lax.psum(y, tp_axis)
            return y + layer["b_out"].astype(nd)

        def mlp(x):
            h = layer_norm(x, layer["ln2_g"], layer["ln2_b"], axis=-1)
            h = float_cast(h, nd)
            if self.moe is not None:
                B, L, D = h.shape
                y, aux = self.moe(layer["moe"], h.reshape(B * L, D),
                                  ep_axis=ep_axis)
                return y.reshape(B, L, D), aux
            if self.bsmm1 is not None:
                w1 = float_cast(layer["w_fc"][0], nd)
                h = self.bsmm1(h, w1)
            else:
                h = h @ float_cast(layer["w_fc"], nd)
            h = fast_gelu(h + layer["b_fc"].astype(nd))
            if self.bsmm2 is not None:
                w2 = float_cast(layer["w_proj"][0], nd)
                h = self.bsmm2(h, w2)
            else:
                h = h @ float_cast(layer["w_proj"], nd)
            if tp_axis is not None:
                h = jax.lax.psum(h, tp_axis)
            return h + layer["b_proj"].astype(nd), jnp.zeros(
                (), jnp.float32)

        k1 = k2 = None
        if drop_key is not None:
            k1, k2 = jax.random.split(drop_key)
        x = x + resid_drop(attn(x), k1).astype(x.dtype)
        m, aux = mlp(x)
        x = x + resid_drop(m, k2).astype(x.dtype)
        return x, aux

    # ---------------- KV-cached decode ----------------

    def init_kv_cache(self, batch):
        """Per-layer K/V caches over the full layout context."""
        assert self.moe is None, \
            "KV-cached decode with MoE MLPs not implemented"
        c = self.config
        nd = jnp.dtype(c.dtype)
        return [{"k": jnp.zeros((batch, c.ctx, c.n_embd), nd),
                 "v": jnp.zeros((batch, c.ctx, c.n_embd), nd)}
                for _ in range(c.n_layer)]

    def prefill(self, params, tokens):
        """Full-context forward that also captures per-layer K/V.

        tokens: (batch, ctx) int32 (positions past the prompt may be
        padding — causal masking keeps them out of earlier logits).
        Returns (logits, caches)."""
        assert self.moe is None, \
            "KV-cached decode with MoE MLPs not implemented"
        c = self.config
        nd = jnp.dtype(c.dtype)
        x = embedding_lookup(params["wte"], tokens) \
            + params["wpe"][None, :tokens.shape[1]]
        x = x.astype(jnp.float32)
        caches = []
        for l in range(c.n_layer):
            layer = self._layer(params, l)
            h = layer_norm(x, layer["ln1_g"], layer["ln1_b"], axis=-1)
            h = float_cast(h, nd)
            qkv = h @ float_cast(layer["w_qkv"], nd) \
                + layer["b_qkv"].astype(nd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            caches.append({"k": k, "v": v})
            a = self.bst.attention(q, k, v, scale=1.0 / np.sqrt(self.hs))
            y = a @ float_cast(layer["w_out"], nd) + layer["b_out"].astype(nd)
            x = x + y.astype(x.dtype)
            x = x + self._mlp(layer, x, nd).astype(x.dtype)
        h = layer_norm(x, params["lnf_g"], params["lnf_b"], axis=-1)
        logits = h.astype(nd) @ float_cast(params["wte"], nd).T
        return logits.astype(jnp.float32), caches

    def _mlp(self, layer, x, nd):
        h = layer_norm(x, layer["ln2_g"], layer["ln2_b"], axis=-1)
        h = float_cast(h, nd)
        if self.bsmm1 is not None:
            h = self.bsmm1(h, float_cast(layer["w_fc"][0], nd))
        else:
            h = h @ float_cast(layer["w_fc"], nd)
        h = fast_gelu(h + layer["b_fc"].astype(nd))
        if self.bsmm2 is not None:
            h = self.bsmm2(h, float_cast(layer["w_proj"][0], nd))
        else:
            h = h @ float_cast(layer["w_proj"], nd)
        return h + layer["b_proj"].astype(nd)

    def decode_forward(self, params, tok, caches, pos):
        """One-token forward at position ``pos`` against the K/V caches.

        tok: (batch,) int32; pos: traced scalar (no recompile per step).
        Returns (logits (batch, n_vocab), updated caches).  Attention
        cost is O(visible blocks) via BlocksparseTransformer.decode_step
        (the reference's incremental decode, transformer.py:366-370)."""
        c = self.config
        nd = jnp.dtype(c.dtype)
        pos = jnp.asarray(pos, jnp.int32)
        x = embedding_lookup(params["wte"], tok[:, None]) \
            + jax.lax.dynamic_index_in_dim(params["wpe"], pos, axis=0,
                                           keepdims=True)[None]
        x = x.astype(jnp.float32)                    # (batch, 1, embd)
        new_caches = []
        for l in range(c.n_layer):
            layer = self._layer(params, l)
            cache = caches[l]
            h = layer_norm(x, layer["ln1_g"], layer["ln1_b"], axis=-1)
            h = float_cast(h, nd)
            qkv = h @ float_cast(layer["w_qkv"], nd) \
                + layer["b_qkv"].astype(nd)
            q, k, v = jnp.split(qkv, 3, axis=-1)     # (batch, 1, embd)
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, pos, 0))
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, pos, 0))
            new_caches.append({"k": ck, "v": cv})
            a = self.bst.decode_step(q, ck, cv, pos,
                                     scale=1.0 / np.sqrt(self.hs))
            y = a.astype(nd) @ float_cast(layer["w_out"], nd) \
                + layer["b_out"].astype(nd)
            x = x + y.astype(x.dtype)
            x = x + self._mlp(layer, x, nd).astype(x.dtype)
        h = layer_norm(x, params["lnf_g"], params["lnf_b"], axis=-1)
        logits = h.astype(nd) @ float_cast(params["wte"], nd).T
        return logits[:, 0].astype(jnp.float32), new_caches

    def forward(self, params, tokens, tp_axis=None, sp_axis=None,
                ep_axis=None, dropout_key=None, return_aux=False):
        """tokens (batch, ctx) int32 -> logits (batch, ctx, n_vocab) f32.
        Under sequence parallelism tokens are the LOCAL ctx shard
        (batch, ctx/sp) and sp_axis names the mesh axis.  dropout_key
        enables residual dropout (resid_pdrop).  return_aux also
        returns the summed MoE load-balance loss."""
        c = self.config
        nd = jnp.dtype(c.dtype)
        L = tokens.shape[1]
        if sp_axis is not None and c.sp > 1:
            off = jax.lax.axis_index(sp_axis) * L
            wpe = jax.lax.dynamic_slice_in_dim(params["wpe"], off, L, 0)
            if dropout_key is not None:
                dropout_key = jax.random.fold_in(
                    dropout_key, jax.lax.axis_index(sp_axis))
        else:
            wpe = params["wpe"][:L]
        x = embedding_lookup(params["wte"], tokens) + wpe[None]
        x = x.astype(jnp.float32)

        aux = jnp.zeros((), jnp.float32)
        if self.stack:
            x, aux = self._scan_layers(params["hs"], x, nd, tp_axis,
                                       dropout_key, sp_axis=sp_axis,
                                       ep_axis=ep_axis)
        else:
            keys = (jax.random.split(dropout_key, c.n_layer)
                    if dropout_key is not None else [None] * c.n_layer)
            for l in range(c.n_layer):
                blk = lambda x, layer=params[f"h{l}"], k=keys[l]: \
                    self._block(layer, x, nd, tp_axis, drop_key=k,
                                sp_axis=sp_axis, ep_axis=ep_axis)
                if c.recompute:
                    x, a = jax.checkpoint(blk)(x)
                else:
                    x, a = blk(x)
                aux = aux + a

        h = layer_norm(x, params["lnf_g"], params["lnf_b"], axis=-1)
        logits = h.astype(nd) @ float_cast(params["wte"], nd).T
        logits = logits.astype(jnp.float32)
        return (logits, aux) if return_aux else logits

    def _scan_layers(self, hs, x, nd, tp_axis, dropout_key, sp_axis=None,
                     ep_axis=None, layer0=0):
        """Apply a stacked layer slice with lax.scan (one traced block
        body regardless of depth — bounds compile time and is the stage
        function under pipeline parallelism).  layer0 offsets the
        dropout fold-in so pp stages draw distinct per-layer keys.
        Returns (x, summed MoE aux loss)."""
        L = jax.tree_util.tree_leaves(hs)[0].shape[0]

        def body(carry, inp):
            x, aux = carry
            layer, i = inp
            k = (jax.random.fold_in(dropout_key, layer0 + i)
                 if dropout_key is not None else None)
            blk = lambda x: self._block(layer, x, nd, tp_axis,
                                        drop_key=k, sp_axis=sp_axis,
                                        ep_axis=ep_axis)
            x, a = (jax.checkpoint(blk)(x) if self.config.recompute
                    else blk(x))
            return (x, aux + a), None

        (x, aux), _ = jax.lax.scan(
            body, (x, jnp.zeros((), jnp.float32)), (hs, jnp.arange(L)))
        return x, aux

    def loss_pp(self, params, tokens, targets, pp_axis, tp_axis=None,
                ep_axis=None, dropout_key=None):
        """Pipelined loss: returns the TRUE loss / pp on every shard
        (psum over pp in the caller restores the value and makes a
        plain psum-over-pp gradient reduction exact for the shared
        params — see parallel/pipeline.py docstring).

        MoE composes: each stage's load-balance aux is accumulated
        over its valid ticks (gpipe with_aux), normalized per
        microbatch, and added UNscaled — pp shards hold distinct
        stages, so the caller's psum over pp sums the per-stage aux
        (the CE term alone carries the 1/S replication scaling)."""
        from blocksparse_tpu.parallel import pipeline as pl
        c = self.config
        nd = jnp.dtype(c.dtype)
        S = c.pp
        n_micro = c.pp_microbatch or S
        L = tokens.shape[1]
        wpe = params["wpe"][:L]
        x = embedding_lookup(params["wte"], tokens) + wpe[None]
        x = x.astype(jnp.float32)
        xm = pl.microbatch(x, n_micro)

        l_loc = c.n_layer // S
        layer0 = jax.lax.axis_index(pp_axis) * l_loc

        def stage_fn(hs, h):
            return self._scan_layers(hs, h, nd, tp_axis, dropout_key,
                                     ep_axis=ep_axis, layer0=layer0)

        ym, aux = pl.gpipe(stage_fn, params["hs"], xm, axis=pp_axis,
                           n_stages=S, with_aux=True)
        ym = pl.broadcast_from_last(ym, axis=pp_axis, n_stages=S)
        y = pl.unmicrobatch(ym)

        h = layer_norm(y, params["lnf_g"], params["lnf_b"], axis=-1)
        logits = (h.astype(nd) @ float_cast(params["wte"], nd).T)
        losses = softmax_cross_entropy(logits=logits.astype(jnp.float32),
                                       labels=targets)
        # aux is a per-token-mean quantity per (stage, microbatch);
        # summed over n_micro microbatches above -> normalize by n_micro
        return (jnp.mean(losses) / S
                + self.config.moe_aux_coef * aux / n_micro)

    def loss(self, params, tokens, targets, tp_axis=None, sp_axis=None,
             pp_axis=None, ep_axis=None, dropout_key=None):
        if pp_axis is not None and self.config.pp > 1:
            return self.loss_pp(params, tokens, targets, pp_axis,
                                tp_axis=tp_axis, ep_axis=ep_axis,
                                dropout_key=dropout_key)
        logits, aux = self.forward(params, tokens, tp_axis=tp_axis,
                                   sp_axis=sp_axis, ep_axis=ep_axis,
                                   dropout_key=dropout_key,
                                   return_aux=True)
        losses = softmax_cross_entropy(logits=logits, labels=targets)
        return jnp.mean(losses) + self.config.moe_aux_coef * aux

    # ---------------- training ----------------

    def make_train_step(self, optimizer: opt.AdamOptimizer, mesh=None,
                        clip_norm=1.0):
        """Returns train_step(params, opt_state, tokens, targets,
        loss_scale) -> (params, opt_state, metrics, loss_scale).

        With a mesh: runs under shard_map over (dp, tp) with gradient
        psums and dynamic loss scaling (reference enwik8.py:374-397 —
        norm_scale==0 skips the update and halves the scale)."""
        model = self

        def local_step(params, opt_state, tokens, targets, loss_scale,
                       dp_axis=None, tp_axis=None, sp_axis=None,
                       pp_axis=None, ep_axis=None):
            def scaled_loss(p):
                l = model.loss(p, tokens, targets, tp_axis=tp_axis,
                               sp_axis=sp_axis, pp_axis=pp_axis,
                               ep_axis=ep_axis)
                return l * loss_scale

            loss_val, grads = jax.value_and_grad(scaled_loss)(params)

            if dp_axis is not None:
                reduce_axes = model.grad_reduce_axes(
                    include_sp=sp_axis is not None)
                grads = jax.tree_util.tree_map(
                    lambda g, ax: jax.lax.psum(g, ax),
                    grads, reduce_axes,
                    is_leaf=lambda x: isinstance(x, tuple))
                nshards = jax.lax.psum(1, dp_axis)
                if sp_axis is not None:
                    nshards = nshards * jax.lax.psum(1, sp_axis)
                    loss_val = jax.lax.pmean(loss_val, sp_axis)
                if ep_axis is not None:
                    # batch is split dp x ep: ep shards hold distinct
                    # tokens, so they count as data shards too
                    nshards = nshards * jax.lax.psum(1, ep_axis)
                    loss_val = jax.lax.pmean(loss_val, ep_axis)
                if pp_axis is not None:
                    # loss_pp returns true_loss/pp per shard
                    loss_val = jax.lax.psum(loss_val, pp_axis)
                grads = jax.tree_util.tree_map(lambda g: g / nshards, grads)
                loss_val = jax.lax.pmean(loss_val, dp_axis)

            if dp_axis is not None:
                # Cross-shard global norm: psum each SHARDED param's
                # squared sum over its sharding axes so every shard
                # computes the same norm_scale (see param_shard_axes).
                gs = (1.0 / loss_scale).astype(jnp.float32)
                sqs = jax.tree_util.tree_map(
                    lambda g: jnp.sum(
                        jnp.square(g.astype(jnp.float32) * gs)), grads)
                sqs = jax.tree_util.tree_map(
                    lambda s, ax: jax.lax.psum(s, ax) if ax else s,
                    sqs, model.param_shard_axes())
                total = sum(jax.tree_util.tree_leaves(sqs),
                            jnp.zeros((), jnp.float32))
                gn = jnp.sqrt(total)
                clip = jnp.asarray(clip_norm, jnp.float32)
                norm_scale = clip / jnp.maximum(gn, clip)
                norm_scale = jnp.where(jnp.isfinite(gn), norm_scale, 0.0)
            else:
                gn, norm_scale = opt.clip_by_global_norm(
                    jax.tree_util.tree_leaves(grads), clip_norm=clip_norm,
                    grad_scale=1.0 / loss_scale, zero_infs=False,
                    zero_nans=False)

            new_params, new_state = optimizer.apply(
                grads, params, opt_state, norm_scale=norm_scale,
                grad_scale=1.0 / loss_scale)

            # dynamic loss scaling (reference enwik8.py:374-397)
            ok = norm_scale > 0.0
            new_scale = jnp.where(ok,
                                  jnp.minimum(loss_scale * (2.0 ** (1 / 2000)),
                                              2.0 ** 24),
                                  jnp.maximum(loss_scale * 0.5, 1.0))
            metrics = {"loss": loss_val / loss_scale, "grad_norm": gn,
                       "norm_scale": norm_scale}
            return new_params, new_state, metrics, new_scale

        if mesh is None:
            return jax.jit(local_step)

        from jax import shard_map
        pspecs = self.param_specs()
        opt_specs = {
            "mean": pspecs, "var": pspecs, "t": P(),
        }

        use_sp = self.config.sp > 1
        if use_sp:
            assert "sp" in mesh.axis_names, \
                "config.sp > 1 needs an 'sp' mesh axis (make_mesh(sp=N))"
            assert mesh.shape["sp"] == self.config.sp, \
                (mesh.shape, self.config.sp)
        use_pp = self.config.pp > 1
        if use_pp:
            assert "pp" in mesh.axis_names, \
                "config.pp > 1 needs a 'pp' mesh axis (make_mesh(pp=N))"
            assert mesh.shape["pp"] == self.config.pp, \
                (mesh.shape, self.config.pp)
        use_ep = self.config.ep > 1
        if use_ep:
            assert "ep" in mesh.axis_names, \
                "config.ep > 1 needs an 'ep' mesh axis (make_mesh(ep=N))"
            assert mesh.shape["ep"] == self.config.ep, \
                (mesh.shape, self.config.ep)
        batch_axes = ("dp", "ep") if use_ep else "dp"
        tok_spec = (P(batch_axes, "sp") if use_sp
                    else P(batch_axes, None))
        step = partial(local_step, dp_axis="dp", tp_axis="tp",
                       sp_axis="sp" if use_sp else None,
                       pp_axis="pp" if use_pp else None,
                       ep_axis="ep" if use_ep else None)
        smapped = shard_map(
            step, mesh=mesh,
            in_specs=(pspecs, opt_specs, tok_spec, tok_spec, P()),
            out_specs=(pspecs, opt_specs,
                       {"loss": P(), "grad_norm": P(), "norm_scale": P()},
                       P()),
            check_vma=False,
        )
        return jax.jit(smapped)


def generate(model: SparseTransformerLM, params, prompt, steps,
             temperature=1.0, key=None):
    """Reference-style autoregressive sampling via a full-context forward
    per token (O(ctx^2) per sequence — use ``generate_cached`` for the
    KV-cached O(visible blocks)/token path).

    prompt: (batch, n) int32 with n < ctx.  Returns (batch, n+steps).
    """
    c = model.config
    if key is None:
        key = jax.random.PRNGKey(0)
    batch, n = prompt.shape
    tokens = jnp.zeros((batch, c.ctx), jnp.int32)
    tokens = tokens.at[:, :n].set(prompt)

    @jax.jit
    def step(tokens, pos, key):
        logits = model.forward(params, tokens)
        logits_t = logits[jnp.arange(batch), pos - 1] / temperature
        nxt = jax.random.categorical(key, logits_t, axis=-1)
        return tokens.at[:, pos].set(nxt)

    for i in range(steps):
        key, sub = jax.random.split(key)
        tokens = step(tokens, n + i, sub)
    return tokens[:, :n + steps]


def generate_cached(model: SparseTransformerLM, params, prompt, steps,
                    temperature=1.0, key=None):
    """KV-cached autoregressive sampling: one prefill over the prompt,
    then one single-token decode per generated token (attention cost
    O(visible blocks) — parity with the reference's incremental decode,
    transformer.py:366-370).  Single-shard only (tp folded into heads).

    prompt: (batch, n) int32 with n + steps <= ctx.
    Returns (batch, n + steps).
    """
    c = model.config
    assert c.tp == 1, "generate_cached runs unsharded"
    if key is None:
        key = jax.random.PRNGKey(0)
    batch, n = prompt.shape
    assert n + steps <= c.ctx

    tokens_full = jnp.zeros((batch, c.ctx), jnp.int32)
    tokens_full = tokens_full.at[:, :n].set(prompt)
    logits_all, caches = jax.jit(model.prefill)(params, tokens_full)
    last_logits = logits_all[:, n - 1]

    @jax.jit
    def dec(params, caches, pos, key, last_logits):
        nxt = jax.random.categorical(key, last_logits / temperature,
                                     axis=-1)
        logits, caches = model.decode_forward(params, nxt, caches, pos)
        return nxt, caches, logits

    out = [prompt]
    for i in range(steps):
        key, sub = jax.random.split(key)
        tok, caches, last_logits = dec(params, caches,
                                       jnp.asarray(n + i, jnp.int32),
                                       sub, last_logits)
        out.append(tok[:, None])
    return jnp.concatenate(out, axis=1)


def generate_cached_scan(model: SparseTransformerLM, params, prompt, steps,
                         temperature=1.0, key=None):
    """``generate_cached`` with the whole decode loop inside ONE jit
    (lax.scan carrying the K/V caches) — the production serving shape:
    no per-token host dispatch, XLA pipelines the token steps.  Emits
    the same tokens as ``generate_cached`` for the same key.
    """
    c = model.config
    assert c.tp == 1, "generate_cached_scan runs unsharded"
    if key is None:
        key = jax.random.PRNGKey(0)
    batch, n = prompt.shape
    assert n + steps <= c.ctx

    tokens_full = jnp.zeros((batch, c.ctx), jnp.int32)
    tokens_full = tokens_full.at[:, :n].set(prompt)
    logits_all, caches = jax.jit(model.prefill)(params, tokens_full)
    last_logits = logits_all[:, n - 1]

    @jax.jit
    def decode_all(caches, key, last_logits):
        def body(carry, _):
            caches, pos, key, last_logits = carry
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, last_logits / temperature,
                                         axis=-1)
            logits, caches = model.decode_forward(params, nxt, caches, pos)
            return (caches, pos + 1, key, logits), nxt

        (_, _, _, _), toks = jax.lax.scan(
            body, (caches, jnp.asarray(n, jnp.int32), key, last_logits),
            None, length=steps)
        return toks

    toks = decode_all(caches, key, last_logits)       # (steps, batch)
    return jnp.concatenate([prompt, toks.T], axis=1)
