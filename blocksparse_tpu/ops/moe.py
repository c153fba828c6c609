"""Block-sparse Mixture-of-Experts with expert parallelism ("ep").

No reference equivalent (openai/blocksparse predates MoE); this is the
natural composition of its block-sparse MLPs with TPU-native expert
parallelism — the "ep" leg of the dp/tp/pp/sp/ep mesh story:

* **Static-shape routing** (XLA requires static shapes): Switch/GShard
  style top-k gating with a fixed per-expert capacity; token->slot
  assignment is a cumsum over the token order, overflow tokens are
  dropped (their FFN output is zero; the transformer residual carries
  them — the standard Switch behaviour).
* **Einsum dispatch**: the (tokens, experts, capacity) one-hot dispatch
  tensor turns gather/scatter into two MXU-friendly einsums — the
  Mesh-TensorFlow/GShard formulation, which XLA fuses well on TPU.
* **Expert parallelism**: experts shard over the "ep" mesh axis; the
  per-expert buffers travel via ``lax.all_to_all`` (ICI), compute runs
  on each shard's local experts, and a reverse all_to_all brings the
  results home.  ``jax.grad`` transposes the all_to_alls automatically.
* **Block-sparse experts**: each expert FFN is a pair of
  BlocksparseMatMul ops (one shared layout, per-expert weights),
  scanned over the local experts.

Gate grads are partial per ep shard (each shard routes its own
tokens): reduce with psum over ("dp", "ep"); expert weights are
ep-sharded and reduce over "dp" only (see param_reduce_axes).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from blocksparse_tpu.ops.matmul import BlocksparseMatMul
from blocksparse_tpu.ops.ewops import fast_gelu


def route_topk(probs, k, capacity):
    """Static-shape top-k routing (GShard normalize; Switch aux loss).

    probs: (T, E) softmax gate probabilities.
    Returns (dispatch (T, E, C) {0,1}, combine (T, E, C) float,
    aux_loss scalar).  Choice c's slots are assigned after all
    choice-(c-1) slots (first choices win capacity), each in token
    order."""
    T, E = probs.shape
    C = int(capacity)

    topv, topi = lax.top_k(probs, k)                   # (T, k)
    denom = jnp.sum(topv, axis=-1, keepdims=True)
    gates = topv / jnp.maximum(denom, 1e-9)            # normalized

    dispatch = jnp.zeros((T, E, C), probs.dtype)
    combine = jnp.zeros((T, E, C), probs.dtype)
    base = jnp.zeros((E,), jnp.int32)                  # slots used so far
    for c in range(k):
        onehot = jax.nn.one_hot(topi[:, c], E, dtype=jnp.int32)  # (T, E)
        ranks = jnp.cumsum(onehot, axis=0) - 1 + base[None]
        pos = jnp.where(onehot > 0, ranks, -1)   # -1 where not chosen
        keep = (pos >= 0) & (pos < C)
        slot = jax.nn.one_hot(jnp.where(keep, pos, -1).max(-1), C,
                              dtype=probs.dtype)       # (T, C)
        d_c = (onehot * keep).astype(probs.dtype)[:, :, None] \
            * slot[:, None, :]
        dispatch = dispatch + d_c
        combine = combine + d_c * gates[:, c][:, None, None]
        base = base + jnp.sum(onehot, axis=0)

    # Switch aux loss on first choices: E * sum_e f_e * P_e
    first = jax.nn.one_hot(topi[:, 0], E, dtype=probs.dtype)
    f = jnp.mean(first, axis=0)
    p = jnp.mean(probs, axis=0)
    aux = E * jnp.sum(f * p)
    return dispatch, combine, aux


class BlocksparseMoE:
    """Top-k MoE layer: y, aux = moe(params, x[, ep_axis=..]).

    n_experts experts of d_model -> d_hidden -> d_model; block-sparse
    when block_size > 0 (one random-but-covered layout shared by all
    experts — SPMD needs one static schedule; per-expert weights)."""

    def __init__(self, n_experts, d_model, d_hidden, block_size=0,
                 density=1.0, capacity_factor=1.25, k=1, ep=1, seed=0):
        assert n_experts % ep == 0, (n_experts, ep)
        assert 1 <= k <= n_experts
        self.E, self.d, self.h = n_experts, d_model, d_hidden
        self.cf, self.k, self.ep = float(capacity_factor), k, ep
        if block_size:
            bs = block_size
            CB, KB = d_model // bs, d_hidden // bs
            rng = np.random.RandomState(seed)
            lay = (rng.rand(CB, KB) < density).astype(np.int32)
            lay[np.arange(CB), np.arange(CB) % KB] = 1   # no empty rows
            lay[np.arange(KB) % CB, np.arange(KB)] = 1   # no empty cols
            self.bsmm1 = BlocksparseMatMul(lay, block_size=bs,
                                           feature_axis=1)
            self.bsmm2 = BlocksparseMatMul(lay.T.copy(), block_size=bs,
                                           feature_axis=1)
        else:
            self.bsmm1 = self.bsmm2 = None

    def init(self, key):
        E, d, h = self.E, self.d, self.h
        k1, k2, k3 = jax.random.split(key, 3)
        std = 0.02
        if self.bsmm1 is not None:
            w1 = jax.random.normal(k1, (E,) + self.bsmm1.w_shape) * std
            w2 = jax.random.normal(k2, (E,) + self.bsmm2.w_shape) * std
        else:
            w1 = jax.random.normal(k1, (E, d, h)) * std
            w2 = jax.random.normal(k2, (E, h, d)) * std
        return {
            "wg": jax.random.normal(k3, (d, E)) * std,
            "w1": w1, "b1": jnp.zeros((E, h)),
            "w2": w2, "b2": jnp.zeros((E, d)),
        }

    def param_specs(self):
        """PartitionSpec tree: experts sharded over "ep", gate
        replicated."""
        nw = (len(self.bsmm1.w_shape) if self.bsmm1 is not None
              else 2)
        ew = P(*(("ep",) + (None,) * nw))
        return {"wg": P(None, None), "w1": ew, "b1": P("ep", None),
                "w2": ew, "b2": P("ep", None)}

    def param_reduce_axes(self, dp_axis="dp", ep_axis="ep"):
        """Axes to psum grads over (cf. SparseTransformerLM
        grad_reduce_axes): gate partial per ep shard; expert weights
        ep-local."""
        return {"wg": (dp_axis, ep_axis), "w1": (dp_axis,),
                "b1": (dp_axis,), "w2": (dp_axis,), "b2": (dp_axis,)}

    def capacity(self, n_tokens):
        c = int(np.ceil(self.k * self.cf * n_tokens / self.E))
        return max(8, -(-c // 8) * 8)   # multiple of 8 sublanes

    def _ffn(self, w1, b1, w2, b2, x):
        """One expert: x (Cap, d) -> (Cap, d)."""
        if self.bsmm1 is not None:
            u = self.bsmm1(x, w1)
        else:
            u = x @ w1
        u = fast_gelu(u + b1[None])
        y = self.bsmm2(u, w2) if self.bsmm2 is not None else u @ w2
        return y + b2[None]

    def __call__(self, params, x, ep_axis=None):
        """x: (T, d) this shard's tokens -> (y (T, d), aux_loss).

        With ep_axis (inside shard_map): params["w1"] etc. are the
        LOCAL expert slice (E/ep leading); dispatch buffers all_to_all
        over the axis."""
        T, d = x.shape
        assert d == self.d, (x.shape, self.d)
        C = self.capacity(T)

        logits = x @ params["wg"]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        dispatch, combine, aux = route_topk(probs, self.k, C)
        dispatch = dispatch.astype(x.dtype)
        combine = combine.astype(x.dtype)

        xe = jnp.einsum("tec,td->ecd", dispatch, x)    # (E, C, d)

        if ep_axis is not None and self.ep > 1:
            # rows of experts -> their owner shard; each shard ends up
            # with (E/ep, ep*C, d): its experts' buffers from everyone
            xe = lax.all_to_all(xe, ep_axis, split_axis=0,
                                concat_axis=1, tiled=True)

        def body(_, ew):
            w1, b1, w2, b2, xb = ew
            return None, self._ffn(w1, b1, w2, b2, xb)

        _, ye = lax.scan(body, None,
                         (params["w1"], params["b1"], params["w2"],
                          params["b2"], xe))

        if ep_axis is not None and self.ep > 1:
            ye = lax.all_to_all(ye, ep_axis, split_axis=1,
                                concat_axis=0, tiled=True)

        y = jnp.einsum("ecd,tec->td", ye, combine)
        return y, aux.astype(jnp.float32)
