"""Sparse LSTM language model (second flagship family).

TPU-native re-make of /root/reference/examples/lstm/: block-sparse
mLSTM with small-world weight layouts (Barabasi-Albert / Watts-Strogatz,
reference masks.py:32-57), SparseProj strided input/output projections
(layers.py:163-184), multi-internal-step mLSTM recurrence
("LSTM_scott", layers.py:637), fused layer norm on the gates, and
scan-based training (the reference's group_param_grads dw fusion and
manual memory-saving backward become lax.scan + jax.checkpoint).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops.matmul import BlocksparseMatMul, SparseProj
from blocksparse_tpu.ops.lstm import fused_lstm_gates
from blocksparse_tpu.ops.norms import layer_norm
from blocksparse_tpu.ops.transformer import softmax_cross_entropy


def make_mask(n, kind="ba_10", seed=0):
    """Small-world block layouts (parity with reference masks.py:5-29)."""
    import networkx
    if kind == "dense":
        return np.ones((n, n), dtype=np.int32)
    if kind.startswith("ba_"):
        m = int(kind.split("_")[1])
        g = networkx.generators.barabasi_albert_graph(n=n, m=m, seed=seed)
        a = networkx.adjacency_matrix(g).toarray().astype(np.int32) \
            + np.eye(n, dtype=np.int32)
        a[0:m, 0:m] = 1
        return a
    if kind.startswith("ws_"):
        _, m, pct = kind.split("_")
        g = networkx.generators.random_graphs.watts_strogatz_graph(
            n, int(m) * 2, float(pct) / 100.0, seed=seed)
        return networkx.adjacency_matrix(g).toarray().astype(np.int32) \
            + np.eye(n, dtype=np.int32)
    raise ValueError("Unknown mask kind: " + str(kind))


@dataclass
class LSTMConfig:
    n_vocab: int = 256
    nhidden: int = 1120
    nembd: int = 64
    nproj_in: int = 512
    nproj_out: int = 512
    nsteps: int = 64
    block_size: int = 32
    mask_kind: str = "ba_10"
    isteps: int = 2           # internal (multi-step) recurrence depth
    layernorm: bool = True
    dtype: str = "float32"


class SparseLSTM:
    """Functional sparse mLSTM LM."""

    def __init__(self, config: LSTMConfig):
        c = self.config = config
        bs = c.block_size
        assert c.nhidden % bs == 0
        nb = c.nhidden // bs
        layout = make_mask(nb, c.mask_kind)

        # hidden-to-hidden (4 gates share one sparse weight per gate set)
        self.bsmm_h = BlocksparseMatMul(
            np.tile(layout, (1, 4)), block_size=bs, feature_axis=0,
            name="bsmm_h")
        # strided dense<->sparse projections (reference layers.py:163-184);
        # projection sizes clamp to the hidden width
        nproj_in = min(c.nproj_in, c.nhidden)
        nproj_out = min(c.nproj_out, c.nhidden)
        self.proj_in = SparseProj(c.nhidden,
                                  proj_stride=max(c.nhidden // nproj_in, 1))
        self.proj_out = SparseProj(c.nhidden,
                                   proj_stride=max(c.nhidden // nproj_out, 1))

    def init(self, key):
        c = self.config
        ks = jax.random.split(key, 8)
        std = 0.05
        params = {
            "wte": jax.random.normal(ks[0], (c.n_vocab, c.nembd)) * std,
            "w_in": jax.random.normal(
                ks[1], (c.nembd, self.proj_in.nproj)) * std,
            "w_h": jnp.asarray(self.bsmm_h.ortho_init()(None)),
            "b_h": jnp.zeros((4 * c.nhidden,)),
            "w_out": jax.random.normal(
                ks[2], (self.proj_out.nproj, c.n_vocab)) * std,
            "b_out": jnp.zeros((c.n_vocab,)),
        }
        if c.layernorm:
            params["g_h"] = jnp.ones((4 * c.nhidden,))
        return params

    def _cell(self, params, c_state, h_state, x_proj):
        """One LSTM step: h is (nhidden, batch) feature-major for the
        CN-oriented bsmm."""
        cfg = self.config
        # scatter the input projection into the hidden space
        h_in = self.proj_in.scatter_add(h_state, x_proj)
        for _ in range(cfg.isteps):
            gates = self.bsmm_h(h_in, params["w_h"])   # (4*nhidden, batch)
            if cfg.layernorm:
                gates = layer_norm(gates, params["g_h"], params["b_h"],
                                   axis=0, segments=4)
            else:
                gates = gates + params["b_h"][:, None]
            cT, hT = fused_lstm_gates(c_state.T, gates.T, forget_bias=1.0)
            c_state, h_in = cT.T, hT.T
        return c_state, h_in

    def forward(self, params, tokens):
        """tokens (batch, nsteps) -> logits (batch, nsteps, n_vocab)."""
        cfg = self.config
        batch = tokens.shape[0]
        emb = jnp.take(params["wte"], tokens, axis=0)     # (B, T, nembd)
        xproj = jnp.einsum("bte,ep->btp", emb, params["w_in"])

        c0 = jnp.zeros((cfg.nhidden, batch))
        h0 = jnp.zeros((cfg.nhidden, batch))

        def step(carry, x_t):
            c, h = carry
            c, h = self._cell(params, c, h, x_t.T)      # x_t.T: (nproj, B)
            out = self.proj_out.gather(h)               # (nproj_out, B)
            return (c, h), out

        (cT, hT), outs = jax.lax.scan(step, (c0, h0),
                                      jnp.moveaxis(xproj, 1, 0))
        # outs from scan: (T, nproj_out, B)
        logits = jnp.einsum("tpb,pv->btv", outs,
                            params["w_out"]) + params["b_out"]
        return logits

    def loss(self, params, tokens, targets):
        logits = self.forward(params, tokens)
        return jnp.mean(softmax_cross_entropy(logits=logits,
                                              labels=targets))
