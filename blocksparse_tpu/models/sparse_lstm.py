"""Sparse LSTM language model (second flagship family).

TPU-native re-make of /root/reference/examples/lstm/: block-sparse
mLSTM with small-world weight layouts (Barabasi-Albert / Watts-Strogatz,
reference masks.py:32-57), SparseProj strided input/output projections
(layers.py:163-184), multi-internal-step mLSTM recurrence
("LSTM_scott", layers.py:637), fused layer norm on the gates, and
scan-based training (the reference's group_param_grads dw fusion and
manual memory-saving backward become lax.scan + jax.checkpoint).

Depth parity with the reference hparams surface (train.py:100-140):
``isteps`` (internal recurrence per cell), ``lsteps`` (stacked sparse
LSTM layers; the reference applies the cell lsteps times per token —
here each level carries its own recurrent state and, with
``share_masks=False``, its own layout), ``forget_bias``, ``dropout``
(recurrent-output dropout like the reference's hps.dropout on h),
``recompute`` (per-timestep jax.checkpoint — the reference's segment
recompute, layers.py:686-737).
"""
from __future__ import annotations

from dataclasses import dataclass, asdict

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
    lsteps: int = 1           # stacked sparse LSTM layers
    share_masks: bool = True  # one layout for all layers
    forget_bias: float = 1.0
    dropout: float = 0.0      # recurrent-output dropout (train only)
    recompute: bool = False   # per-timestep rematerialization
    layernorm: bool = True
    dtype: str = "float32"


class SparseLSTM:
    """Functional sparse mLSTM LM."""

    def __init__(self, config: LSTMConfig):
        c = self.config = config
        bs = c.block_size
        assert c.nhidden % bs == 0
        nb = c.nhidden // bs

        # hidden-to-hidden per layer (4 gates share one sparse weight
        # per gate set); share_masks reuses layer 0's layout
        self.bsmm_layers = []
        for l in range(c.lsteps):
            seed = 0 if c.share_masks else l
            layout = make_mask(nb, c.mask_kind, seed=seed)
            self.bsmm_layers.append(BlocksparseMatMul(
                np.tile(layout, (1, 4)), block_size=bs, feature_axis=0,
                name=f"bsmm_h{l}"))
        self.bsmm_h = self.bsmm_layers[0]
        # strided dense<->sparse projections (reference layers.py:163-184);
        # projection sizes clamp to the hidden width
        nproj_in = min(c.nproj_in, c.nhidden)
        nproj_out = min(c.nproj_out, c.nhidden)
        self.proj_in = SparseProj(c.nhidden,
                                  proj_stride=max(c.nhidden // nproj_in, 1))
        self.proj_out = SparseProj(c.nhidden,
                                   proj_stride=max(c.nhidden // nproj_out, 1))

    def layouts(self):
        """name -> 0/1 layout, for the checkpoint sidecar."""
        return {b.name: np.asarray(b.layout)
                for b in self.bsmm_layers}

    def init(self, key):
        c = self.config
        ks = jax.random.split(key, 4 + c.lsteps)
        std = 0.05
        params = {
            "wte": jax.random.normal(ks[0], (c.n_vocab, c.nembd)) * std,
            "w_in": jax.random.normal(
                ks[1], (c.nembd, self.proj_in.nproj)) * std,
            "w_out": jax.random.normal(
                ks[2], (self.proj_out.nproj, c.n_vocab)) * std,
            "b_out": jnp.zeros((c.n_vocab,)),
            "layers": [],
        }
        for l, bsmm in enumerate(self.bsmm_layers):
            lp = {
                "w_h": jnp.asarray(bsmm.ortho_init()(None)),
                "b_h": jnp.zeros((4 * c.nhidden,)),
            }
            if c.layernorm:
                lp["g_h"] = jnp.ones((4 * c.nhidden,))
            params["layers"].append(lp)
        return params

    def _cell(self, lp, bsmm, c_state, h_state, x_inj):
        """One LSTM step for one layer: h is (nhidden, batch)
        feature-major for the CN-oriented bsmm.  x_inj: input injection
        in the hidden space (scattered x for layer 0, the lower layer's
        h above)."""
        cfg = self.config
        h_in = h_state + x_inj
        for _ in range(cfg.isteps):
            gates = bsmm(h_in, lp["w_h"])              # (4*nhidden, batch)
            if cfg.layernorm:
                gates = layer_norm(gates, lp["g_h"], lp["b_h"],
                                   axis=0, segments=4)
            else:
                gates = gates + lp["b_h"][:, None]
            cT, hT = fused_lstm_gates(c_state.T, gates.T,
                                      forget_bias=cfg.forget_bias)
            c_state, h_in = cT.T, hT.T
        return c_state, h_in

    def forward(self, params, tokens, dropout_key=None):
        """tokens (batch, nsteps) -> logits (batch, nsteps, n_vocab).
        dropout_key enables recurrent-output dropout (training)."""
        cfg = self.config
        batch = tokens.shape[0]
        emb = jnp.take(params["wte"], tokens, axis=0)     # (B, T, nembd)
        xproj = jnp.einsum("bte,ep->btp", emb, params["w_in"])

        L = cfg.lsteps
        c0 = jnp.zeros((L, cfg.nhidden, batch))
        h0 = jnp.zeros((L, cfg.nhidden, batch))
        use_drop = cfg.dropout > 0.0 and dropout_key is not None
        if use_drop:
            T = tokens.shape[1]
            keep = jax.random.bernoulli(
                dropout_key, 1.0 - cfg.dropout,
                (T, L, cfg.nhidden, batch)).astype(xproj.dtype)
            keep = keep / (1.0 - cfg.dropout)
        else:
            keep = jnp.ones((tokens.shape[1], 1, 1, 1), xproj.dtype)

        def one_step(carry, xs):
            c, h = carry
            x_t, keep_t = xs
            inj = self.proj_in.scatter_add(
                jnp.zeros((cfg.nhidden, batch)), x_t.T)
            cs, hs = [], []
            for l in range(L):
                cl, hl = self._cell(params["layers"][l],
                                    self.bsmm_layers[l], c[l], h[l], inj)
                if use_drop:
                    hl = hl * keep_t[min(l, keep_t.shape[0] - 1)]
                cs.append(cl)
                hs.append(hl)
                inj = hl                      # feed the layer above
            out = self.proj_out.gather(hs[-1])            # (nproj_out, B)
            return (jnp.stack(cs), jnp.stack(hs)), out

        step = one_step
        if cfg.recompute:
            step = jax.checkpoint(one_step)
        (cT, hT), outs = jax.lax.scan(step, (c0, h0),
                                      (jnp.moveaxis(xproj, 1, 0), keep))
        # outs from scan: (T, nproj_out, B)
        logits = jnp.einsum("tpb,pv->btv", outs,
                            params["w_out"]) + params["b_out"]
        return logits

    def loss(self, params, tokens, targets, dropout_key=None):
        logits = self.forward(params, tokens, dropout_key=dropout_key)
        return jnp.mean(softmax_cross_entropy(logits=logits,
                                              labels=targets))

    def config_dict(self):
        return asdict(self.config)
