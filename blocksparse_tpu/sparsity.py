"""Sparsity layouts, masks, and structure tools — one discoverable home.

Collects the layout generators used across the framework:
* attention patterns (fixed / strided / dense-causal, the Sparse
  Transformer families; conv-emulating layouts from utils),
* weight-matrix patterns (Barabasi-Albert / Watts-Strogatz small-world
  graphs, random block masks — reference examples/lstm/masks.py),
* causal sub-block mask callback,
* structure tools (coarsen_layout, layout statistics).
"""
from __future__ import annotations

import numpy as np

from blocksparse_tpu.models.sparse_transformer import (  # noqa: F401
    fixed_layout,
    strided_layout,
    dense_causal_layout,
    causal_subblock_mask,
)
from blocksparse_tpu.models.sparse_lstm import make_mask  # noqa: F401
from blocksparse_tpu.ops.matmul import coarsen_layout  # noqa: F401
from blocksparse_tpu.utils import (  # noqa: F401
    bst_conv_layout,
    bst_deconv_layout,
)


def random_layout(CB, KB, density=0.25, seed=0, ensure_diagonal=True):
    """Random 0/1 block layout (the reference README config)."""
    rng = np.random.RandomState(seed)
    layout = (rng.rand(CB, KB) < density).astype(np.int32)
    if ensure_diagonal:
        idx = np.arange(min(CB, KB))
        layout[idx, idx % KB] = 1
        layout[idx % CB, idx] = 1
    return layout


def layout_stats(layout):
    """Quick structure report: density, row/col degree spread, supertile
    fill at 128 for block sizes 8..64 (predicts which kernel mode and
    whether coarsening pays)."""
    layout = (np.asarray(layout) != 0).astype(np.int32)
    CB, KB = layout.shape
    rows = layout.sum(axis=0)
    cols = layout.sum(axis=1)
    out = {
        "shape": (CB, KB),
        "blocks": int(layout.sum()),
        "density": float(layout.mean()),
        "row_degree_min_max": (int(rows.min()), int(rows.max())),
        "col_degree_min_max": (int(cols.min()), int(cols.max())),
    }
    for b in (8, 16, 32, 64):
        V = 128 // b
        CBp = -(-CB // V) * V
        KBp = -(-KB // V) * V
        pad = np.zeros((CBp, KBp), np.int32)
        pad[:CB, :KB] = layout
        coarse = pad.reshape(CBp // V, V, KBp // V, V)
        present = coarse.max(axis=(1, 3)).sum()
        out[f"supertile128_fill_b{b}"] = (
            float(layout.sum() / max(present * V * V, 1)))
    return out
