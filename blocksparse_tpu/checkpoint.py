"""Checkpoint / resume.

The reference has no framework-level checkpoint system — the LSTM
example joblib-dumps EMA'd arrays (reference examples/lstm/layers.py:44-98)
and op objects pickle their layouts (matmul.py:76-80).  Here checkpointing
is first-class: orbax for the array pytrees (params / optimizer state /
EMA / loss-scale) plus a metadata sidecar for layouts and config, so a
training run can resume exactly — including the sparsity structure.
"""
from __future__ import annotations

import os
import pickle



def save(path, params, opt_state=None, ema_state=None, step=0,
         loss_scale=None, layouts=None, config=None):
    """Write a checkpoint directory: arrays via orbax, metadata pickled.

    layouts: dict name -> np.ndarray 0/1 layout (the sparsity structure
    needed to rebuild BlocksparseMatMul/BlocksparseTransformer objects).
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    if ema_state is not None:
        tree["ema_state"] = ema_state
    if loss_scale is not None:
        tree["loss_scale"] = loss_scale

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), tree, force=True)

    meta = {"step": int(step), "layouts": layouts or {},
            "config": config}
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump(meta, f)


def restore(path):
    """Returns (tree, meta): tree has params/opt_state/ema_state/
    loss_scale as saved; meta has step/layouts/config."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.join(path, "arrays"))
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    return tree, meta
