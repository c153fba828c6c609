"""Embedding lookup.

TPU-native equivalent of /root/reference/blocksparse/embed.py
(src/embedding_op_gpu.cu).  The reference offers sorted (deterministic)
vs atomic grads; XLA scatter-add on TPU is deterministic by
construction, so ``sort_grad`` is accepted and ignored.  The grad is
emitted in the incoming grad's dtype (reference embed.py:29-36) —
standard JAX behavior.
"""
from __future__ import annotations

import jax.numpy as jnp


def embedding_lookup(emb, idx, sort_grad=True, bench=0, use_tf=False):
    return jnp.take(emb, idx, axis=0)


def convert_gradient_to_tensor(x):
    """Parity shim: JAX grads are always dense tensors already."""
    return x
