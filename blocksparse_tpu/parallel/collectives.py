"""Collectives: the reference nccl.py API surface on XLA collectives.

Reference: /root/reference/blocksparse/nccl.py + src/nccl_op.cc.

Mapping (see SURVEY.md §2.3):
* ``allreduce`` -> ``lax.psum`` over a named mesh axis.  The reference's
  deadlock-avoidance machinery (global op counter, ``serialize_allreduce_ops``
  control-edge chains, multiple communicators with round-robin
  assignment, ``sync_size`` backpressure) is unnecessary: XLA emits
  collectives in a deterministic program order on every participant and
  its latency-hiding scheduler overlaps them with compute.
* ``prereduce`` (hierarchical intra-node reduce -> inter-node allreduce
  -> broadcast, src/nccl_op.cc:174-191) maps to a two-level psum over
  ("ici", "dcn") mesh axes — pass ``axis=("ici", "dcn")``.
* ``group_allreduce``'s flat fp16/fp32 bucket concat exists to amortize
  NCCL launch overhead; XLA fuses small psums itself, so only the
  *dtype* semantics (optional cast-to-fp16 before reducing) are kept.
* ``reduce_scatter``/``all_gather`` (model sharding; the reference
  Python documents these but the backing C++ ops are absent from the
  snapshot, nccl.py:316-429) are first-class here via
  ``lax.psum_scatter`` / ``lax.all_gather``.

All functions must run inside ``shard_map``/``pjit`` with the named axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


_op_counter = 0


def allreduce(x, op_num=None, num_comms=2, prereduce=0, mpi_ranks=None,
              comm_id=0, logfile=None, axis="dp"):
    """Sum x across the axis.  Gradient is an allreduce of dy
    (reference nccl.py:70) — which is what AD of psum produces.

    ``prereduce`` (reference src/nccl_op.cc:174-191: intra-node reduce ->
    inter-node allreduce -> intra-node broadcast): pass a tuple axis
    ``("ici", "dcn")`` (fast axis first) and prereduce>0 to run the
    bandwidth-optimal hierarchical form via :func:`hierarchical_allreduce`.
    A plain tuple axis without prereduce is a flat multi-axis psum."""
    global _op_counter
    _op_counter += 1
    if prereduce and isinstance(axis, (tuple, list)) and len(axis) == 2:
        return hierarchical_allreduce(x, fast_axis=axis[0],
                                      slow_axis=axis[1])
    return lax.psum(x, axis)


def hierarchical_allreduce(x, fast_axis="ici", slow_axis="dcn",
                           scatter_dimension=0):
    """Two-level allreduce: reduce_scatter over the fast axis (ICI),
    allreduce over the slow axis (DCN), all_gather over the fast axis.

    This is the TPU-native form of the reference's ``prereduce``
    (src/nccl_op.cc:174-191 — intra-node reduce to one rank, inter-node
    allreduce among node leaders, intra-node broadcast): only 1/|ici| of
    the payload crosses the slow DCN links, while the scatter/gather legs
    ride ICI.  Bitwise-equal in sum to ``lax.psum(x, (fast, slow))`` up
    to float reassociation.

    When x's leading dim does not divide by the fast-axis size, falls
    back to the flat two-axis psum (the scatter needs an even split).
    """
    size = lax.psum(1, fast_axis)
    d = scatter_dimension
    if x.ndim == 0 or x.shape[d] % size != 0:
        return lax.psum(x, (fast_axis, slow_axis))
    part = lax.psum_scatter(x, fast_axis, scatter_dimension=d, tiled=True)
    part = lax.psum(part, slow_axis)
    return lax.all_gather(part, fast_axis, axis=d, tiled=True)


def group_allreduce(grads, params=None, search_strings=None, cast_all=None,
                    axis="dp"):
    """Allreduce a pytree/list of grads.

    cast_all: optional dtype (e.g. jnp.bfloat16) applied before reducing,
    preserving the reference's cast_all/fp16-bucket semantics
    (nccl.py:100-162).  Bucketing by name (search_strings) is accepted
    for API parity but has no performance role under XLA.
    """
    def red(g):
        if cast_all is not None and g.dtype != cast_all:
            g = g.astype(cast_all)
        return lax.psum(g, axis)
    return jax.tree_util.tree_map(red, grads)


def sync_variables_op(params, axis="dp"):
    """Make all ranks agree on rank 0's values (reference nccl.py:164).
    Run once inside shard_map after init."""
    idx = lax.axis_index(axis)

    def bcast(p):
        z = jnp.where(idx == 0, p, jnp.zeros_like(p))
        return lax.psum(z, axis)
    return jax.tree_util.tree_map(bcast, params)


def sync_globals_zero_init_op(params, axis="dp"):
    """Parity with nccl.py:178: equivalent to sync_variables for
    zero-initialized variables."""
    return sync_variables_op(params, axis)


def serialize_allreduce_ops(ops=None):
    """No-op: XLA schedules collectives identically on all participants,
    so the reference's cross-rank deadlock-prevention pass
    (nccl.py:230-298) has no TPU equivalent."""
    return ops


def identity_sync(*xs, sync_fwd=False, sync_bwd=False):
    """No-op passthrough: XLA has no scheduler-runahead hazard to stop
    (reference nccl.py:301)."""
    return xs if len(xs) > 1 else xs[0]


def reduce_scatter(x, axis="dp", scatter_dimension=0):
    """Sum across the axis and keep 1/N along scatter_dimension
    (reference nccl.py:347; backing op absent in the reference snapshot).
    x.shape[scatter_dimension] must divide by the axis size."""
    return lax.psum_scatter(x, axis, scatter_dimension=scatter_dimension,
                            tiled=True)


def all_gather(x, axis="dp", concat_dimension=0):
    """Inverse of reduce_scatter (reference nccl.py:376)."""
    return lax.all_gather(x, axis, axis=concat_dimension, tiled=True)
