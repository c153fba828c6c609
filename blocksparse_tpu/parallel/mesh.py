"""Device mesh construction helpers.

The reference's distributed runtime is MPI + NCCL: one process per GPU,
rank/size from MPI, ncclUniqueId broadcast over MPI, async comm threads
per communicator (/root/reference/src/nccl_op.cc:247-383,
/root/reference/blocksparse/nccl.py).  On TPU none of that machinery is
needed: ``jax.sharding.Mesh`` over ``jax.devices()`` names the axes, XLA
inserts the collectives, and its latency-hiding scheduler provides the
overlap the reference builds with multiple communicators and ordering
constraints.  Multi-host bootstrap is ``jax.distributed.initialize``.

Axis conventions used throughout blocksparse_tpu:
  "dp" data parallel, "tp" tensor/model parallel, "pp" pipeline,
  "sp" sequence (context) parallel.
DCN-connected multi-slice meshes put the slower axis first so
collectives ride ICI within a slice.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec, NamedSharding


def make_mesh(dp=None, tp=1, pp=1, sp=1, ep=1, devices=None,
              axis_names=("dp", "tp", "pp", "sp", "ep")):
    """Build a Mesh over available devices; dp defaults to the remainder.
    Size-1 axes are kept in the mesh (psum over them is a no-op), so one
    program can name any of dp/tp/pp/sp/ep unconditionally."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (tp * pp * sp * ep) == 0, (n, tp, pp, sp, ep)
        dp = n // (tp * pp * sp * ep)
    assert dp * tp * pp * sp * ep == n, (dp, tp, pp, sp, ep, n)
    arr = np.array(devices).reshape(dp, tp, pp, sp, ep)
    return Mesh(arr, axis_names)


def mpi_size(mesh=None, axis="dp"):
    """Parity helper: the reference uses mpi_size for the DP world size."""
    if mesh is None:
        return jax.device_count()
    return mesh.shape[axis]


def mpi_rank(axis="dp"):
    """Inside shard_map/pjit: the index along the DP axis."""
    return jax.lax.axis_index(axis)


def data_sharding(mesh, *spec):
    return NamedSharding(mesh, PartitionSpec(*spec))
