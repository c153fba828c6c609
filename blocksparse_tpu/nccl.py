"""Drop-in module name for the reference's ``blocksparse.nccl``.

The reference users do ``import blocksparse.nccl as nccl``; this module
keeps that import path working on TPU — every function is implemented
on XLA collectives in blocksparse_tpu.parallel (see that module for the
full mapping of the MPI+NCCL machinery)."""
from blocksparse_tpu.parallel.collectives import (  # noqa: F401
    allreduce,
    hierarchical_allreduce,
    group_allreduce,
    sync_variables_op,
    sync_globals_zero_init_op,
    serialize_allreduce_ops,
    identity_sync,
    reduce_scatter,
    all_gather,
)
from blocksparse_tpu.parallel.mesh import mpi_size, mpi_rank  # noqa: F401

serialize_nccl_ops = serialize_allreduce_ops
