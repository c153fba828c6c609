from blocksparse_tpu.parallel.mesh import (
    make_mesh,
    mpi_size,
    mpi_rank,
)
from blocksparse_tpu.parallel.collectives import (
    allreduce,
    hierarchical_allreduce,
    group_allreduce,
    reduce_scatter,
    all_gather,
    sync_variables_op,
    sync_globals_zero_init_op,
    serialize_allreduce_ops,
    identity_sync,
)
from blocksparse_tpu.parallel.sequence import (
    sequence_parallel_attention,
    ring_attention,
    build_sp_schedules,
    build_ring_schedules,
)
from blocksparse_tpu.parallel.pipeline import (
    gpipe,
    broadcast_from_last,
    microbatch,
    unmicrobatch,
)
