"""Pallas TPU kernels for blocksparse_tpu.

Each kernel family mirrors a CUDA/SASS kernel family of the reference
(see SURVEY.md §2.2) but is designed TPU-first: host-precomputed block
schedules are passed as scalar-prefetch arrays, block gathers happen via
`BlockSpec` index maps, and accumulation exploits the sequential TPU grid
(no spin locks).
"""
from blocksparse_tpu.kernels.common import use_interpret, set_interpret
