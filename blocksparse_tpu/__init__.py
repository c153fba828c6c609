"""blocksparse_tpu: TPU-native block-sparse neural network framework.

A ground-up JAX/XLA/Pallas reimplementation of the capability surface of
OpenAI's `blocksparse` GPU library (see SURVEY.md): layout-driven
block-sparse matmul, block-sparse transformer attention, block-sparse
convolution, fused norms/elementwise/LSTM ops, fused optimizers with
compact 16-bit state, quantization research ops, gradient checkpointing,
and mesh-parallel collectives.
"""
__version__ = "0.1.0"

from blocksparse_tpu.utils import (
    ceil_div,
    reduce_mul,
    scalar_constant,
    set_entropy,
    get_entropy,
    z_order_2d,
    z_order_3d,
    magic32u,
    magic64u,
    bst_conv_layout,
    bst_deconv_layout,
)

from blocksparse_tpu.ops.matmul import (
    BlocksparseMatMul,
    SparseProj,
    group_param_grads,
    block_reduced_full_dw,
    largest_block,
)
