"""blocksparse_tpu: TPU-native block-sparse neural network framework.

A ground-up JAX/XLA/Pallas reimplementation of the capability surface of
OpenAI's `blocksparse` GPU library (see SURVEY.md): layout-driven
block-sparse matmul, block-sparse transformer attention, block-sparse
convolution, fused norms/elementwise/LSTM ops, fused optimizers with
compact 16-bit state, quantization research ops, gradient checkpointing,
and mesh-parallel collectives.

Public surface mirrors /root/reference/blocksparse/__init__.py.
"""
__version__ = "0.1.0"

from blocksparse_tpu.utils import (
    reset_scalar_constants,
    get_entropy,
    set_entropy,
    entropy_size,
    scalar_constant,
    ceil_div,
    reduce_mul,
    z_order_2d,
    z_order_3d,
    magic32u,
    magic64u,
    bst_conv_layout,
    bst_deconv_layout,
)

from blocksparse_tpu.ops.conv import (
    BlocksparseConv,
    BlocksparseDeconv,
    ConvEdgeBias,
    conv_edge_bias_init,
    deconv_edge_bias_init,
    cwise_linear,
)

from blocksparse_tpu.ops.embed import (
    embedding_lookup,
)

from blocksparse_tpu.ops.ewops import (
    add,
    multiply,
    subtract,
    divide,
    maximum,
    minimum,
    negative,
    reciprocal,
    square,
    sqrt,
    exp,
    log,
    sigmoid,
    tanh,
    relu,
    elu,
    gelu,
    swish,
    fast_gelu,
    filter_tensor,
    filter_tensor_op,
    scale_tensor,
    float_cast,
    dropout,
    concrete_gate,
    concrete_gate_infer,
    add_n8,
    add_n,
    bias_relu,
    fancy_gather,
    reduce_max,
    assign_add,
    replace_add_n,
    restore_add_n,
)

from blocksparse_tpu.ops.grads import (
    gradients,
    recomputable,
)

from blocksparse_tpu.ops.lstm import (
    fused_lstm_gates,
    split4,
    concat4,
    sparse_relu,
    FusedBasicLSTMCell,
    grouped_lstm,
    grouped_lstm_init,
    group_lstm_grads,
)

from blocksparse_tpu.ops.matmul import (
    BlocksparseMatMul,
    SparseProj,
    block_reduced_full_dw,
    group_param_grads,
    group_dg_grads,
    get_bsmm_dx_ops,
    largest_block,
    coarsen_layout,
    dw_matmul_large_n,
)
from blocksparse_tpu import checkpoint
from blocksparse_tpu import nccl
from blocksparse_tpu import sparsity
from blocksparse_tpu import profiling

from blocksparse_tpu.ops.moe import (
    BlocksparseMoE,
    route_topk,
)
from blocksparse_tpu.ops.norms import (
    layer_norm,
    batch_norm,
    batch_norm_inference,
)

from blocksparse_tpu.ops.optimize import (
    Ema,
    AdamOptimizer,
    AdafactorOptimizer,
    blocksparse_l2_decay,
    blocksparse_norm,
    blocksparse_prune,
    clip_by_global_norm,
    global_norm,
    adafactor2d_op,
    adafactor1d_op,
    adam_op,
    adam_apply,
    lazy_emb_adam_op,
    lazy_emb_adam_apply,
    blocksparse_adam_op,
    ema_op,
    mhalf_pack,
    mhalf_unpack,
    vhalf_pack,
    vhalf_unpack,
)

from blocksparse_tpu.ops.quantize import (
    QuantizeSpec,
    QuantizeTracker,
    quantize,
    quantize_emax_estimate,
    log_stats,
)

from blocksparse_tpu.ops.transformer import (
    BlocksparseTransformer,
    softmax,
    masked_softmax,
    masked_top_k_softmax,
    softmax_cross_entropy,
    transpose_2d,
    transpose_0213,
    top_k,
    rectified_top_k,
    clear_bst_constants,
)

from blocksparse_tpu.parallel import (
    make_mesh,
    allreduce,
    group_allreduce,
    reduce_scatter,
    all_gather,
    sync_variables_op,
    serialize_allreduce_ops,
    identity_sync,
    sequence_parallel_attention,
)
