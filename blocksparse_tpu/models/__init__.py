from blocksparse_tpu.models.sparse_transformer import (
    SparseTransformerLM,
    TransformerConfig,
)
