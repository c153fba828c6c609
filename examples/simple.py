#!/usr/bin/env python
"""Minimal BlocksparseMatMul example (parity with reference
examples/simple.py / README.md:44-67)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
# honor an explicit CPU request (CI / virtual-mesh runs)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
from blocksparse_tpu import BlocksparseMatMul

hidden_size = 4096
block_size = 32
minibatch_size = 64

# Create a (random) sparsity pattern
sparsity = np.random.randint(2, size=(hidden_size // block_size,
                                      hidden_size // block_size))

# Initialize the block-sparse matmul object
bsmm = BlocksparseMatMul(sparsity, block_size=block_size, feature_axis=0)

# Input to graph
x = jnp.asarray(np.random.uniform(-1.0, 1.0, bsmm.i_shape(minibatch_size))
                .astype(np.float32))

# Initialize block-sparse weights
w = jnp.asarray(bsmm.identity_init()(None))

# Block-sparse matmul operation
y = jax.jit(lambda x, w: bsmm(x, w))(x, w)

print("y shape:", y.shape, "blocks:", bsmm.blocks,
      "sparsity:", bsmm.sparsity)
print("max |y - x| (identity init):", float(jnp.abs(y - x).max()))
