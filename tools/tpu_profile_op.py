"""Find where time goes in the full bsmm op at the bench config."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul
from blocksparse_tpu.kernels import bsmm as K

rng = np.random.RandomState(0)
CB = KB = 128
bsize, N, d = 32, 512, 0.25
layout = (rng.rand(CB, KB) < d).astype(np.int32)
layout[0, :] = 1
layout[:, 0] = 1
bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0, impl="pallas")
print("blocks", bsmm.blocks, "G_f", bsmm.fprop_grouped.G,
      "CH", bsmm.fprop_grouped.CH, "groups", bsmm.fprop_grouped.groups)

x = jnp.asarray(rng.rand(*bsmm.i_shape(N)), jnp.bfloat16)
w = jnp.asarray(rng.rand(*bsmm.w_shape), jnp.bfloat16)


def timeit(f, *args, reps=30):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


# 1. full fprop
dt = timeit(jax.jit(lambda x, w: bsmm(x, w)), x, w)
print(f"full fprop:        {dt*1e6:9.1f} us")

# 2. gather alone
g = jax.jit(lambda w: K._gather_w_grouped(w, bsmm.fprop_grouped, False))
dt = timeit(g, w)
print(f"w gather alone:    {dt*1e6:9.1f} us")

# 3. kernel with pre-gathered panels
wp = g(w)
sched = bsmm.fprop_grouped


def kernel_only(x, wp):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    C, NN = x.shape
    TN = NN
    R, G, CH, groups = sched.R, sched.G, sched.CH, sched.groups
    in_specs = [
        pl.BlockSpec((C, TN), lambda n, g, rr, ii: (0, n), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + wp.shape[1:], lambda n, g, rr, ii: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((R * bsize, TN), lambda n, g, rr, ii: (g, n),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(NN // TN, groups),
        in_specs=in_specs, out_specs=out_spec)
    fn = pl.pallas_call(
        functools.partial(K._xprop_grouped_kernel, CH, G, R, bsize, False,
                          jax.lax.Precision.DEFAULT),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups * R * bsize, NN), jnp.float32))
    return fn(jnp.asarray(sched.rows), jnp.asarray(sched.in_idx), x, wp)


dt = timeit(jax.jit(kernel_only), x, wp)
print(f"kernel only:       {dt*1e6:9.1f} us")

# 4. f32 out cast alone
y = jax.jit(kernel_only)(x, wp)
dt = timeit(jax.jit(lambda y: y.astype(jnp.bfloat16)), y)
print(f"cast out:          {dt*1e6:9.1f} us")
