"""Validate bsmm Pallas kernels on real TPU: correctness + rough perf."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul

print("backend:", jax.default_backend(), jax.devices())


def check(axis, bsize, CB, KB, N, density, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    layout = (rng.rand(CB, KB) < density).astype(np.int32)
    layout[0, :] = 1
    layout[:, 0] = 1
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=axis,
                             impl="pallas")
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    W = rng.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)

    Xd, Wd, Ed = (jnp.asarray(X, dtype), jnp.asarray(W, dtype),
                  jnp.asarray(E, dtype))

    f = jax.jit(lambda x, w: bsmm(x, w))
    Y = np.asarray(f(Xd, Wd), np.float32)
    Yg = bsmm.fprop_test(np.asarray(Xd, np.float32), np.asarray(Wd, np.float32))
    err = np.abs(Y - Yg).max() / (np.abs(Yg).max() + 1e-9)

    g = jax.jit(jax.grad(lambda x, w: jnp.sum(bsmm(x, w) * Ed), argnums=(0, 1)))
    DX, DW = g(Xd, Wd)
    DXg = bsmm.bprop_test(np.asarray(Ed, np.float32), np.asarray(Wd, np.float32))
    DWg = bsmm.updat_test(np.asarray(Xd, np.float32), np.asarray(Ed, np.float32))
    errdx = np.abs(np.asarray(DX, np.float32) - DXg).max() / (np.abs(DXg).max() + 1e-9)
    errdw = np.abs(np.asarray(DW, np.float32) - DWg).max() / (np.abs(DWg).max() + 1e-9)

    # perf
    reps = 20
    f(Xd, Wd).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        Y = f(Xd, Wd)
    Y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    flops = bsmm.flops * N
    print(f"axis={axis} bs={bsize} {CB*bsize}x{KB*bsize} N={N} d={density} "
          f"{str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):10s} "
          f"err f/dx/dw: {err:.2e}/{errdx:.2e}/{errdw:.2e}  "
          f"{dt*1e3:7.3f} ms  {flops/dt/1e12:6.2f} TFLOP/s")


for axis in (0, 1):
    for bsize in (8, 16, 32, 64):
        check(axis, bsize, 8, 8, 256, 0.5)

# bench-ish configs
check(0, 32, 128, 128, 64, 0.25)                      # 4096^2 @ 25%, N=64
check(0, 32, 128, 128, 64, 0.25, jnp.bfloat16)
check(0, 32, 128, 128, 512, 0.25, jnp.bfloat16)
check(0, 32, 128, 128, 512, 1.0, jnp.bfloat16)        # dense for roofline ref
