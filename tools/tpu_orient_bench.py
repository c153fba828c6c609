"""Honest (scan-chained) timing of matmul orientations + bsmm kernels."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp


def bench_loop(one_step, x0, iters=40):
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y
    y = run(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = run(x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


H, N = 4096, 512
DT = jnp.bfloat16
rng = np.random.RandomState(0)
W = jnp.asarray(rng.uniform(-0.1, 0.1, (H, H)), DT)
x_cn = jnp.asarray(rng.uniform(-1, 1, (H, N)), DT)   # feature-major
x_nc = jnp.asarray(rng.uniform(-1, 1, (N, H)), DT)
flops = 2 * H * H * N

# NN: (N,H)@(H,H) — canonical
dt = bench_loop(lambda x: (x @ W).astype(DT), x_nc)
print(f"NN  (N,H)@(H,H):             {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF/s")

# TN: contract dim0 x dim0 (current CN dense baseline)
dt = bench_loop(lambda x: jax.lax.dot_general(
    W, x, (((0,), (0,)), ((), ())),
    preferred_element_type=jnp.float32).astype(DT), x_cn)
print(f"TN  W^T@x (contract 0,0):    {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF/s")

# NT-ish: W @ x  (contract lanes of W with sublanes of x) — natural
dt = bench_loop(lambda x: jax.lax.dot_general(
    W, x, (((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32).astype(DT), x_cn)
print(f"NN' W@x (contract 1,0):      {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF/s")

# x^T W as (N,H): out transpose orientation
dt = bench_loop(lambda x: jax.lax.dot_general(
    x, W, (((1,), (1,)), ((), ())),
    preferred_element_type=jnp.float32).astype(DT), x_nc)
print(f"NT  x@W^T (contract 1,1):    {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF/s")

# f32 versions for reference
Wf = W.astype(jnp.float32)
xf = x_nc.astype(jnp.float32)
dt = bench_loop(lambda x: (x @ Wf), xf)
print(f"NN  f32 default precision:   {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF/s")

# bsmm kernel honest timing
from blocksparse_tpu import BlocksparseMatMul
for d in (0.25, 1.0):
    lay = (rng.rand(128, 128) < d).astype(np.int32)
    lay[np.arange(128), np.arange(128)] = 1
    bsmm = BlocksparseMatMul(lay, block_size=32, feature_axis=0, impl="pallas")
    Wb = jnp.asarray(rng.uniform(-0.1, 0.1, bsmm.w_shape), DT)
    sflops = 2 * bsmm.blocks * 32 * 32 * N
    dt = bench_loop(lambda x: bsmm(x, Wb).astype(DT), x_cn)
    print(f"bsmm d={d:4.2f} grouped:         {dt*1e3:7.3f} ms {sflops/dt/1e12:6.1f} TF/s effective")
