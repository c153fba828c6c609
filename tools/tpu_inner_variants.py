"""Honest comparison of bsmm inner-loop strategies (chained scan timing,
dense baseline in-process for chip normalization)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blocksparse_tpu.profiling import bench_op
from blocksparse_tpu import BlocksparseMatMul

rng = np.random.RandomState(0)
lay = (rng.rand(128, 128) < 0.25).astype(np.int32)
lay[np.arange(128), np.arange(128)] = 1
b = BlocksparseMatMul(lay, block_size=32, feature_axis=0,
                      w_layout="fprop_packed")
sched = b.fprop_grouped
G, R, CH, groups = sched.G, sched.R, sched.CH, sched.groups
bs = 32
N = 512
C = 4096
Wc = rng.uniform(-0.1, 0.1, (b.blocks, bs, bs)).astype(np.float32)
Wp = jnp.asarray(b.pack_weights(Wc), jnp.bfloat16)
panels = jnp.asarray(
    np.asarray(Wp, np.float32).reshape(groups, CH * G * bs, bs),
    jnp.bfloat16)
x0 = jnp.asarray(rng.uniform(-1, 1, (C, N)), jnp.bfloat16)
x3 = x0.reshape(C // bs, bs, N)
rows = jnp.asarray(sched.rows)
idxf = jnp.asarray(sched.in_idx.reshape(groups, -1))
FL = 2 * b.blocks * bs * bs * N

# dense normalizer
Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (C, C)), jnp.bfloat16)
dtd = bench_op(lambda x: jax.lax.dot_general(
    Wd, x, (((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32).astype(jnp.bfloat16), x0, iters=30)
print(f"dense: {dtd*1e3:.3f} ms ({2*C*C*N/dtd/1e12:.1f} TF/s)")


def make(kernel, x_arr, x_spec):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, groups),
        in_specs=[x_spec,
                  pl.BlockSpec((1, CH * G * bs, bs),
                               lambda n, g, rr, ii: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R * bs, N), lambda n, g, rr, ii: (g, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R * bs, N), jnp.float32)],
    )
    fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups * R * bs, N), jnp.bfloat16))

    def step(x):
        y = fn(rows, idxf, x if x_spec_is2d else x.reshape(C // bs, bs, N),
               panels)
        return y[:C].reshape(x0.shape).astype(jnp.bfloat16)
    return step


def variant(name, kernel, use3d=False):
    global x_spec_is2d
    x_spec_is2d = not use3d
    if use3d:
        spec = pl.BlockSpec((C // bs, bs, N), lambda n, g, rr, ii: (0, 0, n),
                            memory_space=pltpu.VMEM)
    else:
        spec = pl.BlockSpec((C, N), lambda n, g, rr, ii: (0, n),
                            memory_space=pltpu.VMEM)
    step = make(kernel, x0, spec)
    try:
        dt = bench_op(step, x0, iters=30)
        print(f"{name}: {dt*1e3:.3f} ms  eff {FL/dt/1e12:.2f} TF/s "
              f"({dtd/dt*0.25*100:.0f}% of d-scaled dense)")
    except Exception as e:
        print(name, "FAIL", str(e)[-200:])


def k_current(rr, ii, x_ref, w_ref, out_ref, acc):
    g = pl.program_id(1)
    Gb = G * bs
    acc[...] = jnp.zeros_like(acc)

    def chunk(j):
        xcat = jnp.concatenate(
            [x_ref[pl.ds(ii[g, j * G + i] * bs, bs), :] for i in range(G)],
            axis=0)
        wch = w_ref[0, pl.ds(j * Gb, Gb), :]
        a = jax.lax.dot_general(wch, xcat, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc[pl.ds(rr[g, j] * bs, bs), :] += a

    jax.lax.fori_loop(0, CH, lambda j, c: (chunk(j), c)[1], 0)
    out_ref[...] = acc[...].astype(out_ref.dtype)


def k_slots(rr, ii, x_ref, w_ref, out_ref, acc):
    g = pl.program_id(1)
    Gb = G * bs
    acc[...] = jnp.zeros_like(acc)

    def chunk(j):
        a = None
        for i in range(G):
            xi = x_ref[pl.ds(ii[g, j * G + i] * bs, bs), :]
            wi = w_ref[0, pl.ds(j * Gb + i * bs, bs), :]
            d = jax.lax.dot_general(wi, xi, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            a = d if a is None else a + d
        acc[pl.ds(rr[g, j] * bs, bs), :] += a

    jax.lax.fori_loop(0, CH, lambda j, c: (chunk(j), c)[1], 0)
    out_ref[...] = acc[...].astype(out_ref.dtype)


def k_lead3d(rr, ii, x_ref, w_ref, out_ref, acc):
    g = pl.program_id(1)
    Gb = G * bs
    acc[...] = jnp.zeros_like(acc)

    def chunk(j):
        xcat = jnp.concatenate(
            [x_ref[ii[g, j * G + i]] for i in range(G)], axis=0)
        wch = w_ref[0, pl.ds(j * Gb, Gb), :]
        a = jax.lax.dot_general(wch, xcat, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc[pl.ds(rr[g, j] * bs, bs), :] += a

    jax.lax.fori_loop(0, CH, lambda j, c: (chunk(j), c)[1], 0)
    out_ref[...] = acc[...].astype(out_ref.dtype)


variant("current (2d concat)", k_current)
variant("per-slot dots", k_slots)
variant("3d leading-index concat", k_lead3d, use3d=True)

# reference comparison: the production path
dt = bench_op(lambda x: b(x, Wp).astype(jnp.bfloat16), x0, iters=30)
print(f"production op: {dt*1e3:.3f} ms eff {FL/dt/1e12:.2f} TF/s")
