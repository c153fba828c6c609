"""Microbenchmarks for bsmm inner-loop strategies on TPU."""
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

C, N, b, G = 4096, 512, 32, 4
CB = C // b
CH = 22          # chunks per group per row-ish
R = 8            # out rows per group
GROUPS = 16
DT = jnp.bfloat16

rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(C, N), DT)
x3 = x.reshape(CB, b, N)
w_panels = jnp.asarray(rng.rand(GROUPS, CH * G * b, b), DT)
idx = jnp.asarray(rng.randint(0, CB, (GROUPS, CH, G)).astype(np.int32))
start = jnp.asarray((rng.randint(0, CB // G, (GROUPS, CH)) * G).astype(np.int32))
rows = jnp.asarray(rng.randint(0, R, (GROUPS, CH)).astype(np.int32))


def timeit(f, *args, reps=30):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def report(name, dt, flops):
    print(f"{name:40s} {dt*1e6:9.1f} us   {flops/dt/1e12:7.2f} TFLOP/s")


# 0) dense roofline
f_dense = jax.jit(lambda a, bb: jnp.dot(a.T, bb, preferred_element_type=jnp.float32))
wd = jnp.asarray(rng.rand(C, C), DT)
dt = timeit(f_dense, wd, x)
report("dense 4096x4096x512 bf16 (XLA)", dt, 2 * C * C * N)

FLOPS_K = 2 * GROUPS * CH * G * b * b * N  # nominal kernel flops


def run_kernel(kernel, scalars, inputs, out_shape, grid, in_specs, out_specs):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars), grid=grid,
        in_specs=in_specs, out_specs=out_specs)
    fn = pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape)
    return jax.jit(lambda *a: fn(*a))(*scalars, *inputs)


# 1) concat of G dynamic sublane slices + dot
def k_concat(rows_ref, idx_ref, x_ref, w_ref, out_ref):
    g = pl.program_id(1)
    out_ref[...] = jnp.zeros_like(out_ref)
    Gb = G * b
    for j in range(CH):
        xcat = jnp.concatenate(
            [x_ref[pl.ds(idx_ref[g, j, i] * b, b), :] for i in range(G)], axis=0)
        wch = w_ref[0, j * Gb:(j + 1) * Gb, :]
        acc = jax.lax.dot_general(wch, xcat, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[pl.ds(rows_ref[g, j] * b, b), :] += acc


# 2) single contiguous 128-row slice + dot (supertile)
def k_contig(rows_ref, start_ref, x_ref, w_ref, out_ref):
    g = pl.program_id(1)
    out_ref[...] = jnp.zeros_like(out_ref)
    Gb = G * b
    for j in range(CH):
        xs = x_ref[pl.ds(start_ref[g, j] * b, Gb), :]
        wch = w_ref[0, j * Gb:(j + 1) * Gb, :]
        acc = jax.lax.dot_general(wch, xs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[pl.ds(rows_ref[g, j] * b, b), :] += acc


# 3) per-slot small dots, no concat
def k_slots(rows_ref, idx_ref, x_ref, w_ref, out_ref):
    g = pl.program_id(1)
    out_ref[...] = jnp.zeros_like(out_ref)
    Gb = G * b
    for j in range(CH):
        acc = None
        for i in range(G):
            xi = x_ref[pl.ds(idx_ref[g, j, i] * b, b), :]
            wi = w_ref[0, j * Gb + i * b:j * Gb + (i + 1) * b, :]
            d = jax.lax.dot_general(wi, xi, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[pl.ds(rows_ref[g, j] * b, b), :] += acc


# 4) concat from leading-index 3D x
def k_lead(rows_ref, idx_ref, x_ref, w_ref, out_ref):
    g = pl.program_id(1)
    out_ref[...] = jnp.zeros_like(out_ref)
    Gb = G * b
    for j in range(CH):
        xcat = jnp.concatenate(
            [x_ref[idx_ref[g, j, i]] for i in range(G)], axis=0)
        wch = w_ref[0, j * Gb:(j + 1) * Gb, :]
        acc = jax.lax.dot_general(wch, xcat, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[pl.ds(rows_ref[g, j] * b, b), :] += acc


# 5) contiguous supertile 128x128 dense dot (output also 128-wide supertile)
def k_super128(startc_ref, x_ref, w_ref, out_ref):
    g = pl.program_id(1)
    out_ref[...] = jnp.zeros_like(out_ref)
    for j in range(CH):
        xs = x_ref[pl.ds(startc_ref[g, j] * b, 128), :]
        wch = w_ref[0, j * 128:(j + 1) * 128, :]
        out_ref[...] += jax.lax.dot_general(
            wch, xs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


out_shape = jax.ShapeDtypeStruct((GROUPS * R * b, N), jnp.float32)
x_spec = pl.BlockSpec((C, N), lambda n, g, *s: (0, n), memory_space=pltpu.VMEM)
x3_spec = pl.BlockSpec((CB, b, N), lambda n, g, *s: (0, 0, n), memory_space=pltpu.VMEM)
w_spec = pl.BlockSpec((1, CH * G * b, b), lambda n, g, *s: (g, 0, 0),
                      memory_space=pltpu.VMEM)
out_spec = pl.BlockSpec((R * b, N), lambda n, g, *s: (g, n),
                        memory_space=pltpu.VMEM)
grid = (1, GROUPS)

for name, kern, scalars, xs, xspec in [
    ("1 concat-4-dyn-slices", k_concat, (rows, idx), x, x_spec),
    ("2 contiguous-128-slice", k_contig, (rows, start), x, x_spec),
    ("3 per-slot-dots", k_slots, (rows, idx), x, x_spec),
    ("4 concat-leading-idx", k_lead, (rows, idx), x3, x3_spec),
]:
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars), grid=grid,
        in_specs=[xspec, w_spec], out_specs=out_spec)
    fn = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape)
    f = jax.jit(lambda *a, fn=fn: fn(*a))
    try:
        dt = timeit(f, *scalars, x if xspec is x_spec else x3, w_panels)
        report(name, dt, FLOPS_K)
    except Exception as e:
        print(name, "FAILED:", str(e)[:200])

# supertile-128 output variant
w128 = jnp.asarray(rng.rand(GROUPS, CH * 128, 128), DT)
w128_spec = pl.BlockSpec((1, CH * 128, 128), lambda n, g, *s: (g, 0, 0),
                         memory_space=pltpu.VMEM)
out128_spec = pl.BlockSpec((128, N), lambda n, g, *s: (g, n),
                           memory_space=pltpu.VMEM)
out128_shape = jax.ShapeDtypeStruct((GROUPS * 128, N), jnp.float32)
startc = jnp.asarray((rng.randint(0, CB // 4, (GROUPS, CH)) * 4).astype(np.int32))
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=grid,
    in_specs=[x_spec, w128_spec], out_specs=out128_spec)
fn = pl.pallas_call(k_super128, grid_spec=grid_spec, out_shape=out128_shape)
f = jax.jit(lambda *a: fn(*a))
dt = timeit(f, startc, x, w128)
report("5 supertile-128x128 dense dots", dt, 2 * GROUPS * CH * 128 * 128 * N)
