"""Dense-tile kernel overhead probes.

Times doctored variants of the flat dense-tile kernel that skip one
piece of per-chunk work each, to locate the gap between measured time
and the MXU-pass-bound ideal:

  full      — production kernel (gather slots, concat, acc +=, out)
  noconcat  — dot reads a resident VMEM scratch instead of the gathered
              concat (slot DMAs still issued; isolates concat/copy cost)
  nogather  — slot BlockSpecs all point at block 0 (cached revisits:
              isolates the slot-DMA HBM traffic)
  noacc     — acc = dot instead of acc += dot (isolates the f32 RMW)

Results are WRONG numerically — timing only.
"""
import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blocksparse_tpu.kernels import bsmm as K


def bench_loop(one_step, x0, iters=20, reps=3):
    @jax.jit
    def run(x):
        def body(x, _):
            return one_step(x), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y
    y = run(x0)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(x0)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def probe_kernel(G, bsize, variant, grp_ref, last_ref, slot_ref, *refs):
    xs = refs[:G]
    w_ref, out_ref, acc_ref, xbuf = refs[G], refs[G + 1], refs[G + 2], refs[G + 3]
    s = pl.program_id(1)
    prev = grp_ref[jnp.maximum(s - 1, 0)]

    @pl.when(jnp.logical_or(s == 0, grp_ref[s] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if variant == "noconcat":
        xcat = xbuf[...]
    else:
        xcat = jnp.concatenate([x[...] for x in xs], axis=0)
    dot = jax.lax.dot_general(
        w_ref[0], xcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    if variant == "noacc":
        acc_ref[...] = dot
    else:
        acc_ref[...] += dot

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def fatx_kernel(grp_ref, last_ref, slot_ref, x_ref, w_ref, out_ref,
                acc_ref, xbuf):
    s = pl.program_id(1)
    prev = grp_ref[jnp.maximum(s - 1, 0)]

    @pl.when(jnp.logical_or(s == 0, grp_ref[s] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        w_ref[0], x_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def run_variant(x, w_panels, sched, bsize, variant):
    C, N = x.shape
    TN = N
    R, G = sched.R, sched.G
    S = sched.num_chunks
    M = R * bsize

    if variant == "fatx":
        # ONE (Gb, TN) x operand at a schedule-driven (wrong) offset:
        # isolates the cost of 16 slot BlockSpecs + index maps
        in_specs = [
            pl.BlockSpec((G * bsize, TN),
                         lambda n, s, gr, la, sl: (sl[s * G] % (C // (G * bsize)), n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, G * bsize),
                         lambda n, s, gr, la, sl: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec((M, TN), lambda n, s, gr, la, sl: (gr[s], n),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(N // TN, S),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32),
                            pltpu.VMEM((G * bsize, TN), x.dtype)],
        )
        fn = pl.pallas_call(
            fatx_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((sched.groups * M, N), x.dtype),
        )
        return fn(jnp.asarray(sched.grp), jnp.asarray(sched.last),
                  jnp.asarray(sched.slot.reshape(-1)), x, w_panels)

    def x_index(i):
        if variant == "nogather":
            return lambda n, s, gr, la, sl, i=i: (0, n)
        return lambda n, s, gr, la, sl, i=i: (sl[s * G + i], n)

    in_specs = [pl.BlockSpec((bsize, TN), x_index(i),
                             memory_space=pltpu.VMEM) for i in range(G)]
    in_specs.append(pl.BlockSpec((1, M, G * bsize),
                                 lambda n, s, gr, la, sl: (s, 0, 0),
                                 memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((M, TN), lambda n, s, gr, la, sl: (gr[s], n),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N // TN, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32),
                        pltpu.VMEM((G * bsize, TN), x.dtype)],
    )
    fn = pl.pallas_call(
        functools.partial(probe_kernel, G, bsize, variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sched.groups * M, N), x.dtype),
    )
    return fn(jnp.asarray(sched.grp), jnp.asarray(sched.last),
              jnp.asarray(sched.slot.reshape(-1)), *([x] * G), w_panels)


def main():
    hidden, N, bsize, density = 8192, 2048, 32, 0.25
    dtype = jnp.bfloat16
    CB = KB = hidden // bsize
    rng = np.random.RandomState(0)
    layout = (rng.rand(CB, KB) < density).astype(np.int32)
    layout[np.arange(CB), np.arange(CB)] = 1
    cs, ks = np.nonzero(layout)
    blocks = len(cs)
    rows = [[] for _ in range(KB)]
    for w, (c, k) in enumerate(zip(cs.tolist(), ks.tolist())):
        rows[k].append((c, w))
    sched = K.build_dense_tile_schedule(rows, KB, bsize, blocks,
                                        cluster=True)
    w_can = jnp.asarray(rng.uniform(-0.1, 0.1, (blocks, bsize, bsize)),
                        dtype)
    panels = K.dense_tile_panels(w_can, sched, trans_w=False)
    x0 = jnp.asarray(rng.uniform(-1, 1, (hidden, N)), dtype)
    real_flops = 2 * blocks * bsize * bsize * N
    passes = sched.mxu_passes(bsize)
    print(f"G={sched.G} chunks={sched.num_chunks} passes={passes}")

    Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (hidden, hidden)), dtype)
    dt_dense = bench_loop(
        lambda x: jax.lax.dot_general(
            Wd, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype), x0)
    ideal = passes / 4096 * dt_dense
    print(f"dense {dt_dense*1e3:7.3f} ms   pass-bound ideal {ideal*1e3:7.3f} ms")
    for variant in ("full", "fatx"):
        dt = bench_loop(
            lambda x, v=variant: run_variant(x, panels, sched, bsize, v), x0)
        print(f"{variant:9s} {dt*1e3:7.3f} ms  ({real_flops/dt/1e12:5.1f} eff TF)")


if __name__ == "__main__":
    main()
