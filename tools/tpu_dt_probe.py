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
    if variant == "nodot":
        acc_ref[...] += xcat[:128, :].astype(jnp.float32)
        return
    dot = jax.lax.dot_general(
        w_ref[0], xcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    if variant == "noacc":
        acc_ref[...] = dot
    elif variant == "alt":
        # alternate destination halves: breaks any same-buffer
        # write-after-write dependency between consecutive dots
        M = w_ref.shape[1]
        half = jax.lax.rem(s, 2) * M
        acc_ref[pl.ds(half, M), :] = dot
    else:
        acc_ref[...] += dot

    @pl.when(last_ref[s] == 1)
    def _():
        M = out_ref.shape[0]
        out_ref[...] = acc_ref[pl.ds(0, M), :].astype(out_ref.dtype)


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


def w2d_kernel(grp_ref, last_ref, slot_ref, *refs):
    G = len(refs) - 3
    xs = refs[:G]
    w_ref, out_ref, acc_ref = refs[G], refs[G + 1], refs[G + 2]
    s = pl.program_id(1)
    prev = grp_ref[jnp.maximum(s - 1, 0)]

    @pl.when(jnp.logical_or(s == 0, grp_ref[s] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xcat = jnp.concatenate([x[...] for x in xs], axis=0)
    acc_ref[...] += jax.lax.dot_general(
        w_ref[...], xcat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    @pl.when(last_ref[s] == 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def run_w2d(x, w_panels, sched, bsize):
    """Weight blocks delivered as 2-D (M, Gb) BlockSpec slices of an
    (S*M, Gb) array — no leading singleton dim."""
    C, N = x.shape
    TN = N
    R, G = sched.R, sched.G
    S = sched.num_chunks
    M = R * bsize
    w2 = w_panels.reshape(S * M, G * bsize)
    in_specs = [pl.BlockSpec((bsize, TN),
                             (lambda n, s, gr, la, sl, i=i: (sl[s * G + i], n)),
                             memory_space=pltpu.VMEM) for i in range(G)]
    in_specs.append(pl.BlockSpec((M, G * bsize),
                                 lambda n, s, gr, la, sl: (s, 0),
                                 memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((M, TN), lambda n, s, gr, la, sl: (gr[s], n),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N // TN, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
    )
    fn = pl.pallas_call(
        w2d_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sched.groups * M, N), x.dtype),
    )
    return fn(jnp.asarray(sched.grp), jnp.asarray(sched.last),
              jnp.asarray(sched.slot.reshape(-1)), *([x] * G), w2)


def run_densectl(x, bsize, G):
    """Dense control: same kernel structure, contraction slices of a
    dense matmul (no gather, every chunk real).  Measures the Pallas
    chunked-matmul ceiling vs the XLA dense matmul."""
    C, N = x.shape
    TN = N
    M = 128
    Gb = G * bsize
    CH = C // Gb
    tiles = C // M
    S = tiles * CH
    grp = np.repeat(np.arange(tiles, dtype=np.int32), CH)
    last = np.zeros(S, np.int32)
    last[CH - 1::CH] = 1
    slot = np.zeros((S, G), np.int32)
    for t in range(tiles):
        for j in range(CH):
            slot[t * CH + j] = (j * G + np.arange(G))
    rng = np.random.RandomState(5)
    w2 = jnp.asarray(rng.uniform(-0.1, 0.1, (S * M, Gb)), x.dtype)
    in_specs = [pl.BlockSpec((bsize, TN),
                             (lambda n, s, gr, la, sl, i=i: (sl[s * G + i], n)),
                             memory_space=pltpu.VMEM) for i in range(G)]
    in_specs.append(pl.BlockSpec((M, Gb), lambda n, s, gr, la, sl: (s, 0),
                                 memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((M, TN), lambda n, s, gr, la, sl: (gr[s], n),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N // TN, S),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((M, TN), jnp.float32)],
    )
    fn = pl.pallas_call(
        w2d_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles * M, N), x.dtype),
    )
    return fn(jnp.asarray(grp), jnp.asarray(last),
              jnp.asarray(slot.reshape(-1)), *([x] * G), w2), S


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
        scratch_shapes=[pltpu.VMEM((2 * M if variant == "alt" else M, TN),
                                   jnp.float32),
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
    for variant in ("full",):
        dt = bench_loop(
            lambda x, v=variant: run_variant(x, panels, sched, bsize, v), x0)
        print(f"{variant:9s} {dt*1e3:7.3f} ms  ({real_flops/dt/1e12:5.1f} eff TF)")
    dt = bench_loop(lambda x: run_w2d(x, panels, sched, bsize), x0)
    print(f"w2d       {dt*1e3:7.3f} ms  ({real_flops/dt/1e12:5.1f} eff TF)")
    dt = bench_loop(lambda x: run_densectl(x, bsize, sched.G)[0], x0)
    Sd = run_densectl(x0, bsize, sched.G)[1]
    dense_flops = 2 * hidden * hidden * N
    print(f"densectl  {dt*1e3:7.3f} ms  ({dense_flops/dt/1e12:5.1f} TF, "
          f"S={Sd}, xla_dense={dt_dense*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
