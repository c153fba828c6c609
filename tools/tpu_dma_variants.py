#!/usr/bin/env python
"""Probe Mosaic DMA-gather legality for the stream attention kernels.

Round-4: the stream-mode kernels (kernels/bst_attn.py) fail to compile
on the current toolchain: `make_async_copy` from a (BH, ctx, hs) HBM
ref with hs=64 is rejected — "Slice shape along dimension 2 must be
aligned to tiling (128)" (the lane dim is padded 64->128 in HBM and a
64-lane slice of the padded row is illegal).

Variants probed, each copying E gathered (bs, hs) key blocks per grid
step and checking bit parity against a NumPy gather:
  A. current: 3D (BH, ctx, hs) src, slice [bh, ds(kb*bs, bs), :]
  B. folded:  (BH, ctx*hs//128, 128) src, slice [bh, ds(kb*rows, rows), :]
     where rows = bs*hs//128 — every copy is whole-lane aligned; the
     kernel reshapes the loaded (E*rows, 128) value back to (E*bs, hs)
  C. hs=128 control through the 3D path (no fold needed)
  D. 4D (BH, nblk, bs, hs) src, slice [bh, kb] (whole trailing dims)
"""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, CTX, BS, E, S = 2, 2048, 64, 4, 8


def idx_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def out_map(bh, s):
    return (bh, s, 0, 0)


def run(name, build):
    try:
        out, want = build()
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        print(f"{name}: {'PASS' if err == 0 else 'MISMATCH'} err={err}",
              flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:220]
        print(f"{name}: FAIL {msg}", flush=True)


def gather_ref(K, idx, hs):
    want = np.zeros((BH, S, E * BS, hs), np.float32)
    Kn = np.asarray(K, np.float32)
    for bh in range(BH):
        for s in range(S):
            for i in range(E):
                kb = idx[s, i]
                want[bh, s, i * BS:(i + 1) * BS] = Kn[bh, kb * BS:(kb + 1) * BS]
    return want


def variant_3d(hs):
    rng = np.random.RandomState(0)
    K = jnp.asarray(rng.randn(BH, CTX, hs), jnp.bfloat16)
    nblk = CTX // BS
    idx = rng.randint(0, nblk, (S, E)).astype(np.int32)

    def kern(idx_ref, k_ref, out_ref, buf, sem):
        s = pl.program_id(1)
        bh = pl.program_id(0)
        for i in range(E):
            kb = idx_ref[s, i]
            pltpu.make_async_copy(
                k_ref.at[bh, pl.ds(kb * BS, BS), :],
                buf.at[pl.ds(i * BS, BS), :], sem.at[i]).start()
        for i in range(E):
            pltpu.make_async_copy(
                k_ref.at[bh, pl.ds(idx_ref[s, i] * BS, BS), :],
                buf.at[pl.ds(i * BS, BS), :], sem.at[i]).wait()
        out_ref[0, 0] = buf[...]

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(BH, S),
            in_specs=[idx_spec(), pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1, E * BS, hs), out_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((E * BS, hs), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((E,))],
        ),
        out_shape=jax.ShapeDtypeStruct((BH, S, E * BS, hs), jnp.bfloat16),
    )(jnp.asarray(idx), K)
    return out, gather_ref(K, idx, hs)


def variant_folded(hs):
    rng = np.random.RandomState(0)
    K = jnp.asarray(rng.randn(BH, CTX, hs), jnp.bfloat16)
    F = 128 // hs
    rows = BS * hs // 128
    Kf = K.reshape(BH, CTX * hs // 128, 128)
    nblk = CTX // BS
    idx = rng.randint(0, nblk, (S, E)).astype(np.int32)

    def kern(idx_ref, kf_ref, out_ref, buf, sem):
        s = pl.program_id(1)
        bh = pl.program_id(0)
        for i in range(E):
            kb = idx_ref[s, i]
            pltpu.make_async_copy(
                kf_ref.at[bh, pl.ds(kb * rows, rows), :],
                buf.at[pl.ds(i * rows, rows), :], sem.at[i]).start()
        for i in range(E):
            pltpu.make_async_copy(
                kf_ref.at[bh, pl.ds(idx_ref[s, i] * rows, rows), :],
                buf.at[pl.ds(i * rows, rows), :], sem.at[i]).wait()
        out_ref[0, 0] = jnp.reshape(buf[...], (E * BS, hs))

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(BH, S),
            in_specs=[idx_spec(), pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1, E * BS, hs), out_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((E * rows, 128), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((E,))],
        ),
        out_shape=jax.ShapeDtypeStruct((BH, S, E * BS, hs), jnp.bfloat16),
    )(jnp.asarray(idx), Kf)
    return out, gather_ref(K, idx, hs)


def variant_4d(hs):
    rng = np.random.RandomState(0)
    K = jnp.asarray(rng.randn(BH, CTX, hs), jnp.bfloat16)
    nblk = CTX // BS
    K4 = K.reshape(BH, nblk, BS, hs)
    idx = rng.randint(0, nblk, (S, E)).astype(np.int32)

    def kern(idx_ref, k4_ref, out_ref, buf, sem):
        s = pl.program_id(1)
        bh = pl.program_id(0)
        for i in range(E):
            kb = idx_ref[s, i]
            pltpu.make_async_copy(
                k4_ref.at[bh, kb], buf.at[i], sem.at[i]).start()
        for i in range(E):
            pltpu.make_async_copy(
                k4_ref.at[bh, idx_ref[s, i]], buf.at[i], sem.at[i]).wait()
        out_ref[0, 0] = jnp.reshape(buf[...], (E * BS, hs))

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(BH, S),
            in_specs=[idx_spec(), pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1, E * BS, hs), out_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((E, BS, hs), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((E,))],
        ),
        out_shape=jax.ShapeDtypeStruct((BH, S, E * BS, hs), jnp.bfloat16),
    )(jnp.asarray(idx), K4)
    return out, gather_ref(K, idx, hs)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    tests = {
        "A_3d_hs64": lambda: variant_3d(64),
        "B_folded_hs64": lambda: variant_folded(64),
        "C_3d_hs128": lambda: variant_3d(128),
        "D_4d_hs64": lambda: variant_4d(64),
    }
    for name, fn in tests.items():
        if which != "all" and which != name:
            continue
        run(name, fn)
