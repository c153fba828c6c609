"""Does a fori_loop chain body serialize Pallas pipeline overlap?

The anchor-validated slope protocol chains `c` applications per scan
iteration.  If the chain is a fori_loop, each application is a separate
loop iteration and XLA may insert a loop boundary that drains the
Pallas DMA pipeline between applications; an unrolled (traced Python
loop) chain lets consecutive pallas_calls overlap prologue/epilogue.
The last r3 capture saw sparse per-app time ~2x the earlier unrolled
captures with valid anchors — this probe times the SAME sparse workload
both ways, interleaved, to settle it.

Usage: python tools/tpu_chain_style_probe.py
"""
import os
import sys
import time
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_layout, _fresh_pool


def chain_timer_style(one_step, x0, chain, iters, reps, style):
    @jax.jit
    def run(x):
        def body(x, _):
            if style == "fori":
                x = jax.lax.fori_loop(0, chain, lambda i, v: one_step(v), x)
            else:
                for _ in range(chain):
                    x = one_step(x)
            return x, None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        flat = y.reshape(-1)
        rep_n = max(1, int(128 * 1024 * 1024 // max(flat.nbytes, 1)))
        return jnp.tile(flat, rep_n) if rep_n > 1 else y

    jax.block_until_ready(run(x0))
    pool = _fresh_pool(x0, reps, seed=chain + (1000 if style == "fori" else 0))

    def rep():
        x = pool.pop()
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        return (time.perf_counter() - t0) / iters
    return rep


def main():
    from blocksparse_tpu import BlocksparseMatMul

    hidden, N, bsize, density = 8192, 2048, 32, 0.25
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    lay = make_layout("random", hidden // bsize, density, rng)
    bsmm = BlocksparseMatMul(lay, block_size=bsize, feature_axis=0,
                             impl="pallas", w_layout="fprop_packed")
    Wc = rng.uniform(-0.1, 0.1, (bsmm.blocks, bsize, bsize)).astype(np.float32)
    W = jnp.asarray(bsmm.pack_weights(Wc), dtype)
    x0 = jnp.asarray(rng.uniform(-1, 1, bsmm.i_shape(N)), dtype)

    def sparse_step(x):
        return bsmm(x, W).astype(dtype)

    Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (hidden, hidden)), dtype)

    def dense_step(x):
        return jax.lax.dot_general(
            Wd, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    chains, iters, reps = (2, 8), 8, 4
    jobs = {}
    for style in ("fori", "unroll"):
        for name, step in (("sparse", sparse_step), ("dense", dense_step)):
            jobs[(style, name)] = [
                chain_timer_style(step, x0, c, iters, reps, style)
                for c in chains]

    best = {k: [float("inf")] * len(chains) for k in jobs}
    for _ in range(reps):
        for k, timers in jobs.items():
            for j, t in enumerate(timers):
                best[k][j] = min(best[k][j], t())

    out = {}
    c1, c2 = chains
    for (style, name), b in best.items():
        slope_ms = (b[1] - b[0]) / (c2 - c1) * 1e3
        out[f"{style}_{name}_ms"] = round(slope_ms, 4)
        out[f"{style}_{name}_raw_ms"] = [round(v * 1e3, 3) for v in b]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
