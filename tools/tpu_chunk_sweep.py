"""Sweep dense-tile chunk geometry (G slots/chunk x TN lane tile) on the
production kernel at the headline bench shape, to find whether deeper
contraction chunks (fewer grid steps) buy more than their VMEM cost.

choose_dense_tile_G considers contraction depths 768/512/256/128 with a
fitted per-step overhead (STEP_OVERHEAD_LANES); set BS_COMBOS (e.g.
"16x2048,32x1024" = GxTN pairs) to measure specific geometries when
re-fitting.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

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


def main():
    H = int(os.environ.get("BS_H", 8192))
    N = int(os.environ.get("BS_N", 2048))
    BS = int(os.environ.get("BS_BS", 32))
    D = float(os.environ.get("BS_D", 0.25))
    DT = jnp.bfloat16
    rng = np.random.RandomState(0)
    nb = H // BS
    lay = (rng.rand(nb, nb) < D).astype(np.int32)
    lay[np.arange(nb), np.arange(nb)] = 1
    blocks = int(lay.sum())
    # entries_per_row for fprop: row = output block k, entries (c, w)
    w_of = {}
    wid = 0
    for c in range(nb):
        for k in range(nb):
            if lay[c, k]:
                w_of[(c, k)] = wid
                wid += 1
    entries = [[(c, w_of[(c, k)]) for c in range(nb) if lay[c, k]]
               for k in range(nb)]

    x = jnp.asarray(rng.uniform(-1, 1, (H, N)), DT)
    Wb = jnp.asarray(rng.uniform(-0.1, 0.1, (blocks, BS, BS)), DT)
    sflops = 2 * blocks * BS * BS * N
    print(f"H={H} N={N} bs={BS} blocks={blocks} "
          f"(density {blocks/nb/nb:.3f})")

    combos = ((16, 2048), (16, 1024), (24, 2048), (32, 1024),
              (8, 2048), (24, 1024))
    if os.environ.get("BS_COMBOS"):
        combos = tuple(tuple(int(v) for v in c.split("x"))
                       for c in os.environ["BS_COMBOS"].split(","))
    for G, TN in combos:
        est_probe = None
        try:
            sched = K.build_dense_tile_schedule(
                entries, nb, BS, blocks, G=G, cluster=True)
            est = K.dense_tile_vmem_estimate(H, TN, 2, sched, BS)
            est_probe = est / 1e6
            if est > 15.5e6:
                print(f"G={G:3d} TN={TN:5d}: skip (vmem est {est/1e6:.1f} MB)")
                continue
            panels = K.dense_tile_panels(Wb, sched, False)

            def step(v, panels=panels, sched=sched, TN=TN):
                y = K.xprop_pallas_dense_tile(v, panels, sched, BS,
                                              tile_n=TN, out_dtype=DT)
                return (v * 0.999 + 1e-6 * y).astype(DT)

            dt = bench_loop(step, x)
            print(f"G={G:3d} TN={TN:5d}: {dt*1e3:7.3f} ms "
                  f"{sflops/dt/1e12:6.2f} TF/s eff  "
                  f"steps={sched.num_chunks} vmem={est/1e6:.1f}MB")
        except Exception as e:
            print(f"G={G:3d} TN={TN:5d}: FAILED "
                  f"(vmem {est_probe}) {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
