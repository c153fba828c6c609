#!/usr/bin/env python
"""BlocksparseConv benchmark (VERDICT r2 #6: "no conv benchmark exists
anywhere in-repo").

Shapes follow the reference's conv regime (32x32 channel blocks, 3x3
filters — src/blocksparse_conv_op.cc kernels are 32x32x{16,32}):
C=K=1024 channels at several block densities, NCHW 32x32 images.
Measures the two fixed-block lowerings (vmapped XLA convs vs
tap-chunked gathered matmul) against a dense conv roofline, fwd and
fwd+bwd, with slope-based chained timing (see bench.py).  Writes
benchmarks/results_conv.json; the better lowering becomes the
documented default for TPU.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from blocksparse_tpu.ops.conv import BlocksparseConv
from bench import bench_slope, result_path


def make_bck(nb_c, nb_k, bC, bK, density, rng):
    """Random block-sparse channel connectivity, diagonal guaranteed."""
    BCK = []
    for kb in range(nb_k):
        for cb in range(nb_c):
            if cb == kb % nb_c or rng.rand() < density:
                BCK.append((tuple(range(cb * bC, (cb + 1) * bC)),
                            tuple(range(kb * bK, (kb + 1) * bK))))
    return BCK


def main():
    on_tpu = jax.default_backend() == "tpu"
    p = argparse.ArgumentParser()
    p.add_argument("--channels", type=int, default=1024 if on_tpu else 64)
    p.add_argument("--bsize", type=int, default=32 if on_tpu else 16)
    p.add_argument("--hw", type=int, default=32 if on_tpu else 8)
    p.add_argument("--batch", type=int, default=32 if on_tpu else 2)
    p.add_argument("--densities", type=str,
                   default="0.25,0.0625" if on_tpu else "0.5")
    p.add_argument("--out", type=str, default=result_path("conv"))
    args = p.parse_args()

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    CK, b, HW, N = args.channels, args.bsize, args.hw, args.batch
    nb = CK // b
    rng = np.random.RandomState(0)
    results = {"backend": jax.default_backend(), "channels": CK,
               "bsize": b, "hw": HW, "batch": N, "rows": []}

    # dense conv roofline at the same channel count
    Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (CK, CK, 3, 3)), dtype)
    xd = jnp.asarray(rng.uniform(-1, 1, (N, CK, HW, HW)), dtype)
    dn = jax.lax.conv_dimension_numbers((N, CK, HW, HW), (CK, CK, 3, 3),
                                        ("NCHW", "OIHW", "NCHW"))

    def dense_step(x):
        return jax.lax.conv_general_dilated(
            x, Wd, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(dtype)

    (dt_dense,) = bench_slope([(dense_step, xd)], chains=(1, 3), iters=6)
    dense_flops = 2 * CK * CK * 9 * HW * HW * N
    results["dense_ms"] = round(dt_dense * 1e3, 3)
    results["dense_tflops"] = round(dense_flops / dt_dense / 1e12, 2)
    print(f"dense conv {CK}x{CK}x3x3 @{HW}^2 b{N}: {dt_dense*1e3:.3f} ms "
          f"({results['dense_tflops']} TF/s)")

    for density in [float(d) for d in args.densities.split(",")]:
        BCK = make_bck(nb, nb, b, b, density, rng)
        for impl in ("conv", "matmul"):
            bsc = BlocksparseConv(BCK, (3, 3), (HW, HW), padding="SAME",
                                  impl=impl)
            F = jnp.asarray(rng.uniform(
                -0.1, 0.1, (bsc.blocks, b, b, 3, 3)), dtype)
            x0 = jnp.asarray(rng.uniform(-1, 1, bsc.i_shape(N)), dtype)

            def fwd(x, bsc=bsc, F=F):
                return bsc(F, x).astype(dtype)

            def fwdbwd(x, bsc=bsc, F=F):
                def f(x):
                    return jnp.sum(jnp.square(
                        bsc(F, x).astype(jnp.float32)))
                return jax.grad(f)(x).astype(dtype)

            dt_f, dt_fb = bench_slope([(fwd, x0), (fwdbwd, x0)],
                                      chains=(1, 3), iters=6)
            d_eff = bsc.blocks / (nb * nb)
            fl = bsc.flops * N
            row = {"density": round(d_eff, 4), "impl": impl,
                   "blocks": bsc.blocks,
                   "fwd_ms": round(dt_f * 1e3, 3),
                   "fwdbwd_ms": round(dt_fb * 1e3, 3),
                   "fwd_speedup_vs_dense": round(dt_dense / dt_f, 2),
                   "eff_tflops": round(fl / dt_f / 1e12, 2),
                   "flops_fraction_of_dense_roofline": round(
                       (d_eff * dt_dense) / dt_f, 4)}
            results["rows"].append(row)
            print(f"d={d_eff:.3f} impl={impl:6s} fwd {dt_f*1e3:8.3f} ms "
                  f"({row['eff_tflops']:6.2f} TF/s, "
                  f"{row['flops_fraction_of_dense_roofline']:.3f} of "
                  f"density-scaled) fwd+bwd {dt_fb*1e3:8.3f} ms")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
