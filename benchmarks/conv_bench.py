#!/usr/bin/env python
"""BlocksparseConv benchmark on TPU (VERDICT r3 #4).

Shapes follow the reference's conv regime (32x32 channel blocks, 3x3
filters — src/blocksparse_conv_op.cc kernels are 32x32x{16,32};
src/sass/xconv_blocksparse_32x32x16_fprop.sass is the capability this
bench prices): 512-2048 channels at several block densities, NCHW
32^2-64^2 images.  Measures the two fixed-block lowerings (vmapped XLA
convs vs tap-chunked gathered matmul) against a dense lax.conv control,
fwd and fwd+bwd, with anchor-validated slope timing (see bench.py).

Roofline accounting (the round-3 harness divided by the measured dense
time, which reports >1 whenever XLA's dense conv is itself off peak):
* eff_tflops        = sparse FLOPs / time (the sparse op's real rate)
* flops_roofline_fraction = eff_tflops / chip peak — the honest
  fraction of machine roofline; never exceeds 1.
* speedup_vs_dense and speedup_vs_density_scaled_dense remain the
  relative columns (the latter CAN exceed 1 when dense conv is
  inefficient — it is labeled as a speedup, not a fraction).

Writes benchmarks/results_conv.json; the better lowering becomes the
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


def dev_uniform(seed, shape, lo, hi, dtype):
    """Random operand generated ON DEVICE — the bench tunnel rejects
    big host transfers (canonical_bench hit this first) and timing is
    data-independent."""
    return jax.jit(lambda k: jax.random.uniform(
        k, shape, jnp.float32, lo, hi).astype(dtype))(
            jax.random.PRNGKey(seed))


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
    p.add_argument("--channels", type=str,
                   default="512,1024,2048" if on_tpu else "64")
    p.add_argument("--bsize", type=int, default=32 if on_tpu else 16)
    p.add_argument("--hw", type=int, default=32 if on_tpu else 8)
    p.add_argument("--batch", type=int, default=32 if on_tpu else 2)
    p.add_argument("--densities", type=str,
                   default="0.25,0.0625" if on_tpu else "0.5")
    p.add_argument("--impls", type=str,
                   default="conv,matmul,bsmm" if on_tpu else "conv,matmul")
    p.add_argument("--out", type=str, default=result_path("conv"))
    args = p.parse_args()

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # v5e chip peak (bench.py's dense matmul control measures 194 TF/s
    # bf16 = 98% of 197); f32 runs the MXU at ~1/4 rate
    PEAK_TF = 197.0 if dtype == jnp.bfloat16 else 49.0
    b, HW, N = args.bsize, args.hw, args.batch
    rng = np.random.RandomState(0)
    results = {"backend": jax.default_backend(), "bsize": b, "hw": HW,
               "batch": N, "dtype": str(dtype),
               "peak_tflops_assumed": PEAK_TF, "rows": []}

    def flush():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    for CK in [int(c) for c in args.channels.split(",")]:
        nb = CK // b
        # dense conv control at the same channel count
        Wd = dev_uniform(CK, (CK, CK, 3, 3), -0.1, 0.1, dtype)
        xd = dev_uniform(CK + 1, (N, CK, HW, HW), -1.0, 1.0, dtype)
        dn = jax.lax.conv_dimension_numbers(
            (N, CK, HW, HW), (CK, CK, 3, 3), ("NCHW", "OIHW", "NCHW"))

        def dense_step(x, w):
            return (jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(dtype)
                * (1.0 / CK))

        (dt_dense,), anch_d = bench_slope(
            [(dense_step, xd, Wd)], chains=(1, 3), iters=6,
            with_anchor=True, retries=3 if on_tpu else 0)
        dense_flops = 2 * CK * CK * 9 * HW * HW * N
        dense_tf = dense_flops / dt_dense / 1e12
        results.setdefault("dense", []).append({
            "channels": CK, "dense_ms": round(dt_dense * 1e3, 3),
            "dense_tflops": round(dense_tf, 2),
            "dense_roofline_fraction": round(dense_tf / PEAK_TF, 4),
            "anchor_ms": anch_d["anchor_ms"],
            "timing_valid": anch_d["timing_valid"]})
        print(f"dense conv {CK}x{CK}x3x3 @{HW}^2 b{N}: "
              f"{dt_dense*1e3:.3f} ms ({dense_tf:.2f} TF/s = "
              f"{dense_tf/PEAK_TF:.3f} of peak)")
        flush()

        for density in [float(d) for d in args.densities.split(",")]:
            BCK = make_bck(nb, nb, b, b, density, rng)
            for impl in args.impls.split(","):
                try:
                    bsc = BlocksparseConv(BCK, (3, 3), (HW, HW),
                                          padding="SAME", impl=impl)
                    F = dev_uniform(2 * CK, (bsc.blocks, b, b, 3, 3),
                                    -0.1, 0.1, dtype)
                    x0 = dev_uniform(2 * CK + 1, bsc.i_shape(N),
                                     -1.0, 1.0, dtype)

                    def fwd(x, F, bsc=bsc):
                        return (bsc(F, x).astype(dtype) * (1.0 / CK))

                    def fwdbwd(x, F, bsc=bsc):
                        def f(xx):
                            return jnp.sum(jnp.square(
                                bsc(F, xx).astype(jnp.float32)))
                        return (x * 0.999
                                + 1e-6 * jax.grad(f)(x)).astype(dtype)

                    (dt_f, dt_fb), anch = bench_slope(
                        [(fwd, x0, F), (fwdbwd, x0, F)],
                        chains=(1, 3), iters=6, with_anchor=True,
                        retries=3 if on_tpu else 0)
                except Exception as e:
                    results["rows"].append(
                        {"channels": CK, "density": density,
                         "impl": impl,
                         "error": str(e).replace("\n", " ")[:300]})
                    flush()
                    print(f"C{CK} d={density} {impl}: FAILED "
                          f"{str(e)[:100]}")
                    continue
                d_eff = bsc.blocks / (nb * nb)
                fl = bsc.flops * N
                eff = fl / dt_f / 1e12
                row = {"channels": CK, "density": round(d_eff, 4),
                       "impl": impl, "blocks": bsc.blocks,
                       "fwd_ms": round(dt_f * 1e3, 3),
                       "fwdbwd_ms": round(dt_fb * 1e3, 3),
                       "eff_tflops": round(eff, 2),
                       "flops_roofline_fraction": round(eff / PEAK_TF,
                                                        4),
                       "speedup_vs_dense": round(dt_dense / dt_f, 2),
                       "speedup_vs_density_scaled_dense": round(
                           (d_eff * dt_dense) / dt_f, 4),
                       "anchor_ms": anch["anchor_ms"],
                       "timing_valid": anch["timing_valid"]}
                results["rows"].append(row)
                flush()
                print(f"C{CK} d={d_eff:.3f} impl={impl:6s} fwd "
                      f"{dt_f*1e3:8.3f} ms ({eff:6.2f} TF/s = "
                      f"{eff/PEAK_TF:.3f} of peak) fwd+bwd "
                      f"{dt_fb*1e3:8.3f} ms")

    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
