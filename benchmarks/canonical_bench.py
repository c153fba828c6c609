#!/usr/bin/env python
"""The reference's canonical bsmm bench envelope, reproduced exactly.

/root/reference/test/blocksparse_matmul_bench.py:36-80 sweeps:
  * (hidden, target sparsity%) = (k*2560, s) for
    (1,100.0) (2,25.62) (3,11.25) (4,6.56) (5,4.25) (6,2.71)
    (7,1.96) (8,1.41)  — chosen so total params stay ~6.55M
  * block size 32 / 16 / 8, feature axis 0 (CN)
  * Barabasi-Albert (default) or Watts-Strogatz layouts, with the
    bandwidth m grown until the layout density reaches the target
    (the reference's exact m-selection rule is reproduced here)
  * minibatch N = 64, bfloat16 compute, depth-8 chained applications
    y = bsmm(y, w) with gradients through the chain.

Plus the README config (/root/reference/README.md:44-67): hidden 4096,
block 32, minibatch 64, uniform random 0/1 layout, fp32.

Measured per APPLICATION (chain time / depth) with the anchor-validated
slope protocol from bench.py.  Writes results_canonical.json with
per-row: ms, effective TFLOP/s, fraction of the density-scaled dense
roofline, and the per-app overhead-floor diagnosis small-N rows carry.
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

from blocksparse_tpu import BlocksparseMatMul
from blocksparse_tpu.models.sparse_lstm import make_mask
from bench import bench_slope, result_path

# (hidden multiplier, target sparsity %) — reference bench line 40
CONFIGS = [(1, 100.0), (2, 25.62), (3, 11.25), (4, 6.56),
           (5, 4.25), (6, 2.71), (7, 1.96), (8, 1.41)]


def pick_m(n, target_pct, mask):
    """The reference's m-selection rule (bench lines 52-59)."""
    if target_pct >= 100.0:
        return n, n * n
    for m in range(1, n // 2):
        if mask == "ws":
            blks = n * (m * 2 + 1)
        else:
            blks = 2 * m * (n - m) + m * m + n - m
        if 100 * blks / n ** 2 >= target_pct:
            return m, blks
    return n // 2, n * n // 2


def build_layout(mask, n, m, seed=0):
    if m >= n:
        return np.ones((n, n), np.int32)
    if mask == "ws":
        return make_mask(n, f"ws_{m}_20", seed=seed)
    return make_mask(n, f"ba_{m}", seed=seed)


def dev_uniform(seed, shape, lo, hi, dtype):
    """Random operand generated ON DEVICE (tunnel rejects big host
    transfers; timing is data-independent)."""
    return jax.jit(lambda k: jax.random.uniform(
        k, shape, jnp.float32, lo, hi).astype(dtype))(
            jax.random.PRNGKey(seed))


def bench_dense_control(hidden, N, dtype, depth, on_tpu):
    """Dense hidden^2 x N matmul through the same chained-slope
    protocol — the honest roofline at small N, where the MXU lane dim
    is underfilled and density-scaled PEAK overstates the target."""
    s = 0.5 / np.sqrt(hidden)
    W = dev_uniform(11, (hidden, hidden), -s, s, dtype)
    x0 = dev_uniform(12, (hidden, N), -1.0, 1.0, dtype)

    def fwd_step(x, w):
        for _ in range(depth):
            x = jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)
        return x

    # Wide chain gap + high iters: at N=64 a single application is
    # ~30-500 us, so the (1,3)x8 protocol's ~1.4 ms slope signal sat
    # inside the tunnel's ~1 ms quantum noise and anchors deflated
    # below the floor (results_canonical_p2 first capture).  (1,4)x24
    # gives ~6 ms of anchor signal; reps=4 lets min() converge.
    chains = (1, 4) if on_tpu else (1, 2)
    (t_d,), anchor = bench_slope(
        [(fwd_step, x0, W)], chains=chains,
        iters=24 if on_tpu else 1, reps=4 if on_tpu else 3,
        with_anchor=True, retries=3 if on_tpu else 0)
    return t_d / depth, anchor


def bench_config(bsmm, N, dtype, depth, on_tpu):
    """Per-application fwd and fwd+bwd seconds through a depth-chain."""
    rng = np.random.RandomState(7)
    Wc = rng.uniform(-1, 1, (bsmm.blocks, bsmm.bsize, bsmm.bsize)) \
        .astype(np.float32) / np.sqrt(bsmm.bsize)
    W = jnp.asarray(bsmm.pack_weights(Wc) if hasattr(bsmm, "pack_weights")
                    else Wc, dtype)
    x0 = jnp.asarray(rng.uniform(-1, 1, bsmm.i_shape(N)), dtype)

    def fwd_step(x, w):
        for _ in range(depth):
            x = bsmm(x, w).astype(dtype)
        return x * (1.0 / depth)        # keep magnitudes bounded

    def fb_step(x, w):
        def chain(xx):
            y = xx
            for _ in range(depth):
                y = bsmm(y, w).astype(dtype)
            return y
        y, vjp = jax.vjp(chain, x)
        (dx,) = vjp(y)
        return (x * 0.999 + 1e-6 * dx).astype(dtype)

    chains = (1, 4) if on_tpu else (1, 2)   # see bench_dense_control
    iters = 24 if on_tpu else 1
    (t_f, t_fb), anchor = bench_slope(
        [(fwd_step, x0, W), (fb_step, x0, W)], chains=chains,
        iters=iters, reps=4 if on_tpu else 3, with_anchor=True,
        retries=3 if on_tpu else 0)
    return t_f / depth, t_fb / depth, anchor


def main():
    on_tpu = jax.default_backend() == "tpu"
    p = argparse.ArgumentParser()
    p.add_argument("--mask", type=str, default="ba", choices=("ba", "ws"))
    p.add_argument("--bsizes", type=str, default="32,16,8")
    p.add_argument("--ks", type=str,
                   default="1,2,3,4,5,6,7,8" if on_tpu else "1")
    p.add_argument("--N", type=int, default=64)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--readme", action="store_true",
                   help="also run the README 4096^2/b32/random/fp32 row")
    p.add_argument("--out", type=str, default=result_path("canonical"))
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)

    # chip peak for the fraction column (v5e: 197 bf16 / ~49 f32 TF/s;
    # bench.py's dense 8192^2 control measured 194 TF/s = 98% of peak)
    PEAK_TF = 197.0 if dtype == jnp.bfloat16 else 49.0

    results = {"backend": jax.default_backend(), "mask": args.mask,
               "N": args.N, "depth": args.depth, "dtype": args.dtype,
               "peak_tflops_assumed": PEAK_TF, "rows": []}
    out = args.out

    def flush():
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    print(f"backend {jax.default_backend()} mask={args.mask} N={args.N} "
          f"depth={args.depth} {args.dtype}")
    print(f"{'hidden':>7} {'bsize':>5} {'dens%':>6} {'blocks':>7} "
          f"{'fwd ms':>8} {'fb ms':>8} {'fwd TF/s':>8} {'frac':>6} "
          f"{'mode':>10}")

    ks = [int(k) for k in args.ks.split(",")]
    bsizes = [int(b) for b in args.bsizes.split(",")]
    for k, target in [CONFIGS[k - 1] for k in ks]:
        hidden = k * 2560
        # dense control at the SAME N: the fair small-N roofline
        try:
            t_dense, d_anchor = bench_dense_control(
                hidden, args.N, dtype, args.depth, on_tpu)
        except Exception as e:
            t_dense, d_anchor = None, {"anchor_ms": -1.0,
                                       "timing_valid": False}
            print(f"dense control {hidden} FAILED {str(e)[:120]}")
        else:
            dtf = 2 * hidden * hidden * args.N / t_dense / 1e12
            print(f"{hidden:7d} dense control {t_dense*1e3:8.4f} ms/app "
                  f"{dtf:8.2f} TF/s (anchor {d_anchor['anchor_ms']} ms "
                  f"valid={d_anchor['timing_valid']})")
        for bsize in bsizes:
            n = hidden // bsize
            m, _ = pick_m(n, target, args.mask)
            lay = build_layout(args.mask if target < 100 else "dense",
                               n, m)
            try:
                bsmm = BlocksparseMatMul(lay, block_size=bsize,
                                         feature_axis=0,
                                         w_layout="fprop_packed")
                t_f, t_fb, anchor = bench_config(
                    bsmm, args.N, dtype, args.depth, on_tpu)
            except Exception as e:
                results["rows"].append(
                    {"hidden": hidden, "bsize": bsize,
                     "error": str(e).replace("\n", " ")[:300]})
                flush()
                print(f"{hidden:7d} {bsize:5d}  FAILED {str(e)[:100]}")
                continue
            fl = 2 * bsmm.blocks * bsize * bsize * args.N
            eff = fl / t_f / 1e12
            dens = float(bsmm.sparsity)
            # eff counts only the sparse FLOPs, so eff/PEAK is already
            # the fraction of the density-scaled dense roofline
            frac = eff / PEAK_TF
            row = {"hidden": hidden, "bsize": bsize,
                   "density": round(dens, 4), "blocks": bsmm.blocks,
                   "m": m,
                   "fwd_ms_per_app": round(t_f * 1e3, 4),
                   "fwdbwd_ms_per_app": round(t_fb * 1e3, 4),
                   "fwd_eff_tflops": round(eff, 2),
                   "flops_roofline_fraction": round(frac, 4),
                   "mode": bsmm.dispatch_mode(args.N, dtype.itemsize),
                   "anchor_ms": anchor["anchor_ms"],
                   "timing_valid": anchor["timing_valid"]}
            if t_dense is not None:
                row["dense_ms_per_app"] = round(t_dense * 1e3, 4)
                row["speedup_vs_dense"] = round(t_dense / t_f, 3)
                # density-scaled fraction of the measured same-N dense
                row["frac_of_dense_control"] = round(
                    dens * t_dense / t_f, 4)
                row["dense_anchor_valid"] = d_anchor["timing_valid"]
                # At N=64 the dense control is weight-bandwidth-bound:
                # an app must read hidden^2 weight bytes, so ms below
                # bytes/2TB/s (generous over the ~1.4 TB/s measured)
                # is a tunnel-memoization artifact (BENCH_NOTES round-1
                # notes) and the vs-dense ratio is conservative-only.
                w_bytes = hidden * hidden * dtype.itemsize
                row["dense_bw_plausible"] = bool(
                    t_dense >= w_bytes / 2.0e12)
            results["rows"].append(row)
            flush()
            print(f"{hidden:7d} {bsize:5d} {100*dens:6.2f} "
                  f"{bsmm.blocks:7d} {t_f*1e3:8.4f} {t_fb*1e3:8.4f} "
                  f"{eff:8.2f} {frac:6.3f} "
                  f"{row['mode']:>10}")

    if args.readme:
        # README config: 4096^2, b32, N=64, uniform random layout, fp32
        rng = np.random.RandomState(0)
        n = 4096 // 32
        lay = (rng.rand(n, n) < 0.25).astype(np.int32)
        lay[np.arange(n), np.arange(n)] = 1
        bsmm = BlocksparseMatMul(lay, block_size=32, feature_axis=0,
                                 w_layout="fprop_packed")
        t_f, t_fb, anchor = bench_config(bsmm, 64, jnp.float32,
                                         args.depth, on_tpu)
        fl = 2 * bsmm.blocks * 32 * 32 * 64
        results["readme_row"] = {
            "hidden": 4096, "bsize": 32, "N": 64, "dtype": "float32",
            "density": round(float(bsmm.sparsity), 4),
            "fwd_ms_per_app": round(t_f * 1e3, 4),
            "fwdbwd_ms_per_app": round(t_fb * 1e3, 4),
            "fwd_eff_tflops": round(fl / t_f / 1e12, 2),
            "anchor_ms": anchor["anchor_ms"],
            "timing_valid": anchor["timing_valid"]}
        flush()
        r = results["readme_row"]
        print(f"README row: fwd {r['fwd_ms_per_app']} ms/app, "
              f"fwd+bwd {r['fwdbwd_ms_per_app']} ms/app, "
              f"{r['fwd_eff_tflops']} TF/s")

    flush()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
