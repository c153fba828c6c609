#!/usr/bin/env python
"""On-chip A/B: per-slot dense-tile kernel vs VMEM-resident-x kernel.

Round-4 finding: at the headline configs the per-slot dense-tile kernel
is x-DMA-bound, not MXU-bound — every union slot re-reads its (bsize,
TN) x block from HBM:

  random 8192^2/b32/d0.25: 10.9K slot reads x 131 KB = 1.42 GB ~ 1.05 ms
    at ~1.35 TB/s  vs MXU 2604 passes ~ 0.91 ms   (measured 1.077 ms)
  banded 8192^2/b32/d0.435: 8.4K slots = 1.10 GB ~ 0.81 ms
    vs MXU 1948 passes ~ 0.68 ms                  (measured 0.826 ms)

The resident kernel copies the whole (C, TN) x column tile into VMEM
once per n-tile (TN chosen so the scratch fits ~9 MB) and gathers slots
with dynamic sublane slices: x traffic drops to C*N bytes.  The open
question this probe answers is the per-chunk overhead at the smaller TN
(the per-step fixed cost was fitted at TN=2048; resident needs TN<=512
at hidden 8192 bf16) and the W-panel re-read per n-tile.

Usage:
  python tools/tpu_resident_ab.py --parity-only   # compile+parity, fast
  python tools/tpu_resident_ab.py                 # timed A/B
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul
from bench import bench_slope, make_layout, result_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=8192)
    p.add_argument("--N", type=int, default=2048)
    p.add_argument("--configs", type=str,
                   default="random:32:0.25,banded:32:0.25,banded:64:0.25")
    p.add_argument("--parity-only", action="store_true")
    p.add_argument("--fwdbwd", action="store_true",
                   help="also time the fwd+bwd step per config")
    args = p.parse_args()
    hidden, N = args.hidden, args.N
    dtype = jnp.bfloat16
    on_tpu = jax.default_backend() == "tpu"

    def dev_uniform(seed, shape, lo, hi):
        return jax.jit(lambda k: jax.random.uniform(
            k, shape, jnp.float32, lo, hi).astype(dtype))(
                jax.random.PRNGKey(seed))

    jobs, labels, meta = [], [], []
    rng = np.random.RandomState(0)
    for spec in args.configs.split(","):
        kind, bs, dens = spec.split(":")
        bs, dens = int(bs), float(dens)
        nb = hidden // bs
        lay = make_layout(kind, nb, dens, np.random.RandomState(7))
        pair = {}
        for mode in ("dense_tile", "resident"):
            bsmm = BlocksparseMatMul(lay, block_size=bs, feature_axis=0,
                                     w_layout="fprop_packed", mode=mode)
            W = dev_uniform(100 + bs, bsmm.w_shape, -0.05, 0.05)
            x0 = dev_uniform(200 + bs, bsmm.i_shape(N), -1.0, 1.0)
            pair[mode] = (bsmm, W, x0)
            if not args.parity_only:
                jobs.append((lambda x, w, b=bsmm: b(x, w).astype(dtype),
                             x0, W))
                labels.append(f"{kind}_b{bs}_{mode}")
                meta.append((kind, bs, bsmm))
                if args.fwdbwd:
                    def fb(x, w, b=bsmm):
                        y, vjp = jax.vjp(lambda xx, ww: b(xx, ww), x, w)
                        dx, dw = vjp(y.astype(dtype))
                        return (x * 0.999 + 1e-6 * dx).astype(dtype)
                    jobs.append((fb, x0, W))
                    labels.append(f"{kind}_b{bs}_{mode}_fb")
                    meta.append((kind, bs, bsmm))
        # parity: same canonical weights through both modes.  NB: both
        # sides must see the same *packed* buffer — raw-random packed
        # weights carry garbage in the ladder padding slots, which ARE
        # billed by the pass-quantized dot width (that garbage is
        # timing-neutral for the bench jobs above but not parity-neutral).
        bd, Wd, xd = pair["dense_tile"]
        br, Wr, xr = pair["resident"]
        Wc = np.asarray(bd.unpack_weights(np.asarray(jax.device_get(Wd))))
        Wd2 = jnp.asarray(bd.pack_weights(Wc), dtype)
        Wr2 = jnp.asarray(br.pack_weights(Wc), dtype)
        yd = np.asarray(jax.device_get(bd(xd, Wd2)))
        yr = np.asarray(jax.device_get(br(xd, Wr2)))
        err = float(np.abs(yd - yr).max() / (np.abs(yd).max() + 1e-9))
        print(f"parity {kind} b{bs}: rel err {err:.2e} "
              f"(resident TN auto)", flush=True)
        assert err < 2e-2, f"parity failure {kind} b{bs}"

    if args.parity_only:
        print("parity OK")
        return

    times, anchor = bench_slope(jobs, chains=(2, 6), iters=6,
                                with_anchor=True,
                                retries=3 if on_tpu else 0)
    rows = []
    for (kind, bs, bsmm), lab, dt in zip(meta, labels, times):
        fl = 2 * bsmm.blocks * bs * bs * N
        row = {"label": lab, "ms": round(dt * 1e3, 4),
               "eff_tflops": round(fl / dt / 1e12, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = {"hidden": hidden, "N": N, "anchor_ms": anchor["anchor_ms"],
           "timing_valid": anchor["timing_valid"],
           "backend": jax.default_backend(), "rows": rows}
    with open(result_path("resident_ab"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", result_path("resident_ab"))


if __name__ == "__main__":
    main()
