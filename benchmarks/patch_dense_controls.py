#!/usr/bin/env python
"""Patch dense-control columns into canonical-sweep rows that predate
the dense-control addition (k=1,2 rows captured before canonical_bench
grew bench_dense_control).

Usage: python benchmarks/patch_dense_controls.py results.json [hidden ...]
Times a dense hidden^2 x N control per listed hidden (default: every
hidden in the file missing one) and rewrites the rows in place.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from canonical_bench import bench_dense_control  # noqa: E402


def main():
    path = sys.argv[1]
    with open(path) as f:
        d = json.load(f)
    want = [int(h) for h in sys.argv[2:]] or sorted(
        {r["hidden"] for r in d["rows"]
         if "hidden" in r and "dense_ms_per_app" not in r})
    on_tpu = jax.default_backend() == "tpu"
    N, depth = d.get("N", 64), d.get("depth", 8)
    dtype = jnp.dtype(d.get("dtype", "bfloat16"))
    for hidden in want:
        t_dense, anchor = bench_dense_control(hidden, N, dtype, depth,
                                              on_tpu)
        dtf = 2 * hidden * hidden * N / t_dense / 1e12
        print(f"{hidden:7d} dense control {t_dense*1e3:8.4f} ms/app "
              f"{dtf:8.2f} TF/s anchor={anchor}")
        for r in d["rows"]:
            if r.get("hidden") != hidden or "fwd_ms_per_app" not in r:
                continue
            t_f = r["fwd_ms_per_app"] / 1e3
            r["dense_ms_per_app"] = round(t_dense * 1e3, 4)
            r["speedup_vs_dense"] = round(t_dense / t_f, 3)
            r["frac_of_dense_control"] = round(
                r["density"] * t_dense / t_f, 4)
            r["dense_anchor_valid"] = anchor["timing_valid"]
    with open(path, "w") as f:
        json.dump(d, f, indent=1)
    print(f"patched {path}")


if __name__ == "__main__":
    main()
