#!/usr/bin/env python
"""Render results_canonical*.json as the BENCH_NOTES markdown table.

Adds the derived bandwidth-roofline column: at N=64 every config is
weight-bandwidth-bound (dense control at hidden 7680 reads 118 MB per
application for 7.5 GFLOP -> arithmetic intensity 64 FLOP/B, right at
the v5e ridge; sparse configs read density x that for the same N), so
the honest ideal time is  max(flops / peak, bytes / BW_eff)  with
BW_eff derived from the measured dense control in the same window:
BW_eff = dense_bytes / dense_ms.

Usage: python tools/canon_table.py benchmarks/results_canonical.json
"""
import json
import sys


def main():
    with open(sys.argv[1]) as f:
        d = json.load(f)
    N = d.get("N", 64)
    peak = d.get("peak_tflops_assumed", 197.0)
    isz = 2 if d.get("dtype") == "bfloat16" else 4
    print(f"| hidden | bsize | dens% | blocks | fwd ms | fb ms | "
          f"TF/s | vs dense | frac(dense) | frac(bw-roofline) | ok |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for r in d["rows"]:
        if "error" in r:
            print(f"| {r.get('hidden')} | {r.get('bsize')} | "
                  f"ERROR {r['error'][:60]} |")
            continue
        h, bs = r["hidden"], r["bsize"]
        t_f = r["fwd_ms_per_app"] / 1e3
        fl = 2 * r["blocks"] * bs * bs * N
        ideal_c = fl / (peak * 1e12)
        cols = ""
        if "dense_ms_per_app" in r:
            t_d = r["dense_ms_per_app"] / 1e3
            dense_bytes = (h * h + 2 * h * N) * isz
            bw_eff = dense_bytes / t_d
            sparse_bytes = (r["blocks"] * bs * bs + 2 * h * N) * isz
            ideal = max(ideal_c, sparse_bytes / bw_eff)
            cols = (f" {r['speedup_vs_dense']:.2f}x | "
                    f"{r['frac_of_dense_control']:.3f} | "
                    f"{ideal / t_f:.3f} |")
        else:
            cols = " — | — | — |"
        ok = "y" if r.get("timing_valid") else "n"
        print(f"| {h} | {bs} | {100*r['density']:.1f} | {r['blocks']} | "
              f"{r['fwd_ms_per_app']:.4f} | {r['fwdbwd_ms_per_app']:.4f} | "
              f"{r['fwd_eff_tflops']:.1f} |{cols} {ok} |")
    if d.get("readme_row"):
        r = d["readme_row"]
        print(f"\nREADME config (4096^2 b32 N=64 random fp32): "
              f"fwd {r['fwd_ms_per_app']} ms/app, fwd+bwd "
              f"{r['fwdbwd_ms_per_app']} ms/app, {r['fwd_eff_tflops']} "
              f"TF/s (anchor-valid: {r['timing_valid']})")


if __name__ == "__main__":
    main()
