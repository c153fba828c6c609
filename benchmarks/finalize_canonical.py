#!/usr/bin/env python
"""Final round-5 canonical-artifact assembly.

Merges the round-4 merged BA artifact with the round-5 recaptures
(b8/b16 post-resident-switch, b32 + README row) into ONE
results_canonical.json — later parts win per (hidden, bsize) — and
back-fills the dense_bw_plausible flag (added mid-round) on rows whose
capture predates it: at N=64 a dense application must read hidden^2
weight bytes, so ms below bytes/2TB/s is a tunnel-memoization artifact
(BENCH_NOTES round-1 notes) and the vs-dense ratio is conservative.

Usage: python benchmarks/finalize_canonical.py
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

PARTS = ["results_canonical.json", "results_canon_b816.json",
         "results_canon_b32r.json"]


def main():
    parts = [os.path.join(HERE, p) for p in PARTS
             if os.path.exists(os.path.join(HERE, p))]
    out = os.path.join(HERE, "results_canonical.json")
    subprocess.check_call(
        [sys.executable, os.path.join(HERE, "merge_canonical.py"), out]
        + parts)
    with open(out) as f:
        d = json.load(f)
    isz = 2 if d.get("dtype") == "bfloat16" else 4
    for r in d["rows"]:
        if "dense_ms_per_app" in r and "dense_bw_plausible" not in r:
            w_bytes = r["hidden"] * r["hidden"] * isz
            r["dense_bw_plausible"] = bool(
                r["dense_ms_per_app"] * 1e-3 >= w_bytes / 2.0e12)
    with open(out, "w") as f:
        json.dump(d, f, indent=1)
    n = len(d["rows"])
    nv = sum(bool(r.get("timing_valid")) for r in d["rows"])
    nd = sum("dense_ms_per_app" in r for r in d["rows"])
    npl = sum(bool(r.get("dense_bw_plausible")) for r in d["rows"])
    print(f"{out}: {n} rows, {nv} anchor-valid, {nd} with dense "
          f"controls ({npl} bw-plausible), "
          f"readme_row={'yes' if d.get('readme_row') else 'no'}")


if __name__ == "__main__":
    main()
