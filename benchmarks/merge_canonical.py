#!/usr/bin/env python
"""Merge split canonical-sweep part files into results_canonical.json.

The round-4 BA sweep ran in resumable segments (the bench tunnel
session died mid-sweep once); this stitches them back into one file,
preferring later captures of the same (hidden, bsize) row (reruns of
anchor-invalid rows), and carries the readme_row if any part has it.

Usage: python benchmarks/merge_canonical.py out.json part1.json part2.json ...
Parts are applied in order; later rows win on (hidden, bsize) key.
"""
import json
import sys


def main():
    out_path, parts = sys.argv[1], sys.argv[2:]
    merged = None
    rows = {}          # (hidden, bsize) -> row
    readme = None
    for p in parts:
        with open(p) as f:
            d = json.load(f)
        if merged is None:
            merged = {k: v for k, v in d.items()
                      if k not in ("rows", "readme_row")}
        for r in d.get("rows", []):
            key = (r.get("hidden"), r.get("bsize"))
            prev = rows.get(key)
            # prefer anchor-valid rows; among equals, later wins
            if prev is not None and prev.get("timing_valid") \
                    and not r.get("timing_valid"):
                continue
            rows[key] = r
        if d.get("readme_row"):
            readme = d["readme_row"]
    merged["rows"] = sorted(
        rows.values(),
        key=lambda r: (r.get("hidden", 0), -r.get("bsize", 0)))
    if readme:
        merged["readme_row"] = readme
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    nvalid = sum(bool(r.get("timing_valid")) for r in merged["rows"])
    print(f"wrote {out_path}: {len(merged['rows'])} rows "
          f"({nvalid} anchor-valid), readme_row={'yes' if readme else 'no'}")


if __name__ == "__main__":
    main()
