#!/usr/bin/env python
"""Offline study: how much random-layout MXU fill can scheduling recover?

Fill = nnz / (R * total contraction slots).  The round-3 kernel uses a
fixed partition of output block-rows into R-row groups (union-minimized
by cluster_rows); its ceiling at d=0.25/R=4 is ~0.39.  VERDICT r3 asks
whether a flexible cover — output rows appearing in MULTIPLE passes,
realizable as a small number of phases, each a fixed partition over the
RESIDUAL cells, summed afterwards — raises the ceiling.

Strategies measured on the canonical 8192^2/b32 (256x256 blocks) random
layout at several densities:
  part        : plain fixed partition (consecutive rows)
  clust       : cluster_rows partition (round-3 shipping state)
  phase2(t)   : phase 1 keeps only columns with >= t cells in the
                group (others deferred); phase 2 = clustered partition
                over residual.  Output cost: one extra out write+add.
  phase3(t,t2): three phases.
Slots are quantized to pass granularity only at the end (G chooser
handles that); this study counts raw union slots, the kernel's ~10%
quantization/overhead rides on top identically for all strategies.
"""
import sys
import os
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blocksparse_tpu.kernels.bsmm import cluster_rows_py


def union_slots_partition(sup, R, perm):
    """Total union slots for a fixed partition given row order perm."""
    n = sup.shape[0]
    tot = 0
    for g0 in range(0, n, R):
        rows = perm[g0:g0 + R]
        tot += int(np.any(sup[rows], axis=0).sum())
    return tot


def entries_of(sup):
    return [[(int(c), 0) for c in np.nonzero(sup[r])[0]]
            for r in range(sup.shape[0])]


def fill_partition(sup, R, cluster=True):
    nnz = int(sup.sum())
    if cluster:
        perm = cluster_rows_py(entries_of(sup), R, sup.shape[1])
    else:
        perm = np.arange(sup.shape[0])
    return nnz / (R * union_slots_partition(sup, R, perm))


def phase_split(sup, R, thresh, cluster=True):
    """One thresholded phase: returns (slots, covered_sup, residual_sup).

    Groups rows (clustered on the full support), keeps columns with
    >= thresh cells in the group; cells of kept columns are covered,
    the rest deferred."""
    n = sup.shape[0]
    if cluster:
        perm = cluster_rows_py(entries_of(sup), R, sup.shape[1])
    else:
        perm = np.arange(n)
    covered = np.zeros_like(sup)
    slots = 0
    for g0 in range(0, n, R):
        rows = perm[g0:g0 + R]
        mult = sup[rows].sum(axis=0)
        keep = mult >= thresh
        slots += int(keep.sum())
        covered[np.ix_(rows, np.nonzero(keep)[0])] = \
            sup[np.ix_(rows, np.nonzero(keep)[0])]
    residual = sup & ~covered
    return slots, covered, residual


def fill_phases(sup, R, threshs, cluster=True):
    """Multi-phase cover: thresholded phases then a final full phase."""
    nnz = int(sup.sum())
    cur = sup.copy()
    slots = 0
    for t in threshs:
        s, cov, cur = phase_split(cur, R, t, cluster)
        slots += s
        if cur.sum() == 0:
            break
    if cur.sum():
        if cluster:
            perm = cluster_rows_py(entries_of(cur), R, cur.shape[1])
        else:
            perm = np.arange(cur.shape[0])
        slots += union_slots_partition(cur, R, perm)
    return nnz / (R * slots)


def main():
    R = 4
    n = 256
    rng = np.random.RandomState(0)
    print(f"{'d':>6} {'part':>6} {'clust':>6} {'ph2@2':>6} {'ph2@3':>6} "
          f"{'ph3@3,2':>8}")
    for d in (0.25, 0.125, 0.0625):
        sup = rng.rand(n, n) < d
        idx = np.arange(n)
        sup[idx, idx] = True
        rows = [round(fill_partition(sup, R, cluster=False), 4),
                round(fill_partition(sup, R, cluster=True), 4),
                round(fill_phases(sup, R, [2]), 4),
                round(fill_phases(sup, R, [3]), 4),
                round(fill_phases(sup, R, [3, 2]), 4)]
        print(f"{d:6.4f} {rows[0]:6.4f} {rows[1]:6.4f} {rows[2]:6.4f} "
              f"{rows[3]:6.4f} {rows[4]:8.4f}")


if __name__ == "__main__":
    main()
