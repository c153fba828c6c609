"""Layout-driven block-sparse matrix multiply.

TPU-native equivalent of the reference's ``BlocksparseMatMul``
(/root/reference/blocksparse/matmul.py:74-527) and ``SparseProj``
(matmul.py:835-921).

Differences by design (see SURVEY.md §7):
* LUT segmenting + spin locks (matmul.py:172-270) are replaced by the
  sequential-grid step schedule in ``kernels/bsmm.py``.
* ``group_param_grads``'s graph rewrite is unnecessary under JAX: RNN
  weight grads accumulate through ``jax.lax.scan`` automatically; the
  function is kept as a documented no-op shim.
* Gating is folded into the custom VJP instead of separate DG ops.
"""
from __future__ import annotations

import functools

import numpy as np
import scipy.sparse as sparse
import jax
import jax.numpy as jnp

from blocksparse_tpu.utils import ceil_div, z_order_2d, round_up
from blocksparse_tpu.kernels import bsmm as bsmm_kernels
from blocksparse_tpu.kernels.bsmm import (
    XpropSchedule, build_xprop_schedule,
    build_grouped_schedule, build_updat_grouped_schedule,
    default_rows_per_group, choose_contract_blocks,
    grouped_vmem_estimate, packed_len, packed_positions,
    fprop_panels_from_packed, build_supertile_schedule, CONTRACT,
    build_dense_tile_schedule, build_dense_tile_schedule_phased,
    build_updat_dense_tile_schedule,
    dense_tile_panels, dense_tile_vmem_estimate,
    dense_tile_flat_pos, dense_tile_blocks_view,
    build_window_schedule, window_vmem_estimate,
    build_fine_schedule,
)
import copy as _copy
from blocksparse_tpu.kernels.common import pick_tile


# Measured on-chip cost of one extra phased-cover group, in MXU
# pass-equivalents (benchmarks/results_phased_ab.json; see the cost
# model in BlocksparseMatMul.__init__).  With the Pallas gather merge
# (kernels/bsmm.py merge_phased_tiles) an extra group costs ~8.4
# pass-equivalents: phased_fwd 1.555 ms vs pass-proportional 0.884 ms
# over 192 extra groups at the headline random 8192^2/b32/d=0.25
# config.  (The original XLA segment_sum merge put this at ~22 and
# regressed the headline 2.1x.)  Module-level so probes can force
# phased selection (tools/tpu_phased_ab.py).
PHASED_EXTRA_GROUP_PASSES = 9


def _default_impl():
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def largest_block(dim):
    for blk in (32, 16, 8):
        if dim % blk == 0:
            return (blk, dim // blk)
    raise ValueError("dimension not multiple of 8, 16, or 32")


class BlocksparseMatMul:
    """Block-sparse matmul op object.

    layout: 2-D 0/1 array (CB, KB) of nonzero blocks.
    block_size: 8..64 (reference range, restricted per axis there —
        matmul.py:82-89) plus 128, which fills the full MXU tile (use
        `coarsen_layout` to lift a fine layout to 128 when it has 2-D
        locality: smaller blocks fill only bsize/128 of the output
        lanes per pass).
    feature_axis: 0 => activations are (C, N) feature-major ("CN", the fast
        path on TPU: batch lanes stay full); 1 => (N, C).
    """

    def __getstate__(self):
        return {"layout": self.layout, "block_size": self.bsize,
                "feature_axis": self.axis, "z_order": self.z_order,
                "name": self.name, "impl": self.impl,
                "w_layout": self.w_layout, "mode": self.mode,
                "dense_tile_R": self.dense_tile_R}

    def __setstate__(self, state):
        if isinstance(state, tuple):  # legacy tuple form
            self.__init__(*state)
        else:
            self.__init__(**state)

    def __init__(self, layout, block_size=32, feature_axis=0, z_order=True,
                 name=None, impl=None, tile_n=None, w_layout="blocks",
                 mode="auto", dense_tile_G=None, dense_tile_R=None):
        """w_layout="fprop_packed" stores weights in fprop schedule order
        (zero padding blocks included): the fprop weight panels become a
        free reshape instead of a gather — about 3 fewer W-sized HBM
        passes per fprop.  w_shape changes accordingly; use
        pack_weights/unpack_weights to convert.

        mode: "auto" picks per direction between the per-row grouped /
        supertile kernels and the dense-tile rectangle kernel (full
        128-lane MXU output tiles for bsize < 128) by estimated MXU pass
        count; "grouped" / "dense_tile" pin it.  "window" pins the
        window-slab kernel: x streamed once per (super-group, column
        window) — 3-6x lower input HBM traffic for bandwidth-constrained
        deployments.  "resident" pins the dense-tile schedule with the
        VMEM-resident-x kernel (one x column-tile copy per n-tile, slots
        gathered by dynamic slice): same MXU passes, x HBM traffic down
        from union-amplified to 1x.  Measured: residency WINS only in
        the small-N regime (auto switches to it at N <= 512 when the
        whole x fits one tile); at bench N the per-slot kernel already
        sits at its x-traffic bound (BENCH_NOTES round-5 resident
        close-out).  Dense-tile schedules cluster output rows by
        column-support union (fewer MXU passes; output gathered back to
        canonical order).

        dense_tile_R: rows per dense-tile schedule group (default
        128/block_size, one 128-row MXU output tile).  R-aligned
        STRUCTURED layouts (rows of a group sharing their column
        support) should raise it — x slot re-reads scale 1/R at
        constant MXU passes since the (R*bsize, TN) output tile stays
        resident; R=4 at b64 took the aligned-band 8192^2/d0.25 row
        from 0.80 to 0.93 of the FLOPs roofline (anchor-valid,
        benchmarks/results_bigr.json).  Leave default for random
        layouts: bigger unions lower fill faster than the re-read
        saving."""
        if block_size not in (8, 16, 32, 64, 128):
            raise ValueError("Unsupported block size: %d" % block_size)
        assert w_layout in ("blocks", "fprop_packed")
        assert mode in ("auto", "grouped", "dense_tile", "window",
                        "resident", "fine")
        self.axis = feature_axis
        self.bsize = block_size
        self.z_order = z_order
        self.impl = impl
        self.tile_n = tile_n
        self.w_layout = w_layout
        self.mode = mode
        self.dense_tile_R = dense_tile_R

        assert len(layout.shape) == 2
        CB, KB = layout.shape
        layout = np.asarray(layout)
        if layout.dtype != np.int32:
            layout = (layout != 0).astype(np.int32)

        csr = sparse.csr_matrix(layout)
        cs, ks, _ = sparse.find(csr)
        blocks = len(cs)
        if blocks == 0:
            raise ValueError("empty layout")

        # Assign block ids: z-order for weight-storage locality (parity with
        # reference matmul.py:119-127), else row-major (c, k).
        coords = list(zip(cs.tolist(), ks.tolist()))
        if z_order:
            order = sorted(range(blocks),
                           key=lambda i: z_order_2d(coords[i][0], coords[i][1]))
        else:
            order = sorted(range(blocks), key=lambda i: coords[i])
        updat_list = [coords[i] for i in order]

        self.updat_list = updat_list
        self.updat_lut = np.array(updat_list, dtype=np.int32)

        # entries grouped by output block: fprop by k, bprop by c
        fprop_rows = [[] for _ in range(KB)]
        bprop_rows = [[] for _ in range(CB)]
        for w, (c, k) in enumerate(updat_list):
            fprop_rows[k].append((c, w))
            bprop_rows[c].append((k, w))
        # sort entries within each row for deterministic accumulation order
        for r in fprop_rows:
            r.sort()
        for r in bprop_rows:
            r.sort()

        self.fprop_list = [(k, lut) for k, lut in enumerate(fprop_rows)]
        self.bprop_list = [(c, lut) for c, lut in enumerate(bprop_rows)]

        # Adaptive MXU contraction depth per direction (padding waste vs
        # step amortization; plays the role of reference segment sizing).
        G_f = choose_contract_blocks(block_size, fprop_rows)
        G_b = choose_contract_blocks(block_size, bprop_rows)
        self.G = G_f
        self.fprop_sched = build_xprop_schedule(fprop_rows, KB, G_f)
        self.bprop_sched = build_xprop_schedule(bprop_rows, CB, G_b)
        R_f = default_rows_per_group(block_size, KB, blocks / KB)
        R_b = default_rows_per_group(block_size, CB, blocks / CB)
        # Two grouped-kernel modes per direction: supertile (contiguous
        # 128-row x slices, zero-padded weights — no in-kernel gather)
        # when the layout has input-side locality, else gathered chunks.
        SUPERTILE_MAX_INFLATION = 1.8
        from blocksparse_tpu.kernels.bsmm import supertile_rows
        _, infl_f = supertile_rows(fprop_rows, block_size)
        _, infl_b = supertile_rows(bprop_rows, block_size)
        # group size budgeted on the inflated (zero-padded) panel bytes
        R_fs = default_rows_per_group(block_size, KB,
                                      infl_f * blocks / KB)
        R_bs = default_rows_per_group(block_size, CB,
                                      infl_b * blocks / CB)
        def _flat0(rows):
            ib, wb, ob = [], [], []
            for r, lut in enumerate(rows):
                for (i, w) in lut:
                    ib.append(i)
                    wb.append(w)
                    ob.append(r)
            return (np.array(ib, np.int32), np.array(wb, np.int32),
                    np.array(ob, np.int32))

        flat_f = _flat0(fprop_rows)
        flat_b = _flat0(bprop_rows)
        if infl_f <= SUPERTILE_MAX_INFLATION:
            self.fprop_grouped, _ = build_supertile_schedule(
                fprop_rows, KB, block_size, R_fs, flat=flat_f)
        else:
            self.fprop_grouped = build_grouped_schedule(fprop_rows, KB, G_f,
                                                        R_f, flat=flat_f)
        if infl_b <= SUPERTILE_MAX_INFLATION:
            self.bprop_grouped, _ = build_supertile_schedule(
                bprop_rows, CB, block_size, R_bs, flat=flat_b)
        else:
            self.bprop_grouped = build_grouped_schedule(bprop_rows, CB, G_b,
                                                        R_b, flat=flat_b)
        self.supertile_inflation = (infl_f, infl_b)
        self.updat_grouped = build_updat_grouped_schedule(updat_list, G_b)

        # Dense-tile rectangle schedules: one MXU pass covers an
        # (R x G) = (128/b x 128/b) rectangle of layout cells, filling all
        # 128 output lanes for bsize < 128.  Each chunk is one 128-deep
        # MXU pass in every mode, so the mode with fewer chunks wins;
        # dense-tile chunks <= per-row chunks whenever rows in a group
        # share input columns (always true at density >~ 1/R).
        R_dt = CONTRACT // block_size
        R_use = dense_tile_R or R_dt
        self.fprop_dt = self.bprop_dt = self.updat_dt = None
        self.mode_f = self.mode_b = self.mode_u = "grouped"
        if R_use > 1 and mode not in ("grouped",):
            # row clustering raises fill (union-minimizing groups); the
            # kernel wrapper gathers rows back to canonical order
            fprop_dt = build_dense_tile_schedule(fprop_rows, KB, block_size,
                                                 blocks, R=R_use,
                                                 G=dense_tile_G,
                                                 cluster=True)
            bprop_dt = build_dense_tile_schedule(bprop_rows, CB, block_size,
                                                 blocks, R=R_use,
                                                 G=dense_tile_G,
                                                 cluster=True)
            updat_dt = build_updat_dense_tile_schedule(updat_list, CB,
                                                       block_size)
            # flexible-cover (phased) alternative: on low-locality
            # layouts deferring single-multiplicity columns to
            # re-clustered residual phases raises fill well past the
            # partition ceiling (kernels/bsmm.py builder docstring).
            # Cost model: billed lanes + per-chunk overhead + a
            # MEASURED ~9 pass-equivalents per extra group (on-chip
            # A/B at the headline random 8192^2/b32/d=0.25 config,
            # benchmarks/results_phased_ab.json; acc churn +
            # low-utilization residual chunks + the Pallas gather
            # merge.  The original 2-pass charge under-billed 4x even
            # with the cheap merge and regressed the headline 2.1x;
            # the earlier segment_sum merge put the true cost at ~22).
            # Phased only wins when it saves >~9 passes per extra
            # group; at the bench configs (2.4 saved/extra at the
            # headline layout) the partition is kept.
            def _dt_cost(s, base_groups):
                extra = max(0, s.groups - base_groups) \
                    if s.rows_at is not None else 0
                from blocksparse_tpu.kernels.bsmm import (
                    CONTRACT as _CT, STEP_OVERHEAD_LANES as _SO)
                return (s.mxu_passes(block_size) * _CT
                        + s.num_chunks * _SO
                        + extra * PHASED_EXTRA_GROUP_PASSES * _CT)

            if dense_tile_G is None and dense_tile_R is None:
                for th in ((2,), (3, 2), (3, 2, 2)):
                    f_ph = build_dense_tile_schedule_phased(
                        fprop_rows, KB, block_size, blocks, thresholds=th)
                    if _dt_cost(f_ph, -(-KB // R_use)) \
                            < _dt_cost(fprop_dt, -(-KB // R_use)):
                        fprop_dt = f_ph
                    b_ph = build_dense_tile_schedule_phased(
                        bprop_rows, CB, block_size, blocks, thresholds=th)
                    if _dt_cost(b_ph, -(-CB // R_use)) \
                            < _dt_cost(bprop_dt, -(-CB // R_use)):
                        bprop_dt = b_ph

            def _chunks(s):
                # MXU pass-equivalents: a chunk of contraction depth G*b
                # costs ceil(G*b/128) passes (output rows <=128 round to 1)
                return s.groups * s.CH * max(1, s.G * block_size // CONTRACT)

            def _grouped_cost(s):
                # same lane units as _dt_cost (passes*CT + chunks*SO) so
                # a phased dense-tile schedule carries its calibrated
                # extra-group charge into the dense_tile-vs-grouped
                # comparison too (a phased pick that displaced grouped on
                # raw passes could be costlier under the project's own
                # model)
                from blocksparse_tpu.kernels.bsmm import (
                    CONTRACT as _CT, STEP_OVERHEAD_LANES as _SO)
                return _chunks(s) * _CT + s.groups * s.CH * _SO

            force = mode in ("dense_tile", "window", "resident")
            dt_name = "resident" if mode == "resident" else "dense_tile"
            if force or _dt_cost(fprop_dt, -(-KB // R_use)) \
                    < _grouped_cost(self.fprop_grouped):
                self.fprop_dt = fprop_dt
                self.mode_f = dt_name
            if force or _dt_cost(bprop_dt, -(-CB // R_use)) \
                    < _grouped_cost(self.bprop_grouped):
                self.bprop_dt = bprop_dt
                self.mode_b = dt_name
            if force or updat_dt.num_chunks < _chunks(self.updat_grouped):
                self.updat_dt = updat_dt
                self.mode_u = "dense_tile"
        if mode == "window" and R_dt >= 1:
            # Pinned window-slab mode: x streamed once per (super-group,
            # window) instead of per chunk — 3-6x lower x HBM traffic.
            # Validated in its target regime (tools/tpu_window_check.py,
            # benchmarks/results_window.json): at the bandwidth-leaning
            # N=256 shape it wins 1.14x over dense_tile; at the
            # compute-bound N=2048 bench shape it loses 0.70x, so auto
            # keeps dense_tile and window stays an explicit mode for
            # small-batch / bandwidth-constrained deployments.
            Gw = max(1, 2 * CONTRACT // block_size) \
                if block_size <= 64 else 1
            WBf = max(Gw, min(2048 // block_size, CB))
            WBb = max(Gw, min(2048 // block_size, KB))
            self.fprop_dt = build_window_schedule(
                fprop_rows, KB, CB, block_size, blocks, G=Gw, WB=WBf,
                SG=min(8, max(1, KB // max(1, R_dt))))
            self.bprop_dt = build_window_schedule(
                bprop_rows, CB, KB, block_size, blocks, G=Gw, WB=WBb,
                SG=min(8, max(1, CB // max(1, R_dt))))
            self.mode_f = self.mode_b = "window"
        # window schedules duck-type the dense-tile panel layout
        self._panels_f = self.mode_f in ("dense_tile", "window", "resident")
        self._panels_b = self.mode_b in ("dense_tile", "window", "resident")

        # Fine-block schedules (SURVEY §7 hard-part 2): per-output-row
        # chunks + VMEM-resident x/acc — fill 1.0 where the dense-tile
        # rectangle's R=128/bsize row-union collapses it (b8 random ran
        # SLOWER than dense, results_canonical_p2.json).  Measured ON
        # CHIP it loses 2.6-11x to dense_tile/resident at the canonical
        # b8/b16 N=64 rows (results_fine_ab.json): fill 1.0 cannot pay
        # for the (bsize x N) output tile filling only bsize/128
        # sublanes x N/128 lanes of the MXU — 3% at b8/N=64.  That is
        # the measured packing ceiling for per-row fine gathers;
        # mode="fine" pins the kernel for A/B, auto never picks it.
        self.fprop_fine = self.bprop_fine = None
        if mode == "fine" and block_size <= 32:
            self.fprop_fine = build_fine_schedule(fprop_rows, KB,
                                                  block_size)
            self.bprop_fine = build_fine_schedule(bprop_rows, CB,
                                                  block_size)

        # flat sorted entry arrays for the XLA fallback impl
        def _flat(rows):
            ib, wb, ob = [], [], []
            for r, lut in enumerate(rows):
                for (i, w) in lut:
                    ib.append(i)
                    wb.append(w)
                    ob.append(r)
            return (np.array(ib, np.int32), np.array(wb, np.int32),
                    np.array(ob, np.int32))

        self._fprop_flat = flat_f
        self._bprop_flat = flat_b

        # kb id of each block (for l2_normalize / column reductions)
        self._block_kb = np.array([k for _, k in updat_list], dtype=np.int32)
        self._block_cb = np.array([c for c, _ in updat_list], dtype=np.int32)

        self.name = name or "BlocksparseMatMul"
        self.blocks = blocks
        self.flops = blocks * block_size * block_size * 2
        if w_layout == "fprop_packed" and self._panels_f:
            # Packed store IS the fprop dense-tile panel array (cells
            # pre-transposed): fprop runs with zero weight gathers.
            fdt = self.fprop_dt
            self._dt_flat_pos = dense_tile_flat_pos(fdt)
            self.packed_blocks = fdt.num_chunks * fdt.R * fdt.G
            self.w_shape = (fdt.num_chunks, fdt.R * block_size,
                            fdt.G * block_size)
            if self._panels_b:
                wp = self.bprop_dt.wpos
                self._bprop_dt_wpos_packed = np.where(
                    wp == blocks, self.packed_blocks,
                    self._dt_flat_pos[np.minimum(wp, blocks - 1)]
                ).astype(np.int32)
        elif w_layout == "fprop_packed":
            self.packed_blocks = packed_len(self.fprop_grouped)
            self._packed_pos = packed_positions(self.fprop_grouped, blocks)
            # bprop schedule remapped to packed slot ids
            bg = _copy.copy(self.bprop_grouped)
            bg.w_idx = self._packed_pos[self.bprop_grouped.w_idx]
            self.bprop_grouped_packed = bg
            bs_ = _copy.copy(self.bprop_sched)
            bs_.w_idx = self._packed_pos[self.bprop_sched.w_idx]
            self.bprop_sched_packed = bs_
            if self._panels_b:
                wp = self.bprop_dt.wpos
                self._bprop_dt_wpos_packed = np.where(
                    wp == blocks, self.packed_blocks,
                    self._packed_pos[np.minimum(wp, blocks - 1)]
                ).astype(np.int32)
            # updat schedule emitting grads straight into packed slots
            ug = _copy.copy(self.updat_grouped)
            S2G = ug.groups * ug.CH * ug.G
            perm_packed = np.full(self.packed_blocks, S2G, np.int32)
            perm_packed[self._packed_pos] = ug.perm
            ug.perm = perm_packed
            ug.pad_zero = True
            self.updat_grouped_packed = ug
            self.w_shape = (self.packed_blocks, block_size, block_size)
        else:
            self.w_shape = (blocks, block_size, block_size)
        self.g_shape = (blocks,)
        self.CB, self.KB = CB, KB
        self.C = CB * block_size
        self.K = KB * block_size
        self.count = 0
        self.sparsity = round(float(blocks) / float(CB * KB), 3)
        self.layout = layout > 0

    # ---------------- shapes / coords ----------------

    def i_shape(self, N):
        return (N, self.C) if self.axis else (self.C, N)

    def o_shape(self, N):
        return (N, self.K) if self.axis else (self.K, N)

    def block_coord(self, block):
        return self.updat_list[block]

    # ---------------- initializers ----------------

    def ortho_init(self):
        def _initializer(shape=None, dtype=np.float32, key=None):
            W = np.empty(self.w_shape, dtype=dtype)
            bsize = self.bsize
            if self.sparsity < 1.0:
                for k, lut in self.fprop_list:
                    if not lut:
                        continue
                    shp = (len(lut) * bsize, bsize)
                    a = np.random.normal(0.0, 1.0, shp).astype(dtype)
                    u, _, v = np.linalg.svd(a, full_matrices=False)
                    if u.shape != shp:
                        u = v
                    for i, (c, w) in enumerate(lut):
                        W[w, :, :] = u[i * bsize:(i + 1) * bsize, :]
            else:
                shp = (self.C, self.K)
                a = np.random.normal(0.0, 1.0, shp).astype(dtype)
                u, _, v = np.linalg.svd(a, full_matrices=False)
                if u.shape != shp:
                    u = v
                for w, (c, k) in enumerate(self.updat_list):
                    W[w, :, :] = u[c * bsize:(c + 1) * bsize,
                                   k * bsize:(k + 1) * bsize]
            return W
        return _initializer

    def identity_init(self, scale=1.0):
        def _initializer(shape=None, dtype=np.float32, key=None):
            W = np.zeros(self.w_shape, dtype=dtype)
            for w in range(self.blocks):
                cb, kb = self.updat_list[w]
                if (cb % self.KB) == (kb % self.CB):
                    W[w] = np.eye(self.bsize, dtype=dtype) * scale
            return W
        return _initializer

    def checker_init(self):
        def _initializer(shape=None, dtype=np.float32, key=None):
            gate = np.empty(self.blocks, dtype=dtype)
            for w, (c, k) in enumerate(self.updat_list):
                gate[w] = (c & 1) ^ (k & 1) ^ 1
            return gate
        return _initializer

    def prune(self, param, gate):
        """Drop blocks whose gate is zero; returns (new_param, new_gate).

        Host-side utility (reference matmul.py:272-290).  The caller builds a
        new BlocksparseMatMul from self.layout afterwards.
        """
        param = np.asarray(param)
        gate = np.asarray(gate)
        new_blocks = int(np.sum(gate != 0.0))
        if new_blocks != self.blocks:
            new_param = np.empty((new_blocks, self.bsize, self.bsize),
                                 dtype=param.dtype)
            new_w = 0
            layout = self.layout
            for w, (c, k) in enumerate(self.updat_list):
                if gate[w] == 0.0:
                    layout[c, k] = False
                else:
                    new_param[new_w] = param[w]
                    new_w += 1
        else:
            new_param = param
        return new_param, np.ones((new_blocks,), dtype=gate.dtype)

    # ---------------- NumPy goldens (the spec; parity with reference) -------

    def fprop_test(self, I, W, gate=None):
        bsize = self.bsize
        if self.axis:
            O = np.zeros((I.shape[0], self.KB, bsize))
            I = I.reshape((-1, self.CB, bsize))
            for k, lut in self.fprop_list:
                for c, w in lut:
                    g = 1.0 if gate is None else gate[w]
                    if g != 0.0:
                        O[:, k, :] += np.dot(I[:, c, :], W[w]) * g
            return O.reshape(I.shape[0], -1)
        else:
            N = I[0].size
            O = np.zeros((self.KB, bsize, N))
            I = I.reshape((self.CB, bsize, N))
            for k, lut in self.fprop_list:
                for c, w in lut:
                    g = 1.0 if gate is None else gate[w]
                    if g != 0.0:
                        O[k, :, :] += np.dot(W[w].T, I[c, :, :]) * g
            return O.reshape(-1, N)

    def bprop_test(self, E, W, gate=None):
        bsize = self.bsize
        if self.axis:
            B = np.zeros((E.shape[0], self.CB, bsize))
            E = E.reshape((-1, self.KB, bsize))
            for c, lut in self.bprop_list:
                for k, w in lut:
                    g = 1.0 if gate is None else gate[w]
                    if g != 0.0:
                        B[:, c, :] += np.dot(E[:, k, :], W[w].T) * g
            return B.reshape(E.shape[0], -1)
        else:
            N = E[0].size
            B = np.zeros((self.CB, bsize, N))
            E = E.reshape((self.KB, bsize, N))
            for c, lut in self.bprop_list:
                for k, w in lut:
                    g = 1.0 if gate is None else gate[w]
                    if g != 0.0:
                        B[c, :, :] += np.dot(W[w], E[k, :, :]) * g
            return B.reshape(-1, N)

    def updat_test(self, I, E, gate=None, dw_gated=False):
        # always canonical (blocks, b, b), even in packed-weight mode
        U = np.zeros((self.blocks, self.bsize, self.bsize))
        bsize = self.bsize
        if self.axis:
            I = I.reshape((-1, self.CB, bsize))
            E = E.reshape((-1, self.KB, bsize))
            for w, (c, k) in enumerate(self.updat_list):
                g = gate[w] if (dw_gated and gate is not None) else 1.0
                if g != 0.0:
                    U[w] = np.dot(I[:, c, :].T, E[:, k, :]) * g
        else:
            I = I.reshape((self.CB, bsize, -1))
            E = E.reshape((self.KB, bsize, -1))
            for w, (c, k) in enumerate(self.updat_list):
                g = gate[w] if (dw_gated and gate is not None) else 1.0
                if g != 0.0:
                    U[w] = np.dot(I[c], E[k].T) * g
        return U

    def l2_normalize_test(self, W, epsilon=1e-12):
        W = np.array(W, copy=True)
        for k, lut in self.fprop_list:
            ws = [w for c, w in lut]
            if not ws:
                continue
            W2 = W[ws].reshape(-1, self.bsize)
            norm = np.sqrt(np.maximum(
                np.sum(np.square(W2), axis=0, keepdims=True), epsilon))
            for w in ws:
                W[w] /= norm
        return W

    def l2_normalize_grad_test(self, W, U, epsilon=1e-12):
        U = np.array(U, copy=True)
        for k, lut in self.fprop_list:
            ws = [w for c, w in lut]
            if not ws:
                continue
            W2 = W[ws].reshape(-1, self.bsize)
            U2 = U[ws].reshape(-1, self.bsize)
            sum_sqr_w = np.sum(np.square(W2), axis=0, keepdims=True)
            max_w = np.maximum(sum_sqr_w, epsilon)
            norm_grad = (U2 + W2 * (sum_sqr_w >= epsilon)
                         * np.sum(-U2 * W2 / max_w, axis=0, keepdims=True)
                         ) / np.sqrt(max_w)
            norm_grad = norm_grad.reshape(-1, self.bsize, self.bsize)
            for i, w in enumerate(ws):
                U[w] = norm_grad[i]
        return U

    # ---------------- device ops ----------------

    def l2_normalize(self, W, gain=None, epsilon=1e-12, dtype=None):
        """Joint L2 normalization of each layout block-column.

        XLA-level: a segment-sum over blocks grouped by kb; AD through this
        matches the reference L2NormalizeGradCK math
        (/root/reference/src/blocksparse_l2_norm_op_gpu.cu)."""
        kb = jnp.asarray(self._block_kb)
        sq = jnp.sum(jnp.square(W.astype(jnp.float32)), axis=1)  # (blocks, bsize)
        ssq = jax.ops.segment_sum(sq, kb, num_segments=self.KB)  # (KB, bsize)
        norm = jnp.sqrt(jnp.maximum(ssq, epsilon))
        Wn = W.astype(jnp.float32) / norm[kb][:, None, :]
        if gain is not None:
            g = gain.reshape(self.KB, self.bsize).astype(jnp.float32)
            Wn = Wn * g[kb][:, None, :]
        return Wn.astype(dtype or W.dtype)

    def _grouped_tile(self, C_in, sched, n, itemsize, budget=13 * 1024 * 1024):
        """Pick an N-tile for the grouped kernel that fits VMEM, or None."""
        TN = self.tile_n or pick_tile(n)
        while True:
            est = grouped_vmem_estimate(C_in, TN, itemsize, sched, self.bsize)
            if est <= budget:
                return TN
            if TN % 2 or TN <= 128:
                return None
            TN //= 2

    def _win_tile(self, sched, n, itemsize, budget=13 * 1024 * 1024):
        """Pick an N-tile for the window kernel that fits VMEM, or None."""
        TN = self.tile_n or bsmm_kernels.dense_tile_pick_tile(n)
        while True:
            est = window_vmem_estimate(TN, itemsize, sched, self.bsize)
            if est <= budget:
                return TN
            if TN % 2 or TN <= 128:
                return None
            TN //= 2

    def _dt_tile(self, C_in, sched, n, itemsize, budget=13 * 1024 * 1024):
        """Pick an N-tile for the dense-tile kernel that fits VMEM, or None.

        Prefers large tiles (up to 2048): the per-chunk (128,128) MXU
        weight-tile load amortizes over the TN-long stream."""
        TN = self.tile_n or bsmm_kernels.dense_tile_pick_tile(n)
        while True:
            est = dense_tile_vmem_estimate(C_in, TN, itemsize, sched,
                                           self.bsize)
            if est <= budget:
                return TN
            if TN % 2 or TN <= 128:
                return None
            TN //= 2

    # ---------------- packed weight conversions ----------------

    def pack_weights(self, w):
        """(blocks, b, b) canonical -> fprop-packed layout (NumPy or jnp)."""
        assert self.w_layout == "fprop_packed"
        if self._panels_f:
            fdt = self.fprop_dt
            b = self.bsize
            if isinstance(w, np.ndarray):
                w_ext = np.concatenate(
                    [w, np.zeros((1, b, b), w.dtype)], axis=0)
                cells = w_ext[fdt.wpos].swapaxes(-1, -2)   # (S, R, G, b, b)
                return cells.transpose(0, 1, 3, 2, 4).reshape(self.w_shape)
            return dense_tile_panels(w, fdt, trans_w=False)
        if isinstance(w, np.ndarray):
            out = np.zeros(self.w_shape, w.dtype)
            out[self._packed_pos] = w
            return out
        out = jnp.zeros(self.w_shape, w.dtype)
        return out.at[jnp.asarray(self._packed_pos)].set(w)

    def unpack_weights(self, w_packed):
        assert self.w_layout == "fprop_packed"
        if self._panels_f:
            fdt = self.fprop_dt
            b = self.bsize
            if isinstance(w_packed, np.ndarray):
                pv = w_packed.reshape(fdt.num_chunks, fdt.R, b, fdt.G, b) \
                             .transpose(0, 1, 3, 2, 4) \
                             .reshape(-1, b, b)
                return pv[self._dt_flat_pos].swapaxes(-1, -2)
            pv = dense_tile_blocks_view(w_packed, fdt, b)
            return pv[jnp.asarray(self._dt_flat_pos)].swapaxes(-1, -2)
        if isinstance(w_packed, np.ndarray):
            return w_packed[self._packed_pos]
        return w_packed[jnp.asarray(self._packed_pos)]

    def _canonical_w(self, w):
        return self.unpack_weights(w) if self.w_layout == "fprop_packed" \
            else w

    def _pad_rows_for(self, x, sched):
        """Contiguous-supertile slices must stay in bounds: pad feature
        rows to a supertile multiple (zero rows x zero weights = 0)."""
        if not getattr(sched, "contiguous", False):
            return x
        span = sched.G * self.bsize
        rows = x.shape[0]
        pad = (-rows) % span
        if pad == 0:
            return x
        return jnp.pad(x, ((0, pad), (0, 0)))

    def _pallas_pad(self, x, axis_is_last):
        """Pad the batch dim so a clean lane tile exists."""
        n = x.shape[1] if axis_is_last else x.shape[0]
        if n % 8 == 0:
            return x, n
        n_pad = round_up(n, 64 if n > 32 else 8)
        pads = ((0, 0), (0, n_pad - n)) if axis_is_last else ((0, n_pad - n), (0, 0))
        return jnp.pad(x, pads), n

    def _fine_ok(self, fs, xp):
        """Run the fine-block kernel?  Only when mode='fine' pins it
        (A/B experiments): on-chip A/B showed it losing 2.6-11x to the
        dense_tile/resident paths at the canonical b8/b16 N=64 rows
        (results_fine_ab.json; see the build-time comment).  Requires
        the VMEM working set (x + f32 acc + out + W tiles) to fit."""
        if fs is None or self.mode != "fine":
            return False
        N = xp.shape[1]
        if N > 128 and N % 128:
            return False
        TN = N if N <= 128 else 128
        return bsmm_kernels.fine_vmem_estimate(
            xp.shape[0], fs.n_out_blocks + 1, TN, xp.dtype.itemsize,
            fs, self.bsize, xp.dtype.itemsize) <= bsmm_kernels.VMEM_LIMIT

    def dispatch_mode(self, N, itemsize=2):
        """The kernel the fprop dispatch will actually pick for a
        minibatch of N columns — mirrors `_fprop_impl`'s decision tree
        without running it.  Diagnostic only (benchmark row labels):
        the build-time `mode_f` can't see the dynamic fine/resident
        selection that depends on N and dtype."""
        N_pad = N if N % 8 == 0 else round_up(N, 64 if N > 32 else 8)

        class _Shim:
            shape = (self.C, N_pad)
            dtype = jnp.dtype(jnp.bfloat16 if itemsize == 2
                              else jnp.float32)
        if self._fine_ok(self.fprop_fine, _Shim):
            return "fine"
        if self.mode_f == "window":
            return "window"
        if self.mode_f in ("dense_tile", "resident"):
            if self.mode_f == "resident" or (N_pad <= 512
                                             and self.bsize <= 64):
                TN = bsmm_kernels.resident_pick_tile(
                    self.C, N_pad, itemsize, sched=self.fprop_dt,
                    bsize=self.bsize, out_itemsize=itemsize)
                if TN is not None and (self.mode_f == "resident"
                                       or TN == N_pad):
                    return "resident"
            if self._dt_tile(self.C, self.fprop_dt, N_pad,
                             itemsize) is not None:
                return "dense_tile"
        return "grouped"

    def _fprop_impl(self, x, w):
        """Mosaic requires the minor block dim be lane-sized, so the Pallas
        path always runs feature-major (CN); axis=1 transposes around it
        (XLA fuses these with neighbors where possible).

        This is the TPU-native answer to the reference's dedicated NC
        kernel family (/root/reference/src/blocksparse_hgemm_nc_op_gpu.cu):
        a lane-minor NC kernel would read (TN, bsize)-shaped x slots whose
        32-lane minor dim quarter-fills the 128-lane VPU/MXU tiles, so the
        transpose wrappers are strictly cheaper.  Measured on the bench
        chip (tools/tpu_axis_bench.py, 8192^2/b32/d0.25/bf16/N=2048):
        axis=1 is within 1% of axis=0 on the fwd+bwd training path — the
        two transposes are ~4% of kernel DMA volume and overlap with it.
        """
        impl = self.impl or _default_impl()
        if impl == "pallas":
            # IEEE fp16 (the reference's ehalf fast path, gpu_types.h:15)
            # has no MXU format on TPU and Mosaic rejects f16 dots: run
            # the kernels in bfloat16 — the TPU's half-precision fast
            # path — and emit f16.  (XLA fallback path takes f16 as-is.)
            out_dt = x.dtype
            if out_dt == jnp.float16:
                x = x.astype(jnp.bfloat16)
                w = w.astype(jnp.bfloat16)
            xcn = x if self.axis == 0 else x.T
            xp, n0 = self._pallas_pad(xcn, True)
            y = None
            grouped_packed = self.w_layout == "fprop_packed" \
                and not self._panels_f
            if self._fine_ok(self.fprop_fine, xp):
                panels = bsmm_kernels.fine_panels(
                    self._canonical_w(w), self.fprop_fine, True)
                y = bsmm_kernels.xprop_pallas_fine(
                    xp, panels, self.fprop_fine, self.bsize,
                    out_dtype=x.dtype)
            if y is None and self.mode_f == "window":
                TN = self._win_tile(self.fprop_dt, xp.shape[1],
                                    xp.dtype.itemsize)
                if TN is not None:
                    if self.w_layout == "fprop_packed":
                        panels = w
                    else:
                        panels = dense_tile_panels(w, self.fprop_dt, False)
                    y = bsmm_kernels.xprop_pallas_window(
                        xp, panels, self.fprop_dt, self.bsize, tile_n=TN,
                        out_dtype=x.dtype)
                else:
                    w = self._canonical_w(w)
            elif y is None and self.mode_f in ("dense_tile", "resident"):
                res = self.mode_f == "resident" or (
                    xp.shape[1] <= 512 and self.bsize <= 64)
                if res:
                    TN = bsmm_kernels.resident_pick_tile(
                        xp.shape[0], xp.shape[1], xp.dtype.itemsize,
                        sched=self.fprop_dt, bsize=self.bsize,
                        out_itemsize=x.dtype.itemsize)
                    if TN is None:   # working set too big: per-slot
                        res = False
                    elif self.mode_f != "resident" and TN != xp.shape[1]:
                        # small-N auto-switch only when the WHOLE x is
                        # resident in one tile: measured wins at N<=512
                        # (per-slot pays chunks x G sub-KB slot-DMA
                        # issue overhead there), losses once x spans
                        # n-tiles (results_smalln.json, BENCH_NOTES
                        # resident close-out)
                        res = False
                if not res:
                    TN = self._dt_tile(self.C, self.fprop_dt, xp.shape[1],
                                       xp.dtype.itemsize)
                if TN is not None:
                    if self.w_layout == "fprop_packed":
                        panels = w
                    else:
                        panels = dense_tile_panels(w, self.fprop_dt, False)
                    y = bsmm_kernels.xprop_pallas_dense_tile(
                        xp, panels, self.fprop_dt, self.bsize, tile_n=TN,
                        out_dtype=x.dtype, resident=res)
                else:
                    # panel exceeds VMEM: fall back to the grouped path
                    w = self._canonical_w(w)
            if y is None:
                TN = self._grouped_tile(self.C, self.fprop_grouped,
                                        xp.shape[1], xp.dtype.itemsize)
                if TN is not None:
                    xp = self._pad_rows_for(xp, self.fprop_grouped)
                    if grouped_packed:
                        panels = fprop_panels_from_packed(
                            w, self.fprop_grouped)
                        y = bsmm_kernels.xprop_pallas_grouped_panels(
                            xp, panels, self.fprop_grouped, self.bsize,
                            False, tile_n=TN, out_dtype=x.dtype)
                    else:
                        y = bsmm_kernels.xprop_pallas_grouped(
                            xp, w, self.fprop_grouped, self.bsize, False,
                            tile_n=TN, out_dtype=x.dtype)
                else:
                    wc = self.unpack_weights(w) if grouped_packed else w
                    y = bsmm_kernels.xprop_pallas(
                        xp, wc, self.fprop_sched, self.bsize,
                        False, self.KB, tile_n=self.tile_n)
            y = y[:, :n0].astype(out_dt)
            return y if self.axis == 0 else y.T
        ib, wb, ob = self._fprop_flat
        return bsmm_kernels.xprop_xla(x, self._canonical_w(w), ib, wb, ob,
                                      self.KB, self.bsize,
                                      self.axis, False, out_dtype=x.dtype)

    def _bprop_impl(self, dy, w):
        impl = self.impl or _default_impl()
        if impl == "pallas":
            out_dt = dy.dtype
            if out_dt == jnp.float16:   # see _fprop_impl
                dy = dy.astype(jnp.bfloat16)
                w = w.astype(jnp.bfloat16)
            dycn = dy if self.axis == 0 else dy.T
            dyp, n0 = self._pallas_pad(dycn, True)
            dx = None
            dt_packed = self.w_layout == "fprop_packed" \
                and self._panels_f
            grouped_packed = self.w_layout == "fprop_packed" \
                and not dt_packed
            if self._fine_ok(self.bprop_fine, dyp):
                panels = bsmm_kernels.fine_panels(
                    self._canonical_w(w), self.bprop_fine, False)
                dx = bsmm_kernels.xprop_pallas_fine(
                    dyp, panels, self.bprop_fine, self.bsize,
                    out_dtype=dy.dtype)
            if dx is None and self.mode_b in ("dense_tile", "window",
                                              "resident"):
                res = self.mode_b == "resident" or (
                    self.mode_b == "dense_tile" and dyp.shape[1] <= 512
                    and self.bsize <= 64)
                if self.mode_b == "window":
                    res = False
                    TN = self._win_tile(self.bprop_dt, dyp.shape[1],
                                        dyp.dtype.itemsize)
                else:
                    if res:
                        TN = bsmm_kernels.resident_pick_tile(
                            dyp.shape[0], dyp.shape[1], dyp.dtype.itemsize,
                            sched=self.bprop_dt, bsize=self.bsize,
                            out_itemsize=dy.dtype.itemsize)
                        if TN is None:
                            res = False
                        elif self.mode_b != "resident" \
                                and TN != dyp.shape[1]:
                            # small-N auto-switch (see _fprop)
                            res = False
                    if not res:
                        TN = self._dt_tile(self.K, self.bprop_dt,
                                           dyp.shape[1], dyp.dtype.itemsize)
                if TN is not None:
                    if dt_packed:
                        # store cells are W^T: re-gather, transposing back
                        pv = dense_tile_blocks_view(w, self.fprop_dt,
                                                    self.bsize)
                        panels = dense_tile_panels(
                            pv, self.bprop_dt, True,
                            wpos=self._bprop_dt_wpos_packed,
                            trans_cells=True)
                    elif grouped_packed:
                        panels = dense_tile_panels(
                            w, self.bprop_dt, True,
                            wpos=self._bprop_dt_wpos_packed)
                    else:
                        panels = dense_tile_panels(w, self.bprop_dt, True)
                    if self.mode_b == "window":
                        dx = bsmm_kernels.xprop_pallas_window(
                            dyp, panels, self.bprop_dt, self.bsize,
                            tile_n=TN, out_dtype=dy.dtype)
                    else:
                        dx = bsmm_kernels.xprop_pallas_dense_tile(
                            dyp, panels, self.bprop_dt, self.bsize,
                            tile_n=TN, out_dtype=dy.dtype, resident=res)
            if dx is None:
                if dt_packed:
                    w = self.unpack_weights(w)
                TN = self._grouped_tile(self.K, self.bprop_grouped,
                                        dyp.shape[1], dyp.dtype.itemsize)
                if TN is not None:
                    bsched = self.bprop_grouped_packed \
                        if grouped_packed else self.bprop_grouped
                    dyp = self._pad_rows_for(dyp, bsched)
                    dx = bsmm_kernels.xprop_pallas_grouped(
                        dyp, w, bsched, self.bsize, True,
                        tile_n=TN, out_dtype=dy.dtype)
                else:
                    wc = self.unpack_weights(w) if grouped_packed else w
                    dx = bsmm_kernels.xprop_pallas(
                        dyp, wc, self.bprop_sched, self.bsize,
                        True, self.CB, tile_n=self.tile_n)
            dx = dx[:, :n0].astype(out_dt)
            return dx if self.axis == 0 else dx.T
        ib, wb, ob = self._bprop_flat
        return bsmm_kernels.xprop_xla(dy, self._canonical_w(w), ib, wb, ob,
                                      self.CB, self.bsize,
                                      self.axis, True, out_dtype=dy.dtype)

    def _updat_impl(self, x, dy):
        impl = self.impl or _default_impl()
        if impl == "pallas":
            if x.dtype == jnp.float16:   # see _fprop_impl
                x = x.astype(jnp.bfloat16)
            if dy.dtype == jnp.float16:
                dy = dy.astype(jnp.bfloat16)
            xcn = x if self.axis == 0 else x.T
            dycn = dy if self.axis == 0 else dy.T
            xp, _ = self._pallas_pad(xcn, True)
            dyp, _ = self._pallas_pad(dycn, True)
            grouped_packed = self.w_layout == "fprop_packed" \
                and not self._panels_f
            if self.mode_u == "dense_tile":
                udt = self.updat_dt
                M = udt.R * self.bsize
                panel = 2 * udt.CH * M * udt.G * self.bsize * 4
                TN = self.tile_n \
                    or bsmm_kernels.dense_tile_pick_tile(xp.shape[1], 1024)

                def _est(tn):
                    return (2 * (M + self.K) * tn
                            * xp.dtype.itemsize + panel
                            + udt.G * self.bsize * tn * xp.dtype.itemsize)

                while _est(TN) > 13 * 1024 * 1024 and TN > 128 and TN % 2 == 0:
                    TN //= 2
                if _est(TN) <= 13 * 1024 * 1024:
                    dw = bsmm_kernels.updat_pallas_dense_tile(
                        xp, dyp, udt, self.bsize, tile_n=TN)
                    return self._repack_dw(dw)
            TN = self.tile_n or pick_tile(xp.shape[1])
            usch = self.updat_grouped
            est = (2 * (self.C + self.K) * TN * xp.dtype.itemsize
                   + 2 * usch.CH * usch.G * self.bsize * self.bsize * 4)
            while est > 13 * 1024 * 1024 and TN > 128 and TN % 2 == 0:
                TN //= 2
                est = (2 * (self.C + self.K) * TN * xp.dtype.itemsize
                       + 2 * usch.CH * usch.G * self.bsize * self.bsize * 4)
            if est <= 13 * 1024 * 1024:
                if grouped_packed:
                    return bsmm_kernels.updat_pallas_grouped(
                        xp, dyp, self.updat_grouped_packed, self.bsize,
                        self.blocks, tile_n=TN)
                dw = bsmm_kernels.updat_pallas_grouped(
                    xp, dyp, self.updat_grouped, self.bsize, self.blocks,
                    tile_n=TN)
                return self._repack_dw(dw)
            dw = bsmm_kernels.updat_pallas(xp, dyp, self.updat_lut,
                                           self.bsize, tile_n=self.tile_n)
            return self._repack_dw(dw)
        return self._repack_dw(bsmm_kernels.updat_xla(
            x, dy, self.updat_lut, self.bsize, self.axis))

    def _repack_dw(self, dw_canonical):
        """Canonical (blocks,b,b) dw -> the packed weight layout."""
        if self.w_layout != "fprop_packed":
            return dw_canonical
        if self._panels_f:
            return dense_tile_panels(dw_canonical, self.fprop_dt,
                                     trans_w=False)
        out = jnp.zeros(self.w_shape, dw_canonical.dtype)
        return out.at[jnp.asarray(self._packed_pos)].set(dw_canonical)

    # ---------------- public call ----------------

    def matmul(self, I, W, **kwargs):
        return self.__call__(I, W, **kwargs)

    def __call__(self, I, W, gate=None, gate_grad=False, dw_gated=False,
                 name=None, bench=0):
        self.count += 1
        x2d, unflatten = self._flatten_io(I, self.C)
        if gate is None:
            y = self._bsmm(x2d, W)
        elif isinstance(gate, np.ndarray) and dw_gated and not gate_grad:
            # static gate: rebuild pruned schedules so gate==0 blocks are
            # skipped entirely (the reference's gated kernels' compute
            # skip, src/blocksparse_matmul_op.cc:186-215) — FLOPs scale
            # with the surviving density.  Cached per gate content;
            # changing the gate retraces (matches blocksparse_prune's
            # frequency semantics: prune events are rare).
            y = self._static_gated(gate)(x2d, W)
        else:
            y = self._bsmm_gated(dw_gated, gate_grad)(x2d, W, gate)
        return unflatten(y)

    def _static_gated(self, gate):
        cache = getattr(self, "_static_gate_cache", None)
        if cache is None:
            cache = self._static_gate_cache = {}
        key = np.asarray(gate).tobytes()
        if key in cache:
            return cache[key]
        op = self
        keep = np.nonzero(np.asarray(gate) != 0)[0]
        b = self.bsize

        if keep.size == 0:
            @jax.custom_vjp
            def f0(x, w):
                y_rows = op.o_shape(1)[1 if op.axis else 0]
                shp = (x.shape[0], y_rows) if op.axis else \
                    (y_rows, x.shape[1])
                return jnp.zeros(shp, x.dtype)

            def fwd0(x, w):
                return f0(x, w), (x, w)

            def bwd0(res, dy):
                x, w = res
                return jnp.zeros_like(x), jnp.zeros_like(w)
            f0.defvjp(fwd0, bwd0)
            cache[key] = f0
            return f0

        sub_layout = np.zeros(self.layout.shape, np.int32)
        for i in keep:
            c, k = self.updat_list[i]
            sub_layout[c, k] = 1
        sub = BlocksparseMatMul(sub_layout, self.bsize, self.axis,
                                z_order=self.z_order, impl=self.impl,
                                tile_n=self.tile_n, mode=self.mode)
        orig_of = {coord: w for w, coord in enumerate(self.updat_list)}
        sub_to_orig = jnp.asarray(
            np.array([orig_of[c] for c in sub.updat_list], np.int32))
        gv = jnp.asarray(np.asarray(gate, np.float32)[
            np.array([orig_of[c] for c in sub.updat_list])])

        @jax.custom_vjp
        def f(x, w):
            wc = op._canonical_w(w)
            ws = (wc[sub_to_orig].astype(jnp.float32)
                  * gv[:, None, None]).astype(wc.dtype)
            return sub._fprop_impl(x, ws)

        def fwd(x, w):
            return f(x, w), (x, w)

        def bwd(res, dy):
            x, w = res
            wc = op._canonical_w(w)
            ws = (wc[sub_to_orig].astype(jnp.float32)
                  * gv[:, None, None]).astype(wc.dtype)
            dx = sub._bprop_impl(dy, ws).astype(x.dtype)
            dws = sub._updat_impl(x, dy) * gv[:, None, None]  # dw_gated
            dw_can = jnp.zeros((op.blocks, b, b), dws.dtype) \
                .at[sub_to_orig].set(dws)
            dw = op._repack_dw(dw_can)
            return dx, dw.astype(w.dtype)

        f.defvjp(fwd, bwd)
        cache[key] = f
        return f

    def _flatten_io(self, x, feat):
        """Collapse extra dims around the feature axis; returns (x2d, restore)."""
        shape = x.shape
        if self.axis == 0:
            assert shape[0] == feat, (shape, feat)
            x2d = x.reshape(feat, -1)

            def restore(y):
                return y.reshape((y.shape[0],) + tuple(shape[1:]))
        else:
            assert shape[-1] == feat, (shape, feat)
            x2d = x.reshape(-1, feat)

            def restore(y):
                return y.reshape(tuple(shape[:-1]) + (y.shape[-1],))
        return x2d, restore

    @functools.cached_property
    def _bsmm(self):
        op = self

        @jax.custom_vjp
        def bsmm(x, w):
            return op._fprop_impl(x, w)

        def fwd(x, w):
            return op._fprop_impl(x, w), (x, w)

        def bwd(res, dy):
            x, w = res
            dx = op._bprop_impl(dy, w)
            dw = op._updat_impl(x, dy).astype(w.dtype)
            return dx.astype(x.dtype), dw

        bsmm.defvjp(fwd, bwd)
        return bsmm

    def _bsmm_gated(self, dw_gated, gate_grad):
        key = (bool(dw_gated), bool(gate_grad))
        cache = getattr(self, "_gated_cache", None)
        if cache is None:
            cache = self._gated_cache = {}
        if key in cache:
            return cache[key]
        op = self

        def gate_mult(gate):
            """Per-element multiplier shaped like the weight store."""
            g32 = gate.astype(jnp.float32)
            if op.w_layout != "fprop_packed":
                return g32[:, None, None]
            if op._panels_f:
                fdt = op.fprop_dt
                b = op.bsize
                S = fdt.num_chunks
                ge = jnp.concatenate([g32, jnp.zeros((1,), jnp.float32)])
                cells = ge[jnp.asarray(fdt.wpos)]     # (S, R, G)
                gp = jnp.broadcast_to(
                    cells[:, :, None, :, None],
                    (S, fdt.R, b, fdt.G, b))
                return gp.reshape(op.w_shape)
            out = jnp.zeros((op.w_shape[0],), jnp.float32)
            return out.at[jnp.asarray(op._packed_pos)].set(g32)[:, None, None]

        def gate_from_store(dg_store):
            """Per-element store array -> per-block (blocks,) sums."""
            if op.w_layout != "fprop_packed":
                return jnp.sum(dg_store, axis=(1, 2))
            if op._panels_f:
                pv = dense_tile_blocks_view(dg_store, op.fprop_dt, op.bsize)
                return jnp.sum(pv, axis=(1, 2))[jnp.asarray(op._dt_flat_pos)]
            return jnp.sum(dg_store, axis=(1, 2))[jnp.asarray(op._packed_pos)]

        @jax.custom_vjp
        def bsmm_gated(x, w, gate):
            wg = (w.astype(jnp.float32) * gate_mult(gate)).astype(w.dtype)
            return op._fprop_impl(x, wg)

        def fwd(x, w, gate):
            return bsmm_gated(x, w, gate), (x, w, gate)

        def bwd(res, dy):
            x, w, gate = res
            gm = gate_mult(gate)
            wg = (w.astype(jnp.float32) * gm).astype(w.dtype)
            dx = op._bprop_impl(dy, wg).astype(x.dtype)
            dw_raw = op._updat_impl(x, dy)
            if dw_gated:
                dw = dw_raw * gm
            else:
                dw = dw_raw
            if gate_grad:
                dg = gate_from_store(dw_raw * w.astype(jnp.float32))
            else:
                dg = jnp.zeros_like(gate)
            return dx, dw.astype(w.dtype), dg.astype(gate.dtype)

        bsmm_gated.defvjp(fwd, bwd)
        cache[key] = bsmm_gated
        return bsmm_gated


# ------------------------------------------------------------------
# Graph-rewrite shims.  Under JAX, dw accumulation across shared-weight
# applications (RNN timesteps) happens automatically through scan/AD;
# these exist for API familiarity.
# ------------------------------------------------------------------

def group_param_grads(param_grad, group_size=8):
    """No-op under JAX: grads of shared weights are already accumulated.

    The reference rewrites the TF graph to chain BlocksparseMatmulDW(A) ops
    (matmul.py:612-731).  With ``jax.lax.scan`` the dw accumulation is the
    scan carry, which XLA schedules in-place.
    """
    return param_grad


def group_dg_grads(gate_grad, group_size=8):
    """No-op under JAX (gate-grad analog of :func:`group_param_grads`).

    The reference rewrites chained BlocksparseMatmulDG ops for shared
    gates (matmul.py:733-777); JAX accumulates shared-gate cotangents
    automatically.
    """
    return gate_grad


def get_bsmm_dx_ops(param_grad):
    raise NotImplementedError(
        "graph introspection has no JAX equivalent; use jax.grad directly")


def block_reduced_full_dw(xs, gs, bsize=32, axis=0, norm="max", scale=1.0):
    """Block-norm-reduced *full* dw for network growth.

    Reference: BlocksparseReducedDW (src/blocksparse_matmul_op.cc:639),
    driven by the graph rewrite in matmul.py:556-609.  Here it is a pure
    function of the activation / grad tensor lists: computes the dense
    dw = sum_t x_t·g_t^T, then reduces each (bsize, bsize) block to its
    max-abs or L2 norm, returning a (CB, KB) array used to pick blocks for
    growing the layout.
    """
    assert len(xs) == len(gs)
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST
    acc = None
    for x, g in zip(xs, gs):
        if axis == 0:
            d = jnp.einsum("cn,kn->ck", x.astype(f32), g.astype(f32),
                           precision=prec)
        else:
            d = jnp.einsum("nc,nk->ck", x.astype(f32), g.astype(f32),
                           precision=prec)
        acc = d if acc is None else acc + d
    C, K = acc.shape
    blk = acc.reshape(C // bsize, bsize, K // bsize, bsize)
    if norm.lower() == "max":
        out = jnp.max(jnp.abs(blk), axis=(1, 3))
    else:
        out = jnp.sqrt(jnp.sum(jnp.square(blk), axis=(1, 3)))
    return out * scale


# ------------------------------------------------------------------
# SparseProj: 1-to-1 dense<->sparse feature projections
# (reference matmul.py:835-921).  Feature-major: x is (nhidden, ...).
# ------------------------------------------------------------------

class SparseProj:

    def __getstate__(self):
        return (self.nhidden, self.nproj, self.gather_lut, self.name)

    def __setstate__(self, state):
        self.__init__(state[0], nproj=None, gather_lut=state[2], name=state[3])

    def __init__(self, nhidden, nproj=None, proj_stride=None, block_size=32,
                 gather_lut=None, name=None):
        if gather_lut is None:
            gather_lut = np.arange(nhidden, dtype=np.int32)
            if nproj is not None:
                assert nproj <= nhidden
                np.random.shuffle(gather_lut)
                gather_lut = np.sort(gather_lut[0:nproj])
            elif proj_stride is not None:
                assert 1 <= proj_stride <= nhidden
                gather_max = ((nhidden // proj_stride) // block_size) \
                    * block_size * proj_stride
                gather_lut = gather_lut[:gather_max:proj_stride].copy()
            else:
                raise ValueError("missing nproj, proj_stride or gather_lut")
        gather_lut = np.asarray(gather_lut, dtype=np.int32)
        nproj = gather_lut.size

        scatter_lut = np.full(nhidden, -1, dtype=np.int32)
        scatter_lut[gather_lut] = np.arange(nproj, dtype=np.int32)

        self.name = name or "SparseProj"
        self.gather_lut = gather_lut
        self.scatter_lut = scatter_lut
        self.nhidden = nhidden
        self.nproj = nproj

    def gather(self, x):
        assert x.shape[0] == self.nhidden
        return jnp.take(x, jnp.asarray(self.gather_lut), axis=0)

    def scatter(self, x):
        assert x.shape[0] == self.nproj
        out_shape = (self.nhidden,) + tuple(x.shape[1:])
        return jnp.zeros(out_shape, x.dtype).at[jnp.asarray(self.gather_lut)].set(x)

    def scatter_add(self, x, y):
        assert x.shape[0] == self.nhidden
        assert y.shape[0] == self.nproj
        return x.at[jnp.asarray(self.gather_lut)].add(y)

    def scatter_mul(self, x, y):
        assert x.shape[0] == self.nhidden
        assert y.shape[0] == self.nproj
        return x.at[jnp.asarray(self.gather_lut)].multiply(y)


def dw_matmul_large_n(x, dy, precision=None):
    """fp32-accurate dense dw for very large N (reference
    dw_matmul_large_n, src/matmul_op.cc:21): dw = x^T @ dy with float32
    accumulation regardless of input dtype.  On TPU this is one
    dot_general with f32 preferred type; the reference needed a custom
    kernel because fp16 tensorcore accumulation saturated."""
    prec = precision or jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def coarsen_layout(layout, bsize, target=128):
    """Lift a fine block layout to ``target``-sized blocks.

    Returns (coarse_layout, pack_w, unpack_w): a (CB', KB') 0/1 layout at
    the coarse block size plus converters between the fine (blocks, b, b)
    weight array (ordered like BlocksparseMatMul(layout, bsize)) and the
    coarse (blocks', target, target) array (ordered like
    BlocksparseMatMul(coarse_layout, target)), absent fine blocks zero.

    Why: blocks smaller than 128 fill only bsize/128 of the MXU output
    lanes per pass; when the layout has 2-D locality (banded, local,
    low-rank-ish), coarsening trades a little padding compute for full
    MXU tiles.  The fill factor is nnz_fine / (nnz_coarse * (target/b)^2)
    — coarsen when that stays high."""
    V = target // bsize
    assert target % bsize == 0 and V >= 1
    layout = (np.asarray(layout) != 0).astype(np.int32)
    CB, KB = layout.shape
    CBp, KBp = ceil_div(CB, V), ceil_div(KB, V)
    pad = np.zeros((CBp * V, KBp * V), np.int32)
    pad[:CB, :KB] = layout
    coarse = pad.reshape(CBp, V, KBp, V).max(axis=(1, 3))

    fine = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0)
    co = BlocksparseMatMul(coarse, block_size=target, feature_axis=0)

    # map each fine block id -> (coarse block id, row off, col off)
    coarse_id = {cc: i for i, cc in enumerate(co.updat_list)}
    fmap = []
    for w, (c, k) in enumerate(fine.updat_list):
        cid = coarse_id[(c // V, k // V)]
        fmap.append((cid, (c % V) * bsize, (k % V) * bsize))

    def pack_w(w_fine):
        w_fine = np.asarray(w_fine)
        out = np.zeros((co.blocks, target, target), w_fine.dtype)
        for w, (cid, ro, cv) in enumerate(fmap):
            out[cid, ro:ro + bsize, cv:cv + bsize] = w_fine[w]
        return out

    def unpack_w(w_coarse):
        w_coarse = np.asarray(w_coarse)
        out = np.zeros((fine.blocks, bsize, bsize), w_coarse.dtype)
        for w, (cid, ro, cv) in enumerate(fmap):
            out[w] = w_coarse[cid, ro:ro + bsize, cv:cv + bsize]
        return out

    fill = fine.blocks / (co.blocks * V * V)
    return coarse, pack_w, unpack_w, fill
