"""Block-sparse transformer attention + dense softmax family.

TPU-native equivalent of /root/reference/blocksparse/transformer.py
(kernels: src/bst_hgemm_op_gpu.cu, src/bst_sgemm_op_gpu.cu,
src/bst_softmax_op_gpu.cu, src/transformer_op_gpu.cu).

API parity surface:
* ``BlocksparseTransformer`` with per-head (or shared) block layouts,
  ``nt_op``/``nn_op``/``tn_op`` (a.k.a. query_key / weight_value),
  blocked ``softmax``/``masked_softmax`` with bit-mask callbacks and
  dynamic ``autoregress_at_key`` re-masking, and NumPy goldens.
* dense ``softmax``/``masked_softmax``/``masked_top_k_softmax``/
  ``top_k``/``rectified_top_k``, fused ``softmax_cross_entropy``, and
  the transpose helpers.

Implementation notes (TPU-first):
* The unfused blocked ops materialize the (batch, heads, blocks, bs, bs)
  score tensor exactly like the reference, computed as gathered batched
  matmuls + segment-sums — all MXU work under XLA.  The fused
  flash-style path (kernels/bst_attn.py) streams K/V blocks per the LUT
  and never materializes scores; it also lifts the reference's 32K-key
  softmax-row limit (src/bst_op.cc:383).
* Blocked softmax reductions run as per-head segment reductions over the
  q-block rows (the LUT rows are contiguous by construction, matching
  the reference's row-major nt_list ordering).
* Masks are stored both bit-packed (``softmax_mask`` / ``softmax_mask_np``
  for API/golden parity, reference transformer.py:135-159) and as dense
  bool blocks for the kernels.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sparse
import jax
import jax.numpy as jnp

_NEG_MAX = -np.finfo(np.float32).max


def sparse_coo_to_dense(coords, nq, nk):
    a = np.zeros((nq, nk), np.int32)
    for (q, k) in coords:
        a[q, k] = 1
    return a


class BlocksparseTransformer:

    def __getstate__(self):
        # picklable (the reference left this as a TODO,
        # transformer.py:53-59): layouts + masks fully determine state
        return {"layout": np.stack([np.asarray(
                    sparse_coo_to_dense(self.nt_list[h], self.ctx_blks_q,
                                        self.ctx_blks_k))
                    for h in range(self.lut_heads)]),
                "block_size": self.blk_size,
                "heads": self.heads,
                "mask_blocks": self._mask_blocks,
                "name": self.name,
                "impl": self.impl,
                "q_mult": self.q_mult}

    def __setstate__(self, state):
        mask_blocks = state["mask_blocks"]
        cb = None
        if mask_blocks is not None:
            blk_of = {}

            def cb(blk_shape, head, qry, key, blk):
                return np.asarray(mask_blocks[head][blk])
        self.__init__(state["layout"], state["block_size"], state["heads"],
                      cb, state["name"], state.get("impl"),
                      state.get("q_mult"))

    def __init__(self, layout, block_size=64, heads=None, mask_callback=None,
                 name=None, impl=None, q_mult=None):
        # impl: None = auto (Pallas kernels on TPU, XLA elsewhere);
        # "pallas" | "xla" force a path for the unfused nt/nn/tn trio.
        # q_mult: fused-kernel row pairing (kernels/bst_attn.py
        # AttnSchedule.q_mult) — None = auto (pair q rows in fwd/dq and
        # k rows in dkv whenever the respective row count is even; both
        # resident and stream kernels), 1 = never, 2 = pin.  Amortizes
        # the per-row fixed cost measured at 41% of a sparse row
        # (results_attn_breakdown.json) and halves stream DMA chunks:
        # on-chip 1.45x sparse fwd / 1.60x causal-flash fwd
        # (results_qpair_ab.json).
        self.impl = impl
        self.q_mult = q_mult
        self._pl_scheds = None
        layout = np.asarray(layout)
        if layout.ndim == 2:
            assert heads is not None, \
                "heads must be explicitly specified when using shared layouts per head"
            layout = np.expand_dims(layout, 0)
        if heads is None:
            heads = layout.shape[0]

        assert block_size in (8, 16, 32, 64), \
            "Block sizes of 8, 16, 32 and 64 currently supported"
        assert layout.ndim == 3, "bad layout shape: " + str(layout.shape)

        self.blk_size = block_size
        self.name = name
        self.heads = heads
        self.lut_heads = layout.shape[0]
        self.ctx_blks_q = layout.shape[1]
        self.ctx_blks_k = layout.shape[2]
        self.blk_shape = (block_size, block_size)
        self.nn_max = 0
        self.tn_max = 0

        if layout.dtype != np.int32:
            layout = layout.astype(np.int32)

        self.nt_lut = []
        self.nn_lut = []
        self.tn_lut = []
        self.nt_list = []
        self.nn_list = []
        self.tn_list = []
        blocks = None
        for head in range(layout.shape[0]):
            csr = sparse.csr_matrix(layout[head])
            ys, xs, bs = sparse.find(csr)
            if blocks is None:
                blocks = len(bs)
            else:
                assert len(bs) == blocks, \
                    "number of layout blocks must be equal across heads"

            # blocks contiguous along the rows (blocked softmax and the
            # fused kernel both leverage this)
            nt_list = sorted(zip(ys.tolist(), xs.tolist()))
            ys = [b[0] for b in nt_list]
            xs = [b[1] for b in nt_list]

            nt_lut = np.array(nt_list, dtype=np.int32)
            nn_lut, nn_list, nn_max = self.xn_lut(ys, xs, blocks,
                                                  self.ctx_blks_q)
            tn_lut, tn_list, tn_max = self.xn_lut(xs, ys, blocks,
                                                  self.ctx_blks_k)

            self.nt_lut.append(nt_lut)
            self.nn_lut.append(nn_lut)
            self.tn_lut.append(tn_lut)
            self.nt_list.append(nt_list)
            self.nn_list.append(nn_list)
            self.tn_list.append(tn_list)
            self.nn_max = max(self.nn_max, nn_max)
            self.tn_max = max(self.tn_max, tn_max)

        self.blocks = blocks
        self.nt_lut = np.array(self.nt_lut, dtype=np.int32)

        # flat per-head gather arrays for the XLA impls
        self._q_blk = self.nt_lut[:, :, 0]          # (lut_heads, blocks)
        self._k_blk = self.nt_lut[:, :, 1]

        if mask_callback is not None:
            self.init_softmax_mask(mask_callback)
        else:
            self.softmax_mask = None
            self.softmax_mask_np = None
            self._mask_blocks = None

    # ------------- LUT building (parity: reference transformer.py:161) ----

    def xn_lut(self, ys, xs, blocks, ctx_blks):
        py_lut = [list() for _ in range(ctx_blks)]
        for b in range(blocks):
            py_lut[ys[b]].append((b, xs[b]))
        max_lut = 0
        offset = ctx_blks
        np_lut = np.empty((offset + blocks, 2), dtype=np.int32)
        for i, lut in enumerate(py_lut):
            np_lut[i] = offset, len(lut)
            max_lut = max(max_lut, len(lut))
            for entry in lut:
                np_lut[offset] = entry
                offset += 1
        return np_lut, py_lut, max_lut

    def init_softmax_mask(self, mask_callback):
        if self.blk_size == 64:
            dtype = np.uint64
        elif self.blk_size == 32:
            dtype = np.uint32
        elif self.blk_size == 16:
            dtype = np.uint16
        else:
            dtype = np.uint8

        masks = []
        dense = []
        for h in range(self.lut_heads):
            head_mask = []
            head_dense = []
            for b, (q, k) in enumerate(self.nt_list[h]):
                mask = mask_callback(self.blk_shape, h, q, k, b)
                bits = np.packbits(mask.reshape(-1, 8)[:, ::-1]).view(dtype)
                head_mask.append(bits)
                head_dense.append(mask.astype(bool))
            masks.append(head_mask)
            dense.append(head_dense)

        # numpy mask for test code: (heads, blocks, blk_size)
        self.softmax_mask_np = np.array(masks, dtype=dtype)
        # kernel-order parity: (heads, blk_size, blocks)
        self.softmax_mask = np.transpose(
            self.softmax_mask_np, [0, 2, 1]).copy()
        # dense bool blocks for the TPU kernels:
        self._mask_blocks = np.array(dense, dtype=bool)

    def block_coord(self, block, head=0):
        return self.nt_list[head][block]

    # ------------- shape plumbing ----------------

    def _split_heads(self, a, ctx_blks):
        """(batch, ctx, state) -> (batch, heads, ctx_blks, bs, hs)"""
        batch, ctx, state = a.shape
        bs = self.blk_size
        assert ctx == ctx_blks * bs, (a.shape, ctx_blks, bs)
        hs = state // self.heads
        a5 = a.reshape(batch, ctx_blks, bs, self.heads, hs)
        return a5.transpose(0, 3, 1, 2, 4)

    def _merge_heads(self, a5):
        """(batch, heads, ctx_blks, bs, hs) -> (batch, ctx, state)"""
        batch, heads, ctx_blks, bs, hs = a5.shape
        return a5.transpose(0, 2, 3, 1, 4).reshape(
            batch, ctx_blks * bs, heads * hs)

    def _head_gather(self, a5, blk_idx):
        """Gather ctx blocks per head: blk_idx (lut_heads, blocks) ->
        (batch, heads, blocks, bs, hs)."""
        idx = jnp.asarray(blk_idx)
        if self.lut_heads == 1:
            g = jnp.take(a5, idx[0], axis=2)
        else:
            g = jnp.take_along_axis(
                a5, idx[None, :, :, None, None], axis=2)
        return g

    def _per_head(self, arr):
        """(lut_heads, ...) numpy -> broadcastable over self.heads"""
        return arr if self.lut_heads > 1 else arr

    # ------------- core ops ----------------

    def nt_op(self, a, b, name=None, bench=0):
        """scores[n,h,blk] = q_blk @ k_blk^T  (dense x dense -> sparse)."""
        return _bst_nt(self, a, b)

    query_key_op = nt_op

    def nn_op(self, a, b, name=None, bench=0):
        """y = sum over blocks: w_blk @ v_blk  (sparse x dense -> dense)."""
        return _bst_nn(self, a, b)

    weight_value_op = nn_op

    def tn_op(self, a, b, name=None, bench=0):
        """Transposed-sparse x dense -> dense (gradient op)."""
        return _bst_tn(self, a, b)

    # ------------- blocked softmax ----------------

    def _softmax_imp(self, x, scale, mask_blocks):
        """x: (batch, heads, blocks, bs, bs) -> softmax over each q row's
        visible keys (all blocks of that row x in-block columns)."""
        f32 = jnp.float32
        bs = self.blk_size
        xs = x.astype(f32) * jnp.asarray(scale, f32)
        if mask_blocks is not None:
            xs = jnp.where(mask_blocks, xs, _NEG_MAX)

        q_seg = jnp.asarray(self._q_blk)  # (lut_heads, blocks)
        nq = self.ctx_blks_q

        def per_head(xh, seg):
            # xh: (batch, blocks, bs, bs)
            m_blk = jnp.max(xh, axis=3)                      # (batch,blocks,bs)
            m_row = jax.ops.segment_max(m_blk.swapaxes(0, 1), seg,
                                        num_segments=nq)     # (nq,batch,bs)
            m_full = jnp.take(m_row, seg, axis=0)            # (blocks,batch,bs)
            e = jnp.exp(xh - m_full.swapaxes(0, 1)[..., None])
            s_blk = jnp.sum(e, axis=3)
            s_row = jax.ops.segment_sum(s_blk.swapaxes(0, 1), seg,
                                        num_segments=nq)
            s_full = jnp.take(s_row, seg, axis=0)
            return e / s_full.swapaxes(0, 1)[..., None]

        if self.lut_heads == 1:
            out = jax.vmap(per_head, in_axes=(1, None), out_axes=1)(
                xs, q_seg[0])
        else:
            out = jax.vmap(per_head, in_axes=(1, 0), out_axes=1)(xs, q_seg)
        return out.astype(x.dtype)

    def masked_softmax(self, x, scale=1.0, autoregress_at_key=None,
                       dtype=None):
        if self.softmax_mask_np is None:
            if autoregress_at_key is not None:
                raise ValueError(
                    "autoregress_at_key only applies to ops with "
                    "mask_callback defined.")
            return self.softmax(x, scale)
        mask = jnp.asarray(self._mask_blocks)  # (lut_heads, blocks, bs, bs)
        # broadcast over batch (axis 0); heads broadcast against lut_heads
        mask_full = mask[None]

        if autoregress_at_key is not None:
            key = jnp.asarray(autoregress_at_key, jnp.int32)
            bs = self.blk_size
            q0 = jnp.asarray(self._q_blk)[:, :, None, None] * bs  # (lh,blocks,1,1)
            k0 = jnp.asarray(self._k_blk)[:, :, None, None] * bs
            qi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bs, bs), 2)
            ki = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bs, bs), 3)
            q_glob = q0 + qi
            k_glob = k0 + ki
            # visible if k < max(decode key, causal front) — parity with
            # bst_partial_autoregressive_mask (src/bst_softmax_op_gpu.cu:461)
            allowed = k_glob < jnp.maximum(key, q_glob + 1)
            mask_full = jnp.logical_and(mask_full, allowed[None])

        out = self._softmax_imp(x, scale, mask_full)
        return out if dtype is None else out.astype(dtype)

    def softmax(self, x, scale=1.0, dtype=None):
        out = self._softmax_imp(x, scale, None)
        return out if dtype is None else out.astype(dtype)

    # ------------- NumPy goldens (parity: reference transformer.py:186) ---

    def nt_test(self, A, B):
        shapeA = list(A.shape)
        shapeB = list(B.shape)
        shapeA[1:] = [self.ctx_blks_q, self.blk_size, self.heads,
                      shapeA[2] // self.heads]
        shapeB[1:] = [self.ctx_blks_k, self.blk_size, self.heads,
                      shapeB[2] // self.heads]
        batch_size = shapeA[0]
        A = A.reshape(shapeA)
        B = B.reshape(shapeB)
        C = np.empty([batch_size, self.heads, self.blocks, self.blk_size,
                      self.blk_size], dtype=np.float32)
        for n in range(batch_size):
            for h in range(self.heads):
                lut_head = h if self.lut_heads > 1 else 0
                for b, (y, x) in enumerate(self.nt_list[lut_head]):
                    C[n, h, b] = np.dot(A[n, y, :, h, :], B[n, x, :, h, :].T)
        return C

    def nn_test(self, A, B):
        shapeB = list(B.shape)
        state_size = shapeB[2]
        shapeB[1:] = [self.ctx_blks_k, self.blk_size, self.heads,
                      state_size // self.heads]
        shapeC = list(shapeB)
        shapeC[1:] = [self.ctx_blks_q, self.blk_size, self.heads,
                      state_size // self.heads]
        batch_size = shapeC[0]
        B = B.reshape(shapeB)
        C = np.zeros(shapeC, dtype=np.float32)
        for n in range(batch_size):
            for h in range(self.heads):
                lut_head = h if self.lut_heads > 1 else 0
                for x, lut in enumerate(self.nn_list[lut_head]):
                    for b, y in lut:
                        C[n, x, :, h, :] += np.dot(A[n, h, b], B[n, y, :, h, :])
        return C.reshape([batch_size, self.ctx_blks_q * self.blk_size,
                          state_size])

    def tn_test(self, A, B):
        shapeB = list(B.shape)
        state_size = shapeB[2]
        shapeB[1:] = [self.ctx_blks_q, self.blk_size, self.heads,
                      state_size // self.heads]
        shapeC = list(shapeB)
        shapeC[1:] = [self.ctx_blks_k, self.blk_size, self.heads,
                      state_size // self.heads]
        batch_size = shapeC[0]
        B = B.reshape(shapeB)
        C = np.zeros(shapeC, dtype=np.float32)
        for n in range(batch_size):
            for h in range(self.heads):
                lut_head = h if self.lut_heads > 1 else 0
                for x, lut in enumerate(self.tn_list[lut_head]):
                    for b, y in lut:
                        C[n, x, :, h, :] += np.dot(A[n, h, b].T,
                                                   B[n, y, :, h, :])
        return C.reshape([batch_size, self.ctx_blks_k * self.blk_size,
                          state_size])

    def masked_softmax_test(self, x, scale=1.0, autoregress_at_key=None):
        y = np.empty_like(x)
        m = self.softmax_mask_np
        bsize = self.blk_size
        ones = (1 << bsize) - 1
        for n in range(x.shape[0]):
            for h in range(x.shape[1]):
                hl = h if self.lut_heads > 1 else 0
                for lut in self.nn_list[hl]:
                    xm = np.full((len(lut), bsize * bsize), _NEG_MAX,
                                 dtype=np.float32)
                    for i, (b, k) in enumerate(lut):
                        xb = x[n, h, b].reshape(-1)
                        if m is None:
                            xm[i, :] = xb * scale
                        else:
                            mask = m[hl, b, :]
                            if autoregress_at_key is not None:
                                Q = self.nt_list[hl][b][0] * bsize
                                K = k * bsize
                                new_mask = np.empty(bsize, dtype=mask.dtype)
                                for q in range(bsize):
                                    shift_a = bsize - min(max(
                                        autoregress_at_key - K, 0), bsize)
                                    shift_b = min(max(
                                        bsize - 1 + K - (Q + q), 0), bsize)
                                    shift_c = int(min(shift_a, shift_b))
                                    new_mask[q] = int(mask[q]) \
                                        & (ones >> shift_c)
                                mask = new_mask
                            mask = np.unpackbits(
                                mask.view(np.uint8)).reshape(-1, 8)[:, ::-1] \
                                .reshape(-1)
                            nzIdx = np.nonzero(mask)
                            xm[i, nzIdx] = xb[nzIdx] * scale
                    xm = xm.reshape((len(lut), bsize, bsize))
                    xm = np.exp(xm - np.max(xm, axis=(0, 2), keepdims=True))
                    ym = xm / np.sum(xm, axis=(0, 2), keepdims=True)
                    for i, (b, k) in enumerate(lut):
                        y[n, h, b] = ym[i]
        return y

    def masked_softmax_grad_test(self, dy, y, scale=1.0):
        dx = np.empty_like(dy)
        for n in range(dy.shape[0]):
            for h in range(dy.shape[1]):
                hl = h if self.lut_heads > 1 else 0
                for lut in self.nn_list[hl]:
                    bs = [b for b, k in lut]
                    dyb = dy[n, h, bs]
                    yb = y[n, h, bs]
                    dxb = (dyb - np.sum(dyb * yb, axis=(0, 2),
                                        keepdims=True)) * yb * scale
                    for i, (b, k) in enumerate(lut):
                        dx[n, h, b] = dxb[i]
        return dx


# ------------------------------------------------------------------
# XLA implementations of NT/NN/TN with custom VJPs wired per the
# reference's registered grads (transformer.py:391-449).
# ------------------------------------------------------------------

def _bst_impl(bst):
    impl = getattr(bst, "impl", None)
    if impl is not None:
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _bst_scheds(bst):
    """Dense-tile schedules (per lut head) for the Pallas nt/nn/tn trio.

    The three unfused ops are the bsmm kernel families with the head
    dim as the contraction/lane axis: NT == updat (dw-shaped output),
    NN == fprop over q rows, TN == fprop over k rows with transposed
    cells.  Reference kernels: src/bst_hgemm_op_gpu.cu (hgemm_blocksparse
    _qk/_nn/_tn); here they reuse kernels/bsmm.py rectangle schedules.
    """
    if bst._pl_scheds is None:
        from ..kernels import bsmm as bk
        nt, nn, tn = [], [], []
        for lh in range(bst.lut_heads):
            nt.append(bk.build_updat_dense_tile_schedule(
                bst.nt_list[lh], bst.ctx_blks_q, bst.blk_size))
            nn_entries = [[(k, blk) for (blk, k) in lut]
                          for lut in bst.nn_list[lh]]
            nn.append(bk.build_dense_tile_schedule(
                nn_entries, bst.ctx_blks_q, bst.blk_size, bst.blocks))
            tn_entries = [[(q, blk) for (blk, q) in lut]
                          for lut in bst.tn_list[lh]]
            tn.append(bk.build_dense_tile_schedule(
                tn_entries, bst.ctx_blks_k, bst.blk_size, bst.blocks))
        bst._pl_scheds = (nt, nn, tn)
    return bst._pl_scheds


def _per_lut_vmap(bst, a5, b5, run):
    """Apply run(lut_head, a_inst, b_inst) vmapped over instances.

    a5/b5: (batch, heads, ctx, hs).  lut_heads == 1 folds batch*heads
    into one vmap axis; otherwise heads must equal lut_heads and each
    head gets its own schedule."""
    batch, heads = a5.shape[0], a5.shape[1]
    if bst.lut_heads == 1:
        af = a5.reshape((batch * heads,) + a5.shape[2:])
        bf = b5.reshape((batch * heads,) + b5.shape[2:])
        out = jax.vmap(lambda x, y: run(0, x, y))(af, bf)
        return out.reshape((batch, heads) + out.shape[1:])
    assert heads == bst.lut_heads, \
        "per-head layouts require heads == lut_heads"
    outs = [jax.vmap(lambda x, y, lh=lh: run(lh, x, y))(
        a5[:, lh], b5[:, lh]) for lh in range(bst.lut_heads)]
    return jnp.stack(outs, axis=1)


def _nt_impl_pallas(bst, a, b):
    """scores[n,h,blk] = q_blk @ k_blk^T without materializing gathered
    q/k copies: the updat-family rectangle kernel reads q/k blocks
    straight from HBM per the LUT."""
    from ..kernels import bsmm as bk
    scheds = _bst_scheds(bst)[0]
    bs = bst.blk_size
    a5 = bst._split_heads(a, bst.ctx_blks_q)
    b5 = bst._split_heads(b, bst.ctx_blks_k)
    hs = a5.shape[4]
    q = a5.reshape(a5.shape[:2] + (-1, hs))        # (n, h, ctx_q, hs)
    k = b5.reshape(b5.shape[:2] + (-1, hs))

    def run(lh, q_i, k_i):
        return bk.updat_pallas_dense_tile(q_i, k_i, scheds[lh], bs,
                                          tile_n=hs)

    w = _per_lut_vmap(bst, q, k, run)              # (n, h, blocks, bs, bs)
    return w.astype(a.dtype)


def _xn_impl_pallas(bst, w_blocked, b, trans_a):
    """Shared NN/TN: y = sum over LUT blocks of w_blk (@ or ^T@) v_blk,
    via the fprop-family rectangle kernel with per-instance weight
    panels (head dim = lane axis)."""
    from ..kernels import bsmm as bk
    scheds = _bst_scheds(bst)[2 if trans_a else 1]
    bs = bst.blk_size
    ctx_blks_in = bst.ctx_blks_q if trans_a else bst.ctx_blks_k
    b5 = bst._split_heads(b, ctx_blks_in)
    hs = b5.shape[4]
    x = b5.reshape(b5.shape[:2] + (-1, hs))        # (n, h, ctx_in, hs)

    def run(lh, w_i, x_i):
        sched = scheds[lh]
        panels = bk.dense_tile_panels(w_i, sched, False,
                                      trans_cells=trans_a)
        return bk.xprop_pallas_dense_tile(x_i, panels, sched, bs,
                                          tile_n=hs, out_dtype=jnp.float32)

    out = _per_lut_vmap(bst, w_blocked, x, run)    # (n, h, ctx_out, hs)
    out5 = out.reshape(out.shape[:2] + (-1, bs, hs))
    return bst._merge_heads(out5).astype(b.dtype)


def _hs_ok(bst, state_size):
    """Pallas trio needs the head dim to tile onto lanes cleanly."""
    hs = state_size // bst.heads
    return hs % 8 == 0 and state_size % bst.heads == 0


def _nt_impl(bst, a, b):
    if _bst_impl(bst) == "pallas" and _hs_ok(bst, a.shape[-1]):
        if a.dtype == jnp.float16:
            # IEEE fp16 (reference ehalf) has no MXU format and Mosaic
            # rejects f16 dots: run the pallas path in bfloat16, emit
            # f16 — same shim as the fused branch (_bst_attention)
            return _nt_impl_pallas(
                bst, a.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16)).astype(jnp.float16)
        return _nt_impl_pallas(bst, a, b)
    return _nt_impl_xla(bst, a, b)


def _xn_impl(bst, w_blocked, b, seg_idx, gather_idx, ctx_out, trans_a):
    if _bst_impl(bst) == "pallas" and _hs_ok(bst, b.shape[-1]):
        if b.dtype == jnp.float16:
            # f16->bf16 MXU shim (see _nt_impl)
            return _xn_impl_pallas(
                bst, w_blocked.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16), trans_a).astype(jnp.float16)
        return _xn_impl_pallas(bst, w_blocked, b, trans_a)
    return _xn_impl_xla(bst, w_blocked, b, seg_idx, gather_idx, ctx_out,
                        trans_a)


def _nt_impl_xla(bst, a, b):
    a5 = bst._split_heads(a, bst.ctx_blks_q)
    b5 = bst._split_heads(b, bst.ctx_blks_k)
    qg = bst._head_gather(a5, bst._q_blk)
    kg = bst._head_gather(b5, bst._k_blk)
    w = jnp.einsum("nhbqc,nhbkc->nhbqk", qg.astype(jnp.float32),
                   kg.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST
                   if a.dtype == jnp.float32 else None)
    return w.astype(a.dtype)


def _xn_impl_xla(bst, w_blocked, b, seg_idx, gather_idx, ctx_out, trans_a):
    """Shared NN/TN: gather b blocks, per-entry matmul, segment-sum."""
    b5 = bst._split_heads(b, b.shape[1] // bst.blk_size)
    bg = bst._head_gather(b5, gather_idx)     # (batch,heads,blocks,bs,hs)
    f32 = jnp.float32
    prec = jax.lax.Precision.HIGHEST if b.dtype == jnp.float32 else None
    if trans_a:
        prod = jnp.einsum("nhbqk,nhbqc->nhbkc", w_blocked.astype(f32),
                          bg.astype(f32), precision=prec)
    else:
        prod = jnp.einsum("nhbqk,nhbkc->nhbqc", w_blocked.astype(f32),
                          bg.astype(f32), precision=prec)

    seg = jnp.asarray(seg_idx)   # (lut_heads, blocks)

    def per_head(ph, sh):
        # ph: (batch, blocks, bs, hs)
        return jax.ops.segment_sum(ph.swapaxes(0, 1), sh,
                                   num_segments=ctx_out).swapaxes(0, 1)

    if bst.lut_heads == 1:
        out5 = jax.vmap(per_head, in_axes=(1, None), out_axes=1)(prod, seg[0])
    else:
        out5 = jax.vmap(per_head, in_axes=(1, 0), out_axes=1)(prod, seg)
    return bst._merge_heads(out5).astype(b.dtype)


def _bst_nt(bst, a, b):
    @jax.custom_vjp
    def nt(a, b):
        return _nt_impl(bst, a, b)

    def fwd(a, b):
        return nt(a, b), (a, b)

    def bwd(res, dw):
        q, k = res
        # dk = TN(dw, q); dq = NN(dw, k)  (reference transformer.py:404-414)
        dk = _xn_impl(bst, dw, q, bst._k_blk, bst._q_blk, bst.ctx_blks_k,
                      True)
        dq = _xn_impl(bst, dw, k, bst._q_blk, bst._k_blk, bst.ctx_blks_q,
                      False)
        return dq.astype(q.dtype), dk.astype(k.dtype)

    nt.defvjp(fwd, bwd)
    return nt(a, b)


def _bst_nn(bst, w, v):
    @jax.custom_vjp
    def nn(w, v):
        return _xn_impl(bst, w, v, bst._q_blk, bst._k_blk, bst.ctx_blks_q,
                        False)

    def fwd(w, v):
        return nn(w, v), (w, v)

    def bwd(res, dy):
        w, v = res
        # dv = TN(w, dy); dw = NT(dy, v)  (reference transformer.py:436-447)
        dv = _xn_impl(bst, w, dy, bst._k_blk, bst._q_blk, bst.ctx_blks_k,
                      True)
        dw = _nt_impl(bst, dy, v)
        return dw.astype(w.dtype), dv.astype(v.dtype)

    nn.defvjp(fwd, bwd)
    return nn(w, v)


def _bst_tn(bst, w, q):
    @jax.custom_vjp
    def tn(w, q):
        return _xn_impl(bst, w, q, bst._k_blk, bst._q_blk, bst.ctx_blks_k,
                        True)

    def fwd(w, q):
        return tn(w, q), (w, q)

    def bwd(res, dy):
        w, q = res
        dq = _xn_impl(bst, w, dy, bst._q_blk, bst._k_blk, bst.ctx_blks_q,
                      False)
        dw = _nt_impl(bst, q, dy)
        return dw.astype(w.dtype), dq.astype(q.dtype)

    tn.defvjp(fwd, bwd)
    return tn(w, q)


def clear_bst_constants():
    """Parity shim: LUTs are baked as jit constants automatically."""


# ------------------------------------------------------------------
# Dense softmax / top-k family (reference transformer.py:484-701)
# ------------------------------------------------------------------

def top_k(x, k):
    assert k <= x.shape[-1] <= 1024
    return jax.lax.top_k(x, k)


def rectified_top_k(x, k, rebase=True):
    assert k <= x.shape[-1] <= 1024
    vals, _ = jax.lax.top_k(x, k)
    kth = vals[..., k - 1:k]
    base = jnp.maximum(kth, 0.0) if rebase else jnp.zeros_like(kth)
    keep = x >= kth
    y = jnp.where(keep, jnp.maximum(x, base) - base, 0.0)
    return y


def rectified_top_k_test(x, k, rebase=True):
    a = np.argsort(x)[:, ::-1]
    y = np.zeros(x.shape, dtype=np.float32)
    for i in range(x.shape[0]):
        base = max(x[i, a[i, k - 1]], 0.0) if rebase else 0.0
        y[i, a[i, :k]] = np.maximum(x[i, a[i, :k]], base) - base
    return y


def _apply_mask_scale(x, mask, scale):
    xs = x.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        xs = jnp.where(m != 0, xs * m * scale, _NEG_MAX)
    else:
        xs = xs * scale
    return xs


def softmax(x, scale=1.0, bench=0):
    return masked_softmax(x, mask=None, scale=scale)


def masked_softmax(x, mask=None, scale=1.0, bench=0):
    """Dense softmax with a broadcastable multiplicative/visibility mask
    (mask==0 -> -inf; else logit *= mask*scale).  Custom VJP matches the
    reference's masked_softmax_grad (dy - sum(dy*y)) * y * mask * scale."""
    if mask is not None:
        assert mask.ndim == x.ndim
        for i in range(mask.ndim):
            assert mask.shape[i] in (1, x.shape[i])

    @jax.custom_vjp
    def _sm(x, mask):
        xs = _apply_mask_scale(x, mask, scale)
        m = jnp.max(xs, axis=-1, keepdims=True)
        e = jnp.exp(xs - m)
        return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)

    def fwd(x, mask):
        y = _sm(x, mask)
        return y, (y, mask)

    def bwd(res, dy):
        y, mask = res
        f32 = jnp.float32
        yf, dyf = y.astype(f32), dy.astype(f32)
        dx = (dyf - jnp.sum(dyf * yf, axis=-1, keepdims=True)) * yf * scale
        if mask is not None:
            dx = dx * mask.astype(f32)
            dmask = jnp.zeros_like(mask)
            return dx.astype(y.dtype), dmask
        return dx.astype(y.dtype), None

    if mask is None:
        @jax.custom_vjp
        def _sm0(x):
            xs = _apply_mask_scale(x, None, scale)
            m = jnp.max(xs, axis=-1, keepdims=True)
            e = jnp.exp(xs - m)
            return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)

        def fwd0(x):
            y = _sm0(x)
            return y, y

        def bwd0(y, dy):
            f32 = jnp.float32
            yf, dyf = y.astype(f32), dy.astype(f32)
            dx = (dyf - jnp.sum(dyf * yf, axis=-1, keepdims=True)) * yf * scale
            return (dx.astype(y.dtype),)

        _sm0.defvjp(fwd0, bwd0)
        return _sm0(x)

    _sm.defvjp(fwd, bwd)
    return _sm(x, mask)


def masked_top_k_softmax(x, k, mask=None, scale=1.0):
    assert k <= x.shape[-1] <= 1024
    xs = _apply_mask_scale(x, mask, scale)
    vals, idx = jax.lax.top_k(xs, k)
    m = vals[..., 0:1]
    e = jnp.exp(vals - m)
    sm = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.zeros((int(np.prod(x.shape[:-1])), x.shape[-1]), sm.dtype)
    out = jax.vmap(lambda o, i, v: o.at[i].set(v))(
        out, idx.reshape(-1, k), sm.reshape(-1, k)).reshape(x.shape)
    return out.astype(x.dtype)


def masked_softmax_test(x, mask=None, scale=1.0):
    x_shape = x.shape
    if mask is not None:
        x = x.reshape(-1, mask.size)
        y = np.empty(x.shape, dtype=np.float32)
        y.fill(_NEG_MAX)
        nz = np.nonzero(mask.reshape(-1))
        y[:, nz] = x[:, nz] * mask.reshape(1, -1)[:, nz] * scale
    else:
        y = x * scale
    y = y.reshape(-1, x_shape[-1])
    m = np.max(y, axis=1, keepdims=True)
    z = np.exp(y - m) / np.sum(np.exp(y - m), axis=1, keepdims=True)
    return z.reshape(x_shape)


def masked_top_k_softmax_test(x, k, mask=None, scale=1.0):
    x_shape = x.shape
    if mask is not None:
        x = x.reshape(-1, mask.size)
        y = np.empty(x.shape, dtype=np.float32)
        y.fill(_NEG_MAX)
        nz = np.nonzero(mask.reshape(-1))
        y[:, nz] = x[:, nz] * mask.reshape(1, -1)[:, nz] * scale
    else:
        y = x * scale
    y = y.reshape(-1, x_shape[-1])
    a = np.argsort(y)[:, ::-1]
    z = np.zeros(y.shape, dtype=np.float32)
    for i in range(y.shape[0]):
        max_val = y[i, a[i, 0]]
        z[i, a[i, :k]] = np.exp(y[i, a[i, :k]] - max_val) \
            / np.sum(np.exp(y[i, a[i, :k]] - max_val))
    return z.reshape(x_shape)


def masked_softmax_grad_test(dy, y, mask=None, scale=1.0):
    if mask is None:
        mask = 1.0
    return (dy - np.sum(dy * y, axis=-1, keepdims=True)) * y * mask * scale


# ------------------------------------------------------------------
# Transposes (reference transformer.py:664-683)
# ------------------------------------------------------------------

def transpose_2d(x):
    return x.T


def transpose_0213(x):
    """Fused (batch, a, b, c) -> (batch, b, a, c) head transpose."""
    return jnp.transpose(x, (0, 2, 1, 3))


# ------------------------------------------------------------------
# Fused softmax cross-entropy (reference transformer.py:691)
# ------------------------------------------------------------------

def softmax_cross_entropy(logits=None, labels=None):
    """Per-row cross entropy vs integer labels; fused softmax grad.
    Vocab dim caps at 64K in the reference (transformer.py:693); XLA has
    no such limit but we keep the assert for parity."""
    assert logits is not None and labels is not None
    assert logits.shape[-1] <= 65536, \
        "use a sharded cross entropy if feature dim is greater than 64k"

    @jax.custom_vjp
    def _xent(logits, labels):
        f32 = jnp.float32
        ls = logits.astype(f32)
        m = jnp.max(ls, axis=-1, keepdims=True)
        e = ls - m
        lse = jnp.log(jnp.sum(jnp.exp(e), axis=-1)) + m[..., 0]
        picked = jnp.take_along_axis(ls, labels[..., None],
                                     axis=-1)[..., 0]
        return lse - picked

    def fwd(logits, labels):
        return _xent(logits, labels), (logits, labels)

    def bwd(res, dy):
        logits, labels = res
        f32 = jnp.float32
        sm = jax.nn.softmax(logits.astype(f32), axis=-1)
        onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=f32)
        dx = (sm - onehot) * dy[..., None].astype(f32)
        return dx.astype(logits.dtype), None

    _xent.defvjp(fwd, bwd)
    return _xent(logits, labels)


# ------------------------------------------------------------------
# Fused flash-style sparse attention (kernels/bst_attn.py): computes
# nn(masked_softmax(nt(q, k)), v) in one streaming kernel without
# materializing the blocked score tensor.  Backward recomputes scores
# through the unfused ops (flash-bwd kernel is a later optimization).
# ------------------------------------------------------------------

def _can_fuse(bst, hs, ctx_k, itemsize, budget=10 * 1024 * 1024):
    """The fused kernel handles any context: hs is the only hard limit
    (lane width).  Residency vs streaming is chosen separately."""
    return hs <= 128


def _resident_fits(hs, ctx_k, itemsize, budget=2 * 1024 * 1024):
    """Whole-head K/V (and q/do on the dkv pass) VMEM residency check;
    beyond it the kernels stream gathered slots per step instead of
    falling back to the score-materializing path.

    Budget is deliberately small: Mosaic's scoped-vmem accounting for
    the dkv kernel charges ~10x the naive two-resident-tensors estimate
    (measured: ctx 8192 x hs 64 bf16 = 2.1 MB naive but a 24.19 MB
    scoped allocation that fails the 16 MB limit, while ctx 4096
    compiles and runs).  2 MB keeps the proven-resident regime
    (<= ctx 4096 at hs 64 bf16) and streams beyond it.  Strict <: the
    failing config (ctx 8192 x hs 64 bf16) lands exactly ON the 2 MB
    budget and must stream."""
    return 2 * ctx_k * hs * itemsize < budget


def _attention_fused(bst, q, k, v, scale, flash_bwd=True):
    from blocksparse_tpu.kernels import bst_attn

    def to_flat(a, ctx_blks):
        batch = a.shape[0]
        hs = a.shape[2] // bst.heads
        a5 = bst._split_heads(a, ctx_blks)
        return a5.reshape(batch * bst.heads, ctx_blks * bst.blk_size, hs)

    def from_flat(af, batch, ctx_blks):
        hs = af.shape[-1]
        a5 = af.reshape(batch, bst.heads, ctx_blks, bst.blk_size, hs)
        return bst._merge_heads(a5)

    hs_ = q.shape[-1] // bst.heads
    stream = not _resident_fits(hs_, bst.ctx_blks_k * bst.blk_size,
                                q.dtype.itemsize)
    # q-row pairing (auto when the row count is even; see __init__).
    # Amortizes the per-row fixed cost — 41% of a sparse row's time at
    # the sp75 config (results_attn_breakdown.json) — over two rows;
    # applies to both the resident and the stream kernels.
    qm = bst.q_mult if bst.q_mult is not None else 2
    pair = (qm == 2 and bst.ctx_blks_q % 2 == 0)
    sched_nn = bst.attn_schedule_q2 if pair else bst.attn_schedule
    pair_tn = (qm == 2 and bst.ctx_blks_k % 2 == 0)

    @jax.custom_vjp
    def att(q, k, v):
        batch = q.shape[0]
        qf = to_flat(q, bst.ctx_blks_q)
        kf = to_flat(k, bst.ctx_blks_k)
        vf = to_flat(v, bst.ctx_blks_k)
        yf = bst_attn.fused_attention_fwd(qf, kf, vf, sched_nn,
                                          bst.heads, scale, stream=stream)
        return from_flat(yf, batch, bst.ctx_blks_q)

    def fwd(q, k, v):
        if not flash_bwd:
            return att(q, k, v), (q, k, v, None, None)
        batch = q.shape[0]
        qf = to_flat(q, bst.ctx_blks_q)
        kf = to_flat(k, bst.ctx_blks_k)
        vf = to_flat(v, bst.ctx_blks_k)
        yf, lse = bst_attn.fused_attention_fwd_lse(
            qf, kf, vf, sched_nn, bst.heads, scale, stream=stream)
        y = from_flat(yf, batch, bst.ctx_blks_q)
        return y, (q, k, v, yf, lse)

    def bwd(res, dy):
        q, k, v, yf, lse = res
        if yf is None:
            def ref(q, k, v):
                w = bst.nt_op(q, k)
                p = bst.masked_softmax(w, scale=scale)
                return bst.nn_op(p, v)
            _, vjp = jax.vjp(ref, q, k, v)
            return vjp(dy)
        batch = q.shape[0]
        qf = to_flat(q, bst.ctx_blks_q)
        kf = to_flat(k, bst.ctx_blks_k)
        vf = to_flat(v, bst.ctx_blks_k)
        dof = to_flat(dy, bst.ctx_blks_q)
        sched_tn = bst.attn_schedule_tn_q2 if pair_tn \
            else bst.attn_schedule_tn
        dqf, dkf, dvf = bst_attn.fused_attention_bwd(
            qf, kf, vf, yf, lse, dof, sched_nn,
            sched_tn, bst.heads, scale, stream=stream)
        return (from_flat(dqf, batch, bst.ctx_blks_q).astype(q.dtype),
                from_flat(dkf, batch, bst.ctx_blks_k).astype(k.dtype),
                from_flat(dvf, batch, bst.ctx_blks_k).astype(v.dtype))

    att.defvjp(fwd, bwd)
    return att(q, k, v)


def _bst_attention(self, q, k, v, scale=1.0, use_fused=None,
                   flash_bwd=True):
    """Fused sparse attention: softmax(scale*QK^T + mask) V over this
    object's layout.  Falls back to the unfused three-op composition when
    the fused kernel doesn't fit (huge ctx*hs) or when disabled."""
    hs = q.shape[-1] // self.heads
    if use_fused is None:
        use_fused = _can_fuse(self, hs, self.ctx_blks_k * self.blk_size,
                              q.dtype.itemsize)
    if use_fused:
        if q.dtype == jnp.float16:
            # IEEE fp16 (reference ehalf, gpu_types.h:15) has no MXU
            # format on TPU and Mosaic rejects f16 dots: run the fused
            # kernels in bfloat16 — the TPU half fast path — emit f16
            y = _attention_fused(self, q.astype(jnp.bfloat16),
                                 k.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16), scale,
                                 flash_bwd=flash_bwd)
            return y.astype(jnp.float16)
        return _attention_fused(self, q, k, v, scale, flash_bwd=flash_bwd)
    w = self.nt_op(q, k)
    p = self.masked_softmax(w, scale=scale)
    return self.nn_op(p, v)


def _bst_decode_tables(self):
    """Padded per-query-row key-block tables for incremental decode:
    (row_kblk, row_bid, row_cnt) with shapes (lut_heads, ctx_blks_q,
    nn_max), same, and (lut_heads, ctx_blks_q)."""
    if getattr(self, "_decode_tables_cache", None) is None:
        E = max(self.nn_max, 1)
        lh = self.lut_heads
        kblk = np.zeros((lh, self.ctx_blks_q, E), np.int32)
        bid = np.zeros((lh, self.ctx_blks_q, E), np.int32)
        cnt = np.zeros((lh, self.ctx_blks_q), np.int32)
        for h in range(lh):
            for qr in range(self.ctx_blks_q):
                ents = self.nn_list[h][qr]
                cnt[h, qr] = len(ents)
                for i, (b, kb) in enumerate(ents):
                    kblk[h, qr, i] = kb
                    bid[h, qr, i] = b
        self._decode_tables_cache = (kblk, bid, cnt)
    return self._decode_tables_cache


def _bst_decode_step(self, q, k_cache, v_cache, pos, scale=1.0):
    """KV-cached single-position sparse attention.

    q: (batch, 1, state); k_cache / v_cache: (batch, ctx_k, state) with
    positions > pos allowed to contain garbage; pos: scalar int32.
    Returns (batch, 1, state).

    Only the layout row of ``pos`` is gathered (nn_max key blocks), so
    the per-token cost is O(visible blocks) — the reference's dynamic
    re-masking decode (transformer.py:366-370,
    src/bst_softmax_op_gpu.cu:461 bst_partial_autoregressive_mask)
    expressed as XLA gathers: no recompile across positions.  Semantics
    match ``masked_softmax(..., autoregress_at_key=pos+1)`` at query
    row ``pos``.
    """
    bs = self.blk_size
    lh = self.lut_heads
    batch, one, state = q.shape
    assert one == 1
    hs = state // self.heads
    kblk, bid, cnt = self.decode_tables
    E = kblk.shape[2]
    pos = jnp.asarray(pos, jnp.int32)
    r = pos // bs
    qoff = pos % bs

    idx = jax.lax.dynamic_index_in_dim(
        jnp.asarray(kblk), r, axis=1, keepdims=False)        # (lh, E)
    bdi = jax.lax.dynamic_index_in_dim(
        jnp.asarray(bid), r, axis=1, keepdims=False)         # (lh, E)
    cn = jax.lax.dynamic_index_in_dim(
        jnp.asarray(cnt), r, axis=1, keepdims=False)         # (lh,)

    ctx_blks = k_cache.shape[1] // bs
    k5 = k_cache.reshape(batch, ctx_blks, bs, self.heads, hs) \
        .transpose(0, 3, 1, 2, 4)                            # (b,h,cb,bs,hs)
    v5 = v_cache.reshape(batch, ctx_blks, bs, self.heads, hs) \
        .transpose(0, 3, 1, 2, 4)
    if lh == 1:
        kg = jnp.take(k5, idx[0], axis=2)                    # (b,h,E,bs,hs)
        vg = jnp.take(v5, idx[0], axis=2)
    else:
        ix = idx[None, :, :, None, None]
        kg = jnp.take_along_axis(k5, ix, axis=2)
        vg = jnp.take_along_axis(v5, ix, axis=2)

    q3 = q.reshape(batch, self.heads, hs).astype(jnp.float32)
    s = jnp.einsum("nhc,nhebc->nheb", q3, kg.astype(jnp.float32)) \
        * jnp.asarray(scale, jnp.float32)                    # (b,h,E,bs)

    kpos = idx[:, :, None] * bs + jnp.arange(bs)[None, None]  # (lh,E,bs)
    visible = kpos <= pos
    visible &= (jnp.arange(E)[None, :, None] < cn[:, None, None])
    if self._mask_blocks is not None:
        mb = jnp.asarray(self._mask_blocks)                  # (lh,blk,bs,bs)
        mg = jnp.take_along_axis(
            mb, bdi[:, :, None, None], axis=1)               # (lh,E,bs,bs)
        mrow = jax.lax.dynamic_index_in_dim(
            mg.swapaxes(0, 2), qoff, axis=0, keepdims=False) \
            .swapaxes(0, 1)                                  # (lh,E,bs)
        visible &= mrow
    vis = visible if lh > 1 else visible[0][None]            # (h|1,E,bs)
    s = jnp.where(vis[None], s, _NEG_MAX)
    p = jax.nn.softmax(s.reshape(batch, self.heads, E * bs), axis=-1)
    out = jnp.einsum("nhk,nhkc->nhc", p,
                     vg.reshape(batch, self.heads, E * bs, hs)
                     .astype(jnp.float32))
    return out.reshape(batch, 1, state).astype(q.dtype)


def _bst_attn_schedule(self):
    from blocksparse_tpu.kernels import bst_attn
    if getattr(self, "_attn_sched_cache", None) is None:
        self._attn_sched_cache = bst_attn.build_attn_schedule(
            self.nn_list, self.ctx_blks_q, self.blk_size, self._mask_blocks)
    return self._attn_sched_cache


def _bst_attn_schedule_q2(self):
    """Paired (q_mult=2) forward/dq schedule — used by the resident
    fused path to amortize the per-row fixed cost over two q rows."""
    from blocksparse_tpu.kernels import bst_attn
    if getattr(self, "_attn_sched_q2_cache", None) is None:
        self._attn_sched_q2_cache = bst_attn.build_attn_schedule(
            self.nn_list, self.ctx_blks_q, self.blk_size,
            self._mask_blocks, q_mult=2)
    return self._attn_sched_q2_cache


def _bst_attn_schedule_tn(self):
    from blocksparse_tpu.kernels import bst_attn
    if getattr(self, "_attn_sched_tn_cache", None) is None:
        self._attn_sched_tn_cache = bst_attn.build_attn_schedule_tn(
            self.tn_list, self.nt_list, self.ctx_blks_k, self.blk_size,
            self._mask_blocks)
    return self._attn_sched_tn_cache


def _bst_attn_schedule_tn_q2(self):
    """Key-row-paired dk/dv schedule (see attn_schedule_q2)."""
    from blocksparse_tpu.kernels import bst_attn
    if getattr(self, "_attn_sched_tn_q2_cache", None) is None:
        self._attn_sched_tn_q2_cache = bst_attn.build_attn_schedule_tn(
            self.tn_list, self.nt_list, self.ctx_blks_k, self.blk_size,
            self._mask_blocks, q_mult=2)
    return self._attn_sched_tn_q2_cache


BlocksparseTransformer.attention = _bst_attention
BlocksparseTransformer.decode_step = _bst_decode_step
BlocksparseTransformer.decode_tables = property(_bst_decode_tables)
BlocksparseTransformer.attn_schedule = property(_bst_attn_schedule)
BlocksparseTransformer.attn_schedule_q2 = property(_bst_attn_schedule_q2)
BlocksparseTransformer.attn_schedule_tn = property(_bst_attn_schedule_tn)
BlocksparseTransformer.attn_schedule_tn_q2 = \
    property(_bst_attn_schedule_tn_q2)
