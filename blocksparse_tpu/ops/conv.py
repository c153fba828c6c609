"""Block-sparse convolution, edge bias, channel-wise linear.

TPU-native equivalent of /root/reference/blocksparse/conv.py
(kernels: SASS xconv_blocksparse_* via src/blocksparse_conv_op.cc, plus
src/edge_bias_op.cc, src/cwise_linear_op.cc).

Design (TPU-first):
* ``BlocksparseConv`` keeps the reference's BCK spec — a list of blocks,
  each with arbitrary input-channel and output-channel index lists — but
  lowers to gathered ``lax.conv_general_dilated`` calls batched over
  blocks (vmap) plus a segment-sum scatter over output channels (which
  handles overlapping K sets).  XLA maps the convs onto the MXU; no
  spatial LUT/superblock machinery is needed (reference conv.py:354-488
  exists to drive hand-written SASS).
* ``BlocksparseDeconv`` is the exact linear transpose of the conv,
  obtained with ``jax.linear_transpose`` — guaranteed adjoint semantics.
* ``ConvEdgeBias`` reproduces the per-edge-overlap-pattern gain/bias
  (reference conv.py:55-219) with a host-built pixel->pattern map and a
  vectorized gather apply; grads come from AD and match the reference's
  edge_bias_grad math.
* filters are stored like the reference: a (blocks, bK, bC, *TRS) array
  when all blocks share one shape (``fixed_block_size``), else the flat
  "collapsed" vector.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.utils import ceil_div, reduce_mul
from blocksparse_tpu.kernels.bsmm import dot_precision
from blocksparse_tpu.kernels.im2col import im2col, im2col_supported


# ---------------- helpers (parity: reference conv.py:1001-1094) --------

def dilation_size(S, dilate):
    return S * dilate - dilate + 1


def out_dim(S, W, padding, stride, dilate):
    return ceil_div(W - dilation_size(S, dilate) + 1 + 2 * padding, stride)


def in_dim(S, W, padding, stride, dilate):
    return W * stride + S - 2 * padding - (S & 1)


def expand_dims(dim, pad_val=1):
    return [pad_val] * (3 - len(dim)) + list(dim)


def get_padding(padding, TRS, dilates):
    if isinstance(padding, str):
        if padding.upper() == "SAME":
            padding = [dilation_size(*dims) // 2 for dims in zip(TRS, dilates)]
        else:
            padding = [0, 0, 0]
    else:
        padding = expand_dims(padding, 0)
    return padding


def fprop_lut(q, X, S, padding, stride, dilate):
    qs = q * stride - padding
    image = []
    for s in range(S):
        x = qs + s * dilate
        image.append(x if 0 <= x < X else -1)
    return image


def bprop_lut(x, Q, S, padding, stride, dilate):
    pad_eff = dilation_size(S, dilate) - padding - 1
    xs = x - pad_eff
    image = []
    for s in range(S - 1, -1, -1):
        q = xs + s * dilate
        if q % stride == 0:
            q //= stride
            image.append(q if 0 <= q < Q else -1)
        else:
            image.append(-2)
    return image


def fprop_slice(q, X, S, padding, stride, dilate):
    qs = q * stride - padding
    x1 = None
    for s in range(S):
        x = qs + s * dilate
        if x1 is None and x >= 0:
            x1 = x
            f1 = s
        if x < X:
            x2 = x
            f2 = s
    return (slice(f1, f2 + 1), slice(x1, x2 + 1, dilate), f2 - f1 + 1)


def bprop_slice(x, Q, S, padding, stride, dilate):
    pad_eff = dilation_size(S, dilate) - padding - 1
    xs = x - pad_eff
    f, e = [], []
    for s in range(S):
        q = xs + s * dilate
        if q % stride == 0:
            q //= stride
            if 0 <= q < Q:
                f.append(s)
                e.append(q)
    if len(f) == 0:
        return (slice(0, 0, 1), slice(0, 0, 1))
    if len(f) == 1:
        fstride = estride = 1
    else:
        fstride = f[1] - f[0]
        estride = e[1] - e[0]
    return (slice(f[0], f[-1] + 1, fstride), slice(e[0], e[-1] + 1, estride))


class BlocksparseConv:
    """Reference conv.py:228.  BCK: per-block channel lists
    ((c...), (k...)); TRS/DHW/MPQ spatial dims (1-3d); NC[DHW] data."""

    def __init__(self, BCK, TRS, DHW, MPQ=None, strides=(1, 1, 1),
                 dilates=(1, 1, 1), padding="SAME", debug=False,
                 deconv=False, impl="conv"):
        # impl: "conv" (vmapped XLA convs) | "matmul" (tap-chunked
        # gathered matmul, fixed_block_size only) | "bsmm" (im2col +
        # tap-tiled BlocksparseMatMul — the TPU fast path; requires
        # aligned square channel blocks) — see benchmarks/conv_bench.py
        # for the measured comparison
        self.impl = impl
        self.userTRS = list(TRS)
        for a in (TRS, DHW, MPQ, strides, dilates, padding):
            if type(a) in (tuple, list):
                assert 1 <= len(a) <= 3
        assert len(TRS) == len(DHW)

        self.spatial_rank = len(TRS)
        TRS = expand_dims(TRS)
        DHW = expand_dims(DHW)
        strides = expand_dims(strides)
        dilates = expand_dims(dilates)
        padding = get_padding(padding, TRS, dilates)
        if MPQ is None:
            MPQ = [out_dim(*dims)
                   for dims in zip(TRS, DHW, padding, strides, dilates)]
        else:
            MPQ = expand_dims(MPQ)

        cSet, kSet = set(), set()
        overlapC = overlapK = False
        blkSizes = set()
        sizeF = 0
        for listC, listK in BCK:
            for c in listC:
                if c in cSet:
                    overlapC = True
                cSet.add(c)
            for k in listK:
                if k in kSet:
                    overlapK = True
                kSet.add(k)
            blkSizes.add((len(listK), len(listC)))
            sizeF += len(listK) * len(listC) * reduce_mul(TRS)

        self.C = len(cSet)
        self.K = len(kSet)
        self.fixed_block_size = len(blkSizes) == 1
        self.overlapC = overlapC
        self.overlapK = overlapK
        self.BCK = BCK
        self.blocks = len(BCK)
        self.TRS = TRS
        self.DHW = DHW
        self.MPQ = MPQ
        self.sizeF = sizeF
        self.strides = strides
        self.dilates = dilates
        self.padding = padding
        self.trs = reduce_mul(TRS)
        self.flops = sizeF * reduce_mul(MPQ) * 2
        self.debug = bool(debug)
        self.mpqSlice = None
        self.deconv = deconv
        self._bsmm_op = None

        if self.fixed_block_size:
            self._lutC = np.array([list(c) for c, _ in BCK], np.int32)
            self._lutK = np.array([list(k) for _, k in BCK], np.int32)
            self._flatK = self._lutK.reshape(-1)
        else:
            # ragged blocks: pad every block to (bKmax, bCmax); padded
            # C entries read an appended zero input channel, padded K
            # entries scatter into an appended junk output channel, and
            # padded filter cells gather an appended zero weight — so
            # one lax.scan body serves all blocks (no host unrolling;
            # compile time is O(1) in the block count)
            bKmax = max(len(k) for _, k in BCK)
            bCmax = max(len(c) for c, _ in BCK)
            self._bKmax, self._bCmax = bKmax, bCmax
            lutC = np.full((self.blocks, bCmax), self.C, np.int32)
            lutK = np.full((self.blocks, bKmax), self.K, np.int32)
            fmap = np.full((self.blocks, bKmax, bCmax, self.trs),
                           self.sizeF, np.int64)
            offset = 0
            for b, (listC, listK) in enumerate(BCK):
                bC, bK = len(listC), len(listK)
                lutC[b, :bC] = listC
                lutK[b, :bK] = listK
                fmap[b, :bK, :bC, :] = np.arange(
                    bK * bC * self.trs, dtype=np.int64).reshape(
                        bK, bC, self.trs) + offset
                offset += bK * bC * self.trs
            self._lutC_pad = lutC
            self._lutK_pad = lutK
            self._fmap_pad = fmap

        # per-element row ids for ragged l2 norms: KCTRS rows are
        # (block, k-row) over (bC, trs); CKTRS cols are (block, c-col)
        # over (bK, trs).  Reference src/blocksparse_l2_norm_op.cc:33-198
        # drives the same reductions with an l2_lut.
        krow, ccol = [], []
        self._n_krows = sum(len(k) for _, k in BCK)
        self._n_ccols = sum(len(c) for c, _ in BCK)
        koff = coff = 0
        for listC, listK in BCK:
            bC, bK = len(listC), len(listK)
            kr = (koff + np.arange(bK, dtype=np.int64))[:, None, None]
            krow.append(np.broadcast_to(
                kr, (bK, bC, self.trs)).reshape(-1))
            cc = (coff + np.arange(bC, dtype=np.int64))[None, :, None]
            ccol.append(np.broadcast_to(
                cc, (bK, bC, self.trs)).reshape(-1))
            koff += bK
            coff += bC
        self._krow_of_elem = np.concatenate(krow)
        self._ccol_of_elem = np.concatenate(ccol)

        if impl == "bsmm":
            # eager: schedule building is host-side and must not run
            # under a jit trace
            self._build_bsmm()

    # ---------------- shapes ----------------

    def i_shape(self, N):
        return [N, self.C] + self.DHW

    def o_shape(self, N):
        return [N, self.K] + self.MPQ

    def f_shape(self, block=None):
        if block is None:
            if self.fixed_block_size:
                lutC, lutK = self.BCK[0]
                return [self.blocks, len(lutK), len(lutC)] + self.userTRS
            return [self.sizeF]
        lutC, lutK = self.BCK[block]
        return [len(lutK), len(lutC)] + self.userTRS

    def collapse_filter(self, F, dtype=None):
        flatF = np.empty(self.sizeF, dtype=dtype)
        offset = 0
        for f in F:
            flatF[offset:offset + f.size] = f.reshape(-1).astype(dtype)
            offset += f.size
        return flatF

    def expand_filter(self, flatF):
        """Inverse of collapse_filter -> list of (bK, bC, T, R, S) blocks."""
        blocks = []
        offset = 0
        for b in range(self.blocks):
            lutC, lutK = self.BCK[b]
            shape = (len(lutK), len(lutC)) + tuple(self.TRS)
            size = int(np.prod(shape))
            blocks.append(flatF[offset:offset + size].reshape(shape))
            offset += size
        return blocks

    def _f_blocks(self, F):
        """Normalize filter input to a list of 5-D (bK,bC,T,R,S) blocks."""
        if isinstance(F, (list, tuple)):
            return [jnp.asarray(f).reshape(self.f_shape(i)[:2]
                                           + list(self.TRS))
                    for i, f in enumerate(F)]
        F = jnp.asarray(F)
        if self.fixed_block_size and F.ndim >= 3:
            bK, bC = len(self.BCK[0][1]), len(self.BCK[0][0])
            return list(F.reshape((self.blocks, bK, bC) + tuple(self.TRS)))
        return self.expand_filter(F.reshape(-1))

    # ---------------- forward ----------------

    def _conv_fwd_matmul(self, F, I):
        """Tap-chunked gathered-matmul lowering (fixed_block_size only).

        The reference's fast path is im2col per superblock onto the
        tensor cores (src/blocksparse_conv_op.cc:261); the TPU analog
        contracts (bC x tap-chunk) onto the MXU: channels are gathered
        once into block order, each filter tap becomes a strided slice
        of the padded input, and taps are concatenated in chunks of
        ceil(128/bC) so the MXU contraction runs >= 128 deep.  One
        batched dot per chunk; overlapping K sets resolve through the
        same segment-sum as the conv path."""
        N = I.shape[0]
        bK, bC = len(self.BCK[0][1]), len(self.BCK[0][0])
        B = self.blocks
        T, R, S = self.TRS
        M, P, Q = self.MPQ
        st, dil, pd = self.strides, self.dilates, self.padding
        prec = dot_precision(I.dtype)

        Fb = jnp.asarray(F).reshape((B, bK, bC, T, R, S))
        Ig = jnp.take(I, jnp.asarray(self._lutC.reshape(-1)), axis=1)
        Ig = Ig.reshape((N, B * bC) + tuple(self.DHW))

        # pad so every tap's strided window stays in bounds
        dims = list(self.DHW)
        trs = [T, R, S]
        mpq = [M, P, Q]
        padding = [(0, 0), (0, 0)]
        for i in range(3):
            need = (mpq[i] - 1) * st[i] + (trs[i] - 1) * dil[i] + 1
            padding.append((pd[i], max(need - dims[i] - pd[i], pd[i])))
        Ipad = jnp.pad(Ig, padding)
        pdim = [padding[2 + i][0] + dims[i] + padding[2 + i][1]
                for i in range(3)]

        taps = [(t, r, s) for t in range(T) for r in range(R)
                for s in range(S)]
        chunk = max(1, -(-128 // bC))
        npix = M * P * Q
        y = jnp.zeros((N, B, bK, npix), jnp.float32)
        for i in range(0, len(taps), chunk):
            grp = taps[i:i + chunk]
            xs = []
            for (t, r, s) in grp:
                start = (0, 0, t * dil[0], r * dil[1], s * dil[2])
                limit = (N, B * bC,
                         t * dil[0] + (M - 1) * st[0] + 1,
                         r * dil[1] + (P - 1) * st[1] + 1,
                         s * dil[2] + (Q - 1) * st[2] + 1)
                sl = jax.lax.slice(Ipad, start, limit,
                                   (1, 1, st[0], st[1], st[2]))
                xs.append(sl.reshape(N, B, bC, npix))
            xc = jnp.concatenate(xs, axis=2) if len(xs) > 1 else xs[0]
            fc = jnp.concatenate(
                [Fb[:, :, :, t, r, s] for (t, r, s) in grp], axis=2) \
                if len(grp) > 1 else Fb[:, :, :, grp[0][0], grp[0][1],
                                        grp[0][2]]
            y = y + jnp.einsum("bkc,nbcp->nbkp", fc, xc,
                               preferred_element_type=jnp.float32,
                               precision=prec)
        y = jnp.moveaxis(y.reshape(N, B * bK, npix), 1, 0)
        y = jax.ops.segment_sum(y, jnp.asarray(self._flatK),
                                num_segments=self.K)
        return jnp.moveaxis(y, 0, 1).reshape(
            (N, self.K) + tuple(self.MPQ)).astype(I.dtype)

    def _build_bsmm(self):
        """Lazily build the tap-tiled BlocksparseMatMul behind
        impl='bsmm'.

        The conv's channel connectivity (bC x bK blocks over C x K) is
        lifted to a (CB*trs, KB) block layout: each filter tap tiles the
        layout along the contraction axis, so block row cb*trs + tap
        covers input features [cb*trs*b + tap*b, +b).  The whole conv
        then runs as ONE block-sparse matmul with contraction depth
        C*trs and N = batch * MPQ pixels — the dense_tile kernel's
        preferred regime (large N, deep contraction)."""
        from blocksparse_tpu.ops.matmul import BlocksparseMatMul
        bK, bC = len(self.BCK[0][1]), len(self.BCK[0][0])
        if not self.fixed_block_size or bC != bK or \
                bC not in (8, 16, 32, 64, 128) or \
                self.C % bC or self.K % bC:
            raise ValueError(
                "impl='bsmm' requires fixed square channel blocks of "
                "size 8/16/32/64/128 dividing C and K (got bC=%d bK=%d "
                "C=%d K=%d)" % (bC, bK, self.C, self.K))
        CB, KB = self.C // bC, self.K // bC
        layout = np.zeros((CB * self.trs, KB), np.int32)
        block_of = {}
        for b, (listC, listK) in enumerate(self.BCK):
            c0, k0 = listC[0], listK[0]
            if (c0 % bC or k0 % bC
                    or list(listC) != list(range(c0, c0 + bC))
                    or list(listK) != list(range(k0, k0 + bC))):
                raise ValueError(
                    "impl='bsmm' requires aligned contiguous channel "
                    "blocks (block %d spans C%s K%s)"
                    % (b, listC[:2], listK[:2]))
            cb, kb = c0 // bC, k0 // bC
            if (cb, kb) in block_of:
                raise ValueError(
                    "impl='bsmm' requires unique (cb, kb) blocks")
            block_of[(cb, kb)] = b
            layout[cb * self.trs:(cb + 1) * self.trs, kb] = 1
        op = BlocksparseMatMul(layout, block_size=bC, feature_axis=0)
        wb = np.empty(op.blocks, np.int32)
        wt = np.empty(op.blocks, np.int32)
        for w, (c, k) in enumerate(op.updat_list):
            wb[w] = block_of[(c // self.trs, k)]
            wt[w] = c % self.trs
        self._bsmm_op = op
        self._bsmm_wb = wb
        self._bsmm_wt = wt

    def _conv_fwd_bsmm(self, F, I):
        """im2col + tap-tiled block-sparse matmul (the TPU fast path).

        Each tap becomes a strided slice of the padded input; slices are
        stacked tap-minor within each channel block so x rows match the
        tiled layout of :meth:`_build_bsmm`, then the tuned bsmm kernel
        does all the FLOPs in one launch.  The reference's analog is
        im2col per superblock onto the tensor cores
        (src/blocksparse_conv_op.cc:261); on TPU the tuned
        dense_tile bsmm (benchmarks/results_canonical.json) replaces the
        hand-written SASS.  Measured vs the vmapped-conv lowering:
        benchmarks/results_conv.json."""
        N = I.shape[0]
        bC = self._bsmm_op.bsize
        T, R, S = self.TRS
        M, P, Q = self.MPQ
        st, dil, pd = self.strides, self.dilates, self.padding
        dims = list(self.DHW)
        trs_d = [T, R, S]
        mpq = [M, P, Q]
        padding = [(0, 0), (0, 0)]
        for i in range(3):
            need = (mpq[i] - 1) * st[i] + (trs_d[i] - 1) * dil[i] + 1
            padding.append((pd[i], max(need - dims[i] - pd[i], pd[i])))
        Ic = jnp.moveaxis(I, 1, 0)              # (C, N, D, H, W)
        npix = M * P * Q
        if im2col_supported(self.TRS, self.DHW, self.MPQ, list(st),
                            list(dil), list(pd), self.C, bC):
            # Pallas tap-shift im2col: ONE bandwidth-speed pass.  Any
            # XLA build of X (pad + strided tap slices + stack, or a
            # one-hot depthwise conv) writes 64-byte strided runs and
            # measured ~8.5 ms at the bench C=512/32^2 config — 6x the
            # whole block-sparse matmul (tools/tpu_conv_probe{3,4}.py).
            xc = Ic.reshape(self.C, N * self.DHW[1] * self.DHW[2])
            X = im2col(xc, self.DHW[1], self.DHW[2], R, S,
                       int(pd[1]), int(pd[2]), bC)
        else:
            # general case (stride/dilation/3-D): channel-first tap
            # slices stacked on axis 1 write the (cb, tap, ci) row
            # order the tiled layout expects without any 5-D transpose
            Ipad = jnp.pad(Ic, [padding[1], padding[0]] + padding[2:])
            xs = []
            for t in range(T):
                for r in range(R):
                    for s in range(S):
                        start = (0, 0, t * dil[0], r * dil[1],
                                 s * dil[2])
                        limit = (self.C, N,
                                 t * dil[0] + (M - 1) * st[0] + 1,
                                 r * dil[1] + (P - 1) * st[1] + 1,
                                 s * dil[2] + (Q - 1) * st[2] + 1)
                        sl = jax.lax.slice(Ipad, start, limit,
                                           (1, 1, st[0], st[1], st[2]))
                        xs.append(sl.reshape(self.C // bC, bC,
                                             N * npix))
            X = jnp.stack(xs, axis=1)           # (CB, trs, bC, N*npix)
        X = X.reshape(self.C * self.trs, N * npix)
        Fb = jnp.asarray(F).reshape(self.blocks, bC, bC, self.trs)
        W = jnp.transpose(Fb[self._bsmm_wb, :, :, self._bsmm_wt],
                          (0, 2, 1))            # (w, c, k)
        y = self._bsmm_op(X, W.astype(X.dtype))  # (K, N*npix)
        y = jnp.moveaxis(y.reshape(self.K, N, M, P, Q), 0, 1)
        return y.astype(I.dtype)

    def _conv_fwd(self, F, I):
        """I: (N, C, D, H, W); returns (N, K, M, P, Q)."""
        N = I.shape[0]
        pad = [(p, p) for p in self.padding]
        dn = jax.lax.conv_dimension_numbers(
            (N, 1, *self.DHW), (1, 1, *self.TRS),
            ("NCDHW", "OIDHW", "NCDHW"))
        # f32 accumulation only for f32 inputs: with bf16 operands a
        # preferred_element_type of f32 makes the conv TRANSPOSE see
        # (dy f32, operand bf16) and lax rejects mixed dtypes; the MXU
        # accumulates in f32 internally for bf16 convs regardless
        acc = jnp.float32 if I.dtype == jnp.float32 else None

        impl = getattr(self, "impl", "conv")
        if self.fixed_block_size and impl == "matmul":
            return self._conv_fwd_matmul(F, I)
        if self.fixed_block_size and impl == "bsmm":
            return self._conv_fwd_bsmm(F, I)
        if self.fixed_block_size:
            bK, bC = len(self.BCK[0][1]), len(self.BCK[0][0])
            Fb = jnp.asarray(F).astype(I.dtype).reshape(
                (self.blocks, bK, bC) + tuple(self.TRS))
            Ig = jnp.take(I, jnp.asarray(self._lutC).reshape(-1), axis=1)
            Ig = Ig.reshape((N, self.blocks, bC) + tuple(self.DHW))
            Ig = jnp.moveaxis(Ig, 1, 0)          # (blocks, N, bC, D, H, W)

            prec = dot_precision(I.dtype)

            def one(x, f):
                return jax.lax.conv_general_dilated(
                    x, f, window_strides=self.strides, padding=pad,
                    rhs_dilation=self.dilates, dimension_numbers=dn,
                    preferred_element_type=acc, precision=prec)
            out = jax.vmap(one)(Ig, Fb)          # (blocks, N, bK, M, P, Q)
            out = jnp.moveaxis(out, 1, 0).reshape(
                (N, self.blocks * bK) + tuple(self.MPQ))
            y = jax.ops.segment_sum(
                jnp.moveaxis(out, 1, 0), jnp.asarray(self._flatK),
                num_segments=self.K)
            return jnp.moveaxis(y, 0, 1).astype(I.dtype)

        # ragged blocks: one scan body over zero-padded uniform blocks
        # (replaces the round-2 host-unrolled loop whose compile time
        # grew linearly in the block count)
        if isinstance(F, (list, tuple)):
            Ff = jnp.concatenate([jnp.asarray(f).reshape(-1) for f in F])
        else:
            Ff = jnp.asarray(F).reshape(-1)
        Fe = jnp.concatenate([Ff, jnp.zeros((1,), Ff.dtype)])
        Fp = Fe[jnp.asarray(self._fmap_pad)].reshape(
            (self.blocks, self._bKmax, self._bCmax) + tuple(self.TRS))
        Ie = jnp.concatenate(
            [I, jnp.zeros((N, 1) + tuple(self.DHW), I.dtype)], axis=1)
        prec = dot_precision(I.dtype)

        def body(y, args):
            lutC, lutK, Fb = args
            x = jnp.take(Ie, lutC, axis=1)
            o = jax.lax.conv_general_dilated(
                x, Fb, window_strides=self.strides, padding=pad,
                rhs_dilation=self.dilates, dimension_numbers=dn,
                preferred_element_type=acc, precision=prec)
            return y.at[:, lutK].add(o.astype(jnp.float32)), None

        y0 = jnp.zeros((N, self.K + 1) + tuple(self.MPQ), jnp.float32)
        y, _ = jax.lax.scan(
            body, y0, (jnp.asarray(self._lutC_pad),
                       jnp.asarray(self._lutK_pad), Fp))
        return y[:, :self.K].astype(I.dtype)

    def __call__(self, F, I):
        assert I.shape[1] == self.C
        I3 = I.reshape((I.shape[0], self.C) + tuple(self.DHW))
        out = self._conv_fwd(F, I3)
        return out

    # ---------------- l2 norm (per output-channel row over C,T,R,S) ----

    def l2_normalize(self, F, gain=None, epsilon=1e-12, dtype=None):
        """Per output-channel-row L2 norm over (bC, T, R, S) — KCTRS.
        Fixed-size blocks reduce with one reshape; ragged blocks reduce
        with a host-built per-element row map + segment_sum (reference
        src/blocksparse_l2_norm_op.cc:33 L2NormalizeKCTRS drives the
        same reduction through its l2_lut)."""
        if self.fixed_block_size and not isinstance(F, (list, tuple)):
            bK, bC = len(self.BCK[0][1]), len(self.BCK[0][0])
            Fb = jnp.asarray(F).reshape((self.blocks, bK, -1))
            ssq = jnp.sum(jnp.square(Fb.astype(jnp.float32)), axis=2,
                          keepdims=True)
            norm = jnp.sqrt(jnp.maximum(ssq, epsilon))
            out = Fb.astype(jnp.float32) / norm
            if gain is not None:
                g = gain.reshape(self.blocks, bK, 1).astype(jnp.float32)
                out = out * g
            return out.reshape(jnp.asarray(F).shape).astype(dtype or F.dtype)
        return self._l2_normalize_segmented(
            F, self._krow_of_elem, self._n_krows, gain, epsilon, dtype)

    def _l2_normalize_segmented(self, F, seg, nseg, gain, epsilon, dtype):
        if isinstance(F, (list, tuple)):
            Ff = jnp.concatenate([jnp.asarray(f).reshape(-1) for f in F])
        else:
            Ff = jnp.asarray(F).reshape(-1)
        out_dtype = dtype or Ff.dtype
        f32 = Ff.astype(jnp.float32)
        seg = jnp.asarray(seg)
        ssq = jax.ops.segment_sum(jnp.square(f32), seg, num_segments=nseg)
        scale = 1.0 / jnp.sqrt(jnp.maximum(ssq, epsilon))
        if gain is not None:
            scale = scale * jnp.asarray(gain).reshape(-1).astype(jnp.float32)
        return (f32 * scale[seg]).astype(out_dtype)

    # ---------------- NumPy goldens (reference conv.py:540-661) --------

    def init_slices(self):
        if self.mpqSlice is None:
            self.mpqSlice = []
            self.dhwSlice = []
            fdata = list(zip(self.TRS, self.padding, self.strides,
                             self.dilates))
            for i in range(3):
                self.mpqSlice.append(
                    [fprop_slice(x, self.DHW[i], *fdata[i])
                     for x in range(self.MPQ[i])])
                self.dhwSlice.append(
                    [bprop_slice(x, self.MPQ[i], *fdata[i])
                     for x in range(self.DHW[i])])

    def fprop_test(self, F, I, alpha=1.0):
        self.init_slices()
        N = I.shape[0]
        O = np.zeros([N, self.K] + self.MPQ)
        mSlice, pSlice, qSlice = self.mpqSlice
        for block in range(self.blocks):
            blockF = F[block]
            blockK = blockF.shape[0]
            lutC, lutK = self.BCK[block]
            for m, p, q in np.ndindex(*self.MPQ):
                sliceT, sliceD, _ = mSlice[m]
                sliceR, sliceH, _ = pSlice[p]
                sliceS, sliceW, _ = qSlice[q]
                slicedF = blockF[:, :, sliceT, sliceR, sliceS] \
                    .reshape((blockK, -1))
                slicedI = I[:, lutC][:, :, sliceD, sliceH, sliceW] \
                    .reshape((N, -1))
                O[:, lutK, m, p, q] += np.dot(slicedI, slicedF.T) * alpha
        return O

    def bprop_test(self, F, I, alpha=1.0):
        self.init_slices()
        N = I.shape[0]
        O = np.zeros([N, self.C] + self.DHW)
        dSlice, hSlice, wSlice = self.dhwSlice
        for block in range(self.blocks):
            blockF = np.transpose(F[block][:, :, ::-1, ::-1, ::-1],
                                  (1, 0, 2, 3, 4)).copy()
            blockC = blockF.shape[0]
            lutC, lutK = self.BCK[block]
            for d, h, w in np.ndindex(*self.DHW):
                sliceT, sliceM = dSlice[d]
                sliceR, sliceP = hSlice[h]
                sliceS, sliceQ = wSlice[w]
                slicedF = blockF[:, :, sliceT, sliceR, sliceS] \
                    .reshape((blockC, -1))
                slicedI = I[:, lutK][:, :, sliceM, sliceP, sliceQ] \
                    .reshape((N, -1))
                O[:, lutC, d, h, w] += np.dot(slicedI, slicedF.T) * alpha
        return O

    def updat_test(self, E, I, alpha=1.0, transpose=False):
        self.init_slices()
        U = []
        N = I.shape[0]
        mSlice, pSlice, qSlice = self.mpqSlice
        for block in range(self.blocks):
            lutC, lutK = self.BCK[block]
            dimF = self.f_shape(block)
            dimF = [dimF[0], dimF[1]] + self.TRS
            blockU = np.zeros(dimF)
            U.append(blockU)
            for m, p, q in np.ndindex(*self.MPQ):
                sliceT, sliceD, tlen = mSlice[m]
                sliceR, sliceH, rlen = pSlice[p]
                sliceS, sliceW, slen = qSlice[q]
                slicedI = I[:, lutC][:, :, sliceD, sliceH, sliceW] \
                    .reshape(N, -1)
                slicedE = E[:, lutK, m, p, q]
                blockU[:, :, sliceT, sliceR, sliceS] += np.dot(
                    slicedE.T, slicedI).reshape(
                        (dimF[0], dimF[1], tlen, rlen, slen)) * alpha
        return self.collapse_filter(U, dtype=np.float32)

    def l2_normalize_test(self, F, gain=None, epsilon=1e-12):
        normF = []
        if gain is None:
            for blockF in F:
                norm = np.sqrt(np.maximum(np.sum(
                    np.square(blockF), axis=(1, 2, 3, 4), keepdims=True),
                    epsilon))
                normF.append(blockF / norm)
        else:
            offsetK = 0
            for blockF in F:
                blockK = blockF.shape[0]
                g = gain[offsetK:offsetK + blockK].reshape(
                    (blockK, 1, 1, 1, 1))
                norm = np.sqrt(np.maximum(np.sum(
                    np.square(blockF), axis=(1, 2, 3, 4), keepdims=True),
                    epsilon))
                normF.append(g * blockF / norm)
                offsetK += blockK
        return self.collapse_filter(normF, dtype=np.float32)


class BlocksparseDeconv(BlocksparseConv):
    """Reference conv.py:728: the exact linear transpose of the conv."""

    def __init__(self, BCK, TRS, DHW, MPQ=None, strides=(1, 1, 1),
                 dilates=(1, 1, 1), padding="SAME", debug=False):
        BKC = [[listK, listC] for listC, listK in BCK]
        if MPQ is None:
            d = len(TRS)
            std = list(strides)[-d:]
            dil = list(dilates)[-d:]
            pad = get_padding(padding, list(TRS), dil)
            pad = pad[-d:]
            MPQ = [in_dim(*dims)
                   for dims in zip(TRS, DHW, pad, std, dil)]
        super().__init__(BKC, TRS, MPQ, DHW, strides, dilates, padding,
                         debug, True)

    def i_shape(self, N):
        return [N, self.K] + self.MPQ

    def o_shape(self, N):
        return [N, self.C] + self.DHW

    def fprop_test(self, F, I, alpha=1.0):
        return super().bprop_test(F, I, alpha)

    def bprop_test(self, F, I, alpha=1.0):
        return super().fprop_test(F, I, alpha)

    def updat_test(self, E, I, alpha=1.0):
        return super().updat_test(I, E, alpha, transpose=True)

    def __call__(self, F, I):
        assert I.shape[1] == self.K
        N = I.shape[0]
        # transpose of the underlying conv's forward, linear in I
        conv_fwd = lambda x: self._conv_fwd(F, x)
        dummy = jax.ShapeDtypeStruct(tuple([N, self.C] + self.DHW), I.dtype)
        (out,) = jax.linear_transpose(conv_fwd, dummy)(I)
        return out

    def l2_normalize_test(self, F, gain=None, epsilon=1e-12):
        normF = []
        if gain is None:
            for blockF in F:
                norm = np.sqrt(np.maximum(np.sum(
                    np.square(blockF), axis=(0, 2, 3, 4), keepdims=True),
                    epsilon))
                normF.append(blockF / norm)
        else:
            offsetK = 0
            for blockF in F:
                blockK = blockF.shape[1]
                g = gain[offsetK:offsetK + blockK].reshape(
                    (1, blockK, 1, 1, 1))
                norm = np.sqrt(np.maximum(np.sum(
                    np.square(blockF), axis=(0, 2, 3, 4), keepdims=True),
                    epsilon))
                normF.append(g * blockF / norm)
                offsetK += blockK
        return self.collapse_filter(normF, dtype=np.float32)

    def l2_normalize(self, F, gain=None, epsilon=1e-12, dtype=None):
        """Per input-channel-column L2 norm over (bK, T, R, S) — CKTRS
        (reference src/blocksparse_l2_norm_op.cc:47 L2NormalizeCKTRS).
        Ragged blocks use the per-element column map."""
        if self.fixed_block_size and not isinstance(F, (list, tuple)):
            bK, bC = len(self.BCK[0][1]), len(self.BCK[0][0])
            Fb = jnp.asarray(F).reshape((self.blocks, bK, bC, -1))
            ssq = jnp.sum(jnp.square(Fb.astype(jnp.float32)), axis=(1, 3),
                          keepdims=True)
            norm = jnp.sqrt(jnp.maximum(ssq, epsilon))
            out = Fb.astype(jnp.float32) / norm
            if gain is not None:
                g = gain.reshape(self.blocks, 1, bC, 1).astype(jnp.float32)
                out = out * g
            return out.reshape(jnp.asarray(F).shape).astype(dtype or F.dtype)
        return self._l2_normalize_segmented(
            F, self._ccol_of_elem, self._n_ccols, gain, epsilon, dtype)


# ------------------------------------------------------------------
# ConvEdgeBias (reference conv.py:55-225)
# ------------------------------------------------------------------

def conv_edge_bias_init(y_shape, x_shape, w_shape, strides=None,
                        padding="SAME", data_format="NHWC", dilations=None):
    y_shape = list(getattr(y_shape, "shape", y_shape))
    x_shape = list(getattr(x_shape, "shape", x_shape))
    w_shape = list(getattr(w_shape, "shape", w_shape))
    return ConvEdgeBias(y_shape, x_shape, w_shape, strides, padding,
                        data_format, dilations)


def deconv_edge_bias_init(y_shape, x_shape, w_shape, strides=None,
                          padding="SAME", data_format="NHWC", dilations=None):
    y_shape = list(getattr(y_shape, "shape", y_shape))
    x_shape = list(getattr(x_shape, "shape", x_shape))
    w_shape = list(getattr(w_shape, "shape", w_shape))
    return ConvEdgeBias(x_shape, y_shape, w_shape, strides, padding,
                        data_format, dilations, deconv=True)


class ConvEdgeBias:
    """Learned gain+bias per unique filter/image-edge overlap pattern.

    Output pixels are hashed by which filter taps fall off the image
    edge; each unique pattern gets one (gain, bias) pair per channel."""

    Cache = dict()

    def __init__(self, y_shape, x_shape, w_shape, strides=None,
                 padding="SAME", data_format="NHWC", dilations=None,
                 deconv=False):
        if data_format in ("NCW", "NCHW", "NCDHW"):
            self.layout = 0
            sdim = slice(2, None)
            fdim = slice(0, -2)   # RSCK (tf filter layout)
            cdim = 1
        else:
            self.layout = 1
            sdim = slice(1, -1)
            fdim = slice(0, -2)
            cdim = -1

        C = x_shape[cdim]
        K = y_shape[cdim]
        MPQ = expand_dims(y_shape[sdim])
        DHW = expand_dims(x_shape[sdim])
        TRS = expand_dims(w_shape[fdim])

        strides = (1, 1, 1) if strides is None else expand_dims(strides[sdim])
        dilates = (1, 1, 1) if dilations is None \
            else expand_dims(dilations[sdim])

        if isinstance(padding, str) and padding.upper() == "VALID":
            padding = (0, 0, 0)
        else:
            padding = []
            for S, Q, W, stride, dilate in zip(TRS, MPQ, DHW, strides,
                                               dilates):
                padding.append(max((Q - 1) * stride + S - W, 0) // 2)

        if deconv:
            lut_func = bprop_lut
            MPQ, DHW = DHW, MPQ
            C, K = K, C
        else:
            lut_func = fprop_lut

        key = tuple(tuple(a) for a in (MPQ, DHW, TRS, padding, strides,
                                       dilates))
        entry = ConvEdgeBias.Cache.get(key)
        if entry is None:
            mpqLut = []
            fdata = list(zip(TRS, padding, strides, dilates))
            for i in range(3):
                mpqLut.append([lut_func(d, DHW[i], *fdata[i])
                               for d in range(MPQ[i])])
            self._build_edge_lut(MPQ, mpqLut)
            ConvEdgeBias.Cache[key] = (self.edgeBiasMap, self.pattern_map,
                                       self.edgeBiasDim)
        else:
            self.edgeBiasMap, self.pattern_map, self.edgeBiasDim = entry

        self.K = K
        self.shape = (self.edgeBiasDim, K) if self.layout \
            else (K, self.edgeBiasDim)

    def _build_edge_lut(self, MPQ, mpqLut):
        PQ = MPQ[1] * MPQ[2]
        Q = MPQ[2]
        edge_map = {}
        mLut, pLut, qLut = mpqLut
        for m, p, q in np.ndindex(*MPQ):
            pat = []
            for di, d in enumerate(mLut[m]):
                for hi, h in enumerate(pLut[p]):
                    for wi, w in enumerate(qLut[q]):
                        if any(v == -1 for v in (d, h, w)):
                            pat.append((di, hi, wi))
            if pat:
                edge_map.setdefault(tuple(pat), []).append(
                    m * PQ + p * Q + q)

        self.edgeBiasDim = len(edge_map)
        # stable ordering by first pixel (reference conv.py:149)
        self.edgeBiasMap = sorted(edge_map.values(), key=lambda v: v[0])
        # pixel -> pattern-id map; non-edge pixels get id edgeBiasDim
        mpq_total = int(np.prod(MPQ))
        pattern_map = np.full(mpq_total, self.edgeBiasDim, np.int32)
        for i, pix in enumerate(self.edgeBiasMap):
            pattern_map[pix] = i
        self.pattern_map = pattern_map

    def __call__(self, x, g, b, inference=False, bench=0, name=None):
        if not self.edgeBiasDim:
            return x
        pm = jnp.asarray(self.pattern_map)
        K = self.K
        E = self.edgeBiasDim
        if self.layout:  # NHWC: g/b shaped (E, K)
            g_ext = jnp.concatenate([g, jnp.ones((1, K), g.dtype)], axis=0)
            b_ext = jnp.concatenate([b, jnp.zeros((1, K), b.dtype)], axis=0)
            shape = x.shape
            xr = x.reshape(shape[0], -1, K)
            y = xr * g_ext[pm][None] + b_ext[pm][None]
            return y.reshape(shape).astype(x.dtype)
        else:            # NCHW: g/b shaped (K, E)
            g_ext = jnp.concatenate([g, jnp.ones((K, 1), g.dtype)], axis=1)
            b_ext = jnp.concatenate([b, jnp.zeros((K, 1), b.dtype)], axis=1)
            shape = x.shape
            xr = x.reshape(shape[0], K, -1)
            y = xr * g_ext[:, pm][None] + b_ext[:, pm][None]
            return y.reshape(shape).astype(x.dtype)

    # ---------------- goldens (reference conv.py:163-214) ----------

    def edge_bias_test(self, x, g, b):
        if not self.edgeBiasDim:
            return x
        if self.layout:
            N = x.shape[0]
            K = x.shape[-1]
            y = np.array(x.reshape(N, -1, K))
            for i in range(self.edgeBiasDim):
                y[:, self.edgeBiasMap[i], :] = \
                    y[:, self.edgeBiasMap[i], :] * g[i].reshape(1, 1, K) \
                    + b[i].reshape(1, 1, K)
            return y.reshape(x.shape)
        else:
            N, K = x.shape[0:2]
            y = np.array(x.reshape(N, K, -1))
            for i in range(self.edgeBiasDim):
                y[:, :, self.edgeBiasMap[i]] = \
                    y[:, :, self.edgeBiasMap[i]] * g[:, i].reshape(1, K, 1) \
                    + b[:, i].reshape(1, K, 1)
            return y.reshape(x.shape)

    def edge_bias_grad_test(self, dy, x, g):
        if not self.edgeBiasDim:
            return dy, None, None
        lut = self.edgeBiasMap
        dy_shape = dy.shape
        if self.layout:
            N = dy_shape[0]
            K = dy_shape[-1]
            x = x.reshape(N, -1, K)
            dy = dy.reshape(N, -1, K)
            dx = np.array(dy)
            dg = np.empty(self.shape, dtype=np.float32)
            db = np.empty(self.shape, dtype=np.float32)
            for i in range(self.edgeBiasDim):
                dx[:, lut[i], :] *= g[i].reshape(1, 1, K)
                dg[i] = (dy[:, lut[i], :] * x[:, lut[i], :]).sum(axis=(0, 1))
                db[i] = dy[:, lut[i], :].sum(axis=(0, 1))
        else:
            N, K = dy_shape[0:2]
            x = x.reshape(N, K, -1)
            dy = dy.reshape(N, K, -1)
            dx = np.array(dy)
            dg = np.empty(self.shape, dtype=np.float32)
            db = np.empty(self.shape, dtype=np.float32)
            for i in range(self.edgeBiasDim):
                dx[:, :, lut[i]] *= g[:, i].reshape(1, K, 1)
                dg[:, i] = (dy[:, :, lut[i]] * x[:, :, lut[i]]) \
                    .sum(axis=(0, 2))
                db[:, i] = dy[:, :, lut[i]].sum(axis=(0, 2))
        return dx.reshape(dy_shape), dg, db


# ------------------------------------------------------------------
# Channel-wise linear (reference conv.py:906-998)
# ------------------------------------------------------------------

def cwise_linear(x, gain=None, bias=None, relu=False, bias_first=False,
                 use_tf=False):
    """y = relu(a*x + b) (or (x+b)*a with bias_first) with per-channel
    a, b broadcast over NC[DHW] middle dim.  XLA fuses this; the
    reference needed a kernel because TF's broadcast was slow."""
    assert gain is not None or bias is not None
    bcast = [1] * x.ndim
    bcast[1] = x.shape[1]
    y = x
    if bias_first:
        if bias is not None:
            y = y + bias.reshape(bcast)
        if gain is not None:
            y = y * gain.reshape(bcast)
    else:
        if gain is not None:
            y = y * gain.reshape(bcast)
        if bias is not None:
            y = y + bias.reshape(bcast)
    return jax.nn.relu(y) if relu else y


def cwise_linear_test(x, a=1, b=0, relu=False):
    bcast = list(x.shape)
    for i in range(len(bcast)):
        if i != 1:
            bcast[i] = 1
    if not np.isscalar(a):
        a = a.reshape(bcast)
    if not np.isscalar(b):
        b = b.reshape(bcast)
    y = a * x + b
    if relu:
        y = np.maximum(y, 0.0)
    return y


def cwise_linear_grad_test(dy, x, a=1, b=0, relu=False):
    bcast = list(dy.shape)
    axis = []
    for i in range(len(bcast)):
        if i != 1:
            bcast[i] = 1
            axis.append(i)
    axis = tuple(axis)
    if not np.isscalar(a):
        a = a.reshape(bcast)
    if not np.isscalar(b):
        b = b.reshape(bcast)
    if relu:
        dy = dy * (a * x + b > 0.0)
    dx = a * dy
    da = np.sum(dy * x, axis=axis)
    db = np.sum(dy, axis=axis)
    return dx, da, db
