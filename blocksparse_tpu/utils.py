"""Host-side utilities: shape math, z-order curves, attention conv layouts, RNG state.

TPU-native rework of the reference's ``blocksparse/utils.py``
(/root/reference/blocksparse/utils.py:89-335).  The GPU entropy buffer
(LFSR state for in-kernel RNG) is replaced by a JAX PRNG key registry:
Pallas TPU kernels seed ``pltpu.prng_seed`` from integer seeds derived here,
and XLA-level ops use ``jax.random`` directly.
"""
from __future__ import annotations

from functools import reduce
from operator import mul

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------
# small math helpers
# ------------------------------------------------------------------

def ceil_div(x: int, y: int) -> int:
    return -(-x // y)


def reduce_mul(vals, init=1):
    return reduce(mul, vals, init)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def z_order_2d(x: int, y: int) -> int:
    """Morton interleave of 2-D coords (reference utils.py:95)."""
    answer = 0
    bits = max(len(bin(x)), len(bin(y))) - 2
    for i in range(bits):
        mshifted = 1 << i
        shift = i
        answer |= ((x & mshifted) << shift) | ((y & mshifted) << (shift + 1))
    return answer


def z_order_3d(z: int, y: int, x: int) -> int:
    """Morton interleave of 3-D coords (reference utils.py:106)."""
    answer = 0
    bits = max(len(bin(x)), len(bin(y)), len(bin(z))) - 2
    for i in range(bits):
        mshifted = 1 << i
        shift = i << 1
        answer |= (
            ((x & mshifted) << shift)
            | ((y & mshifted) << (shift + 1))
            | ((z & mshifted) << (shift + 2))
        )
    return answer


def magic32u(nmax: int, d: int):
    """Magic number + shift for unsigned integer division (reference utils.py:120).

    Kept for API parity / host-side tooling.  TPU kernels don't need magic
    division — index arithmetic happens in scalar registers on host-prefetched
    LUTs — but the conv grid math still uses it for validation against the
    reference's descriptors.
    """
    nc = ((nmax + 1) // d) * d - 1
    nbits = len(bin(nmax)) - 2
    for p in range(0, 2 * nbits + 1):
        if 2 ** p > nc * (d - 1 - (2 ** p - 1) % d):
            m = (2 ** p + d - 1 - (2 ** p - 1) % d) // d
            return (m, p)
    raise ValueError("Can't find magic number for division")


def magic64u(d: int):
    nmax = 0xFFFFFFFF if d == 3 else 0x7FFFFFFF
    magic, shift = magic32u(nmax, d)
    if magic != 1:
        shift -= 32
    return (magic, shift)


# ------------------------------------------------------------------
# Entropy / RNG state.
#
# The reference keeps a persistent GPU buffer of LFSR state
# (utils.py:21-39) consumed by dropout/quantize kernels.  On TPU the
# per-core PRNG is seeded per kernel launch, so "entropy" reduces to a
# host-side seed sequence.  set_entropy()/get_entropy() keep API parity.
# ------------------------------------------------------------------

# parity constant (the reference sized a GPU LFSR buffer with this,
# utils.py:24); kept for imports that reference it
entropy_size = 80 * 3 * 1024

_g_entropy_key = None


def set_entropy(init=None):
    """Initialise the global RNG used by dropout / stochastic rounding ops."""
    global _g_entropy_key
    if init is None:
        init = np.random.randint(0, 2 ** 31 - 1)
    # ensure_compile_time_eval: PRNGKey is internally jitted, so calling
    # it during a trace would inline to a TRACER of that trace — storing
    # that in the global breaks every later trace
    with jax.ensure_compile_time_eval():
        _g_entropy_key = jax.random.PRNGKey(int(init))


_g_entropy_counter = 0


def get_entropy():
    """Return a fresh PRNG key, advancing the global stream.

    The global key stays CONCRETE: deriving via fold_in with a host
    counter (instead of storing split results) keeps tracers from
    leaking into the global when called during a jit trace — storing a
    traced key breaks every later trace (UnexpectedTracerError)."""
    global _g_entropy_key, _g_entropy_counter
    if _g_entropy_key is None:
        set_entropy()
    _g_entropy_counter += 1
    with jax.ensure_compile_time_eval():
        return jax.random.fold_in(_g_entropy_key, _g_entropy_counter)


def scalar_constant(value, dtype=jnp.float32, name=None):
    """API-parity shim for the reference's host-scalar feeding (utils.py:43).

    In JAX, python scalars passed to jitted functions are either traced args
    or baked constants; there is no op-input plumbing to replicate.  Tensors
    pass through unchanged.
    """
    if isinstance(value, (jnp.ndarray, jax.Array)):
        return value
    return jnp.asarray(value, dtype=dtype)


def reset_scalar_constants():
    """API parity with reference utils.py:72 — the reference clears its
    per-graph scalar-constant cache between graphs; there is no cache
    here (jit dedups constants), so this is a documented no-op."""
    pass


# ------------------------------------------------------------------
# Conv output-dim math (reference utils.py:161-192)
# ------------------------------------------------------------------

def dilation_size(S, dil=1):
    return S * dil - dil + 1


def out_dim(S, W, pad, std=1, dil=1):
    return ceil_div(W - dilation_size(S, dil) + 1 + 2 * pad, std)


def same_pad(S, dil=1):
    return dilation_size(S, dil) // 2


def backward_pad(S, pad, dil=1):
    return dilation_size(S, dil) - pad - 1


def conv_slice(q, W, S, pad, std=1, dil=1):
    qs = q * std - pad
    ws = []
    for s in range(S):
        w = qs + s * dil
        if 0 <= w < W:
            ws.append(w)
    return ws


def deconv_slice(x, Q, S, bpad, std=1, dil=1):
    xs = x - bpad
    e = []
    for s in range(S):
        q = xs + s * dil
        if q % std == 0:
            q //= std
            if 0 <= q < Q:
                e.append(q)
    return e


# ------------------------------------------------------------------
# Attention layouts that emulate (de)convolution
# (reference utils.py:194-335) — pure host-side NumPy, used to drive
# BlocksparseTransformer.
# ------------------------------------------------------------------

def bst_conv_layout(input_h=1, input_w=1, filter_h=1, filter_w=1, stride=1,
                    blk_size=32, autoregressive=True):
    """Block-attention layout + mask callback making attention act like a conv."""
    H, W, R, S = input_h, input_w, filter_h, filter_w

    assert H % stride == 0 or H == 1
    assert W % stride == 0

    P = H // stride or 1
    Q = W // stride

    if H == 1:
        R = 1
        pad_r = 0
    else:
        pad_r = -1
        for r in range(R):
            if P == out_dim(R, H, r, stride):
                pad_r = r
                break
    assert pad_r >= 0, "Even size filters only work with stride 2."

    pad_s = -1
    for s in range(S):
        if Q == out_dim(S, W, s, stride):
            pad_s = s
            break
    assert pad_s >= 0, "Even size filters only work with stride 2."

    assert P * Q % blk_size == 0, f"P:{P} Q:{Q}"
    assert H * W % blk_size == 0, f"H:{H} W:{W}"

    mask_set = set()
    layout = np.zeros((P * Q // blk_size, H * W // blk_size), dtype=bool)

    for p, q in np.ndindex(P, Q):
        for h in conv_slice(p, H, R, pad_r, stride):
            for w in conv_slice(q, W, S, pad_s, stride):
                x = h * W + w
                y = p * Q + q
                if not autoregressive or p * stride * Q * stride + q * stride >= x:
                    layout[y // blk_size, x // blk_size] = 1
                    mask_set.add((y, x))

    def cb(blk_shape, head_idx, qry_idx, key_idx, blk_idx):
        mask = np.zeros(blk_shape, dtype=bool)
        q0 = qry_idx * blk_shape[0]
        k0 = key_idx * blk_shape[1]
        for q, k in np.ndindex(blk_shape):
            if (q0 + q, k0 + k) in mask_set:
                mask[q, k] = 1
        return mask

    return layout, cb


def bst_deconv_layout(output_h=1, output_w=1, filter_h=1, filter_w=1, stride=1,
                      blk_size=32, autoregressive=True):
    """Block-attention layout + mask callback emulating a deconvolution."""
    H, W, R, S = output_h, output_w, filter_h, filter_w

    assert H % stride == 0 or H == 1
    assert W % stride == 0

    P = H // stride or 1
    Q = W // stride

    if H == 1:
        R = 1
        pad_r = 0
    else:
        pad_r = -1
        for r in range(R):
            if P == out_dim(R, H, r, stride):
                pad_r = backward_pad(R, r)
                break
    assert pad_r >= 0, "Even size filters only work with stride 2."

    pad_s = -1
    for s in range(S):
        if Q == out_dim(S, W, s, stride):
            pad_s = backward_pad(S, s)
            break
    assert pad_s >= 0, "Even size filters only work with stride 2."

    assert P * Q % blk_size == 0, f"P:{P} Q:{Q}"
    assert H * W % blk_size == 0, f"H:{H} W:{W}"

    mask_set = set()
    layout = np.zeros((H * W // blk_size, P * Q // blk_size), dtype=bool)

    for h, w in np.ndindex(H, W):
        for p in deconv_slice(h, P, R, pad_r, stride):
            for q in deconv_slice(w, Q, S, pad_s, stride):
                y = h * W + w
                x = p * Q + q
                if not autoregressive or y >= p * stride * Q * stride + q * stride:
                    layout[y // blk_size, x // blk_size] = 1
                    mask_set.add((y, x))

    def cb(blk_shape, head_idx, qry_idx, key_idx, blk_idx):
        mask = np.zeros(blk_shape, dtype=bool)
        q0 = qry_idx * blk_shape[0]
        k0 = key_idx * blk_shape[1]
        for q, k in np.ndindex(blk_shape):
            if (q0 + q, k0 + k) in mask_set:
                mask[q, k] = 1
        return mask

    return layout, cb
