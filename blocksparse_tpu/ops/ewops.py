"""Elementwise op suite.

TPU-native equivalent of the reference's fused elementwise kernels
(/root/reference/blocksparse/ewops.py, /root/reference/src/ew_op_gpu.cu).

Design note: the reference hand-fuses elementwise chains because TF 1.x
wouldn't; XLA fuses elementwise ops into neighboring HLOs automatically,
so most of these are thin jnp wrappers that exist for API parity and for
the places where *semantics* differ from stock ops:

* ``float_cast`` — independent forward/backward cast dtypes (the key
  mixed-precision primitive, reference ewops.py:178).
* ``dropout`` — explicit reusable mask (survives recompute) with
  broadcastable mask shapes (reference ewops.py:214).
* ``filter_tensor`` — inf/nan scrubbing + scale with identical grad
  filtering (reference ewops.py:163).
* ``concrete_gate`` — L0-norm hard-concrete gate (reference ewops.py:250).
* deterministic bias grads come for free (XLA reductions, no atomics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blocksparse_tpu.utils import get_entropy


# ---------------- basic ops (API parity; XLA fuses) ----------------

def add(x, y, name=None): return jnp.add(x, y)
def multiply(x, y, name=None): return jnp.multiply(x, y)
def subtract(x, y, name=None): return jnp.subtract(x, y)
def divide(x, y, name=None): return jnp.divide(x, y)
def maximum(x, y, name=None): return jnp.maximum(x, y)
def minimum(x, y, name=None): return jnp.minimum(x, y)
def negative(x, name=None): return jnp.negative(x)
def reciprocal(x, name=None): return jnp.reciprocal(x)
def square(x, name=None): return jnp.square(x)
def sqrt(x, name=None): return jnp.sqrt(x)
def exp(x, name=None): return jnp.exp(x)
def log(x, name=None): return jnp.log(x)
def sigmoid(x, name=None): return jax.nn.sigmoid(x)
def tanh(x, name=None): return jnp.tanh(x)
def relu(x, name=None): return jax.nn.relu(x)


def elu(x, alpha=1.0, name=None):
    return jax.nn.elu(x, alpha)


def gelu(x, alpha=0.044715, name=None):
    """tanh-approx gelu (reference GELU_OP with alpha=0.044715)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        np.sqrt(2.0 / np.pi).astype(np.float32) * (x + alpha * x * x * x)))


def swish(x, alpha=1.0, name=None):
    return x * jax.nn.sigmoid(alpha * x)


def fast_gelu(x, name=None):
    """sigmoid-approx gelu == swish(1.702) (reference ewops.py:113)."""
    return swish(x, alpha=1.702)


def add_n8(xs, name=None):
    assert len(xs) <= 8
    return add_n(list(xs))


def add_n(xs, name=None):
    """Tree-add; the reference builds 8-way fused trees (ewops.py:276).
    XLA fuses the whole chain, so a simple sum suffices."""
    xs = list(xs)
    if len(xs) == 1:
        return xs[0]
    total = xs[0]
    for x in xs[1:]:
        total = total + x
    return total


# ---------------- filter_tensor / scale_tensor ----------------

def _filter_val(x, scale, saturate, zero_infs, zero_nans):
    f32 = x.astype(jnp.float32)
    if zero_infs:
        f32 = jnp.where(jnp.isinf(f32), 0.0, f32)
    if zero_nans:
        f32 = jnp.where(jnp.isnan(f32), 0.0, f32)
    if saturate:
        f32 = jnp.clip(f32, -saturate, saturate)
    return (f32 * scale).astype(x.dtype)


def filter_tensor(x, scale=1.0, saturate=0.0, zero_infs=False,
                  zero_nans=False):
    """y = scale * scrub(x); grads get the identical scrubbing
    (reference grad: ewops.py:170)."""
    saturate = float(saturate)

    @jax.custom_vjp
    def _ft(x, scale):
        return _filter_val(x, scale, saturate, zero_infs, zero_nans)

    def fwd(x, scale):
        return _ft(x, scale), scale

    def bwd(scale, dy):
        return _filter_val(dy, scale, saturate, zero_infs, zero_nans), None

    _ft.defvjp(fwd, bwd)
    return _ft(x, jnp.asarray(scale, jnp.float32))


filter_tensor_op = filter_tensor  # reference export name (ewops.py:160)


def scale_tensor(x, scale=1.0):
    return filter_tensor(x, scale=scale)


# ---------------- float_cast ----------------

def float_cast(x, dtype, dx_dtype=None, name=None):
    """Cast with an independently chosen backward-cast dtype.

    The reference uses this to run fprop in fp16 while keeping the
    gradient stream in fp32 (or vice versa) — ewops.py:178.
    """
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.float32, jnp.float16, jnp.bfloat16):
        raise ValueError("Only float32/float16/bfloat16 supported.")
    if x.dtype == dtype:
        return x
    if dx_dtype is None:
        dx_dtype = x.dtype

    @jax.custom_vjp
    def _cast(x):
        return x.astype(dtype)

    def fwd(x):
        return x.astype(dtype), None

    def bwd(_, dy):
        return (dy.astype(dx_dtype),)

    _cast.defvjp(fwd, bwd)
    return _cast(x)


# ---------------- dropout ----------------

def dropout(x, keep_prob, mask=None, mask_shape=None, key=None):
    """Returns (y, mask).  The mask is an explicit tensor so it can be
    reused across gradient recompute (reference ewops.py:214) and
    broadcast via mask_shape.  Pass ``key`` for functional RNG; without
    it the global entropy stream is consumed at trace time."""
    if mask is None:
        if key is None:
            key = get_entropy()
        shape = x.shape
        if mask_shape is not None and len(mask_shape) > 0:
            for m_dim, x_dim in zip(mask_shape, x.shape):
                assert m_dim == 1 or m_dim == x_dim, \
                    f"incompatible mask_shape: {mask_shape} x.shape: {x.shape}"
            shape = tuple(mask_shape)
        mask = jax.random.bernoulli(key, p=float(keep_prob), shape=shape)
    scale = 1.0 / float(keep_prob)
    y = jnp.where(mask, x * jnp.asarray(scale, x.dtype), jnp.zeros((), x.dtype))
    return y, mask


# ---------------- concrete gate (L0 pruning) ----------------

def concrete_gate(loga, tempurature=2.0 / 3.0, limit_a=-0.1, limit_b=1.1,
                  epsilon=1e-6, key=None):
    """Hard-concrete gate sample (reference ewops.py:250,
    src/ew_op_gpu.cu concrete_gate)."""
    if key is None:
        key = get_entropy()
    u = jax.random.uniform(key, loga.shape, jnp.float32,
                           minval=epsilon, maxval=1.0 - epsilon)
    s = jax.nn.sigmoid((jnp.log(u) - jnp.log(1.0 - u)
                        + loga.astype(jnp.float32)) / tempurature)
    sbar = s * (limit_b - limit_a) + limit_a
    return jnp.clip(sbar, 0.0, 1.0).astype(loga.dtype)


def concrete_gate_infer(loga, limit_a=-0.1, limit_b=1.1):
    s = jax.nn.sigmoid(loga.astype(jnp.float32))
    return jnp.clip(s * (limit_b - limit_a) + limit_a, 0.0, 1.0).astype(loga.dtype)


# ---------------- bias_relu ----------------

def bias_relu(x, b, axis=-1, relu=False, fast_gelu=False, atomics=True,
              bench=0, use_tf=False):
    """Fused bias + relu / fast-gelu (reference ewops.py:313).  XLA fuses
    this into the producing matmul; bias grads are deterministic XLA
    reductions (the reference needed atomics=False two-pass kernels)."""
    if relu and fast_gelu:
        raise ValueError("relu and fast_gelu can not both be enabled.")
    if b.ndim > 1:
        y = x + b
    else:
        bshape = [1] * x.ndim
        bshape[axis] = b.shape[0]
        y = x + b.reshape(bshape).astype(x.dtype)
    if relu:
        y = jax.nn.relu(y)
    elif fast_gelu:
        y = y * jax.nn.sigmoid(1.702 * y)
    return y


# ---------------- fancy_gather ----------------

def fancy_gather(x, idx, use_tf=False):
    """y[i0..ik] = x[i0..ik, idx[i0..ik], ...] (reference ewops.py:357)."""
    i_rank = idx.ndim
    assert x.ndim > i_rank
    idx = jnp.maximum(idx, 0)
    expanded = idx.reshape(idx.shape + (1,) * (x.ndim - i_rank))
    expanded = jnp.broadcast_to(
        expanded, idx.shape + (1,) + x.shape[i_rank + 1:])
    return jnp.take_along_axis(x, expanded, axis=i_rank).squeeze(i_rank)


def fancy_gather_test(x, idx):
    x = np.asarray(x)
    idx = np.asarray(idx)
    flat = x.reshape((-1,) + x.shape[idx.ndim + 1:])
    stride = x.shape[idx.ndim]
    base = np.arange(idx.size) * stride + np.maximum(idx.reshape(-1), 0)
    return flat[base].reshape(idx.shape + x.shape[idx.ndim + 1:])


# ---------------- reduce_max ----------------

def reduce_max(x, axis, keepdims=False, use_tf=False):
    """Middle-axis max (reference ewops.py:394).  JAX's max-grad already
    routes through the argmax, matching the reference's two-output
    kernel."""
    return jnp.max(x, axis=axis, keepdims=keepdims)


# ---------------- assign_add ----------------

def assign_add(y, x, name=None):
    """Functional: returns y + x (no in-place variables in JAX; XLA
    donates buffers under jit)."""
    return y + x


def replace_add_n():
    """Parity shim: the reference monkey-patches tf.add_n with its fused
    8-way trees (ewops.py:295); XLA fuses additions natively."""


def restore_add_n():
    """Parity shim; see replace_add_n."""
