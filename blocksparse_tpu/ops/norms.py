"""Fused layer/batch norm.

TPU-native equivalent of /root/reference/blocksparse/norms.py
(kernels: src/layer_norm_{nc,cn}_op_gpu.cu, src/batch_norm_op_gpu.cu).

The segmented layer norm (``segments`` > 1, e.g. 4 LSTM gates normalized
independently in one pass — reference norms.py:23) is expressed by a
reshape; XLA fuses the whole normalization into a couple of passes, and
on TPU the reductions are deterministic (no atomics option needed).
Statistics are always computed in float32.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.utils import reduce_mul


def layer_norm(x, g, b, axis=1, segments=1, epsilon=1e-6, relu=False,
               atomics=True, bench=0, use_tf=False):
    """Layer norm over the feature axis (0 = feature-major "CN", else the
    last axis), with optional independent segments and fused relu."""
    x_shape = x.shape
    if axis < 0:
        axis += x.ndim
    K = x_shape[0] if axis == 0 else x_shape[-1]
    assert g.size == K and b.size == K
    assert K % segments == 0

    f32 = jnp.float32
    if axis == 0:
        xs = x.reshape(segments, K // segments, -1).astype(f32)
        gs = g.reshape(segments, K // segments, 1).astype(f32)
        bs = b.reshape(segments, K // segments, 1).astype(f32)
        red_axis = 1
    else:
        xs = x.reshape(-1, segments, K // segments).astype(f32)
        gs = g.reshape(1, segments, K // segments).astype(f32)
        bs = b.reshape(1, segments, K // segments).astype(f32)
        red_axis = 2

    mean = jnp.mean(xs, axis=red_axis, keepdims=True)
    var = jnp.mean(jnp.square(xs - mean), axis=red_axis, keepdims=True)
    rstd = jax.lax.rsqrt(var + epsilon)
    y = (xs - mean) * rstd * gs + bs
    if relu:
        y = jax.nn.relu(y)
    return y.reshape(x_shape).astype(x.dtype)


def batch_norm_inference(x, g, b, m, v, epsilon=1e-6):
    shape = x.shape
    C = shape[1]
    f32 = jnp.float32
    xr = x.reshape(shape[0], C, -1).astype(f32)
    rstd = jax.lax.rsqrt(v.reshape(1, C, 1).astype(f32) + epsilon)
    y = (xr - m.reshape(1, C, 1).astype(f32)) * rstd \
        * g.reshape(1, C, 1).astype(f32) + b.reshape(1, C, 1).astype(f32)
    return y.reshape(shape).astype(x.dtype)


def batch_norm(x, g, b, epsilon=1e-6):
    """NC[DHW] batch norm; returns (y, mean, var) like the reference op
    (mean/var feed the grad and running stats)."""
    shape = x.shape
    C = shape[1]
    f32 = jnp.float32
    xr = x.reshape(shape[0], C, -1).astype(f32)
    mean = jnp.mean(xr, axis=(0, 2), keepdims=True)
    var = jnp.mean(jnp.square(xr - mean), axis=(0, 2), keepdims=True)
    rstd = jax.lax.rsqrt(var + epsilon)
    y = (xr - mean) * rstd * g.reshape(1, C, 1).astype(f32) \
        + b.reshape(1, C, 1).astype(f32)
    return (y.reshape(shape).astype(x.dtype), mean.reshape(C),
            var.reshape(C))


# ---------------- NumPy goldens (parity with reference norms.py:103) ----

def layer_norm_test(x, g, b, axis=1, segments=1, epsilon=1e-6, relu=False):
    x_shape = x.shape
    K = x_shape[axis]
    if axis == 0:
        x = x.reshape(K, -1)
        g = g.reshape(K, 1)
        b = b.reshape(K, 1)
    else:
        axis = 1
        x = x.reshape(-1, K)
        g = g.reshape(1, K)
        b = b.reshape(1, K)
    K //= segments

    y = np.empty_like(x)
    for s in range(segments):
        segK = slice(s * K, s * K + K)
        seg = (segK, slice(None)) if axis == 0 else (slice(None), segK)
        mean = np.mean(x[seg], axis=axis, keepdims=True)
        var = np.var(x[seg], axis=axis, keepdims=True)
        rstd = np.reciprocal(np.sqrt(var + epsilon))
        xhat = (x[seg] - mean) * rstd
        y[seg] = xhat * g[seg] + b[seg]
        if relu:
            y[seg] = np.maximum(y[seg], 0.0)
    return y.reshape(x_shape)


def layer_norm_grad_test(dy, x, g, b, axis=1, segments=1, epsilon=1e-6,
                         relu=False):
    x_shape = x.shape
    K = x_shape[axis]
    if axis == 0:
        dy = dy.reshape(K, -1)
        x = x.reshape(K, -1)
        g = g.reshape(K, 1)
        b = b.reshape(K, 1)
    else:
        axis = 1
        dy = dy.reshape(-1, K)
        x = x.reshape(-1, K)
        g = g.reshape(1, K)
        b = b.reshape(1, K)
    K //= segments

    dy = dy.copy()
    dx = np.empty_like(dy)
    dg = np.empty_like(g)
    db = np.empty_like(b)
    for s in range(segments):
        segK = slice(s * K, s * K + K)
        seg = (segK, slice(None)) if axis == 0 else (slice(None), segK)
        mean = np.mean(x[seg], axis=axis, keepdims=True)
        xmean = x[seg] - mean
        xvar = np.var(x[seg], axis=axis, keepdims=True)
        xstdr = np.reciprocal(np.sqrt(xvar + epsilon))
        xhat = xmean * xstdr
        if relu:
            dy[seg] = dy[seg] * ((xhat * g[seg] + b[seg]) > 0.0)
        dg[seg] = np.sum(dy[seg] * xhat, axis=1 - axis, keepdims=True)
        db[seg] = np.sum(dy[seg], axis=1 - axis, keepdims=True)
        dy[seg] = dy[seg] * g[seg]
        sum1 = np.sum(xhat * dy[seg], axis=axis, keepdims=True)
        sum2 = np.sum(dy[seg], axis=axis, keepdims=True)
        dx[seg] = (dy[seg] - ((xhat * sum1 + sum2) / float(K))) * xstdr
    return dx.reshape(x_shape), dg, db


def batch_norm_inf_test(x, g, b, m, v, epsilon=1e-6):
    xshape = x.shape
    N, C = xshape[0], xshape[1]
    x = x.reshape(N, C, -1)
    g = g.reshape(1, C, 1)
    b = b.reshape(1, C, 1)
    m = m.reshape(1, C, 1)
    v = v.reshape(1, C, 1)
    rstd = np.reciprocal(np.sqrt(v + epsilon))
    return ((x - m) * rstd * g + b).reshape(xshape)


def batch_norm_test(x, g, b, epsilon=1e-6):
    xshape = x.shape
    N, C = xshape[0], xshape[1]
    x = x.reshape(N, C, -1)
    g = g.reshape(1, C, 1)
    b = b.reshape(1, C, 1)
    mean = np.mean(x, axis=(0, 2), keepdims=True)
    var = np.var(x, axis=(0, 2), keepdims=True)
    rstd = np.reciprocal(np.sqrt(var + epsilon))
    return ((x - mean) * rstd * g + b).reshape(xshape), \
        mean.reshape(C), var.reshape(C)


def batch_norm_grad_test(dy, x, g, m, v, epsilon=1e-6):
    xshape = x.shape
    N, C = xshape[0], xshape[1]
    rNDHW = 1.0 / reduce_mul(xshape[2:], N)
    dy = dy.reshape(N, C, -1)
    x = x.reshape(N, C, -1)
    g = g.reshape(1, C, 1)
    m = m.reshape(1, C, 1)
    v = v.reshape(1, C, 1)
    rstd = np.reciprocal(np.sqrt(v + epsilon))
    xhat = (x - m) * rstd
    dg = np.sum(dy * xhat, axis=(0, 2), keepdims=True)
    db = np.sum(dy, axis=(0, 2), keepdims=True)
    z = (xhat * dg + db) * rNDHW
    dx = (dy - z) * rstd * g
    return dx.reshape(xshape), dg.reshape(C), db.reshape(C)
