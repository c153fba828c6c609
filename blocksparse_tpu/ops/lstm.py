"""Fused LSTM ops.

TPU-native equivalent of /root/reference/blocksparse/lstm.py
(kernels: src/lstm_op_gpu.cu).  The fused gate math is expressed in
jnp — XLA fuses the whole c/h update into a couple of VPU passes — and
the multi-timestep machinery (``grouped_lstm``) uses ``jax.lax.scan``,
which also makes the reference's ``group_lstm_grads`` dw-concat graph
rewrite (lstm.py:198) unnecessary: scan accumulates shared-weight grads
in its carry.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops.norms import layer_norm


def fused_lstm_gates(c, *args, bias=None, forget_bias=1.0, name=None):
    """Fused c/h update from pre-activation gates.

    args: either one fused tensor h (N, 4*width) with gate order
    i, u(j), f, o split on axis 1 (reference lstm.py:22), or 4 separate
    gate tensors (bias not supported in that mode).
    Returns (c_next, h_next).
    """
    f32 = jnp.float32
    if len(args) == 1:
        h = args[0]
        if bias is not None:
            h = h + bias.reshape((1, -1)).astype(h.dtype)
        i, u, f, o = jnp.split(h.astype(f32), 4, axis=1)
    else:
        assert len(args) == 4, "args are i, u, f, o"
        assert bias is None, "bias not enabled in this mode"
        i, u, f, o = [a.astype(f32) for a in args]

    cf = c.astype(f32)
    c_next = cf * jax.nn.sigmoid(f + forget_bias) \
        + jax.nn.sigmoid(i) * jnp.tanh(u)
    h_next = jnp.tanh(c_next) * jax.nn.sigmoid(o)
    return c_next.astype(c.dtype), h_next.astype(args[0].dtype)


def lstm_gates_test(c, h, bias=None, forget_bias=1.0):
    if bias is not None:
        h = h + bias.reshape(1, -1)
    i, u, f, o = np.split(h, 4, axis=1)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))
    c_next = c * sig(f + forget_bias) + sig(i) * np.tanh(u)
    h_next = np.tanh(c_next) * sig(o)
    return c_next, h_next


def split4(x):
    return tuple(jnp.split(x, 4, axis=1))


def concat4(x0, x1, x2, x3):
    return jnp.concatenate([x0, x1, x2, x3], axis=1)


def sparse_relu(x, alpha=1.0):
    """Relu thresholded at mean + alpha*std per row (reference
    lstm.py:103); grad matches relu on the output."""
    f32 = jnp.float32
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    std = jnp.std(xf, axis=-1, keepdims=True)
    cutoff = jax.lax.stop_gradient(mean + alpha * std)
    return jnp.maximum(jnp.maximum(xf, cutoff) - cutoff, 0.0).astype(x.dtype)


def sparse_relu_test(x, alpha=1.0):
    axis = x.ndim - 1
    mean = np.mean(x, axis=axis, keepdims=True)
    std = np.std(x, axis=axis, keepdims=True)
    cutoff = mean + alpha * std
    return np.maximum(np.maximum(x, cutoff) - cutoff, 0.0)


class FusedBasicLSTMCell:
    """Functional drop-in for the reference's FusedBasicLSTMCell
    (lstm.py:124): one matmul for all four gates + fused gate math.

    params = cell.init(key, in_width); h, (c, h) = cell(params, x, state)
    """

    def __init__(self, num_units, forget_bias=1.0):
        self.num_units = num_units
        self.forget_bias = forget_bias

    def init(self, key, in_width, dtype=jnp.float32):
        wkey, _ = jax.random.split(key)
        scale = 1.0 / np.sqrt(in_width + self.num_units)
        w = jax.random.uniform(wkey,
                               (in_width + self.num_units,
                                4 * self.num_units),
                               dtype, -scale, scale)
        b = jnp.zeros((4 * self.num_units,), dtype)
        return {"kernel": w, "bias": b}

    def __call__(self, params, inputs, state):
        c, h = state
        gates = jnp.concatenate([inputs, h], axis=1) @ params["kernel"]
        c, h = fused_lstm_gates(c, gates, bias=params["bias"],
                                forget_bias=self.forget_bias)
        return h, (c, h)


def grouped_lstm_init(key, in_width, width, layernorm=True,
                      dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(in_width + width)
    params = {
        "kernel": jax.random.uniform(k1, (in_width + width, 4 * width),
                                     dtype, -scale, scale),
        "bias": jnp.zeros((4 * width,), dtype),
    }
    if layernorm:
        params["gain"] = jnp.ones((4 * width,), dtype)
    return params


def grouped_lstm(inputs, width, timesteps, initial_state, params,
                 layernorm=True, forget_bias=1.0):
    """Full scan-loop LSTM with optional 4-segment layernorm on the gates
    (reference lstm.py:153).  inputs: (N, T, in_width); returns
    (outputs (N, T, width), [c, h])."""
    c0, h0 = initial_state
    w = params["kernel"]
    b = params["bias"]
    g = params.get("gain")

    def step(carry, x_t):
        c, h = carry
        gates = jnp.concatenate([x_t, h], axis=1) @ w
        if layernorm:
            gates = layer_norm(gates, g, b, axis=1, segments=4)
            c, h = fused_lstm_gates(c, gates, forget_bias=forget_bias)
        else:
            c, h = fused_lstm_gates(c, gates, bias=b,
                                    forget_bias=forget_bias)
        return (c, h), h

    xs = jnp.moveaxis(inputs, 1, 0)      # (T, N, in_width)
    (c, h), ys = jax.lax.scan(step, (c0, h0), xs)
    return jnp.moveaxis(ys, 0, 1), [c, h]


def group_lstm_grads(grads, params, scope="grouped_lstm", group_size=None):
    """No-op under JAX: lax.scan already accumulates the shared kernel
    grad across timesteps (the reference's graph rewrite concatenated
    per-timestep dw matmuls, lstm.py:198-273)."""
    return grads
