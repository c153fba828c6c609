"""Fused optimizers: Adam, Adafactor, EMA, global-norm clip, block pruning.

TPU-native equivalent of /root/reference/blocksparse/optimize.py
(kernels: src/optimize_op_gpu.cu).  Functional core + stateful wrapper
classes + optax adapters.

Key semantics preserved (see src/optimize_op_gpu.cu:454-531 apply_adam):
* grad scrubbing (zero_infs/zero_nans/saturate) happens inside the update;
* ``norm_scale`` (from clip_by_global_norm) multiplies the grad, and a
  norm_scale of exactly 0 SKIPS the whole update — this is the hook the
  dynamic loss-scaling retry loop uses (reference enwik8.py:374-397);
* clip_sigma clips the grad against sigma = sqrt(v_new) before the mean
  update;
* per-block ``gate`` masks updates of pruned blocks (gated adam);
* 16-bit optimizer state: the reference packs mean/var into custom
  mhalf(6e9m1s)/vhalf(6e10m) formats (src/gpu_types.h:81-104); on TPU we
  use bfloat16 slots (same 6-bit-class exponent range, hardware-native)
  selected by ``fp16=True`` for params >= 8K elements (optimize.py:70).

All update math runs in float32 regardless of state dtype.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _scrub(g, saturate=0.0, zero_infs=False, zero_nans=False):
    g = g.astype(jnp.float32)
    if zero_infs:
        g = jnp.where(jnp.isinf(g), 0.0, g)
    if zero_nans:
        g = jnp.where(jnp.isnan(g), 0.0, g)
    if saturate:
        g = jnp.clip(g, -saturate, saturate)
    return g


# ------------------------------------------------------------------
# clip_by_global_norm
# ------------------------------------------------------------------

def clip_by_global_norm(grads, clip_norm=1.0, grad_scale=1.0, saturate=0.0,
                        zero_infs=False, zero_nans=False):
    """One fused pass over a mixed-dtype grad list (reference
    optimize.py:197 / ClipGlobalNorm src/optimize_op_gpu.cu:745).

    Returns (global_norm, norm_scale); norm_scale is 0 when the norm is
    non-finite, which downstream fused optimizers interpret as "skip the
    update" — the loss-scaling control signal.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    gs = jnp.asarray(grad_scale, jnp.float32)
    total = jnp.zeros((), jnp.float32)
    for g in leaves:
        gf = _scrub(g, saturate, zero_infs, zero_nans) * gs
        total = total + jnp.sum(jnp.square(gf))
    global_norm = jnp.sqrt(total)
    clip = jnp.asarray(clip_norm, jnp.float32)
    norm_scale = clip / jnp.maximum(global_norm, clip)
    norm_scale = jnp.where(jnp.isfinite(global_norm), norm_scale, 0.0)
    return global_norm, norm_scale


def global_norm(grads, grad_scale=1.0, saturate=0.0, zero_infs=False,
                zero_nans=False):
    gn, _ = clip_by_global_norm(grads, clip_norm=9e9, grad_scale=grad_scale,
                                saturate=saturate, zero_infs=zero_infs,
                                zero_nans=zero_nans)
    return gn


ClipGlobalNorm = clip_by_global_norm


# ------------------------------------------------------------------
# Packed 16-bit optimizer-state formats (reference mhalf/vhalf,
# src/gpu_types.h:81-104, conversions src/ew_op_gpu.h:330-430):
#   vhalf: 0s/6e/10m unsigned, value = 1.m * 2^(e-60), e in [0,63]
#   mhalf: 1s/6e/9m  signed,   same exponent range
# Magnitudes round half-up onto the mantissa grid, saturate just below
# 16, flush to zero below 2^-60.  Stored as real uint16 (2 bytes/slot,
# the same memory the reference's packed formats use); bfloat16 slots
# trade 3 mantissa bits for unneeded range — the accuracy study in
# benchmarks/opt_state_study.py records which matters in training.
# ------------------------------------------------------------------

def _pack16(x, mbits, signed):
    f32 = jnp.float32
    x = x.astype(f32)
    sign = (x < 0) if signed else jnp.zeros(x.shape, bool)
    m = jnp.abs(x)
    max_val = float(np.float32((2.0 - 2.0 ** -mbits) * 8.0))  # < 16
    m = jnp.minimum(m, max_val)
    # round half-up on the relative grid (the reference's
    # fma.rz(round_exp * 2^-(mbits+1)) + truncate); frexp/ldexp keep
    # exponent scaling exact (XLA's exp2 = exp(x*ln2) misrounds, and
    # log2 misrounds just below powers of two)
    one = jnp.ones((), f32)
    _, ex = jnp.frexp(jnp.where(m > 0, m, 1.0))   # m = f * 2^ex
    ulp = jnp.ldexp(one, ex - 1 - mbits)
    m = jnp.floor(m / ulp + 0.5) * ulp
    # flush below the smallest nonzero encoding (mantissa 1 at exp 0):
    # all-zero bits mean 0.0, so 1.0*2^-60 itself is not representable
    # (reference thresholds 8.682e-19 / 8.690e-19, ew_op_gpu.h:379,408)
    tiny = 2.0 ** -60 * (1.0 + 2.0 ** -mbits)
    zero = m < tiny
    # exponent/mantissa fields: m = (1 + mant/2^mbits) * 2^(e6 - 60)
    _, ex = jnp.frexp(jnp.where(zero, 1.0, m))
    e6 = jnp.clip(ex - 1 + 60, 0, 63).astype(jnp.uint32)
    mant = jnp.round(
        (m / jnp.ldexp(one, ex - 1) - 1.0) * (1 << mbits)).astype(jnp.uint32)
    mant = jnp.minimum(mant, (1 << mbits) - 1)
    u = (e6 << mbits) | mant
    if signed:
        u = u | (sign.astype(jnp.uint32) << 15)
    return jnp.where(zero, 0, u).astype(jnp.uint16)


def _unpack16(u, mbits, signed):
    u32 = u.astype(jnp.uint32)
    mant = (u32 & ((1 << mbits) - 1)).astype(jnp.float32)
    e6 = ((u32 >> mbits) & 0x3F).astype(jnp.int32)
    val = jnp.ldexp((1.0 + mant / (1 << mbits)).astype(jnp.float32),
                    e6 - 60)
    if signed:
        val = jnp.where((u32 >> 15) & 1, -val, val)
    return jnp.where(u32 == 0, 0.0, val)


def mhalf_pack(x):
    """f32 -> mhalf-encoded uint16 (Adam mean slots)."""
    return _pack16(x, 9, signed=True)


def mhalf_unpack(u):
    return _unpack16(u, 9, signed=True)


def vhalf_pack(x):
    """f32 -> vhalf-encoded uint16 (Adam variance slots, unsigned)."""
    return _pack16(x, 10, signed=False)


def vhalf_unpack(u):
    return _unpack16(u, 10, signed=False)


# ------------------------------------------------------------------
# Adam
# ------------------------------------------------------------------

def adam_apply(grad, param, m, v, lr, decay_mean=0.9, decay_var=0.999,
               epsilon=1e-8, grad_scale=1.0, clip_sigma=0.0, norm_scale=None,
               gate=None, saturate=0.0, zero_infs=False, zero_nans=False):
    """One fused Adam step; returns (param, m, v).

    Math order follows apply_adam (src/optimize_op_gpu.cu:454): scrub ->
    scale -> v update -> sigma clip -> m update -> param update.  A
    norm_scale of 0 leaves all three outputs untouched.
    """
    f32 = jnp.float32
    ns = jnp.asarray(1.0, f32) if norm_scale is None \
        else jnp.asarray(norm_scale, f32)
    g = _scrub(grad, saturate, zero_infs, zero_nans)
    g = g * (jnp.asarray(grad_scale, f32) * ns)

    m32, v32, p32 = m.astype(f32), v.astype(f32), param.astype(f32)
    v_new = decay_var * v32 + (1.0 - decay_var) * g * g
    sigma = jnp.sqrt(v_new)
    if clip_sigma:
        clip = jnp.asarray(clip_sigma, f32) * sigma
        g = jnp.clip(g, -clip, clip)
    m_new = decay_mean * m32 + (1.0 - decay_mean) * g
    p_new = p32 - jnp.asarray(lr, f32) * m_new / (sigma + epsilon)

    if gate is not None:
        gf = gate.astype(f32).reshape((-1,) + (1,) * (param.ndim - 1))
        m_new = jnp.where(gf != 0, m_new, m32)
        v_new = jnp.where(gf != 0, v_new, v32)
        p_new = jnp.where(gf != 0, p_new, p32)

    skip = ns == 0.0
    p_out = jnp.where(skip, p32, p_new).astype(param.dtype)
    m_out = jnp.where(skip, m32, m_new).astype(m.dtype)
    v_out = jnp.where(skip, v32, v_new).astype(v.dtype)
    return p_out, m_out, v_out


adam_op = adam_apply  # reference export name


def lazy_emb_adam_apply(grad, param, m, v, lr, **kwargs):
    """Lazy embedding Adam (reference apply_lazy_emb_adam,
    src/optimize_op_gpu.cu, registration src/optimize_op.cc:434-440):
    rows whose gradient is exactly zero — embedding entries untouched by
    the batch — skip the m/v decay and the parameter update entirely, so
    their state stays bit-identical across steps (TF's lazy
    IndexedSlices semantics).  Under JAX the embedding grad is a dense
    array with exact zero rows for untouched ids (deterministic
    scatter-add), so the row mask reproduces the sparse-update set."""
    touched = jnp.any(grad != 0, axis=tuple(range(1, grad.ndim)))
    return adam_apply(grad, param, m, v, lr, gate=touched, **kwargs)


lazy_emb_adam_op = lazy_emb_adam_apply  # reference export name


class AdamOptimizer:
    """Stateful-API Adam mirroring the reference class (optimize.py:23),
    recast functionally: ``state = opt.init(params)`` then
    ``params, state = opt.apply(grads, params, state, ...)``.

    The bias-correction is folded into the learning rate exactly as the
    reference does (optimize.py:57):
        lr_t = lr * sqrt(1 - beta2^t) / (1 - beta1^t)
    """

    def __init__(self, learning_rate=3e-4, beta1=0.9, beta2=0.999,
                 epsilon=1e-8, clip_sigmas=0.0, norm_scale=None,
                 grad_scale=1.0, saturate=0.0, zero_infs=False,
                 zero_nans=False, gated=False, param_qspec=None,
                 mean_qspec=None, var_qspec=None, fp16=False,
                 state_format=None, zero_init_variables=False, name="Adam"):
        """state_format (for params >= 8K elements, reference
        optimize.py:70): None/"float32" = f32 slots; "bfloat16" (or
        fp16=True) = bf16 slots; "packed16" = the reference's
        mhalf/vhalf uint16 formats (6-bit exponent, 9/10-bit mantissa)
        — 2 bytes/slot with 2-3 more mantissa bits than bfloat16.  See
        benchmarks/opt_state_study.py for the accuracy comparison."""
        self.learning_rate = learning_rate
        self.beta1, self.beta2 = beta1, beta2
        self.epsilon = epsilon
        self.clip_sigma = clip_sigmas
        self.norm_scale = norm_scale
        self.grad_scale = grad_scale
        self.saturate = saturate
        self.zero_infs = zero_infs
        self.zero_nans = zero_nans
        self.gated = gated
        self.param_qspec = param_qspec
        self.mean_qspec = mean_qspec
        self.var_qspec = var_qspec
        if state_format is None:
            state_format = "bfloat16" if fp16 else "float32"
        assert state_format in ("float32", "bfloat16", "packed16")
        self.state_format = state_format
        self.fp16 = state_format != "float32"
        self.name = name

    def _slot_dtype(self, p):
        if self.fp16 and p.size >= 8 * 1024:
            return jnp.uint16 if self.state_format == "packed16" \
                else jnp.bfloat16
        return jnp.float32

    def init(self, params):
        mean = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, self._slot_dtype(p)), params)
        var = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, self._slot_dtype(p)), params)
        return {"mean": mean, "var": var, "t": jnp.zeros((), jnp.int32)}

    def apply(self, grads, params, state, norm_scale=None, grad_scale=None,
              learning_rate=None, gates=None):
        """gates: optional pytree (matching params) of per-block gates."""
        t = state["t"] + 1
        tf_ = t.astype(jnp.float32)
        b1p = jnp.power(self.beta1, tf_)
        b2p = jnp.power(self.beta2, tf_)
        lr0 = self.learning_rate if learning_rate is None else learning_rate
        lr = jnp.asarray(lr0, jnp.float32) * jnp.sqrt(1 - b2p) / (1 - b1p)
        ns = norm_scale if norm_scale is not None else self.norm_scale
        gs = grad_scale if grad_scale is not None else self.grad_scale

        from blocksparse_tpu.ops.quantize import quantize as _quantize

        def upd(g, p, m, v, gate=None):
            packed = m.dtype == jnp.uint16
            if packed:
                m, v = mhalf_unpack(m), vhalf_unpack(v)
            p2, m2, v2 = adam_apply(
                g, p, m, v, lr, self.beta1, self.beta2, self.epsilon,
                gs, self.clip_sigma, ns, gate,
                self.saturate, self.zero_infs, self.zero_nans)
            if self.param_qspec is not None:
                p2 = _quantize(p2, self.param_qspec)
            if self.mean_qspec is not None:
                m2 = _quantize(m2, self.mean_qspec)
            if self.var_qspec is not None:
                v2 = _quantize(v2, self.var_qspec)
            if packed:
                m2, v2 = mhalf_pack(m2), vhalf_pack(v2)
            return p2, m2, v2

        if gates is None:
            out = jax.tree_util.tree_map(upd, grads, params, state["mean"],
                                         state["var"])
        else:
            out = jax.tree_util.tree_map(upd, grads, params, state["mean"],
                                         state["var"], gates)
        flat, treedef = jax.tree_util.tree_flatten(
            out, is_leaf=lambda x: isinstance(x, tuple))
        new_params = jax.tree_util.tree_unflatten(
            treedef, [x[0] for x in flat])
        new_mean = jax.tree_util.tree_unflatten(
            treedef, [x[1] for x in flat])
        new_var = jax.tree_util.tree_unflatten(
            treedef, [x[2] for x in flat])
        return new_params, {"mean": new_mean, "var": new_var, "t": t}


# ------------------------------------------------------------------
# Adafactor
# ------------------------------------------------------------------

def adafactor2d_apply(param, cv, rv, grad, decay, lr, grad_scale=1.0,
                      clip_thresh=1.0, norm_scale=None, epsilon=1e-30,
                      saturate=0.0, zero_infs=False, zero_nans=False):
    """Factored second-moment update for 2-D params (reference
    Adafactor2d, math per test/adafactor_test.py:66-80).
    Returns (param, cv, rv, x)."""
    f32 = jnp.float32
    ns = jnp.asarray(1.0, f32) if norm_scale is None \
        else jnp.asarray(norm_scale, f32)
    g = _scrub(grad, saturate, zero_infs, zero_nans) \
        * (jnp.asarray(grad_scale, f32) * ns)
    cv32, rv32, p32 = cv.astype(f32), rv.astype(f32), param.astype(f32)

    c_new = decay * cv32 + (1.0 - decay) \
        * jnp.mean(jnp.square(g) + epsilon, axis=0, keepdims=True)
    r_new = decay * rv32 + (1.0 - decay) \
        * jnp.mean(jnp.square(g) + epsilon, axis=1, keepdims=True)
    ltm = jnp.mean(r_new, keepdims=True)
    x = g / (jnp.sqrt(r_new / ltm) * jnp.sqrt(c_new))
    rms_x = jnp.sqrt(jnp.mean(jnp.square(x), keepdims=True))
    p_new = p32 - jnp.asarray(lr, f32) * x \
        / jnp.maximum(1.0, rms_x / clip_thresh)

    skip = ns == 0.0
    return (jnp.where(skip, p32, p_new).astype(param.dtype),
            jnp.where(skip, cv32, c_new).astype(cv.dtype),
            jnp.where(skip, rv32, r_new).astype(rv.dtype),
            x)


def adafactor1d_apply(param, cv, grad, decay, lr, grad_scale=1.0,
                      clip_thresh=1.0, norm_scale=None, epsilon=1e-30,
                      saturate=0.0, zero_infs=False, zero_nans=False):
    """Unfactored variant for 1-D params (reference Adafactor1d)."""
    f32 = jnp.float32
    ns = jnp.asarray(1.0, f32) if norm_scale is None \
        else jnp.asarray(norm_scale, f32)
    g = _scrub(grad, saturate, zero_infs, zero_nans) \
        * (jnp.asarray(grad_scale, f32) * ns)
    cv32, p32 = cv.astype(f32), param.astype(f32)

    c_new = decay * cv32 + (1.0 - decay) * (jnp.square(g) + epsilon)
    x = g / jnp.sqrt(c_new)
    rms_x = jnp.sqrt(jnp.mean(jnp.square(x), keepdims=True))
    p_new = p32 - jnp.asarray(lr, f32) * x \
        / jnp.maximum(1.0, rms_x / clip_thresh)

    skip = ns == 0.0
    return (jnp.where(skip, p32, p_new).astype(param.dtype),
            jnp.where(skip, cv32, c_new).astype(cv.dtype),
            x)


adafactor2d_op = adafactor2d_apply
adafactor1d_op = adafactor1d_apply


class AdafactorOptimizer:
    """Reference optimize.py:118, functional state API."""

    def __init__(self, learning_rate=5e-4, beta2=0.999, epsilon=1e-30,
                 clip_thresh=1.0, norm_scale=None, grad_scale=1.0,
                 saturate=0.0, zero_infs=False, zero_nans=False,
                 name="Adafactor", zero_init_variables=False):
        self.learning_rate = learning_rate
        self.beta2 = beta2
        self.epsilon = epsilon
        self.clip_thresh = clip_thresh
        self.norm_scale = norm_scale
        self.grad_scale = grad_scale
        self.saturate = saturate
        self.zero_infs = zero_infs
        self.zero_nans = zero_nans
        self.name = name

    def init(self, params):
        def slots(p):
            if p.ndim == 2 and p.shape[0] > 1:
                return {"cv": jnp.zeros((1, p.shape[1]), jnp.float32),
                        "rv": jnp.zeros((p.shape[0], 1), jnp.float32)}
            elif p.ndim in (1, 2):
                return {"cv": jnp.zeros((1, int(np.prod(p.shape))),
                                        jnp.float32)}
            raise ValueError("only 1 or 2d params are supported")
        return {"slots": jax.tree_util.tree_map(slots, params),
                "t": jnp.zeros((), jnp.int32)}

    def apply(self, grads, params, state, norm_scale=None, learning_rate=None):
        t = state["t"] + 1
        tf_ = t.astype(jnp.float32)
        # decay_t * (1 - decay1_power) / (1 - decay2_power), reference
        # optimize.py:142
        d1 = jnp.power(self.beta2, tf_)
        d2 = jnp.power(self.beta2 * self.beta2, tf_)
        decay = self.beta2 * (1 - d1) / (1 - d2)
        lr = self.learning_rate if learning_rate is None else learning_rate
        ns = norm_scale if norm_scale is not None else self.norm_scale

        def upd(g, p, slot):
            if "rv" in slot:
                p2, c2, r2, _ = adafactor2d_apply(
                    p, slot["cv"], slot["rv"], g.reshape(p.shape), decay, lr,
                    self.grad_scale, self.clip_thresh, ns, self.epsilon,
                    self.saturate, self.zero_infs, self.zero_nans)
                return p2, {"cv": c2, "rv": r2}
            g2 = g.reshape(1, -1)
            p2, c2, _ = adafactor1d_apply(
                p.reshape(1, -1), slot["cv"], g2, decay, lr,
                self.grad_scale, self.clip_thresh, ns, self.epsilon,
                self.saturate, self.zero_infs, self.zero_nans)
            return p2.reshape(p.shape), {"cv": c2}

        out = jax.tree_util.tree_map(
            upd, grads, params, state["slots"],
            is_leaf=lambda x: isinstance(x, dict) and ("cv" in x))
        flat, treedef = jax.tree_util.tree_flatten(
            out, is_leaf=lambda x: isinstance(x, tuple))
        new_params = jax.tree_util.tree_unflatten(
            treedef, [x[0] for x in flat])
        new_slots = jax.tree_util.tree_unflatten(
            treedef, [x[1] for x in flat])
        return new_params, {"slots": new_slots, "t": t}


# ------------------------------------------------------------------
# EMA
# ------------------------------------------------------------------

def ema_op(ema, param, gate=None, decay=0.999):
    """ema = decay*ema + (1-decay)*param, optionally gated per block
    (reference src/optimize_op_gpu.cu ema kernel)."""
    f32 = jnp.float32
    e32 = ema.astype(f32)
    new = decay * e32 + (1.0 - decay) * param.astype(f32)
    if gate is not None:
        gf = gate.astype(f32).reshape((-1,) + (1,) * (param.ndim - 1))
        new = jnp.where(gf != 0, new, e32)
    return new.astype(ema.dtype)


class Ema:
    """Reference optimize.py:235, functional: ``state = ema.init(params)``
    then ``state = ema.apply(params, state)``; ``ema.average`` reads."""

    def __init__(self, decay=0.999, gated=False, fp16=False, name="Ema"):
        self.decay = decay
        self.gated = gated
        self.fp16 = fp16
        self.name = name

    def init(self, params):
        def mk(p):
            dtype = jnp.bfloat16 if self.fp16 else jnp.float32
            return p.astype(dtype)
        return jax.tree_util.tree_map(mk, params)

    def apply(self, params, state, gates=None, qspec=None):
        if gates is None:
            new = jax.tree_util.tree_map(
                lambda e, p: ema_op(e, p, decay=self.decay), state, params)
        else:
            new = jax.tree_util.tree_map(
                lambda e, p, g: ema_op(e, p, g, decay=self.decay),
                state, params, gates)
        if qspec is not None:
            from blocksparse_tpu.ops.quantize import quantize as _q
            new = jax.tree_util.tree_map(lambda e: _q(e, qspec), new)
        return new

    def average(self, state, path_or_param):
        return state[path_or_param] if isinstance(path_or_param, str) else None

    def params(self, state):
        """The EMA-averaged parameter pytree (the state itself), for
        eval with averaged weights (reference train.py EMA eval)."""
        return state


# ------------------------------------------------------------------
# Group LASSO / blocksparse pruning (reference optimize.py:292-341)
# ------------------------------------------------------------------

def _check_param_shape(param, gate=None):
    assert param.ndim == 3 and param.shape[1] == param.shape[2] \
        and param.shape[1] in (8, 16, 32, 64)
    if gate is not None:
        assert gate.size == param.shape[0]


def blocksparse_l2_decay(param, gate=None, rate=0.05, epsilon=1e-12):
    """Group-lasso decay: shrink each block toward zero by rate/|block|_2
    (src/optimize_op_gpu.cu l2_decay kernel).  Returns new param."""
    _check_param_shape(param, gate)
    f32 = jnp.float32
    p = param.astype(f32)
    norm = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.square(p), axis=(1, 2), keepdims=True), epsilon))
    decayed = p * jnp.maximum(1.0 - rate / norm, 0.0)
    if gate is not None:
        gf = gate.astype(f32).reshape(-1, 1, 1)
        decayed = jnp.where(gf != 0, decayed, p)
    return decayed.astype(param.dtype)


def blocksparse_norm(param, norm="max"):
    _check_param_shape(param)
    p = param.astype(jnp.float32)
    if norm.lower() == "l2":
        return jnp.sqrt(jnp.sum(jnp.square(p), axis=(1, 2)))
    return jnp.max(jnp.abs(p), axis=(1, 2))


def blocksparse_prune(gate, param, step, sparsity=None, threshold=None,
                      norm="max", frequency=1):
    """Dynamic block pruning: keep top-k blocks by norm, or those above a
    threshold; runs every ``frequency`` steps (reference optimize.py:319).
    Returns the new gate."""
    assert (sparsity is None) ^ (threshold is None)
    norms = blocksparse_norm(param, norm=norm)
    blocks = param.shape[0]
    if sparsity is not None:
        k = jnp.maximum(
            1, jnp.round((1.0 - sparsity) * blocks).astype(jnp.int32))
        order = jnp.argsort(-norms)
        ranks = jnp.argsort(order)
        new_gate = (ranks < k).astype(gate.dtype)
    else:
        new_gate = (norms > threshold).astype(gate.dtype)
    do_update = (step % frequency) == 0
    return jnp.where(do_update, new_gate, gate)


def blocksparse_adam_op(grad, param, m, v, lr_old, lr_new, lr_select=None,
                        decay_mean=0.9, decay_var=0.999, epsilon=1e-8,
                        grad_scale=1.0, norm_scale=None, saturate=0.0,
                        zero_infs=False, zero_nans=False):
    """Adam with dual learning rates selected per block (reference
    BlocksparseAdam, src/optimize_op_gpu.cu:629-704): blocks whose
    lr_select entry is nonzero use lr_new (e.g. freshly grown blocks),
    the rest lr_old.  param/m/v are (blocks, bsize, bsize).
    Returns (param, m, v)."""
    f32 = jnp.float32
    ns = jnp.asarray(1.0, f32) if norm_scale is None \
        else jnp.asarray(norm_scale, f32)
    g = _scrub(grad, saturate, zero_infs, zero_nans)
    g = g * (jnp.asarray(grad_scale, f32) * ns)

    if lr_select is None:
        lr = jnp.asarray(lr_old, f32)
    else:
        sel = lr_select.astype(f32).reshape((-1,) + (1,) * (param.ndim - 1))
        lr = jnp.where(sel == 0.0, jnp.asarray(lr_old, f32),
                       jnp.asarray(lr_new, f32))

    m32, v32, p32 = m.astype(f32), v.astype(f32), param.astype(f32)
    m_new = decay_mean * m32 + (1.0 - decay_mean) * g
    v_new = decay_var * v32 + (1.0 - decay_var) * g * g
    p_new = p32 - lr * m_new / (jnp.sqrt(v_new) + epsilon)

    skip = ns == 0.0
    return (jnp.where(skip, p32, p_new).astype(param.dtype),
            jnp.where(skip, m32, m_new).astype(m.dtype),
            jnp.where(skip, v32, v_new).astype(v.dtype))


# ------------------------------------------------------------------
# optax adapters: expose the fused updates as GradientTransformations
# so they compose with the wider JAX ecosystem (schedules, chains).
# ------------------------------------------------------------------

def optax_adam(learning_rate=3e-4, beta1=0.9, beta2=0.999, epsilon=1e-8,
               clip_sigma=0.0, saturate=0.0, zero_infs=False,
               zero_nans=False, fp16_state=False):
    """GradientTransformation wrapping adam_apply (norm_scale signalling
    is handled by the caller's loss-scale loop when needed)."""
    import optax

    opt = AdamOptimizer(learning_rate=learning_rate, beta1=beta1,
                        beta2=beta2, epsilon=epsilon,
                        clip_sigmas=clip_sigma, saturate=saturate,
                        zero_infs=zero_infs, zero_nans=zero_nans,
                        fp16=fp16_state)

    def init_fn(params):
        return opt.init(params)

    def update_fn(grads, state, params=None):
        assert params is not None, "fused adam updates params directly"
        new_params, new_state = opt.apply(grads, params, state)
        updates = jax.tree_util.tree_map(lambda n, p: n - p, new_params,
                                         params)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def optax_adafactor(learning_rate=5e-4, beta2=0.999, epsilon=1e-30,
                    clip_thresh=1.0):
    import optax

    opt = AdafactorOptimizer(learning_rate=learning_rate, beta2=beta2,
                             epsilon=epsilon, clip_thresh=clip_thresh)

    def init_fn(params):
        return opt.init(params)

    def update_fn(grads, state, params=None):
        assert params is not None
        new_params, new_state = opt.apply(grads, params, state)
        updates = jax.tree_util.tree_map(lambda n, p: n - p, new_params,
                                         params)
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
