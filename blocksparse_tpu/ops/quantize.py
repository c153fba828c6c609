"""Quantization research ops: arbitrary float formats + tensor stats.

TPU-native equivalent of /root/reference/blocksparse/quantize.py
(kernel: src/quantize_op_gpu.cu, parameterization src/quantize_op.cc:60-110).

``quantize`` simulates an (ebits, fbits, emax) float format in float32:
relative mantissa rounding (nearest or stochastic), saturation at the
format max, flush-to-zero below the format min, and optional gradual
underflow (denorm grid).  Forward and backward passes can use different
specs (the core mixed-precision research primitive).

Differences from the reference:
* stochastic rounding uses the JAX PRNG (pass ``key``) instead of the
  GPU LFSR entropy buffer;
* the self-tuning exponent-max machinery (mode 1/2, tracked in int64
  variables and re-estimated every ``frequency`` steps,
  src/quantize_op.cc:24-55) is provided by ``QuantizeTracker``: wrap
  the train step with ``tracker.wrap_jit`` and pass ``name=`` to
  ``quantize`` — emax state is threaded through the jit automatically
  (read at step start, estimates collected from both the forward and
  the gradient stream, host applies them every ``frequency`` calls).
  mode 0 (static emax) matches the reference exactly and needs no
  tracker.  ``quantize_emax_estimate`` remains available for manual
  threading.
* ``log_stats`` emits TSV rows via jax.debug.callback.
"""
from __future__ import annotations

import functools
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.utils import get_entropy


class QuantizeSpec:
    """Parity with reference quantize.py:20."""

    def __init__(self, ebits=4, fbits=3, emax=None, stochastic=0, denorm=True,
                 frequency=1024, mode=0, bias_pad=2, stdv_mul=4.0, logfile="",
                 copy=None):
        if copy is None:
            if emax is None:
                emax = (1 << (ebits - 1)) - 1  # default symmetric
            self.ebits = ebits
            self.fbits = fbits
            self.emax = emax
            self.stoch = stochastic
            self.denorm = denorm
            self.freq = frequency
            self.mode = mode
            self.bias_pad = bias_pad
            self.stdv_mul = stdv_mul
            self.logfile = logfile
        else:
            self.ebits = copy.ebits
            self.fbits = copy.fbits
            self.emax = copy.emax
            self.stoch = copy.stoch
            self.denorm = copy.denorm
            self.freq = copy.freq
            self.mode = copy.mode
            self.bias_pad = copy.bias_pad
            self.stdv_mul = copy.stdv_mul
            self.logfile = copy.logfile or logfile


def _format_params(ebits, fbits, emax, denorm):
    """Biased exponent range per reference quantize_op.cc:85-101.

    ``emax`` may be a Python number (compile-time constants, the static
    mode-0 path) or a traced f32 scalar (self-tuning modes via
    ``QuantizeTracker``)."""
    max_exp = (1 << ebits) - 1
    if ebits == 8:
        max_exp -= 1
    if isinstance(emax, (int, float)):
        bexp_max = emax + 127
        if bexp_max < max_exp:
            bexp_max = max_exp
        bexp_min = bexp_max - max_exp + 1 - (fbits if denorm else 0)
        if bexp_min < 2:
            bexp_min = 2
        max_float = float(np.float32(2.0 - 2.0 ** -fbits)
                          * np.float32(2.0) ** (bexp_max - 127))
        min_float = float(np.float32(2.0) ** (bexp_min - 127))
        return max_float, min_float, bexp_min
    f32 = jnp.float32
    bexp_max = jnp.maximum(emax.astype(f32) + 127.0, float(max_exp))
    bexp_min = jnp.maximum(
        bexp_max - max_exp + 1 - (fbits if denorm else 0), 2.0)
    max_float = np.float32(2.0 - 2.0 ** -fbits) * jnp.exp2(bexp_max - 127.0)
    min_float = jnp.exp2(bexp_min - 127.0)
    return max_float, min_float, bexp_min


def quantize_float_sim(x, ebits, fbits, emax, stochastic=0, denorm=True,
                       key=None):
    """Quantize float32 values onto the format grid.  Pure function."""
    max_float, min_float, bexp_min = _format_params(ebits, fbits, emax, denorm)
    f32 = jnp.float32
    x = x.astype(f32)
    sgn = jnp.sign(x)
    ax = jnp.abs(x)

    if fbits >= 23:
        # full f32 mantissa: no rounding, just range handling
        q = ax
    else:
        # relative ulp = 2^(floor(log2 ax) - fbits)
        _, ex = jnp.frexp(jnp.where(ax > 0, ax, 1.0))
        ulp = jnp.exp2((ex - 1 - fbits).astype(f32))
        if stochastic:
            if key is None:
                key = get_entropy()
            r = jax.random.uniform(key, x.shape, f32) * ulp
        else:
            r = 0.5 * ulp
        q = jnp.floor((ax + r) / ulp) * ulp

    q = jnp.minimum(q, max_float)
    q = jnp.where(q < min_float, 0.0, q)
    if denorm:
        # round to the fixed denorm quantum near the bottom of the range
        qd = jnp.exp2(jnp.asarray(bexp_min - 127, f32))
        q = jnp.where(q < qd * (2.0 ** fbits) * 2.0,
                      jnp.round(q / qd) * qd, q)
    return (sgn * q).astype(x.dtype)


def quantize_emax_estimate(x, spec: QuantizeSpec):
    """Functional replacement for the self-tuning emax modes
    (reference quantize_op.cc:140-158): mode 1 = max-based with bias_pad,
    mode 2 = mean + stdv_mul * std."""
    ax = jnp.abs(x.astype(jnp.float32))
    if spec.mode == 2:
        target = jnp.mean(ax) + spec.stdv_mul * jnp.std(ax)
    else:
        target = jnp.max(ax)
    e = jnp.floor(jnp.log2(jnp.maximum(target, 1e-30)))
    return (e + spec.bias_pad).astype(jnp.float32)


# ------------------------------------------------------------------
# Implicit-stateful emax tracking (reference src/quantize_op.cc:24-55:
# exp_max lives in variables inside the op, re-estimated every
# ``frequency`` steps).  The axon TPU runtime has no host callbacks, so
# state is threaded through the jit *automatically* at trace time: a
# thread-local frame collects reads (jit inputs) and estimates (jit
# outputs); the host applies estimates at ``frequency`` granularity.
# One-step lag vs the reference (an estimate recorded at step t is
# usable from step t+1) — irrelevant at frequency >= 2.
# ------------------------------------------------------------------

_ctx = threading.local()


class _TrackerFrame:
    def __init__(self, state):
        self.state = state        # name -> traced f32 emax (jit inputs)
        self.estimates = {}       # name -> traced f32 emax (jit outputs)
        self.freqs = {}           # name -> frequency (trace-time static)

    def read(self, name, spec):
        self.freqs[name] = spec.freq
        if name in self.state:
            return self.state[name]
        return jnp.float32(spec.emax)

    def record(self, name, est):
        self.estimates[name] = est


class QuantizeTracker:
    """Holds one emax per named tensor (and one per ``name + "_grad"``
    for tracked backward specs).  Usage::

        tracker = QuantizeTracker()
        step = tracker.wrap_jit(step_fn)        # instead of jax.jit
        ...inside step_fn:  quantize(x, qspec, bspec, name="q0", ...)

    Specs with ``mode`` 1 (max-based) or 2 (mean+stdv_mul*std) and a
    ``name`` participate; mode-0 specs stay static.  The first call
    traces twice (the second trace sees the discovered state entries).
    Supported in plain jit/grad step functions; inside shard_map/vmap
    the frame tracers cannot cross the inner trace — thread state
    manually there (quantize_emax_estimate)."""

    def __init__(self):
        self.emax = {}      # name -> current emax (python/np/device scalar)
        self.counts = {}
        self._freqs = {}

    def wrap_jit(self, fn, **jit_kwargs):
        tracker = self

        @functools.partial(jax.jit, **jit_kwargs)
        def inner(emax_state, args, kwargs):
            frame = _TrackerFrame(emax_state)
            prev = getattr(_ctx, "frame", None)
            _ctx.frame = frame
            try:
                out = fn(*args, **kwargs)
            finally:
                _ctx.frame = prev
            tracker._freqs.update(frame.freqs)
            return out, frame.estimates

        def wrapped(*args, **kwargs):
            state_in = {k: jnp.float32(v) for k, v in tracker.emax.items()}
            out, est = inner(state_in, args, kwargs)
            tracker._apply(est)
            return out

        return wrapped

    def _apply(self, estimates):
        for name, e in estimates.items():
            c = self.counts.get(name, 0)
            freq = max(int(self._freqs.get(name, 1)), 1)
            if name not in self.emax or c % freq == 0:
                self.emax[name] = e     # device scalar; no forced sync
            self.counts[name] = c + 1

    def emax_of(self, name):
        """Current emax for a tracked tensor (host sync)."""
        return float(self.emax[name])


def quantize(x, qspec: QuantizeSpec, b_qspec: QuantizeSpec = None, name=None,
             key=None, b_key=None):
    """Quantize forward with qspec; gradients quantized with b_qspec
    (reference quantize.py:74 + grad at :124).

    With a ``name`` and self-tuning specs (mode 1/2) inside a
    ``QuantizeTracker.wrap_jit`` step, emax is read from and estimated
    into the tracker state (forward stream under ``name``, gradient
    stream under ``name + "_grad"``)."""
    if b_qspec is None:
        b_qspec = qspec

    if x.dtype == jnp.bfloat16:
        for spec in (qspec, b_qspec):
            assert spec.fbits <= 7, \
                "bfloat only supports up to 7 fractional bits"

    frame = getattr(_ctx, "frame", None)
    emax_f, emax_b = qspec.emax, b_qspec.emax
    track_b = b_qspec.mode != 0 and name is not None and frame is not None
    if qspec.mode != 0 and name is not None and frame is not None:
        emax_f = frame.read(name, qspec)
        frame.record(name, quantize_emax_estimate(x, qspec))
    if track_b:
        emax_b = frame.read(name + "_grad", b_qspec)

    @jax.custom_vjp
    def _q(x):
        return quantize_float_sim(x, qspec.ebits, qspec.fbits, emax_f,
                                  qspec.stoch, qspec.denorm, key)

    def fwd(x):
        # emax_b rides the residuals: the bwd trace must not close over
        # a forward-trace tracer
        return _q(x), emax_b if track_b else None

    def bwd(res, dy):
        e_b = res if res is not None else b_qspec.emax
        if track_b:
            # recorded at trace time into the enclosing frame: legal
            # because jax.grad inside wrap_jit traces bwd under the
            # same jit trace the frame belongs to
            frame.record(name + "_grad",
                         quantize_emax_estimate(dy, b_qspec))
        return (quantize_float_sim(dy, b_qspec.ebits, b_qspec.fbits,
                                   e_b, b_qspec.stoch,
                                   b_qspec.denorm, b_key),)

    _q.defvjp(fwd, bwd)
    return _q(x)


# ------------------------------------------------------------------
# log_stats: periodic tensor statistics appended to a TSV logfile
# (reference quantize.py:155; src/quantize_op.cc LogStats)
# ------------------------------------------------------------------

stat_headers = [
    "sat_pct", "ftz_pct", "max", "mean", "stdv", "mean+stdv5",
    "max_stat_lo", "max_stat_hi", "count", "name",
]

_log_init = set()
_log_timestamp = None


def get_timestamp():
    global _log_timestamp
    if _log_timestamp is None:
        _log_timestamp = time.strftime('%Y_%m_%d_%H_%M_%S')
    return _log_timestamp


def tensor_stats(x, sat_val=65504.0, ftz_val=2.0 ** -24):
    ax = jnp.abs(x.astype(jnp.float32))
    n = x.size
    sat_pct = 100.0 * jnp.sum(ax >= sat_val) / n
    ftz_pct = 100.0 * jnp.sum((ax > 0) & (ax < ftz_val)) / n
    mx = jnp.max(ax)
    mean = jnp.mean(ax)
    stdv = jnp.std(ax)
    return sat_pct, ftz_pct, mx, mean, stdv


def log_stats(x, step, sat_val=65504.0, ftz_val=2.0 ** -24, freq=512,
              bfreq=512, logfile="", name=None):
    """Identity passthrough that appends tensor stats rows to a TSV at a
    pow-2 step schedule.  Grad stream is logged likewise."""
    assert freq == 0 or round(np.log2(freq)) == np.log2(freq)
    name = name or "log_stats"
    if logfile:
        logfile = logfile % {"timestamp": get_timestamp()}
        if logfile not in _log_init:
            with open(logfile, "w") as log:
                log.write("\t".join(stat_headers) + "\n")
            _log_init.add(logfile)

    def _emit(step_v, sat, ftz, mx, mean, stdv, tag):
        step_v = int(step_v)
        should = step_v > 0 and (
            (step_v & (step_v - 1)) == 0 or (freq and step_v % freq == 0))
        if not should:
            return
        row = [f"{float(sat):.4f}", f"{float(ftz):.4f}", f"{float(mx):.6g}",
               f"{float(mean):.6g}", f"{float(stdv):.6g}",
               f"{float(mean + 5 * stdv):.6g}", "0", "0",
               str(int(np.prod(x.shape))), tag]
        if logfile:
            with open(logfile, "a") as log:
                log.write("\t".join(row) + "\n")
        else:
            print("\t".join(row))

    @jax.custom_vjp
    def _ls(x):
        return x

    def fwd(x):
        sat, ftz, mx, mean, stdv = tensor_stats(x, sat_val, ftz_val)
        jax.debug.callback(_emit, step, sat, ftz, mx, mean, stdv, name)
        return x, None

    def bwd(_, dy):
        sat, ftz, mx, mean, stdv = tensor_stats(dy, sat_val, ftz_val)
        jax.debug.callback(_emit, step, sat, ftz, mx, mean, stdv,
                           name + "_grad")
        return (dy,)

    _ls.defvjp(fwd, bwd)
    return _ls(x)
