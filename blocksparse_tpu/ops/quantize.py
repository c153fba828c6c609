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
  variables and re-estimated every ``frequency`` steps) is exposed
  functionally: ``quantize_emax_estimate`` computes the new emax from
  tensor stats; thread it through your train state.  mode 0 (static
  emax) matches the reference exactly.
* ``log_stats`` emits TSV rows via jax.debug.callback.
"""
from __future__ import annotations

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
    """Biased exponent range per reference quantize_op.cc:85-101."""
    max_exp = (1 << ebits) - 1
    if ebits == 8:
        max_exp -= 1
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
    return (e + spec.bias_pad).astype(jnp.int32)


def quantize(x, qspec: QuantizeSpec, b_qspec: QuantizeSpec = None, name=None,
             key=None, b_key=None):
    """Quantize forward with qspec; gradients quantized with b_qspec
    (reference quantize.py:74 + grad at :124)."""
    if b_qspec is None:
        b_qspec = qspec

    if x.dtype == jnp.bfloat16:
        for spec in (qspec, b_qspec):
            assert spec.fbits <= 7, \
                "bfloat only supports up to 7 fractional bits"

    @jax.custom_vjp
    def _q(x):
        return quantize_float_sim(x, qspec.ebits, qspec.fbits, qspec.emax,
                                  qspec.stoch, qspec.denorm, key)

    def fwd(x):
        return _q(x), None

    def bwd(_, dy):
        return (quantize_float_sim(dy, b_qspec.ebits, b_qspec.fbits,
                                   b_qspec.emax, b_qspec.stoch,
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
