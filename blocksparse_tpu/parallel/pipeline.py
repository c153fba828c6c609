"""GPipe-style pipeline parallelism over a mesh axis ("pp").

The reference has no pipeline story (openai/blocksparse scales by
data-parallel NCCL allreduce only; its nccl.py stubs the sharding
collectives).  On TPU, pipelining is the natural way to scale *depth*
past one chip's HBM: each device along the "pp" axis holds a contiguous
slice of layers and microbatches stream through the stages over ICI.

TPU-native mechanics (no MPI ranks, no send/recv threads):

* One SPMD program: every device runs the same ``lax.scan`` over
  ``T = n_micro + n_stages - 1`` ticks.  At each tick a device applies
  its stage to its current activation and hands the result to the next
  stage with ``lax.ppermute`` (a pure ICI shift).
* Stage 0 ingests microbatch ``t`` at tick ``t``; the last stage emits
  microbatch ``t-(n_stages-1)``.  Bubble ticks compute on garbage and
  their outputs are never stored (the scan overwrite order makes the
  first ``n_stages-1`` clipped writes dead).
* **The backward pass is derived, not written**: ``jax.grad`` through
  scan+ppermute transposes to the reverse pipeline (cotangents ride the
  inverse permutation), so fwd and bwd share one schedule definition.

Gradient/loss bookkeeping for the 1/S trick (used by the flagship LM,
models/sparse_transformer.py): compute the final activation only on the
last stage, replicate it with :func:`broadcast_from_last` (mask+psum),
and scale the per-shard loss by ``1/n_stages``.  Then a plain
``psum`` over "pp" of the local gradients is exact for every
*replicated* parameter (embeddings, final LN, logits head):

* head params: each shard computes the same head grad / S -> psum = 1x.
* the psum in broadcast_from_last transposes to a psum of cotangents,
  S * (ybar/S) = ybar, so exactly the true cotangent enters the
  pipeline on the last stage (and stage-sharded layer grads need no
  pp reduction at all).
* embedding params: only stage 0's select() consumes the embedded
  input, so the local grad is the true grad on stage 0 and zero
  elsewhere -> psum = 1x.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def gpipe(stage_fn, stage_params, x_micro, *, axis, n_stages,
          with_aux=False):
    """Run a shape-preserving stage pipeline inside shard_map.

    Args:
      stage_fn: ``(stage_params, h) -> h`` — THIS device's layer slice.
        Must preserve the activation shape/dtype (identical stages).
        With ``with_aux=True``: ``(stage_params, h) -> (h, aux)`` where
        ``aux`` is a scalar auxiliary loss (e.g. MoE load balance).
      stage_params: this device's parameter shard (leading layer dim
        already local — i.e. the caller sharded the stacked layer
        params over ``axis``).
      x_micro: ``(n_micro, ...)`` microbatched input, replicated along
        ``axis``.  Only stage 0 consumes it.
      axis: mesh axis name for the pipeline.
      n_stages: static stage count (== mesh.shape[axis]).
      with_aux: also accumulate the per-tick scalar aux over THIS
        stage's valid ticks (stage s computes real microbatches on
        ticks ``s..s+n_micro-1``; bubble-tick aux is masked out).

    Returns:
      ``(n_micro, ...)`` outputs — VALID ONLY on the last stage; use
      :func:`broadcast_from_last` to replicate along the axis.  With
      ``with_aux``: ``(outputs, aux_sum)`` where aux_sum is this
      shard's stage-local aux summed over microbatches (distinct per
      pp shard — reduce with a psum over the axis, never divide by S).
    """
    n_micro = x_micro.shape[0]
    S = int(n_stages)
    idx = lax.axis_index(axis)
    T = n_micro + S - 1
    perm = [(i, i + 1) for i in range(S - 1)]

    def body(carry, t):
        recv, out, aux = carry
        mb = jnp.clip(t, 0, n_micro - 1)
        x_t = lax.dynamic_index_in_dim(x_micro, mb, 0, keepdims=False)
        inp = jnp.where(idx == 0, x_t, recv)
        if with_aux:
            y, a = stage_fn(stage_params, inp)
            valid = (t >= idx) & (t < idx + n_micro)
            aux = aux + jnp.where(valid, a.astype(jnp.float32), 0.0)
        else:
            y = stage_fn(stage_params, inp)
        if perm:
            recv_next = lax.ppermute(y, axis, perm)
        else:
            recv_next = recv
        # Output slot for this tick on the last stage; ticks t < S-1
        # clip to slot 0 and are overwritten by the real write at
        # t = S-1 (scan order), so no masking is needed.
        o = jnp.clip(t - (S - 1), 0, n_micro - 1)
        out = lax.dynamic_update_index_in_dim(out, y, o, 0)
        return (recv_next, out, aux), None

    h0 = jnp.zeros_like(x_micro[0])
    out0 = jnp.zeros_like(x_micro)
    aux0 = jnp.zeros((), jnp.float32)
    (_, out, aux), _ = lax.scan(body, (h0, out0, aux0), jnp.arange(T))
    return (out, aux) if with_aux else out


def broadcast_from_last(y, *, axis, n_stages):
    """Replicate the last stage's value along the pipeline axis.

    Mask every other shard to zero and psum: forward gives each shard
    the last stage's ``y``; the transpose delivers the summed cotangent
    to the last stage only (see module docstring for why this composes
    exactly with the 1/S loss scaling)."""
    idx = lax.axis_index(axis)
    mask = (idx == n_stages - 1).astype(y.dtype)
    return lax.psum(y * mask, axis)


def microbatch(x, n_micro, batch_axis=0):
    """Split ``batch`` into ``(n_micro, batch/n_micro, ...)``."""
    assert x.shape[batch_axis] % n_micro == 0, (x.shape, n_micro)
    b = x.shape[batch_axis] // n_micro
    new = x.shape[:batch_axis] + (n_micro, b) + x.shape[batch_axis + 1:]
    return jnp.moveaxis(x.reshape(new), batch_axis, 0) \
        if batch_axis else x.reshape(new)


def unmicrobatch(y, batch_axis=0):
    """Inverse of :func:`microbatch` (batch_axis=0 layout)."""
    assert batch_axis == 0
    return y.reshape((y.shape[0] * y.shape[1],) + y.shape[2:])
