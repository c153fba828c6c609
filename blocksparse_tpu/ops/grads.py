"""Gradient utilities: recompute (checkpointing) and a grad entry point.

TPU-native equivalent of /root/reference/blocksparse/grads.py.  The
reference reimplements ``tf.gradients`` to control aggregation trees,
dw-before-dx ordering, and a two-copy recompute graph.  Under JAX/XLA:

* ``@recomputable`` maps to ``jax.checkpoint`` (rematerialization): the
  recomputed forward runs just-in-time in the backward pass, exactly the
  behavior the reference builds by hand with control edges
  (grads.py:17-88).
* grad aggregation (the add_n8 trees, grads.py:110-129) and op ordering
  for comm overlap (grads.py:184-194) are XLA-scheduler concerns; the
  latency-hiding scheduler overlaps collectives with remaining bprop
  automatically.
* ``gradients`` is a functional wrapper over ``jax.grad``.
"""
from __future__ import annotations

import functools

import jax


class recomputable:
    """Decorator: run the wrapped function under jax.checkpoint when
    called with ``recompute=True`` (kwarg, parity with reference
    grads.py:17): activations inside are not saved; they are recomputed
    during the backward pass."""

    def __init__(self, func):
        functools.update_wrapper(self, func)
        self.func = func

    def __call__(self, *args, **kwargs):
        recompute = kwargs.pop("recompute", False)
        if not recompute:
            return self.func(*args, **kwargs)
        f = functools.partial(self.func, **kwargs) if kwargs else self.func
        return jax.checkpoint(f)(*args)

    def __get__(self, instance, owner):
        return functools.partial(self.__call__, instance)


def gradients(fun, xs, grad_ys=None, stop_grads=None, group_aggregations=8,
              custom_matmul_grad=True, has_aux=False):
    """Functional replacement for the reference's custom ``bs.gradients``
    (grads.py:196), including its ``grad_ys`` and ``stop_grads`` args.

    fun: callable taking ``xs`` (a pytree) and returning a scalar loss
         (or (loss, aux) with has_aux=True).  With ``grad_ys`` the output
         may be any pytree of arrays.
    xs:  pytree of arrays to differentiate against.

    grad_ys: optional cotangent pytree matching fun's output — the
        initial dy seeded into the backward pass (reference
        grads.py:196,217).  When given, fun need not return a scalar.
    stop_grads: optional bool pytree (same structure as ``xs``, or a
        prefix): True leaves are held constant — their returned grads
        are zero and nothing flows through them (reference
        grads.py:196,234 treats listed tensors as constants).  For
        *intermediate* tensors use ``jax.lax.stop_gradient`` inside fun,
        which is the same mechanism.

    Returns the grad pytree (with aux if requested).
    """
    if stop_grads is not None:
        inner = fun

        def fun(xs_, _inner=inner):
            xs_ = jax.tree.map(
                lambda s, x: jax.lax.stop_gradient(x) if s else x,
                stop_grads, xs_, is_leaf=lambda s: s is None or
                isinstance(s, bool))
            return _inner(xs_)

    if grad_ys is None:
        return jax.grad(fun, has_aux=has_aux)(xs)
    if has_aux:
        _, vjp_fn, aux = jax.vjp(fun, xs, has_aux=True)
        (gx,) = vjp_fn(grad_ys)
        return gx, aux
    _, vjp_fn = jax.vjp(fun, xs)
    (gx,) = vjp_fn(grad_ys)
    return gx
