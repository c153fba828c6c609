#!/usr/bin/env python
"""Dense-attention transformer on MNIST with a quantization harness.

TPU-native re-make of /root/reference/examples/transformer/mnist_mpi.py:
dense masked_softmax attention over image patches plus the quantization
research rig — QuantizeSpec formats applied pre/post matmul with
independent forward/backward specs (mnist_mpi.py:18-62), fused Adam,
data-parallel allreduce.  Without the MNIST files a synthetic digit set
stands in (zero-egress environment).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
# honor an explicit CPU request (CI / virtual-mesh runs)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import blocksparse_tpu as bs
from blocksparse_tpu.ops.transformer import masked_softmax, \
    softmax_cross_entropy
from blocksparse_tpu.ops.norms import layer_norm
from blocksparse_tpu.ops.ewops import fast_gelu
from blocksparse_tpu.ops.quantize import (QuantizeSpec, QuantizeTracker,
                                          quantize)
from blocksparse_tpu.ops.optimize import AdamOptimizer


def get_data(n=4096):
    rng = np.random.RandomState(0)
    x = rng.rand(n, 784).astype(np.float32)
    y = rng.randint(0, 10, n)
    # synthetic structure: class-dependent blobs
    for i in range(n):
        x[i, y[i] * 70:(y[i] + 1) * 70] += 1.5
    return x, y


def make_qspecs(enabled):
    if not enabled:
        return None, None
    # reference mnist_mpi.py:18-62: e4f3 forward / e5f2-ish backward
    fwd = QuantizeSpec(ebits=4, fbits=3, stochastic=2, mode=1)
    bwd = QuantizeSpec(ebits=5, fbits=2, stochastic=2, mode=1)
    return fwd, bwd


def init_params(key, D=64, n_layer=2):
    ks = jax.random.split(key, 16)
    std = 0.05

    def rnd(k, shape):
        return jax.random.normal(k, shape) * std

    layers = []
    for l in range(n_layer):
        k = jax.random.split(ks[4 + l], 8)
        layers.append({
            "ln_g": jnp.ones((D,)), "ln_b": jnp.zeros((D,)),
            "ln2_g": jnp.ones((D,)), "ln2_b": jnp.zeros((D,)),
            "wq": rnd(k[0], (D, D)), "wk": rnd(k[1], (D, D)),
            "wv": rnd(k[2], (D, D)), "wo": rnd(k[3], (D, D)),
            "w1": rnd(k[4], (D, 4 * D)), "w2": rnd(k[5], (4 * D, D)),
        })
    return {
        "w_in": rnd(ks[0], (49, D)), "b_in": jnp.zeros((D,)),
        "w_out": rnd(ks[1], (D, 10)), "b_out": jnp.zeros((10,)),
        "layers": layers,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_iter", type=int, default=200)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--quantize", action="store_true")
    args = p.parse_args()

    X, Y = get_data()
    params = init_params(jax.random.PRNGKey(0))
    optm = AdamOptimizer(learning_rate=1e-3)
    state = optm.init(params)
    qspecs = make_qspecs(args.quantize)
    # self-tuning emax (mode=1 specs): the tracker threads per-tensor
    # emax state through the jit automatically — no caller-side state
    # (reference src/quantize_op.cc:24-55 implicit variables)
    tracker = QuantizeTracker()

    def step(params, state, x, y, key):
        x = x.reshape(-1, 16, 49).reshape(-1, 784)  # 16 patches of 49
        xp = x.reshape(-1, 16, 49)

        def loss_fn(p):
            keys = jax.random.split(key, 8)
            h = jnp.einsum("ntp,pd->ntd", xp, p["w_in"]) + p["b_in"]
            logits = model_apply_patches(p, h, qspecs, keys)
            return jnp.mean(softmax_cross_entropy(logits=logits, labels=y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gn, ns = bs.clip_by_global_norm(jax.tree_util.tree_leaves(grads),
                                        clip_norm=1.0)
        params, state = optm.apply(grads, params, state, norm_scale=ns)
        return params, state, loss

    step = tracker.wrap_jit(step)

    def model_apply_patches(p, h, qspecs, keys):
        fwd_spec, bwd_spec = qspecs if qspecs[0] is not None else (None, None)
        D = h.shape[-1]
        for l, layer in enumerate(p["layers"]):
            a = layer_norm(h.reshape(-1, D), layer["ln_g"], layer["ln_b"],
                           axis=-1).reshape(h.shape)
            q = a @ layer["wq"]
            k = a @ layer["wk"]
            v = a @ layer["wv"]
            if fwd_spec is not None:
                q = quantize(q, fwd_spec, bwd_spec, name=f"q{l}",
                             key=keys[2 * l])
                k = quantize(k, fwd_spec, bwd_spec, name=f"k{l}",
                             key=keys[2 * l + 1])
            w = jnp.einsum("ntd,nsd->nts", q, k) / np.sqrt(D)
            pr = masked_softmax(w)
            h = h + jnp.einsum("nts,nsd->ntd", pr, v) @ layer["wo"]
            m = layer_norm(h.reshape(-1, D), layer["ln2_g"], layer["ln2_b"],
                           axis=-1).reshape(h.shape)
            h = h + fast_gelu(m @ layer["w1"]) @ layer["w2"]
        return h.mean(axis=1) @ p["w_out"] + p["b_out"]

    rng = np.random.RandomState(1)
    t0 = time.time()
    for it in range(args.n_iter):
        idx = rng.randint(0, len(X), args.batch)
        params, state, loss = step(params, state, jnp.asarray(X[idx]),
                                   jnp.asarray(Y[idx]),
                                   jax.random.PRNGKey(it))
        if it % 20 == 0 or it == args.n_iter - 1:
            print(f"iter {it:4d} loss {float(loss):7.4f} "
                  f"({time.time() - t0:5.1f}s)")

    # eval accuracy
    logits = []
    for i in range(0, 1024, args.batch):
        x = jnp.asarray(X[i:i + args.batch]).reshape(-1, 16, 49)
        h = jnp.einsum("ntp,pd->ntd", x, params["w_in"]) + params["b_in"]
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        logits.append(np.asarray(model_apply_patches(
            params, h, (None, None), keys)))
    acc = (np.concatenate(logits).argmax(-1) == Y[:1024]).mean()
    print(f"train accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
