#!/usr/bin/env python
"""Sparse LSTM language model training (text8/wiki3-style).

TPU-native re-make of /root/reference/examples/lstm/train.py: block-
sparse mLSTM with small-world (Barabasi-Albert) weight layout,
SparseProj strided projections, fused gates + segmented layernorm,
fused Adam, EMA of parameters for eval, bits-per-char reporting.
Synthetic byte data stands in when no corpus file is given.
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
from blocksparse_tpu.models.sparse_lstm import SparseLSTM, LSTMConfig
from blocksparse_tpu.ops.optimize import AdamOptimizer, Ema


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_file", type=str, default=None)
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--nsteps", type=int, default=64)
    p.add_argument("--nhidden", type=int, default=1120)
    p.add_argument("--mask_kind", type=str, default="ba_10")
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args()

    cfg = LSTMConfig(nhidden=args.nhidden, nsteps=args.nsteps,
                     mask_kind=args.mask_kind)
    model = SparseLSTM(cfg)
    print(f"sparse LSTM: nhidden {cfg.nhidden}, layout {cfg.mask_kind}, "
          f"blocks {model.bsmm_h.blocks} "
          f"(density {model.bsmm_h.sparsity:.3f})")

    if args.data_file and os.path.exists(args.data_file):
        data = np.frombuffer(open(args.data_file, "rb").read(),
                             dtype=np.uint8)
    else:
        rng = np.random.RandomState(0)
        data = rng.randint(0, 27, size=10 ** 7).astype(np.uint8)
        data[1:] = (data[1:] + 7 * data[:-1]) % 27

    params = model.init(jax.random.PRNGKey(0))
    optm = AdamOptimizer(learning_rate=args.lr, zero_nans=True)
    state = optm.init(params)
    ema = Ema(decay=0.999)
    ema_state = ema.init(params)

    @jax.jit
    def step(params, state, ema_state, x, y):
        loss, grads = jax.value_and_grad(model.loss)(params, x, y)
        gn, ns = bs.clip_by_global_norm(jax.tree_util.tree_leaves(grads),
                                        clip_norm=1.0)
        params, state = optm.apply(grads, params, state, norm_scale=ns)
        ema_state = ema.apply(params, ema_state)
        return params, state, ema_state, loss, gn

    rng = np.random.RandomState(1)
    t0 = time.time()
    for it in range(args.n_iter):
        idx = rng.randint(0, len(data) - args.nsteps - 1, args.batch)
        x = np.stack([data[i:i + args.nsteps] for i in idx]).astype(np.int32)
        y = np.stack([data[i + 1:i + args.nsteps + 1]
                      for i in idx]).astype(np.int32)
        params, state, ema_state, loss, gn = step(
            params, state, ema_state, jnp.asarray(x), jnp.asarray(y))
        if it % 10 == 0 or it == args.n_iter - 1:
            bpc = float(loss) / np.log(2)
            its = (it + 1) / (time.time() - t0)
            print(f"iter {it:5d} loss {float(loss):7.4f} "
                  f"bits/char {bpc:6.3f} gnorm {float(gn):8.2f} "
                  f"{its:5.2f} it/s")


if __name__ == "__main__":
    main()
