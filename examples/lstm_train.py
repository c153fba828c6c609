#!/usr/bin/env python
"""Sparse LSTM language model training (text8/wiki3-style).

TPU-native re-make of /root/reference/examples/lstm/train.py: block-
sparse mLSTM with small-world (Barabasi-Albert) weight layout,
SparseProj strided projections, fused gates + segmented layernorm,
fused Adam, EMA of parameters with in-loop EMA eval, multi-layer
stacks (--lsteps), recompute, dropout, and checkpoint save/restore
(--save_path/--restore; the reference's HParams joblib round-trip,
layers.py:44-98, becomes blocksparse_tpu.checkpoint with a layout
sidecar).  Synthetic byte data stands in when no corpus file is given.
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
from blocksparse_tpu import checkpoint
from blocksparse_tpu.models.sparse_lstm import SparseLSTM, LSTMConfig
from blocksparse_tpu.ops.optimize import AdamOptimizer, Ema


def get_batch(data, rng, batch, nsteps):
    idx = rng.randint(0, len(data) - nsteps - 1, batch)
    x = np.stack([data[i:i + nsteps] for i in idx]).astype(np.int32)
    y = np.stack([data[i + 1:i + nsteps + 1] for i in idx]).astype(np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_file", type=str, default=None)
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--nsteps", type=int, default=64)
    p.add_argument("--nhidden", type=int, default=1120)
    p.add_argument("--isteps", type=int, default=2)
    p.add_argument("--lsteps", type=int, default=1,
                   help="stacked sparse LSTM layers")
    p.add_argument("--share_masks", type=int, default=1)
    p.add_argument("--forget_bias", type=float, default=1.0)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--recompute", type=int, default=0)
    p.add_argument("--mask_kind", type=str, default="ba_10")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--ckpt_every", type=int, default=0)
    p.add_argument("--restore", type=str, default="")
    p.add_argument("--eval_every", type=int, default=0,
                   help="run an EMA-weights eval every N iters")
    args = p.parse_args()

    cfg = LSTMConfig(nhidden=args.nhidden, nsteps=args.nsteps,
                     mask_kind=args.mask_kind, isteps=args.isteps,
                     lsteps=args.lsteps, share_masks=bool(args.share_masks),
                     forget_bias=args.forget_bias, dropout=args.dropout,
                     recompute=bool(args.recompute))
    if args.restore:
        tree, meta = checkpoint.restore(args.restore)
        cfg = LSTMConfig(**meta["config"])
        print(f"restored config from {args.restore} (step {meta['step']})")
    model = SparseLSTM(cfg)
    print(f"sparse LSTM: nhidden {cfg.nhidden} x {cfg.lsteps}L, layout "
          f"{cfg.mask_kind}, blocks {model.bsmm_h.blocks} "
          f"(density {model.bsmm_h.sparsity:.3f})")

    if args.data_file and os.path.exists(args.data_file):
        data = np.frombuffer(open(args.data_file, "rb").read(),
                             dtype=np.uint8)
    else:
        rng = np.random.RandomState(0)
        data = rng.randint(0, 27, size=10 ** 7).astype(np.uint8)
        data[1:] = (data[1:] + 7 * data[:-1]) % 27
    n_val = max(len(data) // 20, args.nsteps * args.batch + 2)
    train_data, val_data = data[:-n_val], data[-n_val:]

    optm = AdamOptimizer(learning_rate=args.lr, zero_nans=True)
    ema = Ema(decay=0.999)
    start_iter = 0
    if args.restore:
        params = tree["params"]
        state = tree.get("opt_state") or optm.init(params)
        ema_state = tree.get("ema_state") or ema.init(params)
        start_iter = int(meta["step"])
    else:
        params = model.init(jax.random.PRNGKey(0))
        state = optm.init(params)
        ema_state = ema.init(params)

    @jax.jit
    def step(params, state, ema_state, x, y, key):
        loss, grads = jax.value_and_grad(model.loss)(
            params, x, y, key if cfg.dropout > 0 else None)
        gn, ns = bs.clip_by_global_norm(jax.tree_util.tree_leaves(grads),
                                        clip_norm=1.0)
        params, state = optm.apply(grads, params, state, norm_scale=ns)
        ema_state = ema.apply(params, ema_state)
        return params, state, ema_state, loss, gn

    @jax.jit
    def eval_step(ema_params, x, y):
        return model.loss(ema_params, x, y)

    rng = np.random.RandomState(1 + start_iter)
    t0 = time.time()
    for it in range(start_iter, start_iter + args.n_iter):
        x, y = get_batch(train_data, rng, args.batch, args.nsteps)
        params, state, ema_state, loss, gn = step(
            params, state, ema_state, x, y, jax.random.PRNGKey(it))
        if it % 10 == 0 or it == start_iter + args.n_iter - 1:
            bpc = float(loss) / np.log(2)
            its = (it - start_iter + 1) / (time.time() - t0)
            print(f"iter {it:5d} loss {float(loss):7.4f} "
                  f"bits/char {bpc:6.3f} gnorm {float(gn):8.2f} "
                  f"{its:5.2f} it/s")
        if args.eval_every and (it + 1) % args.eval_every == 0:
            # eval with EMA weights (reference train.py evals the EMA
            # copy; Ema state IS the averaged params pytree)
            vx, vy = get_batch(val_data, np.random.RandomState(7),
                               args.batch, args.nsteps)
            vl = float(eval_step(ema.params(ema_state), vx, vy))
            print(f"iter {it:5d} EMA val loss {vl:7.4f} "
                  f"bits/char {vl / np.log(2):6.3f}")
        if args.save_path and args.ckpt_every and \
                (it + 1) % args.ckpt_every == 0:
            checkpoint.save(args.save_path, params, opt_state=state,
                            ema_state=ema_state, step=it + 1,
                            layouts=model.layouts(),
                            config=model.config_dict())
            print(f"iter {it:5d} checkpoint -> {args.save_path}")

    if args.save_path:
        checkpoint.save(args.save_path, params, opt_state=state,
                        ema_state=ema_state,
                        step=start_iter + args.n_iter,
                        layouts=model.layouts(), config=model.config_dict())
        print(f"saved checkpoint -> {args.save_path}")


if __name__ == "__main__":
    main()
