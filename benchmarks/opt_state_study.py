#!/usr/bin/env python
"""16-bit optimizer-state accuracy study (VERDICT r2 #7).

The reference packs Adam mean/var into mhalf(6e9m1s)/vhalf(6e10m)
16-bit formats (src/gpu_types.h:81-104); round 2 substituted bfloat16
slots without measuring the difference.  This script trains the same
enwik8-tiny Sparse Transformer from identical init with three state
formats — float32, bfloat16, packed16 (true mhalf/vhalf uint16) — and
records the loss curves + final param divergence from the f32 run.

Decision criterion: if bf16's curve tracks f32 within noise, bf16
stays the default 16-bit format (hardware-native, no pack/unpack ops);
if it measurably degrades, packed16 (more mantissa, less range) is the
drop-in fix.  Result and decision recorded in STATUS.md.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import blocksparse_tpu as bs
from blocksparse_tpu.models.sparse_transformer import (SparseTransformerLM,
                                                       TransformerConfig)
from blocksparse_tpu.ops.optimize import AdamOptimizer
from bench import result_path


def run_curve(state_format, n_iter, batch, data, cfg, lr):
    model = SparseTransformerLM(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optm = AdamOptimizer(learning_rate=lr, zero_nans=True,
                         state_format=state_format)
    opt_state = optm.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return model.loss(p, x, y)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        gn, ns = bs.clip_by_global_norm(jax.tree_util.tree_leaves(grads),
                                        clip_norm=1.0)
        params, opt_state = optm.apply(grads, params, opt_state,
                                       norm_scale=ns)
        return params, opt_state, loss

    rng = np.random.RandomState(1)
    losses = []
    for it in range(n_iter):
        idx = rng.randint(0, len(data) - cfg.ctx - 1, batch)
        x = np.stack([data[i:i + cfg.ctx] for i in idx]).astype(np.int32)
        y = np.stack([data[i + 1:i + cfg.ctx + 1]
                      for i in idx]).astype(np.int32)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
        if it % 20 == 0:
            print(f"  [{state_format}] iter {it:4d} loss {losses[-1]:.4f}",
                  flush=True)
    return losses, params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_iter", type=int, default=150)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n_embd", type=int, default=256)
    p.add_argument("--ctx", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out", type=str, default=result_path("opt_state"))
    args = p.parse_args()

    # n_embd >= 256 so attention/MLP weights cross the 8K-element
    # threshold that switches on 16-bit slots (reference optimize.py:70)
    cfg = TransformerConfig(
        n_vocab=256, n_embd=args.n_embd, n_layer=2, n_head=4,
        ctx=args.ctx, blk_size=32, attn_layout="fixed", local_blocks=4,
        mlp_ratio=4, dtype="float32", recompute=False)

    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, size=10 ** 6).astype(np.int64)
    data[1:] = (data[1:] * 31 + 17 * data[:-1]) % 256  # learnable structure
    data = data.astype(np.uint8)

    results = {"n_iter": args.n_iter, "batch": args.batch,
               "n_embd": args.n_embd, "ctx": args.ctx,
               "backend": jax.default_backend(), "curves": {}}
    params_by_fmt = {}
    for fmt in ("float32", "bfloat16", "packed16"):
        print(f"training with {fmt} optimizer state...", flush=True)
        losses, params = run_curve(fmt, args.n_iter, args.batch, data,
                                   cfg, args.lr)
        results["curves"][fmt] = losses
        params_by_fmt[fmt] = params

    ref = params_by_fmt["float32"]
    for fmt in ("bfloat16", "packed16"):
        num = den = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(params_by_fmt[fmt])):
            num += float(jnp.sum((a.astype(jnp.float32)
                                  - b.astype(jnp.float32)) ** 2))
            den += float(jnp.sum(a.astype(jnp.float32) ** 2))
        results[f"param_rel_l2_{fmt}"] = float(np.sqrt(num / den))

    w = args.n_iter // 5
    for fmt, curve in results["curves"].items():
        tail = float(np.mean(curve[-w:]))
        results[f"tail_loss_{fmt}"] = round(tail, 5)
        print(f"{fmt:9s}: tail-loss {tail:.5f}")
    for fmt in ("bfloat16", "packed16"):
        d = results[f"tail_loss_{fmt}"] - results["tail_loss_float32"]
        print(f"{fmt:9s}: delta vs f32 {d:+.5f}, "
              f"param rel-L2 {results[f'param_rel_l2_{fmt}']:.4f}")

    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
