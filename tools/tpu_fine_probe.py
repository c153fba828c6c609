#!/usr/bin/env python
"""Fine-block kernel on-chip probe (VERDICT r4 item 2).

Parity + per-application timing at the canonical b8/b16 BA configs
(N=64, depth-8 chain) vs the dense_tile path they previously took
(results_canonical_p2.json: b8/7680 fwd 0.270 ms = 0.60x dense,
b8/10240 fwd 2.47 ms = 0.11x dense).
"""
import sys, os, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from blocksparse_tpu.ops.matmul import BlocksparseMatMul
from blocksparse_tpu.models.sparse_lstm import make_mask
from bench import bench_slope

p = argparse.ArgumentParser()
p.add_argument("--hidden", type=int, default=7680)
p.add_argument("--bsize", type=int, default=8)
p.add_argument("--m", type=int, default=56)
p.add_argument("--N", type=int, default=64)
p.add_argument("--depth", type=int, default=8)
p.add_argument("--modes", type=str, default="fine,auto")
p.add_argument("--out", type=str, default="")
args = p.parse_args()

out_rows = []

n = args.hidden // args.bsize
layout = make_mask(n, f"ba_{args.m}", seed=0)
blocks = int(layout.sum())
print(f"hidden {args.hidden} b{args.bsize} m{args.m}: {blocks} blocks "
      f"d={blocks/n/n:.3f}", flush=True)

dt = jnp.bfloat16
rng = np.random.RandomState(7)

for mode in args.modes.split(","):
    op = BlocksparseMatMul(layout, block_size=args.bsize, feature_axis=0,
                           mode=mode)
    if mode == "fine":
        fs = op.fprop_fine
        print(f"fine: chunks {fs.num_chunks} CH {fs.CH} Gf {fs.Gf} "
              f"steps {fs.num_steps} mxu_passes {fs.mxu_passes(args.bsize)}",
              flush=True)
    Wc = (rng.uniform(-1, 1, (blocks, args.bsize, args.bsize))
          .astype(np.float32) / np.sqrt(args.hidden * 0.1))
    W = jnp.asarray(Wc, dt)
    x0 = jnp.asarray(rng.uniform(-1, 1, op.i_shape(args.N)), dt)

    # parity on chip first
    y = np.asarray(jax.jit(lambda x, w: op(x, w))(x0, W).astype(jnp.float32))
    yg = op.fprop_test(np.asarray(x0, np.float32), Wc)
    err = np.abs(y - yg).max() / max(1e-6, np.abs(yg).max())
    print(f"{mode}: fprop rel err on chip {err:.2e}", flush=True)
    assert err < 5e-2, err

    def fwd_step(x, w, op=op):
        for _ in range(args.depth):
            x = op(x, w).astype(dt)
        return x * 0.5

    def fb_step(x, w, op=op):
        def chain(xx):
            y = xx
            for _ in range(args.depth):
                y = op(y, w).astype(dt)
            return y
        y, vjp = jax.vjp(chain, x)
        (dx,) = vjp(y)
        return (x * 0.999 + 1e-6 * dx).astype(dt)

    (t_f, t_fb), anch = bench_slope(
        [(fwd_step, x0, W), (fb_step, x0, W)], chains=(1, 4), iters=24,
        reps=4, with_anchor=True, retries=2)
    disp = op.dispatch_mode(args.N, np.dtype(np.float16).itemsize)
    print(f"{mode:10s} ({disp}) fwd {t_f/args.depth*1e3:7.4f} ms/app  "
          f"fwd+bwd {t_fb/args.depth*1e3:7.4f} ms/app  "
          f"anchor {anch['anchor_ms']:.4f} valid {anch['timing_valid']}",
          flush=True)
    out_rows.append({
        "mode": mode, "dispatch": disp,
        "fwd_ms_per_app": round(t_f / args.depth * 1e3, 4),
        "fwdbwd_ms_per_app": round(t_fb / args.depth * 1e3, 4),
        "rel_err": float(err),
        "anchor_ms": anch["anchor_ms"],
        "timing_valid": anch["timing_valid"]})

if args.out:
    import json
    payload = {"backend": jax.default_backend(), "hidden": args.hidden,
               "bsize": args.bsize, "m": args.m, "N": args.N,
               "depth": args.depth, "blocks": blocks,
               "density": round(blocks / n / n, 4), "rows": out_rows}
    prev = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
            if isinstance(prev, dict):
                prev = [prev]
    prev.append(payload)
    with open(args.out, "w") as f:
        json.dump(prev, f, indent=1)
    print(f"wrote {args.out}", flush=True)
