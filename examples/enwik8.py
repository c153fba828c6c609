#!/usr/bin/env python
"""Sparse Transformer language model on enwik8 (or synthetic bytes).

TPU-native re-make of /root/reference/examples/transformer/enwik8.py:
block-sparse attention (fixed pattern + causal sub-block masks), fused
layer norm / fast-gelu, mixed precision with dynamic loss scaling,
fused Adam with global-norm clipping, gradient recompute, and
data-parallel training over all available devices (the reference used
mpiexec + NCCL; here it's a dp mesh + psum).

Data: pass --data_file pointing at the enwik8 bytes; without it a
deterministic synthetic byte stream stands in (zero-egress environment).
Reports bits-per-byte like the reference (enwik8.py:400).
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

from blocksparse_tpu.models import SparseTransformerLM, TransformerConfig
from blocksparse_tpu.ops.optimize import AdamOptimizer
from blocksparse_tpu.parallel import make_mesh


def load_data(path, n_train, n_valid):
    if path and os.path.exists(path):
        with open(path, "rb") as f:
            data = np.frombuffer(f.read(), dtype=np.uint8)
    else:
        print("no data file; using synthetic byte stream")
        rng = np.random.RandomState(0)
        # markov-ish synthetic bytes so the LM has something to learn
        data = rng.randint(0, 64, size=n_train + n_valid).astype(np.uint8)
        data[1:] = (data[1:] + data[:-1] * 3) % 223
    return data[:n_train], data[n_train:n_train + n_valid]


def batch_iter(data, batch, ctx, rng):
    while True:
        idx = rng.randint(0, len(data) - ctx - 1, size=batch)
        x = np.stack([data[i:i + ctx] for i in idx]).astype(np.int32)
        y = np.stack([data[i + 1:i + ctx + 1] for i in idx]).astype(np.int32)
        yield x, y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_file", type=str, default=None)
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--n_batch", type=int, default=8)
    p.add_argument("--n_ctx", type=int, default=2048)
    p.add_argument("--n_embd", type=int, default=512)
    p.add_argument("--n_layer", type=int, default=6)
    p.add_argument("--n_head", type=int, default=8)
    p.add_argument("--blk_size", type=int, default=64)
    p.add_argument("--attn_layout", type=str, default="fixed")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--loss_scale", type=float, default=2.0 ** 15)
    p.add_argument("--dtype", type=str, default=None)
    p.add_argument("--profile", type=int, default=0)
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt_every", type=int, default=0)
    p.add_argument("--eval_every", type=int, default=0)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence(context)-parallel shards")
    p.add_argument("--sp_mode", type=str, default="gather",
                   choices=("gather", "ring"),
                   help="sp K/V exchange: all-gather or ring ppermute")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages (GPipe over the pp mesh axis)")
    p.add_argument("--pp_microbatch", type=int, default=0,
                   help="pipeline microbatches (0 => pp)")
    p.add_argument("--moe_experts", type=int, default=0,
                   help=">0: MoE MLPs (Switch/GShard, block-sparse "
                        "experts)")
    p.add_argument("--moe_k", type=int, default=1)
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel shards (needs --moe_experts)")
    args = p.parse_args()

    dtype = args.dtype or ("bfloat16" if jax.default_backend() == "tpu"
                           else "float32")
    n_dev = jax.device_count()
    model_par = args.tp * args.sp * args.pp * args.ep
    if n_dev % model_par != 0:
        raise SystemExit(
            f"--tp {args.tp} x --sp {args.sp} x --pp {args.pp} x "
        f"--ep {args.ep} must "
            f"divide the device count ({n_dev})")
    # data-parallel over the devices left after tp x sp x pp, when the
    # batch divides cleanly
    rest = n_dev // model_par
    # tokens are batch-sharded over dp x ep
    dp = (rest if rest > 0 and args.n_batch % (rest * args.ep) == 0
          else 1)
    if args.n_batch % (dp * args.ep) != 0:
        raise SystemExit(
            f"--n_batch {args.n_batch} must divide by dp*ep = "
            f"{dp * args.ep}")
    mesh_devices = jax.devices()[:dp * model_par]
    if dp * model_par < n_dev:
        print(f"note: n_batch {args.n_batch} not divisible by {rest}; "
              f"using {len(mesh_devices)}/{n_dev} devices (dp={dp})")

    cfg = TransformerConfig(
        n_vocab=256, n_embd=args.n_embd, n_layer=args.n_layer,
        n_head=args.n_head, ctx=args.n_ctx, blk_size=args.blk_size,
        attn_layout=args.attn_layout, local_blocks=8, mlp_ratio=4,
        dtype=dtype, recompute=True, tp=args.tp, sp=args.sp,
        sp_mode=args.sp_mode, pp=args.pp,
        pp_microbatch=args.pp_microbatch, moe_experts=args.moe_experts,
        moe_k=args.moe_k, ep=args.ep,
        mlp_block_size=32 if args.moe_experts else 0)
    model = SparseTransformerLM(cfg)
    print(f"model: {cfg.n_layer}L x {cfg.n_embd}d ctx {cfg.ctx} "
          f"attn blocks {model.bst.blocks} | devices {n_dev}")

    params = model.init(jax.random.PRNGKey(0))
    optm = AdamOptimizer(learning_rate=args.lr, zero_nans=True,
                         zero_infs=True)
    opt_state = optm.init(params)
    use_mesh = (dp > 1 or args.tp > 1 or args.sp > 1 or args.pp > 1
                or args.ep > 1)
    mesh = (make_mesh(dp=dp, tp=args.tp, sp=args.sp, pp=args.pp,
                      ep=args.ep, devices=mesh_devices)
            if use_mesh else None)
    step_fn = model.make_train_step(optm, mesh=mesh)

    train, valid = load_data(args.data_file, 9 * 10 ** 7, 5 * 10 ** 6)
    it = batch_iter(train, args.n_batch, args.n_ctx, np.random.RandomState(1))

    loss_scale = jnp.asarray(args.loss_scale
                             if dtype != "float32" else 1.0)
    start = 0
    if args.resume and args.ckpt_dir:
        from blocksparse_tpu import checkpoint as ck
        tree, meta = ck.restore(args.ckpt_dir)
        params, opt_state = tree["params"], tree["opt_state"]
        loss_scale = tree.get("loss_scale", loss_scale)
        start = meta["step"]
        print(f"resumed from step {start}")

    eval_fn = jax.jit(lambda p, x, y: model.loss(p, x, y))

    t0 = time.time()
    for step in range(start, args.n_iter):
        x, y = next(it)
        ctx_mgr = mesh or _null()
        with ctx_mgr:
            params, opt_state, metrics, loss_scale = step_fn(
                params, opt_state, jnp.asarray(x), jnp.asarray(y),
                loss_scale)
        if step % 10 == 0 or step == args.n_iter - 1:
            loss = float(metrics["loss"])
            bpb = loss / np.log(2)
            dt = time.time() - t0
            print(f"step {step:5d} loss {loss:7.4f} bits/byte {bpb:6.3f} "
                  f"gnorm {float(metrics['grad_norm']):8.2f} "
                  f"scale {float(loss_scale):9.1f} ({dt:5.1f}s)")
        if args.ckpt_every and args.ckpt_dir \
                and (step + 1) % args.ckpt_every == 0:
            from blocksparse_tpu import checkpoint as ck
            ck.save(args.ckpt_dir, params, opt_state=opt_state,
                    step=step + 1, loss_scale=loss_scale,
                    config=vars(args))
        if args.eval_every and (step + 1) % args.eval_every == 0:
            ev = np.random.RandomState(9)
            vx, vy = next(batch_iter(valid, args.n_batch, args.n_ctx, ev))
            vl = float(eval_fn(params, jnp.asarray(vx), jnp.asarray(vy)))
            print(f"  eval bits/byte {vl/np.log(2):6.3f}")
        if args.profile and step == args.profile:
            from blocksparse_tpu.profiling import trace
            with trace("/tmp/bs_trace") as logdir:
                params, opt_state, metrics, loss_scale = step_fn(
                    params, opt_state, jnp.asarray(x), jnp.asarray(y),
                    loss_scale)
                jax.block_until_ready(metrics["loss"])
            print(f"profiler trace written to {logdir}")
            break


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
