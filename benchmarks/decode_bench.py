#!/usr/bin/env python
"""KV-cached incremental decode throughput.

Serving-path benchmark: tokens/sec of ``generate_cached`` (one prefill,
then O(visible blocks) per token) vs the reference-style full-context
``generate`` (one O(ctx^2) forward per token).  The reference's analog
is its dynamic per-step re-masking decode
(/root/reference/blocksparse/transformer.py:366-370).

Writes benchmarks/results_decode.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from blocksparse_tpu.models.sparse_transformer import (
    SparseTransformerLM, TransformerConfig, generate, generate_cached)


def main():
    on_tpu = jax.default_backend() == "tpu"
    ctx = 2048 if on_tpu else 256
    cfg = TransformerConfig(
        n_vocab=256, ctx=ctx, n_embd=512 if on_tpu else 128,
        n_layer=6 if on_tpu else 2, n_head=8 if on_tpu else 4,
        blk_size=64, attn_layout="fixed", dtype="bfloat16")
    model = SparseTransformerLM(cfg)
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.numpy.asarray(
        np.random.RandomState(0).randint(0, 256, (1, ctx // 2)), np.int32)
    steps = 64 if on_tpu else 8

    def run(fn):
        out = fn(model, params, prompt, 2)   # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(model, params, prompt, steps)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    dt_cached = run(generate_cached)
    dt_full = run(generate)
    res = {
        "ctx": ctx, "prompt": int(prompt.shape[1]), "steps": steps,
        "cached_ms_per_token": round(dt_cached * 1e3, 3),
        "full_ms_per_token": round(dt_full * 1e3, 3),
        "speedup": round(dt_full / dt_cached, 2),
        "backend": jax.default_backend(),
    }
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results_decode.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
