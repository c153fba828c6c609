"""Headline benchmark: block-sparse matmul vs density-scaled roofline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config follows the reference's canonical bsmm benchmark
(/root/reference/README.md:44-67, test/blocksparse_matmul_bench.py):
block_size 32, random layout, density 25%, hidden scaled to 8192 and
batch to 2048 (v5e-scale shapes).

Timing: ANCHOR-VALIDATED SLOPE TIMING.  The bench chip is a shared,
time-sliced tenant: depending on the window, executions pay a
per-iteration contention quantum from ~0 up to hundreds of ms
(measured both extremes with verified-correct outputs --
tools/tpu_floor_probe.py, BENCH_NOTES.md round-3).  Round 2's
per-execution timing reported whatever the window gave it.  Here every
workload is timed at two chain lengths (c applications
data-dependently chained inside the scan body); per-application time
is the slope (t(c2) - t(c1)) / (c2 - c1), cancelling per-CALL
overhead; a known-cost dense anchor measured through the same protocol
validates the window (per-ITERATION contention shows up in the
anchor), and invalid passes re-time after a backoff.  Sparse/dense
reps are interleaved (A/B/A/B), every rep runs on a fresh input (the
tunnel caches repeat executions), and every timed call waits on a
scalar HOST READBACK rather than block_until_ready, which does not
reliably block through the tunnel (see `checksum`).

Headline = canonical random layout.  detail adds: the structured
(banded) layout fraction at the same density — random layouts carry a
~0.39 MXU-fill ceiling on a 128-lane MXU (BENCH_NOTES.md), banded
layouts do not, so this is the kernel-quality number; fwd+bwd
(all three directions, like the reference's `bench` attr on every op);
and the sparse-vs-dense-flash attention comparison (dense control =
the SAME fused flash kernel on a dense causal layout, so the speedup
isolates sparsity, not kernel quality).
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# the axon TPU plugin registers itself regardless of JAX_PLATFORMS;
# honor an explicit CPU request (CI smoke) like tests/conftest.py does
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def _fresh_pool(x0, reps, seed=17):
    key = jax.random.PRNGKey(seed)
    pool = []
    for _ in range(reps):
        key, sub = jax.random.split(key)
        eps = (jax.random.uniform(sub, x0.shape, jnp.float32, -1e-3, 1e-3)
               .astype(x0.dtype))
        pool.append(x0 + eps)
    # tiny host readback flushes the queue so pool materialization
    # can't bleed into a timed call (block_until_ready is unreliable
    # through the tunnel)
    for p in pool:
        np.asarray(jax.device_get(p[(0,) * (p.ndim - 1)][:1]))
    return pool


def checksum(y):
    """Scalar f32 checksum of a pytree — the only output a timed runner
    should return.  The timer then waits on a HOST READBACK of the
    scalar (`float(...)`), which cannot complete before the whole
    computation: `jax.block_until_ready` does NOT reliably block
    through the bench tunnel (measured returning in 0.13 ms on a 3.6 s
    program, while agreeing with readback timing on other programs —
    BENCH_NOTES.md round-3 finding 3).  A readback forces real
    execution, so no output inflation is needed either."""
    return sum(jnp.sum(jnp.square(a.astype(jnp.float32)))
               for a in jax.tree_util.tree_leaves(y))


def chain_timer(one_step, x0, chain, iters=8, reps=3, params=None):
    """Compile + warm a runner whose scan body applies one_step `chain`
    times (data-dependent); returns a zero-arg timer giving seconds per
    scan iteration (= quantum + chain * t_app).

    The runner returns a scalar checksum and the timer waits on its
    host readback (see `checksum`).  Every timed rep consumes a fresh
    input (the tunnel caches repeat (executable, args) executions).

    Big constants (weights) must be passed via `params`, making them
    jit ARGUMENTS: closed-over arrays are inlined as HLO literals and
    ship inside the compile request, which the tunnel's remote-compile
    server rejects over ~0.5 GB with HTTP 413 (hit at hidden=16384
    dense; jax.closure_convert does NOT hoist concrete arrays).  With
    params, one_step is called as one_step(x, params)."""
    take_p = params is not None

    @jax.jit
    def run(x, p):
        def body(x, _):
            # UNROLLED chain (not fori_loop): a loop boundary between
            # applications drains the Pallas DMA pipeline, measured 2x
            # on the sparse kernel (tools/tpu_chain_style_probe.py:
            # fori 2.05 ms vs unrolled 1.06 ms per app, dense 1.53 vs
            # 1.44).  Chains are <= 16 so compile time stays bounded.
            for _ in range(chain):
                x = one_step(x, p) if take_p else one_step(x)
            return x, None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return checksum(y)

    float(run(x0, params))  # compile + warm
    pool = _fresh_pool(x0, reps, seed=chain)
    seed_ctr = [chain]

    def rep():
        if not pool:
            seed_ctr[0] += 1000
            pool.extend(_fresh_pool(x0, reps, seed=seed_ctr[0]))
        x = pool.pop()
        t0 = time.perf_counter()
        float(run(x, params))
        return (time.perf_counter() - t0) / iters
    return rep


# Known-cost anchor: 4096^2 x 512 bf16 matmul = 17.2 GFLOP -> 87 us at
# v5e peak; slope-measured honest range on this chip ~0.075-0.30 ms.
# The floor allows ~15% slope flattening below nominal peak (fast
# windows repeatably measure 0.075-0.080 ms with valid workload
# ratios); anything below flags async-floor contamination, anything
# above flags a congestion quantum (BENCH_NOTES round-3).
ANCHOR_RANGE_MS = (0.072, 0.45)


def _anchor_job():
    rng = np.random.RandomState(99)
    W = jnp.asarray(rng.uniform(-0.05, 0.05, (4096, 4096)), jnp.bfloat16)
    x0 = jnp.asarray(rng.uniform(-1, 1, (4096, 512)), jnp.bfloat16)

    def step(x, w):
        return jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return step, x0, W


def bench_slope(steps_and_x0, chains=(2, 8), iters=8, reps=3,
                with_anchor=False, retries=3, backoff_s=60):
    """Per-application seconds for several workloads via the two-chain
    slope, with all (workload, chain) reps interleaved so time-slice
    drift cancels in the ratios.

    with_anchor=True appends a known-cost dense matmul measured through
    the same protocol and returns (times, anchor_info).  The chip is a
    shared tenant: contention windows inflate (or, in idle windows,
    deflate to the dispatch floor) every measurement, so when the
    anchor lands outside ANCHOR_RANGE_MS the whole pass is re-timed
    after a backoff (executables stay compiled; retries are cheap).

    Jobs are (step, x0) with step(x), or (step, x0, params) with
    step(x, params) — pass weights via params (see chain_timer)."""
    jobs = [j if len(j) == 3 else (j[0], j[1], None)
            for j in steps_and_x0]
    if with_anchor:
        jobs.append(_anchor_job())
    timers = [[chain_timer(s, x, c, iters, reps, params=p)
               for c in chains]
              for (s, x, p) in jobs]
    c1, c2 = chains
    lo, hi = ANCHOR_RANGE_MS
    attempts = (retries + 1) if with_anchor else 1
    anchor_ms = None
    for attempt in range(attempts):
        best = [[float("inf")] * len(chains) for _ in timers]
        for _ in range(reps):
            for i, per_chain in enumerate(timers):
                for j, t in enumerate(per_chain):
                    best[i][j] = min(best[i][j], t())
        slopes = [(b[1] - b[0]) / (c2 - c1) for b in best]
        if not with_anchor:
            return slopes
        anchor_ms = slopes[-1] * 1e3
        if lo <= anchor_ms <= hi:
            break
        if attempt < attempts - 1:
            print(f"[bench] anchor {anchor_ms:.3f} ms outside "
                  f"[{lo}, {hi}] — contended window, retrying in "
                  f"{backoff_s}s", flush=True)
            time.sleep(backoff_s)
    info = {"anchor_ms": round(anchor_ms, 4),
            "timing_valid": bool(lo <= anchor_ms <= hi)}
    return slopes[:-1], info


def anchor_slope_ms(iters=6, reps=3):
    """Slope-time the known-cost dense anchor in the CURRENT window.
    Harnesses that can't route their workload through chain_timer
    (e.g. first-execution scan-length slopes) call this to validate
    the window and retry on contention."""
    step, x0, W = _anchor_job()
    timers = [chain_timer(step, x0, c, iters, reps, params=W)
              for c in (2, 8)]
    best = [min(t() for _ in range(reps)) for t in timers]
    return (best[1] - best[0]) / 6 * 1e3




def result_path(name):
    """benchmarks/results_<name>.json on TPU; a `_cpu` suffix
    otherwise, so CI/smoke runs never clobber hardware captures
    (round-3 incident: CPU smoke overwrote the TPU sweep artifacts)."""
    suffix = "" if jax.default_backend() == "tpu" else "_cpu"
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", f"results_{name}{suffix}.json")


def make_layout(kind, nb, density, rng):
    if kind == "random":
        lay = (rng.rand(nb, nb) < density).astype(np.int32)
        lay[np.arange(nb), np.arange(nb)] = 1
        return lay
    if kind == "banded":
        m = max(int(round(density * nb / 2)), 1)
        lay = np.zeros((nb, nb), np.int32)
        for q in range(nb):
            lay[q, max(0, q - m + 1):q + 1] = 1
            lay[q, q:min(nb, q + m)] = 1
        return lay
    raise ValueError(kind)


def aligned_band_layout(nb, width, R):
    """Staircase band: rows R*i..R*i+R-1 share one width-block band —
    the R-aligned structured layout class (block-local attention /
    structured sparsity); schedule fill 1.0 at group size R."""
    lay = np.zeros((nb, nb), np.int32)
    for g in range(-(-nb // R)):
        r0, r1 = g * R, min((g + 1) * R, nb)
        lo = max(0, min(nb - width, g * R - width // 2))
        lay[r0:r1, lo:lo + width] = 1
    return lay


def bsmm_bench():
    from blocksparse_tpu import BlocksparseMatMul

    on_tpu = jax.default_backend() == "tpu"
    # full-size workload on hardware; tiny equivalent off-TPU (CI smoke)
    hidden, N = (8192, 2048) if on_tpu else (512, 128)
    bsize, density = 32, 0.25
    dtype = jnp.bfloat16
    isz = 2
    nb = hidden // bsize
    rng = np.random.RandomState(0)

    def build(kind, bsz):
        lay = make_layout(kind, hidden // bsz, density, rng)
        bsmm = BlocksparseMatMul(lay, block_size=bsz, feature_axis=0,
                                 impl="pallas" if on_tpu else "xla",
                                 w_layout="fprop_packed")
        Wc = rng.uniform(-0.1, 0.1,
                         (bsmm.blocks, bsz, bsz)).astype(np.float32)
        W = jnp.asarray(bsmm.pack_weights(Wc), dtype)
        return bsmm, W

    bs_rand, W_rand = build("random", bsize)
    bs_band, W_band = build("banded", bsize)
    # structured headline at b64: coarser blocks cut the rectangle
    # padding (R=2 groups -> ~0.98 structural ceiling vs 0.93 at b32)
    bs_b64, W_b64 = build("banded", 64)
    # >=0.90 structured row: R-aligned band + tall output tiles (R=4,
    # M=256) halve x slot re-reads at constant MXU passes — 0.925
    # anchor-valid at this config (results_bigr.json, BASELINE north
    # star's structured demonstration)
    from blocksparse_tpu import BlocksparseMatMul as _BSMM
    lay_al = aligned_band_layout(hidden // 64, hidden // 64 // 4, 4)
    bs_al = _BSMM(lay_al, block_size=64, feature_axis=0,
                  impl="pallas" if on_tpu else "xla",
                  w_layout="fprop_packed", dense_tile_R=4)
    W_al = jnp.asarray(bs_al.pack_weights(
        rng.uniform(-0.1, 0.1, (bs_al.blocks, 64, 64))
        .astype(np.float32)), dtype)
    x0 = jnp.asarray(rng.uniform(-1, 1, bs_rand.i_shape(N)), dtype)
    Wd = jnp.asarray(rng.uniform(-0.1, 0.1, (hidden, hidden)), dtype)

    def dense_step(x, w):
        return jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    # weights ride as params (jit arguments): inlined closures ship in
    # the remote-compile request body (HTTP 413 over ~0.5 GB)
    (dt_rand, dt_band, dt_b64, dt_al, dt_dense), anchor = bench_slope([
        (lambda x, w: bs_rand(x, w).astype(dtype), x0, W_rand),
        (lambda x, w: bs_band(x, w).astype(dtype), x0, W_band),
        (lambda x, w: bs_b64(x, w).astype(dtype), x0, W_b64),
        (lambda x, w: bs_al(x, w).astype(dtype), x0, W_al),
        (dense_step, x0, Wd),
    ], with_anchor=True, retries=3 if on_tpu else 0)

    # fwd+bwd (all three directions: fprop + dx + dw contribute) — the
    # reference benches bprop/updat via the bench attr on every op
    # (src/blocksparse_matmul_op.cc:381).  dx has x's shape, so the
    # grad chains as the next input.
    def train_rand(x, w):
        def f(x):
            return jnp.sum(jnp.square(
                bs_rand(x, w).astype(jnp.float32)))
        return jax.grad(f)(x).astype(dtype)

    def train_dense(x, w):
        def f(x):
            return jnp.sum(jnp.square(
                dense_step(x, w).astype(jnp.float32)))
        return jax.grad(f)(x).astype(dtype)

    dt_rand_fb, dt_dense_fb = bench_slope([
        (train_rand, x0, W_rand), (train_dense, x0, Wd)], chains=(2, 6))

    dense_flops = 2 * hidden * hidden * N
    dense_tflops = dense_flops / dt_dense / 1e12

    def fractions(bsmm, dt):
        fl = 2 * bsmm.blocks * bsize * bsize * N
        eff = fl / dt / 1e12
        d_eff = bsmm.blocks / (nb * nb)
        # density-scaled roofline: ideal time = d * t_dense
        return eff, (d_eff * dt_dense) / dt

    def fractions64(bsmm, dt):
        fl = 2 * bsmm.blocks * 64 * 64 * N
        eff = fl / dt / 1e12
        nb64 = hidden // 64
        d_eff = bsmm.blocks / (nb64 * nb64)
        return eff, (d_eff * dt_dense) / dt

    eff_rand, frac_rand = fractions(bs_rand, dt_rand)
    eff_band, frac_band = fractions(bs_band, dt_band)
    eff_b64, frac_b64 = fractions64(bs_b64, dt_b64)
    eff_al, frac_al = fractions64(bs_al, dt_al)
    # bandwidth-aware achievable fraction (round-2 metric, kept for
    # continuity): ideal = max(compute, bytes / measured BW)
    dense_bytes = (hidden * hidden + 2 * hidden * N) * isz + hidden * N * 4
    bw_eff = dense_bytes / dt_dense
    sparse_bytes = (W_rand.size + 2 * hidden * N) * isz
    d_eff_rand = bs_rand.blocks / (nb * nb)
    t_ideal = max(d_eff_rand * dt_dense, sparse_bytes / bw_eff)
    achievable = t_ideal / dt_rand

    return {
        "fraction": frac_rand,
        "detail": {
            "hidden": hidden, "batch": N, "density": density,
            "sparse_ms": round(dt_rand * 1e3, 4),
            "dense_ms": round(dt_dense * 1e3, 4),
            "sparse_vs_dense": round(dt_dense / dt_rand, 3),
            "sparse_eff_tflops": round(float(eff_rand), 2),
            "dense_tflops": round(float(dense_tflops), 2),
            "flops_roofline_fraction": round(float(frac_rand), 4),
            "achievable_roofline_fraction": round(float(achievable), 4),
            "banded_ms": round(dt_band * 1e3, 4),
            "banded_flops_roofline_fraction": round(float(frac_band), 4),
            "banded_eff_tflops": round(float(eff_band), 2),
            "banded_b64_ms": round(dt_b64 * 1e3, 4),
            "banded_b64_flops_roofline_fraction": round(float(frac_b64), 4),
            "banded_b64_eff_tflops": round(float(eff_b64), 2),
            "aligned_b64_r4_ms": round(dt_al * 1e3, 4),
            "aligned_b64_r4_flops_roofline_fraction": round(float(frac_al),
                                                            4),
            "aligned_b64_r4_eff_tflops": round(float(eff_al), 2),
            "fwd_bwd_sparse_ms": round(dt_rand_fb * 1e3, 4),
            "fwd_bwd_dense_ms": round(dt_dense_fb * 1e3, 4),
            "fwd_bwd_sparse_vs_dense": round(dt_dense_fb / dt_rand_fb, 3),
            "bw_eff_gbps": round(bw_eff / 1e9, 1),
            "anchor_ms": anchor["anchor_ms"],
            "timing_valid": anchor["timing_valid"],
        },
    }


def attn_bench():
    """Sparse-vs-dense attention step time at >=75% sparsity (north-star
    clause 2).  The dense control is the SAME fused flash kernel with a
    dense causal layout (honest baseline, VERDICT r2 #3); the naive
    score-materializing XLA attention is also reported for context."""
    from blocksparse_tpu.ops.transformer import BlocksparseTransformer

    on_tpu = jax.default_backend() == "tpu"
    ctx, batch = (4096, 2) if on_tpu else (256, 1)
    bsize, heads, hs = 64, 8, 64
    dtype = jnp.bfloat16
    ctx_blks = ctx // bsize

    def cb(blk_shape, head, qry, key, blk):
        m = np.ones(blk_shape, dtype=bool)
        if qry == key:
            for q in range(blk_shape[0]):
                m[q, q + 1:] = 0
        return m

    lay = np.zeros((ctx_blks, ctx_blks), np.int32)
    for q in range(ctx_blks):
        lay[q, max(0, q - 7):q + 1] = 1
        for k in range(0, q, 8):
            lay[q, k] = 1
    bst = BlocksparseTransformer(lay, block_size=bsize, heads=heads,
                                 mask_callback=cb)

    lay_d = np.tril(np.ones((ctx_blks, ctx_blks), np.int32))
    bst_d = BlocksparseTransformer(lay_d, block_size=bsize, heads=heads,
                                   mask_callback=cb)

    rng = np.random.RandomState(0)
    state = heads * hs
    Q = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, ctx, state)), dtype)
    scale = 1.0 / np.sqrt(hs)

    def sparse_step(q):
        return bst.attention(q, q, q, scale=scale, use_fused=True) \
            .astype(dtype)

    def flash_dense_step(q):
        return bst_d.attention(q, q, q, scale=scale, use_fused=True) \
            .astype(dtype)

    def naive_dense_step(q):
        q4 = q.reshape(batch, ctx, heads, hs).transpose(0, 2, 1, 3)
        s = jnp.einsum("nhqc,nhkc->nhqk", q4, q4) * scale
        causal = jnp.tril(jnp.ones((ctx, ctx), bool))
        s = jnp.where(causal, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(q4.dtype)
        y4 = jnp.einsum("nhqk,nhkc->nhqc", p, q4)
        return y4.transpose(0, 2, 1, 3).reshape(batch, ctx, state) \
            .astype(dtype)

    (dt_sparse, dt_flash, dt_naive), attn_anchor = bench_slope(
        [(sparse_step, Q), (flash_dense_step, Q), (naive_dense_step, Q)],
        chains=(4, 16) if on_tpu else (1, 3),
        iters=24 if on_tpu else 2, with_anchor=True,
        retries=3 if on_tpu else 0)
    sparsity = 1.0 - bst.blocks / (ctx_blks * (ctx_blks + 1) / 2)
    return {
        "attn_sparse_ms": round(dt_sparse * 1e3, 3),
        "attn_dense_flash_ms": round(dt_flash * 1e3, 3),
        "attn_dense_naive_ms": round(dt_naive * 1e3, 3),
        "attn_speedup_vs_flash": round(dt_flash / dt_sparse, 2),
        "attn_speedup_vs_naive": round(dt_naive / dt_sparse, 2),
        "attn_sparsity_vs_causal": round(float(sparsity), 3),
        "attn_anchor_ms": attn_anchor["anchor_ms"],
        "attn_timing_valid": attn_anchor["timing_valid"],
    }


def main():
    b = bsmm_bench()
    try:
        a = attn_bench()
    except Exception as e:  # attention bench is auxiliary
        a = {"attn_error": str(e)[:200]}
    detail = dict(b["detail"])
    detail.update(a)
    detail["backend"] = jax.default_backend()
    result = {
        "metric": "bsmm_8192x8192_b32_d25_bf16_flops_roofline_fraction",
        "value": round(float(b["fraction"]), 4),
        "unit": "fraction_of_density_scaled_dense_roofline",
        "vs_baseline": round(float(b["fraction"] / 0.90), 4),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
