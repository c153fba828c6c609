"""Optimizer tests vs the reference NumPy math (test/adam_test.py,
test/adafactor_test.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from blocksparse_tpu.ops import optimize as opt


def test_clip_by_global_norm():
    gs = [np.random.randn(64, 32).astype(np.float32),
          np.random.randn(100).astype(np.float32)]
    gn, ns = opt.clip_by_global_norm([jnp.asarray(g) for g in gs],
                                     clip_norm=1.0)
    gn_np = np.sqrt(sum((g ** 2).sum() for g in gs))
    np.testing.assert_allclose(float(gn), gn_np, rtol=1e-5)
    np.testing.assert_allclose(float(ns), 1.0 / max(gn_np, 1.0), rtol=1e-5)

    # non-finite grads -> norm_scale 0 (the loss-scale signal)
    gs[0][0, 0] = np.inf
    _, ns = opt.clip_by_global_norm([jnp.asarray(g) for g in gs])
    assert float(ns) == 0.0

    # unless scrubbed
    gn, ns = opt.clip_by_global_norm([jnp.asarray(g) for g in gs],
                                     zero_infs=True)
    assert float(ns) > 0.0


def test_adam_vs_reference_math():
    beta1, beta2, lr, eps = 0.8, 0.5, 0.5, 1e-8
    clip_norm = 1.0
    shape = (128, 65)
    G = np.random.uniform(-1, 1, shape).astype(np.float32)
    P = np.random.uniform(-1, 1, shape).astype(np.float32)
    M = np.random.uniform(0, 1, shape).astype(np.float32)
    V = np.random.uniform(0, 1, shape).astype(np.float32)

    gn, ns = opt.clip_by_global_norm([jnp.asarray(G)], clip_norm=clip_norm)
    p, m, v = opt.adam_apply(jnp.asarray(G), jnp.asarray(P), jnp.asarray(M),
                             jnp.asarray(V), lr, beta1, beta2, eps,
                             norm_scale=ns)

    GN = np.sqrt(np.sum(np.square(G)))
    NS = clip_norm / np.maximum(GN, clip_norm)
    G2 = G * NS
    M2 = beta1 * M + (1 - beta1) * G2
    V2 = beta2 * V + (1 - beta2) * G2 * G2
    P2 = P - lr * M2 / (np.sqrt(V2) + eps)

    np.testing.assert_allclose(np.asarray(m), M2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), V2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p), P2, rtol=1e-5, atol=1e-6)

    # norm_scale == 0 skips the update entirely
    p0, m0, v0 = opt.adam_apply(jnp.asarray(G), jnp.asarray(P),
                                jnp.asarray(M), jnp.asarray(V), lr,
                                beta1, beta2, eps, norm_scale=0.0)
    np.testing.assert_allclose(np.asarray(p0), P)
    np.testing.assert_allclose(np.asarray(m0), M)
    np.testing.assert_allclose(np.asarray(v0), V)


def test_adam_gated():
    shape = (6, 8, 8)  # blocks x bsize x bsize
    G = np.random.randn(*shape).astype(np.float32)
    P = np.random.randn(*shape).astype(np.float32)
    M = np.zeros(shape, np.float32)
    V = np.zeros(shape, np.float32)
    gate = np.array([1, 0, 1, 1, 0, 1], np.float32)
    p, m, v = opt.adam_apply(jnp.asarray(G), jnp.asarray(P), jnp.asarray(M),
                             jnp.asarray(V), 0.1, gate=jnp.asarray(gate))
    for i in range(6):
        if gate[i] == 0:
            np.testing.assert_allclose(np.asarray(p)[i], P[i])
        else:
            assert not np.allclose(np.asarray(p)[i], P[i])


def test_adam_optimizer_class_bias_correction():
    P = {"w": jnp.asarray(np.random.randn(16, 16), jnp.float32)}
    G = {"w": jnp.asarray(np.random.randn(16, 16), jnp.float32)}
    o = opt.AdamOptimizer(learning_rate=0.01, beta1=0.9, beta2=0.999)
    st = o.init(P)
    P2, st = o.apply(G, P, st)
    # step 1 with zero-init state: p -= lr_t * (1-b1) g / (sqrt((1-b2)g^2)+eps)
    lr_t = 0.01 * np.sqrt(1 - 0.999) / (1 - 0.9)
    g = np.asarray(G["w"])
    expect = np.asarray(P["w"]) - lr_t * (0.1 * g) / (
        np.sqrt(0.001 * g * g) + 1e-8)
    np.testing.assert_allclose(np.asarray(P2["w"]), expect, rtol=1e-4,
                               atol=1e-5)


def test_adam_fp16_state():
    P = {"w": jnp.asarray(np.random.randn(128, 128), jnp.float32)}
    G = {"w": jnp.asarray(np.random.randn(128, 128), jnp.float32)}
    o = opt.AdamOptimizer(fp16=True)
    st = o.init(P)
    assert st["mean"]["w"].dtype == jnp.bfloat16
    P2, st2 = o.apply(G, P, st)
    assert st2["var"]["w"].dtype == jnp.bfloat16


def test_adafactor2d_vs_reference_math():
    beta2, lr, eps, clip_thresh = 0.5, 0.5, 1e-30, 1.0
    shape = (64, 48)
    G = np.random.uniform(-1, 1, shape).astype(np.float32)
    P = np.random.uniform(-1, 1, shape).astype(np.float32)
    C = np.random.uniform(0, 1, (1, shape[1])).astype(np.float32)
    R = np.random.uniform(0, 1, (shape[0], 1)).astype(np.float32)

    p, c, r, x = opt.adafactor2d_apply(jnp.asarray(P), jnp.asarray(C),
                                       jnp.asarray(R), jnp.asarray(G),
                                       beta2, lr, clip_thresh=clip_thresh,
                                       epsilon=eps)

    C2 = beta2 * C + (1 - beta2) * np.mean(np.square(G) + eps, axis=0,
                                           keepdims=True)
    R2 = beta2 * R + (1 - beta2) * np.mean(np.square(G) + eps, axis=1,
                                           keepdims=True)
    LTM = np.mean(R2, keepdims=True)
    X = G / (np.sqrt(R2 / LTM) * np.sqrt(C2))
    RMS_X = np.sqrt(np.mean(np.square(X)))
    P2 = P - lr * X / np.maximum(1.0, RMS_X / clip_thresh)

    np.testing.assert_allclose(np.asarray(c), C2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r), R2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p), P2, rtol=1e-4, atol=1e-5)


def test_adafactor1d_vs_reference_math():
    beta2, lr, eps = 0.5, 0.5, 1e-30
    G = np.random.uniform(-1, 1, (1, 100)).astype(np.float32)
    P = np.random.uniform(-1, 1, (1, 100)).astype(np.float32)
    C = np.random.uniform(0, 1, (1, 100)).astype(np.float32)
    p, c, x = opt.adafactor1d_apply(jnp.asarray(P), jnp.asarray(C),
                                    jnp.asarray(G), beta2, lr, epsilon=eps)
    C2 = beta2 * C + (1 - beta2) * (np.square(G) + eps)
    X = G / np.sqrt(C2)
    RMS_X = np.sqrt(np.mean(np.square(X)))
    P2 = P - lr * X / np.maximum(1.0, RMS_X)
    np.testing.assert_allclose(np.asarray(c), C2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p), P2, rtol=1e-4, atol=1e-5)


def test_ema():
    P = np.random.randn(32).astype(np.float32)
    E = np.random.randn(32).astype(np.float32)
    out = opt.ema_op(jnp.asarray(E), jnp.asarray(P), decay=0.9)
    np.testing.assert_allclose(np.asarray(out), 0.9 * E + 0.1 * P, rtol=1e-5)
    ema = opt.Ema(decay=0.9)
    st = ema.init({"w": jnp.asarray(P)})
    st = ema.apply({"w": jnp.asarray(P)}, st)
    np.testing.assert_allclose(np.asarray(st["w"]), P, rtol=1e-6)


def test_l2_decay_and_prune():
    W = np.random.randn(10, 8, 8).astype(np.float32)
    W2 = opt.blocksparse_l2_decay(jnp.asarray(W), rate=0.05)
    norms = np.sqrt((W ** 2).sum(axis=(1, 2), keepdims=True))
    expect = W * np.maximum(1 - 0.05 / norms, 0)
    np.testing.assert_allclose(np.asarray(W2), expect, rtol=1e-5)

    n = opt.blocksparse_norm(jnp.asarray(W), norm="l2")
    np.testing.assert_allclose(np.asarray(n), norms.reshape(-1), rtol=1e-5)

    gate = jnp.ones((10,), jnp.float32)
    new_gate = opt.blocksparse_prune(gate, jnp.asarray(W), step=0,
                                     sparsity=0.5, norm="l2")
    assert np.asarray(new_gate).sum() == 5
    kept = np.argsort(-np.asarray(n))[:5]
    assert set(np.nonzero(np.asarray(new_gate))[0]) == set(kept)

    # off-schedule step keeps old gate
    same = opt.blocksparse_prune(gate, jnp.asarray(W), step=1,
                                 sparsity=0.5, frequency=2)
    np.testing.assert_allclose(np.asarray(same), np.asarray(gate))


def test_quantize_roundtrip():
    from blocksparse_tpu.ops.quantize import QuantizeSpec, quantize, \
        quantize_float_sim
    x = np.random.randn(1024).astype(np.float32)
    # wide format: identity
    spec = QuantizeSpec(ebits=8, fbits=23, emax=127)
    y = quantize_float_sim(jnp.asarray(x), 8, 23, 127)
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-7)

    # 8-bit-ish format: values land on the grid and are monotone
    y = np.asarray(quantize_float_sim(jnp.asarray(x), 4, 3, 7))
    assert np.abs(y - x).max() < 0.1 * np.abs(x).max() + 0.1
    # saturation
    big = jnp.asarray([1e9, -1e9], jnp.float32)
    yb = np.asarray(quantize_float_sim(big, 4, 3, 7))
    mx = (2 - 2.0 ** -3) * 2.0 ** 7
    np.testing.assert_allclose(yb, [mx, -mx])

    # independent backward spec
    f_spec = QuantizeSpec(ebits=8, fbits=23, emax=127)
    b_spec = QuantizeSpec(ebits=4, fbits=3, emax=7)
    dy = jnp.asarray(np.random.randn(1024).astype(np.float32))
    _, vjp = jax.vjp(lambda x: quantize(x, f_spec, b_spec), jnp.asarray(x))
    (dx,) = vjp(dy)
    expect = np.asarray(quantize_float_sim(dy, 4, 3, 7))
    np.testing.assert_allclose(np.asarray(dx), expect, rtol=1e-6)


def test_blocksparse_adam_dual_lr():
    shape = (6, 8, 8)
    G = np.random.randn(*shape).astype(np.float32)
    P = np.random.randn(*shape).astype(np.float32)
    M = np.zeros(shape, np.float32)
    V = np.zeros(shape, np.float32)
    sel = np.array([0, 1, 0, 1, 1, 0], np.float32)
    p, m, v = opt.blocksparse_adam_op(
        jnp.asarray(G), jnp.asarray(P), jnp.asarray(M), jnp.asarray(V),
        lr_old=0.1, lr_new=0.5, lr_select=jnp.asarray(sel),
        decay_mean=0.9, decay_var=0.99)
    M2 = 0.1 * G
    V2 = 0.01 * G * G
    for i in range(6):
        lr = 0.5 if sel[i] else 0.1
        expect = P[i] - lr * M2[i] / (np.sqrt(V2[i]) + 1e-8)
        np.testing.assert_allclose(np.asarray(p)[i], expect, rtol=1e-5,
                                   atol=1e-6)


def test_optax_adapters():
    import optax
    params = {"w": jnp.asarray(np.random.randn(8, 8), jnp.float32)}
    grads = {"w": jnp.asarray(np.random.randn(8, 8), jnp.float32)}
    tx = opt.optax_adam(learning_rate=0.01)
    st = tx.init(params)
    updates, st = tx.update(grads, st, params)
    p2 = optax.apply_updates(params, updates)
    # equals the fused AdamOptimizer path
    o = opt.AdamOptimizer(learning_rate=0.01)
    ref_p, _ = o.apply(grads, params, o.init(params))
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(ref_p["w"]),
                               rtol=1e-6)

    tx2 = opt.optax_adafactor(learning_rate=0.01)
    st2 = tx2.init(params)
    upd2, st2 = tx2.update(grads, st2, params)
    assert jnp.isfinite(upd2["w"]).all()


def test_adafactor_optimizer_class():
    P = {"w2d": jnp.asarray(np.random.randn(16, 24), jnp.float32),
         "b1d": jnp.asarray(np.random.randn(24), jnp.float32)}
    G = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.randn(*p.shape), jnp.float32), P)
    o = opt.AdafactorOptimizer(learning_rate=0.01)
    st = o.init(P)
    assert "rv" in st["slots"]["w2d"] and "rv" not in st["slots"]["b1d"]
    P2, st2 = o.apply(G, P, st)
    assert not np.allclose(np.asarray(P2["w2d"]), np.asarray(P["w2d"]))
    assert not np.allclose(np.asarray(P2["b1d"]), np.asarray(P["b1d"]))
    P3, st3 = o.apply(G, P2, st2)
    assert int(st3["t"]) == 2


def test_clip_mixed_dtypes():
    gs = [jnp.asarray(np.random.randn(16, 16), jnp.float32),
          jnp.asarray(np.random.randn(32), jnp.bfloat16),
          jnp.asarray(np.random.randn(8), jnp.float16)]
    gn, ns = opt.clip_by_global_norm(gs, clip_norm=1.0)
    expect = np.sqrt(sum(np.sum(np.square(np.asarray(g, np.float32)))
                         for g in gs))
    np.testing.assert_allclose(float(gn), expect, rtol=1e-2)


def test_gradients_grad_ys_and_stop_grads():
    """bs.gradients grad_ys seeds the cotangent; stop_grads holds leaves
    constant (reference grads.py:196)."""
    from blocksparse_tpu.ops.grads import gradients

    def f(xs):
        return {"out": xs["a"] * 2.0 + xs["b"] ** 2}

    xs = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([3.0, 4.0])}
    dy = {"out": jnp.asarray([10.0, 100.0])}
    g = gradients(f, xs, grad_ys=dy)
    np.testing.assert_allclose(np.asarray(g["a"]), [20.0, 200.0])
    np.testing.assert_allclose(np.asarray(g["b"]),
                               [60.0, 800.0])

    g = gradients(f, xs, grad_ys=dy, stop_grads={"a": True, "b": False})
    np.testing.assert_allclose(np.asarray(g["a"]), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(g["b"]), [60.0, 800.0])

    # scalar loss path with stop_grads only
    def loss(xs):
        return jnp.sum(xs["a"] * xs["b"])
    g = gradients(loss, xs, stop_grads={"a": False, "b": True})
    np.testing.assert_allclose(np.asarray(g["a"]), [3.0, 4.0])
    np.testing.assert_allclose(np.asarray(g["b"]), [0.0, 0.0])


def test_quantize_tracker_self_tuning_emax():
    """QuantizeTracker threads emax through the jit: mode-1 specs adapt
    to tensor scale (reference src/quantize_op.cc:24-55 frequency
    semantics; estimates apply from the next step)."""
    from blocksparse_tpu.ops.quantize import (QuantizeSpec, QuantizeTracker,
                                              quantize)

    fwd_spec = QuantizeSpec(ebits=4, fbits=3, mode=1, frequency=1,
                            bias_pad=0)
    bwd_spec = QuantizeSpec(ebits=5, fbits=2, mode=1, frequency=1,
                            bias_pad=0)
    tracker = QuantizeTracker()

    def step(x, dy):
        def f(x):
            return jnp.sum(quantize(x, fwd_spec, bwd_spec, name="t") * dy)
        return jax.grad(f)(x)

    wrapped = tracker.wrap_jit(step)
    x = jnp.asarray(np.linspace(0.1, 200.0, 64), jnp.float32)
    dy = jnp.asarray(np.linspace(0.01, 0.5, 64), jnp.float32)
    wrapped(x, dy)
    # after one step the tracker holds emax ~ floor(log2 200) = 7 for
    # the forward stream and floor(log2 0.5) = -1 for the grad stream
    assert float(tracker.emax["t"]) == 7.0
    assert float(tracker.emax["t_grad"]) == -1.0

    # second step quantizes with the tracked emax: values beyond the
    # format max for emax=7 saturate at (2 - 2^-3) * 2^7 = 240
    y = wrapped(x * 10.0, dy)
    assert float(tracker.emax["t"]) == 10.0  # re-estimated (freq=1)
    # grad equals dy quantized onto the e5f2/emax=-1 grid
    from blocksparse_tpu.ops.quantize import quantize_float_sim
    expect = np.asarray(quantize_float_sim(dy, 5, 2, -1))
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-6)


def test_quantize_tracker_frequency_gating():
    from blocksparse_tpu.ops.quantize import (QuantizeSpec, QuantizeTracker,
                                              quantize)

    spec = QuantizeSpec(ebits=4, fbits=3, mode=1, frequency=4, bias_pad=0)
    tracker = QuantizeTracker()

    def step(x):
        return quantize(x, spec, QuantizeSpec(ebits=8, fbits=23),
                        name="v")

    wrapped = tracker.wrap_jit(step)
    wrapped(jnp.full((8,), 4.0))          # count 0: applied (first)
    assert float(tracker.emax["v"]) == 2.0
    wrapped(jnp.full((8,), 64.0))         # count 1: skipped
    assert float(tracker.emax["v"]) == 2.0
    wrapped(jnp.full((8,), 64.0))         # count 2: skipped
    wrapped(jnp.full((8,), 64.0))         # count 3: skipped
    wrapped(jnp.full((8,), 128.0))        # count 4: applied
    assert float(tracker.emax["v"]) == 7.0


def test_mhalf_vhalf_formats():
    """Reference packed optimizer-state formats (src/gpu_types.h:81-104,
    conversions src/ew_op_gpu.h:330-430): 6-bit exponent / 9-10-bit
    mantissa, range [2^-60, ~16), round-half-up, flush-to-zero."""
    from blocksparse_tpu.ops.optimize import (mhalf_pack, mhalf_unpack,
                                              vhalf_pack, vhalf_unpack)

    rng = np.random.RandomState(0)
    # variance-like values (unsigned, tiny to large)
    v = jnp.asarray(np.concatenate([
        rng.uniform(0, 15, 256),
        np.exp(rng.uniform(-40, 2, 256) * np.log(2.0)),
        [0.0, 2.0 ** -60, 15.9921875, 100.0, 2.0 ** -70],
    ]), jnp.float32)
    rt = vhalf_unpack(vhalf_pack(v))
    vv = np.asarray(v)
    rr = np.asarray(rt)
    # relative error bounded by half an ulp = 2^-11
    mask = (vv >= 2.0 ** -59) & (vv <= 15.99)
    rel = np.abs(rr[mask] - vv[mask]) / vv[mask]
    assert rel.max() <= 2.0 ** -11 + 1e-7, rel.max()
    assert rr[np.where(vv == 0.0)[0]].item() == 0.0
    assert rr[-1] == 0.0                       # 2^-70 flushes
    assert abs(rr[np.where(vv == 100.0)[0]].item() - 15.9921875) < 1e-4

    # mean-like values (signed)
    m = jnp.asarray(np.concatenate([
        rng.uniform(-2, 2, 512), [0.0, -15.984375, 20.0, -20.0],
    ]), jnp.float32)
    rt = np.asarray(mhalf_unpack(mhalf_pack(m)))
    mm = np.asarray(m)
    mask = (np.abs(mm) >= 2.0 ** -59) & (np.abs(mm) <= 15.9)
    rel = np.abs(rt[mask] - mm[mask]) / np.abs(mm[mask])
    assert rel.max() <= 2.0 ** -10 + 1e-7, rel.max()
    # out-of-range magnitudes saturate at the format max
    assert rt[np.where(mm == 20.0)[0]].item() == 15.984375
    assert rt[np.where(mm == -20.0)[0]].item() == -15.984375
    assert (np.sign(rt) == np.sign(np.where(np.abs(mm) < 2.0 ** -60,
                                            0.0, mm))).all()
    # roundtrip is idempotent (grid values encode exactly)
    rt2 = np.asarray(mhalf_unpack(mhalf_pack(jnp.asarray(rt))))
    np.testing.assert_array_equal(rt, rt2)


def test_adam_packed16_state():
    """packed16 AdamOptimizer stores uint16 slots and tracks the f32
    optimizer closely over multiple steps."""
    from blocksparse_tpu.ops.optimize import AdamOptimizer

    rng = np.random.RandomState(0)
    p0 = {"w": jnp.asarray(rng.uniform(-1, 1, (128, 128)), jnp.float32)}

    opt32 = AdamOptimizer(learning_rate=1e-2)
    opt16 = AdamOptimizer(learning_rate=1e-2, state_format="packed16")
    s32, s16 = opt32.init(p0), opt16.init(p0)
    assert s16["mean"]["w"].dtype == jnp.uint16
    assert s16["var"]["w"].dtype == jnp.uint16

    pa, pb = p0, p0
    for i in range(5):
        g = {"w": jnp.asarray(rng.normal(0, 0.1, (128, 128)), jnp.float32)}
        pa, s32 = opt32.apply(g, pa, s32)
        pb, s16 = opt16.apply(g, pb, s16)
    diff = np.abs(np.asarray(pa["w"]) - np.asarray(pb["w"])).max()
    step = np.abs(np.asarray(p0["w"]) - np.asarray(pa["w"])).max()
    assert diff < 0.05 * step, (diff, step)
