"""BlocksparseMatMul: Pallas (interpret) + XLA impls vs NumPy goldens.

Mirrors the reference test strategy (test/blocksparse_matmul_test.py) with
hard assertions and per-dtype tolerances.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blocksparse_tpu import BlocksparseMatMul, SparseProj


def random_layout(CB, KB, density=0.5, seed=0):
    rng = np.random.RandomState(seed)
    layout = (rng.rand(CB, KB) < density).astype(np.int32)
    # ensure no empty rows/cols so shapes invert cleanly
    for c in range(CB):
        if layout[c].sum() == 0:
            layout[c, rng.randint(KB)] = 1
    for k in range(KB):
        if layout[:, k].sum() == 0:
            layout[rng.randint(CB), k] = 1
    return layout


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("axis", [0, 1])
@pytest.mark.parametrize("bsize", [8, 16, 32])
def test_fprop_bprop_updat(impl, axis, bsize):
    CB, KB, N = 6, 8, 64
    layout = random_layout(CB, KB, 0.4, seed=bsize + axis)
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=axis,
                             impl=impl)
    C, K = bsmm.C, bsmm.K

    X = np.random.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = np.random.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)

    # goldens
    Y_g = bsmm.fprop_test(X, W)
    DX_g = bsmm.bprop_test(E, W)
    DW_g = bsmm.updat_test(X, E)

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), grads = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        jnp.asarray(X), jnp.asarray(W))
    DX, DW = grads

    np.testing.assert_allclose(np.asarray(Y), Y_g, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), DX_g, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DW), DW_g, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_bsize64(impl):
    layout = random_layout(3, 4, 0.6, seed=7)
    bsmm = BlocksparseMatMul(layout, block_size=64, feature_axis=0, impl=impl)
    X = np.random.uniform(-1, 1, bsmm.i_shape(64)).astype(np.float32)
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    Y = bsmm(jnp.asarray(X), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("axis", [0, 1])
def test_gated(axis):
    layout = random_layout(4, 4, 0.5, seed=3)
    bsmm = BlocksparseMatMul(layout, block_size=16, feature_axis=axis,
                             impl="xla")
    N = 32
    X = np.random.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = np.random.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    gate = (np.random.rand(bsmm.blocks) > 0.5).astype(np.float32)

    Y_g = bsmm.fprop_test(X, W, gate=gate)
    DX_g = bsmm.bprop_test(E, W, gate=gate)
    DW_raw = bsmm.updat_test(X, E)
    DG_g = (DW_raw * W).sum(axis=(1, 2))

    def loss(x, w, g):
        y = bsmm(x, w, gate=g, gate_grad=True)
        return jnp.sum(y * E), y

    (_, Y), grads = jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(
        jnp.asarray(X), jnp.asarray(W), jnp.asarray(gate))
    DX, DW, DG = grads

    np.testing.assert_allclose(np.asarray(Y), Y_g, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), DX_g, rtol=1e-4, atol=1e-4)
    # gate_grad=True, dw_gated=False -> dw is raw updat
    np.testing.assert_allclose(np.asarray(DW), DW_raw, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DG), DG_g, rtol=1e-4, atol=1e-4)


def test_bf16():
    layout = random_layout(4, 4, 0.5, seed=5)
    bsmm = BlocksparseMatMul(layout, block_size=32, feature_axis=0, impl="pallas")
    N = 64
    X = np.random.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    Xh = jnp.asarray(X, jnp.bfloat16)
    Wh = jnp.asarray(W, jnp.bfloat16)
    Y = bsmm(Xh, Wh)
    assert Y.dtype == jnp.bfloat16
    Y_g = bsmm.fprop_test(np.asarray(Xh, np.float32), np.asarray(Wh, np.float32))
    np.testing.assert_allclose(np.asarray(Y, np.float32), Y_g,
                               rtol=3e-2, atol=3e-2)


def test_l2_normalize():
    layout = random_layout(4, 5, 0.5, seed=9)
    bsmm = BlocksparseMatMul(layout, block_size=8, feature_axis=0, impl="xla")
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    U = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)

    Wn = bsmm.l2_normalize(jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(Wn), bsmm.l2_normalize_test(W),
                               rtol=1e-5, atol=1e-5)

    # grad parity with the reference's l2_normalize_grad_test
    _, vjp = jax.vjp(lambda w: bsmm.l2_normalize(w), jnp.asarray(W))
    (DW,) = vjp(jnp.asarray(U))
    DW_g = bsmm.l2_normalize_grad_test(W, U.copy())
    np.testing.assert_allclose(np.asarray(DW), DW_g, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["dense_tile", "grouped"])
@pytest.mark.parametrize("bsize", [16, 32])
def test_feature_axis1_pallas_grads(mode, bsize):
    """NC orientation (feature_axis=1) through the Pallas kernels:
    fprop/bprop/updat vs the NumPy goldens (reference
    blocksparse/matmul.py feature_axis semantics)."""
    rng = np.random.RandomState(7)
    CB, KB, N = 9, 11, 64
    layout = (rng.rand(CB, KB) < 0.4).astype(np.int32)
    layout[0, 0] = 1
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=1,
                             impl="pallas", mode=mode)
    W = rng.uniform(-1, 1, (bsmm.blocks, bsize, bsize)).astype(np.float32)
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)   # (N, C)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)   # (N, K)

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(W))
    # goldens read self.axis and take/return NC activations directly
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DW), bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


def test_multi_dim_batch():
    layout = random_layout(4, 4, 0.5, seed=11)
    bsmm = BlocksparseMatMul(layout, block_size=16, feature_axis=1, impl="pallas")
    X = np.random.uniform(-1, 1, (2, 8, bsmm.C)).astype(np.float32)
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    Y = bsmm(jnp.asarray(X), jnp.asarray(W))
    assert Y.shape == (2, 8, bsmm.K)
    Y_g = bsmm.fprop_test(X.reshape(-1, bsmm.C), W)
    np.testing.assert_allclose(np.asarray(Y).reshape(-1, bsmm.K), Y_g,
                               rtol=1e-4, atol=1e-4)


def test_identity_and_checker_init():
    layout = np.ones((4, 4), np.int32)
    bsmm = BlocksparseMatMul(layout, block_size=8, feature_axis=0, impl="xla")
    W = bsmm.identity_init()(None)
    X = np.random.uniform(-1, 1, bsmm.i_shape(16)).astype(np.float32)
    Y = bsmm(jnp.asarray(X), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(Y), X, rtol=1e-5, atol=1e-5)
    g = bsmm.checker_init()(None)
    assert g.shape == (bsmm.blocks,)


def test_sparse_proj():
    proj = SparseProj(64, nproj=32)
    x = jnp.asarray(np.random.uniform(-1, 1, (64, 8)).astype(np.float32))
    y = proj.gather(x)
    assert y.shape == (32, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x)[proj.gather_lut])

    z = proj.scatter(y)
    assert z.shape == (64, 8)
    np.testing.assert_allclose(np.asarray(z)[proj.gather_lut], np.asarray(y))

    za = proj.scatter_add(x, y)
    np.testing.assert_allclose(
        np.asarray(za)[proj.gather_lut],
        np.asarray(x)[proj.gather_lut] + np.asarray(y), rtol=1e-6)

    # grads: gather grad is scatter
    g = jax.grad(lambda x: jnp.sum(proj.gather(x) ** 2))(x)
    expect = np.zeros_like(np.asarray(x))
    expect[proj.gather_lut] = 2 * np.asarray(x)[proj.gather_lut]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-6)


def test_pickle_roundtrip():
    import pickle
    layout = random_layout(4, 4, 0.5, seed=13)
    bsmm = BlocksparseMatMul(layout, block_size=32, feature_axis=0)
    b2 = pickle.loads(pickle.dumps(bsmm))
    assert b2.blocks == bsmm.blocks
    assert np.array_equal(b2.updat_lut, bsmm.updat_lut)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_packed_weights(impl):
    layout = random_layout(6, 8, 0.4, seed=21)
    ref = BlocksparseMatMul(layout, block_size=16, feature_axis=0, impl=impl)
    pk = BlocksparseMatMul(layout, block_size=16, feature_axis=0, impl=impl,
                           w_layout="fprop_packed")
    N = 64
    X = np.random.uniform(-1, 1, ref.i_shape(N)).astype(np.float32)
    E = np.random.uniform(-1, 1, ref.o_shape(N)).astype(np.float32)
    W = np.random.uniform(-1, 1, ref.w_shape).astype(np.float32)
    Wp = pk.pack_weights(W)
    assert Wp.shape == pk.w_shape
    np.testing.assert_allclose(pk.unpack_weights(Wp), W)

    def loss(bsmm, x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y1), (dx1, dw1) = jax.value_and_grad(
        lambda x, w: loss(ref, x, w), argnums=(0, 1), has_aux=True)(
        jnp.asarray(X), jnp.asarray(W))
    (_, Y2), (dx2, dw2) = jax.value_and_grad(
        lambda x, w: loss(pk, x, w), argnums=(0, 1), has_aux=True)(
        jnp.asarray(X), jnp.asarray(Wp))

    np.testing.assert_allclose(np.asarray(Y2), np.asarray(Y1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pk.unpack_weights(dw2)),
                               np.asarray(dw1), rtol=1e-4, atol=1e-4)
    # padding slots get exactly zero grads (store-agnostic: reconstruct
    # the store from real blocks only; the residue is the padding content)
    recon = np.asarray(pk.pack_weights(np.asarray(pk.unpack_weights(dw2))))
    np.testing.assert_allclose(np.asarray(dw2) - recon, 0.0)


def test_packed_gated():
    layout = random_layout(4, 4, 0.5, seed=23)
    ref = BlocksparseMatMul(layout, block_size=16, feature_axis=0, impl="xla")
    pk = BlocksparseMatMul(layout, block_size=16, feature_axis=0, impl="xla",
                           w_layout="fprop_packed")
    N = 32
    X = np.random.uniform(-1, 1, ref.i_shape(N)).astype(np.float32)
    W = np.random.uniform(-1, 1, ref.w_shape).astype(np.float32)
    gate = (np.random.rand(ref.blocks) > 0.4).astype(np.float32)
    Y1 = ref(jnp.asarray(X), jnp.asarray(W), gate=jnp.asarray(gate))
    Y2 = pk(jnp.asarray(X), jnp.asarray(pk.pack_weights(W)),
            gate=jnp.asarray(gate))
    np.testing.assert_allclose(np.asarray(Y2), np.asarray(Y1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["pallas"])
@pytest.mark.parametrize("packed", [False, True])
def test_supertile_banded_layout(impl, packed):
    """Banded layout triggers the contiguous-supertile kernel."""
    CB = KB = 16
    layout = np.zeros((CB, KB), np.int32)
    for i in range(CB):
        for j in range(max(0, i - 3), min(KB, i + 4)):
            layout[i, j] = 1
    kw = dict(w_layout="fprop_packed") if packed else {}
    bsmm = BlocksparseMatMul(layout, block_size=32, feature_axis=0,
                             impl=impl, **kw)
    assert getattr(bsmm.fprop_grouped, "contiguous", False), \
        bsmm.supertile_inflation
    N = 64
    X = np.random.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = np.random.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    W_can = np.random.uniform(-1, 1,
                              (bsmm.blocks, 32, 32)).astype(np.float32)
    W = bsmm.pack_weights(W_can) if packed else W_can

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(
        jnp.asarray(X), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W_can),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W_can),
                               rtol=1e-4, atol=1e-4)
    dw = bsmm.unpack_weights(np.asarray(DW)) if packed else np.asarray(DW)
    np.testing.assert_allclose(dw, bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


def test_native_schedule_builder_parity():
    """C++ schedule builder produces identical schedules to Python."""
    from blocksparse_tpu import native
    from blocksparse_tpu.kernels import bsmm as K
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(0)
    n_rows, n_in = 40, 30
    rows = []
    flat_i, flat_w, flat_r = [], [], []
    wid = 0
    for r in range(n_rows):
        ents = sorted(rng.choice(n_in, rng.randint(0, 9),
                                 replace=False).tolist())
        row = []
        for c in ents:
            row.append((c, wid))
            flat_i.append(c)
            flat_w.append(wid)
            flat_r.append(r)
            wid += 1
        rows.append(row)
    flat = (np.array(flat_i, np.int32), np.array(flat_w, np.int32),
            np.array(flat_r, np.int32))

    for G, R in [(4, 8), (8, 4), (2, 16)]:
        py = K.build_grouped_schedule(rows, n_rows, G, R)
        nt = native.grouped_schedule(flat[2], flat[0], flat[1], n_rows, G, R)
        assert nt is not None
        n_rows_arr, n_in_idx, n_w_idx, n_w_valid = nt
        np.testing.assert_array_equal(py.rows, n_rows_arr)
        np.testing.assert_array_equal(py.in_idx, n_in_idx)
        np.testing.assert_array_equal(py.w_idx, n_w_idx)
        np.testing.assert_array_equal(py.w_valid, n_w_valid)

    V, R = 4, 8
    py, infl_py = K.build_supertile_schedule(rows, n_rows, 32, R)
    nt = native.supertile_schedule(flat[2], flat[0], flat[1], n_rows, V, R)
    assert nt is not None
    n_rows_arr, n_in_idx, n_w_idx, n_w_valid, padded = nt
    np.testing.assert_array_equal(py.rows, n_rows_arr)
    np.testing.assert_array_equal(py.in_idx, n_in_idx)
    np.testing.assert_array_equal(py.w_idx, n_w_idx)
    np.testing.assert_array_equal(py.w_valid, n_w_valid)
    assert abs(padded / max(len(flat_i), 1) - infl_py) < 1e-9


def test_native_sample_batch():
    from blocksparse_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    data = np.arange(1000, dtype=np.uint8)
    offsets = np.array([0, 100, 500], np.int64)
    out = native.sample_batch(data, offsets, 16)
    assert out is not None
    x, y = out
    np.testing.assert_array_equal(x[1], np.arange(100, 116))
    np.testing.assert_array_equal(y[1], np.arange(101, 117))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_bsize128(impl):
    layout = random_layout(3, 3, 0.7, seed=31)
    bsmm = BlocksparseMatMul(layout, block_size=128, feature_axis=0,
                             impl=impl)
    X = np.random.uniform(-1, 1, bsmm.i_shape(64)).astype(np.float32)
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    E = np.random.uniform(-1, 1, bsmm.o_shape(64)).astype(np.float32)

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(loss, argnums=(0, 1),
                                          has_aux=True)(
        jnp.asarray(X), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(DW), bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-3)


def test_coarsen_layout():
    from blocksparse_tpu import coarsen_layout
    # banded fine layout at b=32 -> coarse 128 with high fill
    CB = KB = 16
    layout = np.zeros((CB, KB), np.int32)
    for i in range(CB):
        layout[i, max(0, i - 3):min(KB, i + 4)] = 1
    coarse, pack_w, unpack_w, fill = coarsen_layout(layout, 32, 128)
    assert coarse.shape == (4, 4)
    assert fill > 0.4

    fine = BlocksparseMatMul(layout, block_size=32, feature_axis=0,
                             impl="xla")
    co = BlocksparseMatMul(coarse, block_size=128, feature_axis=0,
                           impl="xla")
    Wf = np.random.uniform(-1, 1, fine.w_shape).astype(np.float32)
    Wc = pack_w(Wf)
    np.testing.assert_allclose(unpack_w(Wc), Wf)

    X = np.random.uniform(-1, 1, fine.i_shape(32)).astype(np.float32)
    y_fine = fine(jnp.asarray(X), jnp.asarray(Wf))
    y_co = co(jnp.asarray(X), jnp.asarray(Wc))
    np.testing.assert_allclose(np.asarray(y_co), np.asarray(y_fine),
                               rtol=1e-4, atol=1e-4)


def test_l2_normalize_gain():
    layout = random_layout(4, 5, 0.5, seed=17)
    bsmm = BlocksparseMatMul(layout, block_size=8, feature_axis=0, impl="xla")
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    gain = np.random.uniform(0.5, 1.5, bsmm.K).astype(np.float32)
    Wn = bsmm.l2_normalize(jnp.asarray(W), gain=jnp.asarray(gain))
    # golden: normalized then gained per output feature
    Wn0 = bsmm.l2_normalize_test(W)
    g = gain.reshape(bsmm.KB, bsmm.bsize)
    expect = np.array(Wn0)
    for w, (c, k) in enumerate(bsmm.updat_list):
        expect[w] = Wn0[w] * g[k][None, :]
    np.testing.assert_allclose(np.asarray(Wn), expect, rtol=1e-5, atol=1e-5)


# ---------------- dense-tile rectangle kernels ----------------

@pytest.mark.parametrize("bsize", [8, 16, 32, 64])
@pytest.mark.parametrize("w_layout", ["blocks", "fprop_packed"])
def test_dense_tile_modes(bsize, w_layout):
    """Rectangle-cover kernels (full 128-lane MXU tiles) vs goldens,
    including non-divisible group counts and empty rows."""
    CB, KB, N = 13, 9, 64
    rng = np.random.RandomState(bsize)
    layout = (rng.rand(CB, KB) < 0.3).astype(np.int32)
    layout[0, 0] = 1
    layout[5, :] = 0  # empty bprop row
    layout[:, 7] = 0  # empty fprop row
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0,
                             impl="pallas", w_layout=w_layout,
                             mode="dense_tile")
    assert bsmm.mode_f == "dense_tile"
    W = rng.uniform(-1, 1, (bsmm.blocks, bsize, bsize)).astype(np.float32)
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    Wd = bsmm.pack_weights(W) if w_layout == "fprop_packed" else W
    if w_layout == "fprop_packed":
        np.testing.assert_array_equal(bsmm.unpack_weights(Wd), W)

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(Wd))
    DWc = bsmm.unpack_weights(np.asarray(DW)) \
        if w_layout == "fprop_packed" else np.asarray(DW)
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(DWc, bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("w_layout", ["blocks", "fprop_packed"])
def test_dense_tile_gated(w_layout):
    rng = np.random.RandomState(11)
    layout = random_layout(8, 8, 0.4, seed=11)
    bsmm = BlocksparseMatMul(layout, block_size=32, impl="pallas",
                             w_layout=w_layout, mode="dense_tile")
    N = 64
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    W = rng.uniform(-1, 1, (bsmm.blocks, 32, 32)).astype(np.float32)
    gate = (rng.rand(bsmm.blocks) > 0.4).astype(np.float32)
    Wd = jnp.asarray(bsmm.pack_weights(W) if w_layout == "fprop_packed"
                     else W)

    def loss(x, w, g):
        y = bsmm(x, w, gate=g, gate_grad=True, dw_gated=True)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW, DG) = jax.value_and_grad(
        loss, argnums=(0, 1, 2), has_aux=True)(
        jnp.asarray(X), Wd, jnp.asarray(gate))
    DWc = bsmm.unpack_weights(np.asarray(DW)) \
        if w_layout == "fprop_packed" else np.asarray(DW)
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W, gate),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W, gate),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        DWc, bsmm.updat_test(X, E, gate, dw_gated=True),
        rtol=1e-4, atol=1e-4)
    dg_ref = np.sum(bsmm.updat_test(X, E) * W, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(DG), dg_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("bsize", [32, 64])
@pytest.mark.parametrize("w_layout", ["blocks", "fprop_packed"])
def test_resident_mode(bsize, w_layout):
    """VMEM-resident-x kernel (mode="resident"): one x column-tile copy
    per n-tile, slots gathered with dynamic sublane slices — the same
    dense-tile schedule, so outputs must match the goldens exactly like
    the per-slot kernel does (kernels/bsmm.py
    _xprop_dense_tile_resident_kernel)."""
    CB, KB, N = 12, 10, 256       # N >= 256 so the resident TN exists
    rng = np.random.RandomState(bsize)
    layout = (rng.rand(CB, KB) < 0.35).astype(np.int32)
    layout[0, 0] = 1
    layout[4, :] = 0
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0,
                             impl="pallas", w_layout=w_layout,
                             mode="resident")
    assert bsmm.mode_f == "resident"
    W = rng.uniform(-1, 1, (bsmm.blocks, bsize, bsize)).astype(np.float32)
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    Wd = bsmm.pack_weights(W) if w_layout == "fprop_packed" else W

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(Wd))
    DWc = bsmm.unpack_weights(np.asarray(DW)) \
        if w_layout == "fprop_packed" else np.asarray(DW)
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(DWc, bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bsize", [8, 16, 32])
def test_resident_matches_dense_tile_small_n(bsize):
    """Small N (the canonical N=64 regime) runs the resident kernel at
    TN=N — the regime where residency actually wins (no per-slot DMA
    issue overhead; see kernels/bsmm.py resident_pick_tile).  Fine
    blocks gain most (G=16 slot DMAs per chunk at b8).  Also covers the
    dense_tile auto-switch to resident at N<=512 (ops/matmul.py) and
    grads through it."""
    layout = random_layout(256 // bsize, 256 // bsize, 0.4, seed=3)
    rng = np.random.RandomState(3)
    br = BlocksparseMatMul(layout, block_size=bsize, impl="pallas",
                           mode="resident")
    bd = BlocksparseMatMul(layout, block_size=bsize, impl="pallas",
                           mode="dense_tile")
    W = rng.uniform(-1, 1, br.w_shape).astype(np.float32)
    X = rng.uniform(-1, 1, br.i_shape(64)).astype(np.float32)
    E = rng.uniform(-1, 1, br.o_shape(64)).astype(np.float32)

    def loss(b, x, w):
        y = b(x, w)
        return jnp.sum(y * E), y

    (_, y1), (dx1, dw1) = jax.value_and_grad(
        lambda x, w: loss(br, x, w), argnums=(0, 1), has_aux=True)(
        jnp.asarray(X), jnp.asarray(W))
    (_, y2), (dx2, dw2) = jax.value_and_grad(
        lambda x, w: loss(bd, x, w), argnums=(0, 1), has_aux=True)(
        jnp.asarray(X), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("w_layout", ["blocks", "fprop_packed"])
def test_dense_tile_tall_r(w_layout):
    """dense_tile_R > 128/bsize: tall (R*bsize, TN) output tiles halve
    x slot re-reads on R-aligned structured layouts at constant MXU
    passes — the >=0.90 roofline row's mechanism (results_bigr.json,
    b64/R=4 aligned band 0.93).  Full op parity incl. grads."""
    bsize, R, N = 32, 8, 128
    nb = 16
    lay = np.zeros((nb, nb), np.int32)
    for g in range(nb // R):          # R-aligned band, width 4
        lo = min(nb - 4, g * R)
        lay[g * R:(g + 1) * R, lo:lo + 4] = 1
    rng = np.random.RandomState(5)
    bsmm = BlocksparseMatMul(lay, block_size=bsize, feature_axis=0,
                             impl="pallas", w_layout=w_layout,
                             mode="dense_tile", dense_tile_R=R)
    assert bsmm.fprop_dt.R == R
    W = rng.uniform(-1, 1, (bsmm.blocks, bsize, bsize)).astype(np.float32)
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    Wd = bsmm.pack_weights(W) if w_layout == "fprop_packed" else W

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(Wd))
    DWc = bsmm.unpack_weights(np.asarray(DW)) \
        if w_layout == "fprop_packed" else np.asarray(DW)
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(DWc, bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


def test_dense_tile_matches_grouped():
    """Both kernel families compute the same function."""
    layout = random_layout(12, 12, 0.25, seed=5)
    N = 128
    rng = np.random.RandomState(5)
    b_dt = BlocksparseMatMul(layout, block_size=32, impl="pallas",
                             mode="dense_tile")
    b_gr = BlocksparseMatMul(layout, block_size=32, impl="pallas",
                             mode="grouped")
    assert b_gr.mode_f == "grouped"
    W = rng.uniform(-1, 1, b_dt.w_shape).astype(np.float32)
    X = rng.uniform(-1, 1, b_dt.i_shape(N)).astype(np.float32)
    y1 = np.asarray(b_dt(jnp.asarray(X), jnp.asarray(W)))
    y2 = np.asarray(b_gr(jnp.asarray(X), jnp.asarray(W)))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)


def test_dense_tile_auto_selection():
    """auto picks dense-tile for fine blocks (fewer MXU passes) and
    grouped for bsize 128 (rectangle degenerates)."""
    layout = random_layout(16, 16, 0.25, seed=9)
    b = BlocksparseMatMul(layout, block_size=32, impl="pallas")
    assert (b.mode_f, b.mode_u) == ("dense_tile", "dense_tile")
    b128 = BlocksparseMatMul(np.ones((3, 3), np.int32), block_size=128,
                             impl="pallas")
    assert b128.mode_f == "grouped"


@pytest.mark.parametrize("w_layout", ["blocks", "fprop_packed"])
def test_static_gate_compute_skip(w_layout):
    """A host-numpy gate with dw_gated=True rebuilds pruned schedules
    (gate==0 blocks are skipped, not multiplied by zero) and matches the
    gated goldens; the pruned sub-op does proportionally less work."""
    rng = np.random.RandomState(4)
    lay = random_layout(8, 8, 0.5, seed=4)
    bsm = BlocksparseMatMul(lay, block_size=32, impl="pallas",
                            w_layout=w_layout)
    W = rng.uniform(-1, 1, (bsm.blocks, 32, 32)).astype(np.float32)
    gate = (rng.rand(bsm.blocks) > 0.5).astype(np.float32)
    gate[:2] = 0.5                      # scaling gates fold in too
    X = rng.uniform(-1, 1, bsm.i_shape(64)).astype(np.float32)
    E = rng.uniform(-1, 1, bsm.o_shape(64)).astype(np.float32)
    Wd = jnp.asarray(bsm.pack_weights(W) if w_layout == "fprop_packed"
                     else W)

    y = np.asarray(bsm(jnp.asarray(X), Wd, gate=gate, dw_gated=True))
    np.testing.assert_allclose(y, bsm.fprop_test(X, W, gate),
                               rtol=1e-4, atol=1e-4)

    def loss(x, w):
        return (bsm(x, w, gate=gate, dw_gated=True) * jnp.asarray(E)).sum()

    dx, dw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(X), Wd)
    np.testing.assert_allclose(np.asarray(dx), bsm.bprop_test(E, W, gate),
                               rtol=1e-4, atol=1e-4)
    dwc = bsm.unpack_weights(np.asarray(dw)) \
        if w_layout == "fprop_packed" else np.asarray(dw)
    np.testing.assert_allclose(dwc,
                               bsm.updat_test(X, E, gate, dw_gated=True),
                               rtol=1e-4, atol=1e-4)
    assert len(bsm._static_gate_cache) == 1

    # all-zero gate: everything skipped, zero outputs and grads
    g0 = np.zeros(bsm.blocks, np.float32)
    y0 = bsm(jnp.asarray(X), Wd, gate=g0, dw_gated=True)
    assert float(jnp.abs(y0).max()) == 0.0


def test_lazy_emb_adam():
    """Untouched embedding rows keep param/m/v bit-identical
    (reference apply_lazy_emb_adam, src/optimize_op.cc:434-440)."""
    from blocksparse_tpu import lazy_emb_adam_apply, adam_apply

    rng = np.random.RandomState(0)
    P = rng.uniform(-1, 1, (10, 8)).astype(np.float32)
    M = rng.uniform(0, .1, (10, 8)).astype(np.float32)
    V = rng.uniform(0, .1, (10, 8)).astype(np.float32)
    G = np.zeros((10, 8), np.float32)
    touched = [1, 4, 7]
    G[touched] = rng.uniform(-1, 1, (3, 8))
    p2, m2, v2 = map(np.asarray, lazy_emb_adam_apply(
        jnp.asarray(G), jnp.asarray(P), jnp.asarray(M), jnp.asarray(V),
        0.01))
    rest = [i for i in range(10) if i not in touched]
    np.testing.assert_array_equal(p2[rest], P[rest])
    np.testing.assert_array_equal(m2[rest], M[rest])
    np.testing.assert_array_equal(v2[rest], V[rest])
    # touched rows match plain adam
    pa, ma, va = map(np.asarray, adam_apply(
        jnp.asarray(G), jnp.asarray(P), jnp.asarray(M), jnp.asarray(V),
        0.01))
    np.testing.assert_allclose(p2[touched], pa[touched])
    np.testing.assert_allclose(m2[touched], ma[touched])
    np.testing.assert_allclose(v2[touched], va[touched])


@pytest.mark.parametrize("w_layout", ["blocks", "fprop_packed"])
@pytest.mark.parametrize("bsize", [16, 32])
def test_window_mode(bsize, w_layout):
    """Window-slab kernel (x streamed once per column window, VMEM
    super-group accumulators) vs goldens, incl. empty rows and a
    non-divisible window count."""
    CB, KB, N = 21, 11, 64
    rng = np.random.RandomState(bsize)
    layout = (rng.rand(CB, KB) < 0.3).astype(np.int32)
    layout[0, 0] = 1
    layout[5, :] = 0
    layout[:, 7] = 0
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0,
                             impl="pallas", w_layout=w_layout,
                             mode="window")
    assert bsmm.mode_f == "window" and bsmm.mode_b == "window"
    W = rng.uniform(-1, 1, (bsmm.blocks, bsize, bsize)).astype(np.float32)
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    Wd = bsmm.pack_weights(W) if w_layout == "fprop_packed" else W
    if w_layout == "fprop_packed":
        np.testing.assert_array_equal(bsmm.unpack_weights(Wd), W)

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(Wd))
    DWc = bsmm.unpack_weights(np.asarray(DW)) \
        if w_layout == "fprop_packed" else np.asarray(DW)
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(DWc, bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


def test_cluster_rows_is_permutation():
    from blocksparse_tpu.kernels.bsmm import cluster_rows, \
        build_dense_tile_schedule
    rng = np.random.RandomState(7)
    rows = []
    for _ in range(37):
        deg = rng.randint(0, 9)
        cols = rng.choice(48, size=deg, replace=False)
        rows.append([(int(c), 0) for c in sorted(cols)])
    perm = cluster_rows(rows, 4)
    assert sorted(perm.tolist()) == list(range(37))
    # clustered schedule never uses more slots than the consecutive one
    wid = 0
    rows2 = []
    for r in rows:
        rows2.append([(c, wid + i) for i, (c, _) in enumerate(r)])
        wid += len(r)
    blocks = wid
    s_base = build_dense_tile_schedule(rows2, 37, 32, blocks, G=4)
    s_clus = build_dense_tile_schedule(rows2, 37, 32, blocks, G=4,
                                       cluster=True)
    assert s_clus.num_chunks <= s_base.num_chunks


def test_native_cluster_rows_parity():
    from blocksparse_tpu import native
    from blocksparse_tpu.kernels.bsmm import cluster_rows_py
    if native.get_lib() is None:
        pytest.skip("native host library unavailable")
    rng = np.random.RandomState(11)
    for n, n_cols, dens, R in [(37, 48, 0.2, 4), (64, 64, 0.35, 8),
                               (17, 9, 0.5, 4)]:
        rows = []
        fr, fc = [], []
        for r in range(n):
            cols = np.nonzero(rng.rand(n_cols) < dens)[0]
            rows.append([(int(c), 0) for c in cols])
            fr.extend([r] * len(cols))
            fc.extend(cols.tolist())
        ref = cluster_rows_py(rows, R, n_cols)
        got = native.cluster_rows_native(
            np.asarray(fr, np.int32), np.asarray(fc, np.int32),
            n, n_cols, R)
        np.testing.assert_array_equal(got, ref)


def test_dense_tile_tail_chunks():
    """Pass-quantized width-ladder chunks: banded layouts have uniform
    unions whose remainder mod G runs as one narrow chunk (kernels/
    bsmm.py _xprop_dense_tile_ladder_kernel); golden parity plus
    schedule accounting (billed passes <= full-width padding)."""
    from blocksparse_tpu.kernels.bsmm import build_dense_tile_schedule
    nb = 24
    lay = np.zeros((nb, nb), np.int32)
    for q in range(nb):           # band of 9 -> union 10 at R=4
        lay[q, max(0, q - 4):min(nb, q + 5)] = 1
    bsmm = BlocksparseMatMul(lay, block_size=32, feature_axis=0,
                             impl="pallas", mode="dense_tile")
    sched = bsmm.fprop_dt
    assert sched is not None
    if sched.wcls is not None:
        # narrow chunks exist and bill fewer pass-equivalents than
        # full-width padding
        full_p = max(1, (sched.G * 32) // 128)
        assert (sched.wcls < full_p).any()
        full = build_dense_tile_schedule(
            [[(int(c), 0) for c in np.nonzero(lay[r])[0]]
             for r in range(nb)], nb, 32, int(lay.sum()), tails=False)
        assert sched.mxu_passes(32) <= full.mxu_passes(32)
    W = np.random.RandomState(1).uniform(
        -1, 1, (bsmm.blocks, 32, 32)).astype(np.float32)
    Wp = bsmm.pack_weights(W) if bsmm.w_layout == "fprop_packed" else W
    X = np.random.RandomState(2).uniform(
        -1, 1, bsmm.i_shape(128)).astype(np.float32)
    E = np.random.RandomState(3).uniform(
        -1, 1, bsmm.o_shape(128)).astype(np.float32)

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.vdot(y, jnp.asarray(E)), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(Wp))
    DWc = bsmm.unpack_weights(np.asarray(DW)) \
        if bsmm.w_layout == "fprop_packed" else np.asarray(DW)
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(DWc, bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


def test_dense_tile_phased_cover():
    """Flexible-cover (phased) schedules: cells partition across phases,
    the wrapper segment-sums group tiles, and billed passes drop below
    the fixed-partition ceiling on random layouts (kernels/bsmm.py
    build_dense_tile_schedule_phased)."""
    from blocksparse_tpu.kernels import bsmm as K

    rng = np.random.RandomState(0)
    n = 24
    lay = (rng.rand(n, n) < 0.3).astype(np.int32)
    lay[np.arange(n), np.arange(n)] = 1
    rows = [[] for _ in range(n)]
    wid = 0
    for cb in range(n):
        for kb in range(n):
            if lay[cb, kb]:
                rows[kb].append((cb, wid))
                wid += 1
    sch = K.build_dense_tile_schedule_phased(rows, n, 32, wid,
                                             thresholds=(2,))
    assert sch.rows_at is not None
    # every cell covered exactly once
    ids = sch.wpos[sch.wpos != wid]
    assert sorted(ids.tolist()) == list(range(wid))
    # revisited rows exist (the point of the cover)
    flat = sch.rows_at.reshape(-1)
    flat = flat[flat >= 0]
    assert len(flat) > len(np.unique(flat))
    W = rng.uniform(-1, 1, (wid, 32, 32)).astype(np.float32)
    X = rng.uniform(-1, 1, (n * 32, 128)).astype(np.float32)
    panels = K.dense_tile_panels(jnp.asarray(W), sch, trans_w=False)
    y = np.asarray(K.xprop_pallas_dense_tile(jnp.asarray(X), panels,
                                             sch, 32))
    yg = np.zeros((n * 32, 128), np.float32)
    for kb in range(n):
        for (cb, w) in rows[kb]:
            yg[kb * 32:(kb + 1) * 32] += W[w].T @ X[cb * 32:(cb + 1) * 32]
    np.testing.assert_allclose(y, yg, rtol=1e-4, atol=1e-4)


def test_dense_tile_phased_autopick_calibrated():
    """The calibrated cost model (~9 measured pass-equivalents per
    extra group with the Pallas gather merge,
    benchmarks/results_phased_ab.json) KEEPS the fixed partition on a
    bench-scale random layout: the phased cover saves only ~2-4 passes
    per extra group there, below the measured per-group overhead.
    Guards against re-undercharging the merge (the original 2-pass
    charge regressed the r4 headline 2.1x).  The phased builder itself
    still lowers billed passes — the structural property the cover
    exists for."""
    from blocksparse_tpu.kernels.bsmm import (
        build_dense_tile_schedule, build_dense_tile_schedule_phased)

    rng = np.random.RandomState(3)
    n = 128
    lay = (rng.rand(n, n) < 0.25).astype(np.int32)
    lay[np.arange(n), np.arange(n)] = 1
    bsm = BlocksparseMatMul(lay, block_size=32, feature_axis=0)
    f = bsm.fprop_dt
    assert f is not None and f.rows_at is None  # partition kept
    rows = [[(int(c), 0) for c in np.nonzero(lay[:, kb])[0]]
            for kb in range(n)]
    plain = build_dense_tile_schedule(rows, n, 32, int(lay.sum()),
                                      cluster=True)
    ph = build_dense_tile_schedule_phased(rows, n, 32, int(lay.sum()),
                                          thresholds=(2,))
    assert ph.mxu_passes(32) < plain.mxu_passes(32)


def test_fp16_pallas_fwd_bwd():
    """IEEE fp16 (the reference's ehalf, gpu_types.h:15) through the
    Pallas path: computed in bfloat16 (TPU has no fp16 MXU format;
    Mosaic rejects f16 dots), emitted as f16, grads dtyped f16."""
    layout = random_layout(6, 6, 0.4, seed=2)
    bsmm = BlocksparseMatMul(layout, block_size=32, feature_axis=0,
                             impl="pallas")
    X = np.random.uniform(-1, 1, bsmm.i_shape(64)).astype(np.float16)
    W = np.random.uniform(-1, 1, bsmm.w_shape).astype(np.float16)
    E = np.random.uniform(-1, 1, bsmm.o_shape(64)).astype(np.float16)

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y.astype(jnp.float32) * E.astype(np.float32)), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(W))
    assert Y.dtype == jnp.float16
    assert DX.dtype == jnp.float16 and DW.dtype == jnp.float16
    Yg = bsmm.fprop_test(X.astype(np.float32), W.astype(np.float32))
    np.testing.assert_allclose(np.asarray(Y, np.float32), Yg,
                               rtol=3e-2, atol=3e-2)
    DXg = bsmm.bprop_test(E.astype(np.float32), W.astype(np.float32))
    np.testing.assert_allclose(np.asarray(DX, np.float32), DXg,
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("bsize", [8, 16])
@pytest.mark.parametrize("w_layout", ["blocks", "fprop_packed"])
def test_fine_mode_small_blocks(bsize, w_layout):
    """Fine-block kernel (kernels/bsmm.py xprop_pallas_fine): one chunk
    per output block-row (fill 1.0, no R-row union), x and the f32
    accumulator VMEM-resident.  The reference's canonical b8/N=64
    regime (test/blocksparse_matmul_bench.py:75,
    hgemm_blocksparse_8x64x8).  On-chip A/B (results_fine_ab.json)
    showed the (bsize x N) output tile underfills the MXU 2.6-11x
    worse than dense_tile/resident, so auto never picks it;
    mode='fine' pins it and must route fprop AND bprop through it
    while matching the NumPy goldens; grads compose with the existing
    updat kernels."""
    CB, KB, N = 20, 24, 64
    rng = np.random.RandomState(bsize)
    layout = (rng.rand(CB, KB) < 0.25).astype(np.int32)
    layout[0, 0] = 1
    layout[:, 5] = 0          # empty output row stays zero
    bsmm = BlocksparseMatMul(layout, block_size=bsize, feature_axis=0,
                             impl="pallas", w_layout=w_layout,
                             mode="fine")
    assert bsmm.fprop_fine is not None
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    assert bsmm._fine_ok(bsmm.fprop_fine, jnp.asarray(X))
    W = rng.uniform(-1, 1, (bsmm.blocks, bsize, bsize)).astype(np.float32)
    E = rng.uniform(-1, 1, bsmm.o_shape(N)).astype(np.float32)
    Wd = bsmm.pack_weights(W) if w_layout == "fprop_packed" else W

    def loss(x, w):
        y = bsmm(x, w)
        return jnp.sum(y * E), y

    (_, Y), (DX, DW) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(jnp.asarray(X), jnp.asarray(Wd))
    DWc = bsmm.unpack_weights(np.asarray(DW)) \
        if w_layout == "fprop_packed" else np.asarray(DW)
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(DX), bsmm.bprop_test(E, W),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(DWc, bsmm.updat_test(X, E),
                               rtol=1e-4, atol=1e-4)


def test_fine_mode_pinned_axis1_and_large_n():
    """mode='fine' pins the kernel for b32 (A/B experiments) and for
    N > 128 when N % 128 == 0; feature_axis=1 transposes around it."""
    rng = np.random.RandomState(5)
    layout = (rng.rand(8, 6) < 0.4).astype(np.int32)
    layout[0, 0] = 1
    bsmm = BlocksparseMatMul(layout, block_size=32, feature_axis=1,
                             impl="pallas", mode="fine")
    N = 256
    X = rng.uniform(-1, 1, bsmm.i_shape(N)).astype(np.float32)
    W = rng.uniform(-1, 1, bsmm.w_shape).astype(np.float32)
    Y = bsmm(jnp.asarray(X), jnp.asarray(W))
    np.testing.assert_allclose(np.asarray(Y), bsmm.fprop_test(X, W),
                               rtol=1e-4, atol=1e-4)
