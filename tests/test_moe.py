"""Block-sparse MoE + expert parallelism ("ep")."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from blocksparse_tpu.ops.moe import BlocksparseMoE, route_topk
from blocksparse_tpu.ops.optimize import AdamOptimizer


def _ref_moe(moe, params, x, k):
    """Per-token dense reference with unlimited capacity."""
    probs = np.asarray(jax.nn.softmax(
        (x @ params["wg"]).astype(jnp.float32), -1))
    T = x.shape[0]
    y = np.zeros((T, moe.d), np.float32)
    xn = np.asarray(x)
    for t in range(T):
        top = np.argsort(-probs[t])[:k]
        denom = probs[t, top].sum()
        for e in top:
            w1 = np.asarray(params["w1"][e])
            fe = moe._ffn(params["w1"][e], params["b1"][e],
                          params["w2"][e], params["b2"][e],
                          jnp.asarray(xn[t:t + 1]))
            y[t] += probs[t, e] / denom * np.asarray(fe)[0]
    return y


class TestRouting:
    def test_positions_and_drops(self):
        """Deterministic probs: slots fill in token order, overflow
        drops, non-chosen experts never dispatch."""
        T, E, C = 6, 2, 2
        # all tokens pick expert 0
        probs = jnp.asarray(np.tile([0.9, 0.1], (T, 1)), jnp.float32)
        dispatch, combine, aux = route_topk(probs, 1, C)
        d = np.asarray(dispatch)
        # tokens 0,1 get slots 0,1 of expert 0; the rest drop
        assert d[0, 0, 0] == 1 and d[1, 0, 1] == 1
        assert d[2:].sum() == 0
        assert d[:, 1].sum() == 0
        # combine carries normalized gate = 1.0 for k=1
        np.testing.assert_allclose(np.asarray(combine)[0, 0, 0], 1.0,
                                   atol=1e-6)

    def test_topk2_second_choice_after_first(self):
        """k=2: second choices take slots after all first choices."""
        T, E, C = 2, 2, 4
        probs = jnp.asarray([[0.8, 0.2], [0.7, 0.3]], jnp.float32)
        dispatch, combine, _ = route_topk(probs, 2, C)
        d = np.asarray(dispatch)
        # first choices (expert 0): tokens 0,1 -> slots 0,1
        assert d[0, 0, 0] == 1 and d[1, 0, 1] == 1
        # second choices (expert 1): tokens 0,1 -> slots 0,1
        assert d[0, 1, 0] == 1 and d[1, 1, 1] == 1
        c = np.asarray(combine)
        np.testing.assert_allclose(c[0, 0, 0], 0.8, atol=1e-6)
        np.testing.assert_allclose(c[0, 1, 0], 0.2, atol=1e-6)

    def test_aux_uniform_router_is_one(self):
        T, E = 64, 8
        probs = jnp.full((T, E), 1.0 / E)
        _, _, aux = route_topk(probs, 1, 8)
        np.testing.assert_allclose(float(aux), 1.0, atol=1e-5)


class TestMoELayer:
    def _make(self, block_size=16, k=1, E=4, ep=1):
        moe = BlocksparseMoE(E, 32, 64, block_size=block_size,
                             density=0.6, capacity_factor=8.0, k=k,
                             ep=ep)
        params = moe.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.uniform(-1, 1, (16, 32)), jnp.float32)
        return moe, params, x

    def test_no_drop_matches_per_token_reference(self):
        """capacity >> tokens: einsum dispatch == per-token compute."""
        for k in (1, 2):
            moe, params, x = self._make(k=k)
            y, aux = moe(params, x)
            ref = _ref_moe(moe, params, x, k)
            np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4,
                                       err_msg=f"k={k}")
            assert np.isfinite(float(aux))

    def test_dense_experts(self):
        moe, params, x = self._make(block_size=0)
        y, aux = moe(params, x)
        ref = _ref_moe(moe, params, x, 1)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)

    def test_capacity_drops_zero_output(self):
        """capacity 8 slots total vs 16 tokens on 1 expert: dropped
        tokens produce exactly zero (residual carries them)."""
        moe = BlocksparseMoE(1, 32, 64, capacity_factor=0.5, k=1)
        params = moe.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.uniform(-1, 1, (16, 32)), jnp.float32)
        y, _ = moe(params, x)
        yn = np.asarray(y)
        C = moe.capacity(16)
        assert C == 8
        assert np.abs(yn[C:]).sum() == 0          # dropped
        assert np.abs(yn[:C]).sum() > 0           # routed

    def test_grads_finite(self):
        moe, params, x = self._make()

        def loss(p):
            y, aux = moe(p, x)
            return jnp.sum(y ** 2) + 0.01 * aux

        g = jax.grad(loss)(params)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        # gate receives gradient (through combine weights and aux)
        assert np.abs(np.asarray(g["wg"])).max() > 0


class TestExpertParallel:
    def test_ep4_matches_local(self):
        """ep=4 all_to_all path == single-device layer, fwd and grads."""
        E, ep = 8, 4
        moe_l = BlocksparseMoE(E, 32, 64, block_size=16, density=0.6,
                               capacity_factor=8.0, k=2, ep=1)
        moe_p = BlocksparseMoE(E, 32, 64, block_size=16, density=0.6,
                               capacity_factor=8.0, k=2, ep=ep)
        params = moe_l.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.uniform(-1, 1, (16, 32)), jnp.float32)

        def local_loss(p, x):
            y, aux = moe_l(p, x)
            return jnp.sum(y ** 2) + 0.01 * aux

        ref_y, _ = moe_l(params, x)
        ref_g = jax.grad(lambda p: local_loss(p, x))(params)

        mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
        specs = moe_p.param_specs()

        def sharded(p, x):
            y, aux = moe_p(p, x, ep_axis="ep")
            return y, aux

        def sharded_loss(p, x):
            def lfn(p):
                y, aux = moe_p(p, x, ep_axis="ep")
                return jnp.sum(y ** 2) + 0.01 * aux
            loss, g = jax.value_and_grad(lfn)(p)
            # tokens are REPLICATED across ep here, so each shard's
            # loss copy contributes through the transposed all_to_all:
            # expert grads arrive ep x true, gate grads 1 x per shard
            # (its own copy).  psum the gate, then /ep everything —
            # the same bookkeeping as redundant data parallelism.
            g = {kk: (jax.lax.psum(vv, "ep") if kk == "wg" else vv)
                 for kk, vv in g.items()}
            g = jax.tree_util.tree_map(lambda v: v / ep, g)
            return jax.lax.pmean(loss, "ep"), g

        with mesh:
            y, aux = shard_map(sharded, mesh=mesh,
                               in_specs=(specs, P()),
                               out_specs=(P(), P()),
                               check_vma=False)(params, x)
            loss, g = shard_map(
                sharded_loss, mesh=mesh,
                in_specs=(specs, P()),
                out_specs=(P(), specs),
                check_vma=False)(params, x)

        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   atol=1e-5)
        for kk in ("wg", "w1", "b1", "w2", "b2"):
            np.testing.assert_allclose(np.asarray(g[kk]),
                                       np.asarray(ref_g[kk]),
                                       atol=1e-4, err_msg=kk)


class TestMoEModel:
    """MoE MLPs in the flagship LM: dp x ep train step."""

    def _cfg(self, **kw):
        from blocksparse_tpu.models.sparse_transformer import (
            TransformerConfig)
        base = dict(n_vocab=64, n_embd=64, n_layer=2, n_head=4, ctx=128,
                    blk_size=32, attn_layout="fixed", local_blocks=2,
                    mlp_ratio=2, mlp_block_size=16, mlp_density=0.6,
                    dtype="float32", recompute=True, moe_experts=4,
                    moe_k=1, moe_capacity_factor=8.0)
        base.update(kw)
        return TransformerConfig(**base)

    def test_moe_forward_and_loss(self):
        from blocksparse_tpu.models.sparse_transformer import (
            SparseTransformerLM)
        model = SparseTransformerLM(self._cfg())
        params = model.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(1)
        tokens = jnp.asarray(rng.randint(0, 64, (2, 128)), jnp.int32)
        logits, aux = model.forward(params, tokens, return_aux=True)
        assert logits.shape == (2, 128, 64)
        assert np.isfinite(np.asarray(logits)).all()
        assert float(aux) > 0
        l = model.loss(params, tokens, tokens)
        assert np.isfinite(float(l))

    def test_moe_ep_train_step_matches_single_device(self):
        """dp=2 x ep=4 MoE train step == unsharded (high capacity so
        per-shard routing is drop-free and therefore identical)."""
        from blocksparse_tpu.models.sparse_transformer import (
            SparseTransformerLM)
        from blocksparse_tpu.parallel import make_mesh

        model = SparseTransformerLM(self._cfg(ep=4))
        ref_model = SparseTransformerLM(self._cfg())
        params = model.init(jax.random.PRNGKey(0))
        ref_params = ref_model.init(jax.random.PRNGKey(0))

        optm = AdamOptimizer(learning_rate=1e-3)
        state = optm.init(params)
        ref_state = optm.init(ref_params)

        rng = np.random.RandomState(2)
        tokens = jnp.asarray(rng.randint(0, 64, (8, 128)), jnp.int32)
        targets = jnp.asarray(rng.randint(0, 64, (8, 128)), jnp.int32)
        scale = jnp.asarray(64.0)

        mesh = make_mesh(dp=2, ep=4)
        step = model.make_train_step(optm, mesh=mesh)
        with mesh:
            p1, s1, metrics, _ = step(params, state, tokens, targets,
                                      scale)
        jax.block_until_ready(p1)

        ref_step = ref_model.make_train_step(optm)
        rp1, rs1, rmetrics, _ = ref_step(ref_params, ref_state, tokens,
                                         targets, scale)

        assert np.isfinite(float(metrics["loss"]))
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(rmetrics["loss"]), atol=5e-5)
        # grad_norm catches reduction-factor bugs Adam's per-param
        # scale invariance would hide in the params
        np.testing.assert_allclose(float(metrics["grad_norm"]),
                                   float(rmetrics["grad_norm"]),
                                   rtol=5e-4)
        # Adam updates are +-lr steps: fp32 noise on a near-zero grad
        # flips a step's sign, so params can differ by 2*lr per element
        _tree_close_model(p1, rp1, atol=2.5e-3)

    def test_moe_pp_ep_train_step_matches_single_device(self):
        """dp=2 x pp=2 x ep=2 MoE train step == unsharded: the
        pipelined loss carries the per-stage MoE load-balance aux
        through gpipe(with_aux=True), normalized per microbatch, and
        the caller's psum over pp restores the per-layer sum."""
        from blocksparse_tpu.models.sparse_transformer import (
            SparseTransformerLM)
        from blocksparse_tpu.parallel import make_mesh

        model = SparseTransformerLM(self._cfg(ep=2, pp=2, moe_experts=2))
        ref_model = SparseTransformerLM(
            self._cfg(moe_experts=2, stack_layers=True))
        params = model.init(jax.random.PRNGKey(0))
        ref_params = ref_model.init(jax.random.PRNGKey(0))

        optm = AdamOptimizer(learning_rate=1e-3)
        state = optm.init(params)
        ref_state = optm.init(ref_params)

        rng = np.random.RandomState(4)
        tokens = jnp.asarray(rng.randint(0, 64, (8, 128)), jnp.int32)
        targets = jnp.asarray(rng.randint(0, 64, (8, 128)), jnp.int32)
        scale = jnp.asarray(64.0)

        mesh = make_mesh(dp=2, pp=2, ep=2)
        step = model.make_train_step(optm, mesh=mesh)
        with mesh:
            p1, s1, metrics, _ = step(params, state, tokens, targets,
                                      scale)
        jax.block_until_ready(p1)

        ref_step = ref_model.make_train_step(optm)
        rp1, rs1, rmetrics, _ = ref_step(ref_params, ref_state, tokens,
                                         targets, scale)

        assert np.isfinite(float(metrics["loss"]))
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(rmetrics["loss"]), atol=5e-5)
        np.testing.assert_allclose(float(metrics["grad_norm"]),
                                   float(rmetrics["grad_norm"]),
                                   rtol=5e-4)
        _tree_close_model(p1, rp1, atol=2.5e-3)


def _tree_close_model(a, b, atol):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves(b)
    for (kp, x), y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=0,
            err_msg=jax.tree_util.keystr(kp))
