"""Pipeline parallelism (GPipe over the "pp" mesh axis).

Parity-tests the generic scan+ppermute pipeline and the flagship LM's
pipelined train step against the unsharded references, fp32 on the
simulated 8-device CPU mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from blocksparse_tpu.parallel import (
    make_mesh, gpipe, broadcast_from_last, microbatch, unmicrobatch,
)
from blocksparse_tpu.models.sparse_transformer import (
    SparseTransformerLM, TransformerConfig,
)
from blocksparse_tpu.ops.optimize import AdamOptimizer


def _tree_close(a, b, atol, path=""):
    la, lb = jax.tree_util.tree_leaves_with_path(a), \
        jax.tree_util.tree_leaves(b)
    for (kp, x), y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=0,
            err_msg=f"{path}{jax.tree_util.keystr(kp)}")


class TestGpipe:
    def _setup(self, S=4, n_micro=8, mb=2, d=16):
        rng = np.random.RandomState(0)
        # S stages, each y = tanh(x @ w_s + b_s): shape-preserving
        ws = jnp.asarray(rng.uniform(-0.5, 0.5, (S, d, d)), jnp.float32)
        bs = jnp.asarray(rng.uniform(-0.1, 0.1, (S, d)), jnp.float32)
        x = jnp.asarray(rng.uniform(-1, 1, (n_micro, mb, d)), jnp.float32)
        return ws, bs, x

    @staticmethod
    def _stage(params, h):
        w, b = params
        # local stacked slice: leading dim = layers per stage
        def body(h, wb):
            w, b = wb
            return jnp.tanh(h @ w + b), None
        h, _ = jax.lax.scan(body, h, (w, b))
        return h

    def _sequential(self, ws, bs, x):
        def full(h):
            return self._stage((ws, bs), h)
        return jax.vmap(full)(x)

    def test_forward_matches_sequential(self):
        S = 4
        ws, bs, x = self._setup(S=S)
        mesh = Mesh(np.array(jax.devices()[:S]), ("pp",))

        def run(ws, bs, x):
            y = gpipe(lambda p, h: self._stage(p, h), (ws, bs), x,
                      axis="pp", n_stages=S)
            return broadcast_from_last(y, axis="pp", n_stages=S)

        with mesh:
            y = shard_map(run, mesh=mesh,
                          in_specs=(P("pp"), P("pp"), P()),
                          out_specs=P(), check_vma=False)(ws, bs, x)
        ref = self._sequential(ws, bs, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   atol=1e-6)

    def test_grads_match_sequential(self):
        """End-to-end: loss = mean((pipeline(x) - tgt)^2)/S per shard,
        stage grads per-shard, input grads via the select gate."""
        S = 4
        ws, bs, x = self._setup(S=S)
        tgt = jnp.ones_like(x) * 0.1
        mesh = Mesh(np.array(jax.devices()[:S]), ("pp",))

        def local_loss(ws, bs, x):
            y = gpipe(lambda p, h: self._stage(p, h), (ws, bs), x,
                      axis="pp", n_stages=S)
            y = broadcast_from_last(y, axis="pp", n_stages=S)
            return jnp.mean((y - tgt) ** 2) / S

        def run(ws, bs, x):
            loss, grads = jax.value_and_grad(
                local_loss, argnums=(0, 1, 2))(ws, bs, x)
            gw, gb, gx = grads
            # stage params: per-shard grads, no reduction; shared input
            # x: psum over pp (only stage 0's select consumes it)
            return (jax.lax.psum(loss, "pp"), gw, gb,
                    jax.lax.psum(gx, "pp"))

        with mesh:
            loss, gw, gb, gx = shard_map(
                run, mesh=mesh,
                in_specs=(P("pp"), P("pp"), P()),
                out_specs=(P(), P("pp"), P("pp"), P()),
                check_vma=False)(ws, bs, x)

        def ref_loss(ws, bs, x):
            return jnp.mean((self._sequential(ws, bs, x) - tgt) ** 2)

        rloss, rgrads = jax.value_and_grad(
            ref_loss, argnums=(0, 1, 2))(ws, bs, x)
        np.testing.assert_allclose(float(loss), float(rloss), atol=1e-6)
        for got, ref in zip((gw, gb, gx), rgrads):
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-6)

    def test_microbatch_roundtrip(self):
        x = jnp.arange(24.0).reshape(6, 4)
        m = microbatch(x, 3)
        assert m.shape == (3, 2, 4)
        np.testing.assert_array_equal(np.asarray(unmicrobatch(m)),
                                      np.asarray(x))


def _cfg(**kw):
    base = dict(n_vocab=64, n_embd=64, n_layer=4, n_head=4, ctx=128,
                blk_size=32, attn_layout="fixed", local_blocks=2,
                mlp_ratio=2, mlp_block_size=32, mlp_density=0.5,
                dtype="float32", recompute=True)
    base.update(kw)
    return TransformerConfig(**base)


class TestStackedLayers:
    def test_stacked_forward_matches_flat(self):
        """stack_layers=True must be numerically identical to the flat
        per-layer dict path (same init RNG per layer)."""
        tokens = jnp.asarray(
            np.random.RandomState(1).randint(0, 64, (2, 128)), jnp.int32)
        flat = SparseTransformerLM(_cfg())
        stk = SparseTransformerLM(_cfg(stack_layers=True))
        pf = flat.init(jax.random.PRNGKey(0))
        ps = stk.init(jax.random.PRNGKey(0))
        yf = flat.forward(pf, tokens)
        ys = stk.forward(ps, tokens)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yf),
                                   atol=1e-5)


class TestModelPipeline:
    def test_pp_train_step_matches_single_device(self):
        """pp=4 x dp=2 train step == unsharded train step: loss and
        updated params to fp32 tolerance."""
        pp, dp = 4, 2
        mesh = make_mesh(dp=dp, tp=1, pp=pp)

        model = SparseTransformerLM(_cfg(pp=pp))
        ref_model = SparseTransformerLM(_cfg(stack_layers=True))
        params = model.init(jax.random.PRNGKey(0))
        ref_params = ref_model.init(jax.random.PRNGKey(0))

        optm = AdamOptimizer(learning_rate=1e-3)
        state = optm.init(params)
        ref_state = optm.init(ref_params)

        rng = np.random.RandomState(2)
        tokens = jnp.asarray(rng.randint(0, 64, (8, 128)), jnp.int32)
        targets = jnp.asarray(rng.randint(0, 64, (8, 128)), jnp.int32)
        scale = jnp.asarray(64.0)

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
                                   float(rmetrics["loss"]), atol=1e-5)
        np.testing.assert_allclose(float(metrics["grad_norm"]),
                                   float(rmetrics["grad_norm"]),
                                   atol=1e-3)
        _tree_close(p1, rp1, atol=2e-5)

    def test_pp_with_tp(self):
        """pp=2 x tp=2 x dp=2: runs and produces finite loss (tp psums
        inside pipeline stages)."""
        mesh = make_mesh(dp=2, tp=2, pp=2)
        model = SparseTransformerLM(_cfg(pp=2, tp=2))
        params = model.init(jax.random.PRNGKey(0))
        optm = AdamOptimizer(learning_rate=1e-3)
        state = optm.init(params)
        rng = np.random.RandomState(3)
        tokens = jnp.asarray(rng.randint(0, 64, (4, 128)), jnp.int32)
        step = model.make_train_step(optm, mesh=mesh)
        with mesh:
            p1, s1, metrics, _ = step(params, state, tokens, tokens,
                                      jnp.asarray(64.0))
        jax.block_until_ready(p1)
        assert np.isfinite(float(metrics["loss"])), metrics
