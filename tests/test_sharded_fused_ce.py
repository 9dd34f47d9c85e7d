"""Sharded fused CE == dense masked CE (value + grads), on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh
from ikea_recommender_tpu.parallel.fused_ce import sharded_fused_softmax_ce


def _ref(h, w, b, labels, valid):
    logits = h @ w + b
    col = jnp.arange(logits.shape[1])
    logits = jnp.where(col < valid, logits, -1e9)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


@pytest.mark.parametrize("spec", [MeshSpec(1, 4), MeshSpec(2, 4), MeshSpec(1, 8)])
def test_sharded_fused_ce_matches_dense(spec):
    if spec.data * spec.model > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(spec)
    rs = np.random.RandomState(0)
    B, F, A, valid = 16, 8, 64 * spec.model, 64 * spec.model - 5
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.2)
    b = jnp.asarray(rs.randn(A).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, valid, (B,)), jnp.int32)
    weights = jnp.asarray(rs.rand(B).astype(np.float32))

    def loss_sharded(h, w, b):
        per = sharded_fused_softmax_ce(h, w, b, labels, mesh, valid)
        return jnp.sum(per * weights)

    def loss_ref(h, w, b):
        return jnp.sum(_ref(h, w, b, labels, valid) * weights)

    got = jax.jit(loss_sharded)(h, w, b)
    want = loss_ref(h, w, b)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)

    g_got = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(h, w, b)
    g_want = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    for a, e, name in zip(g_got, g_want, "h w b".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5,
            err_msg=f"grad {name}",
        )
    # padded columns: exactly zero gradient
    assert np.all(np.asarray(g_got[1])[:, valid:] == 0.0)


def test_label_on_every_shard_is_found():
    mesh = make_mesh(MeshSpec(1, 4))
    rs = np.random.RandomState(1)
    B, F, A = 4, 8, 64 * 4
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.2)
    b = jnp.zeros((A,), jnp.float32)
    # one label per shard, including shard boundaries
    labels = jnp.asarray([0, 64, 129, 255], jnp.int32)
    got = jax.jit(
        lambda h, w, b: sharded_fused_softmax_ce(h, w, b, labels, mesh, A)
    )(h, w, b)
    want = _ref(h, w, b, labels, A)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


def test_indivisible_action_dim_raises():
    mesh = make_mesh(MeshSpec(1, 4))
    h = jnp.zeros((2, 4)); w = jnp.zeros((4, 66)); b = jnp.zeros((66,))
    with pytest.raises(ValueError, match="not divisible"):
        sharded_fused_softmax_ce(h, w, b, jnp.zeros((2,), jnp.int32), mesh, 66)


def test_sharded_fused_ce_train_step_matches_unsharded():
    """The integrated sharded step (flash-CE under shard_map) trains to the
    same params as the plain unsharded CE step."""
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.parallel.sharding import (
        make_sharded_fused_ce_train_step,
        shard_state,
    )
    from ikea_recommender_tpu.train.state import make_optimizer, make_train_state
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

    mesh = make_mesh(MeshSpec(2, 4))
    A, B, T = 37, 16, 5  # ragged catalog; padded action dim = 40
    tc = TrainConfig(
        model="gru4rec", embedding_size=8, hidden_state_size=8, state_size=T,
        fused_ce=False,
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A), align=4)
    assert mc.padded_action_dim % 4 == 0
    opt = make_optimizer(0.01)
    state, _ = make_train_state(jax.random.key(0), mc, 0.01)

    rs = np.random.RandomState(0)
    def batch():
        return {
            "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
            "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
            "reward": jnp.zeros((B,), jnp.float32),
            "next_state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
            "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
            "true_next_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
            "is_end": jnp.zeros((B,), bool),
            "valid": jnp.ones((B,), bool),
        }

    batches = [batch()] * 4  # one fixed batch: loss must fall (memorization)

    # unsharded reference trajectory
    ref_step = make_train_step(mc, opt, RLStepConfig(), donate=False)
    ref_state = state
    ref_losses = []
    for b in batches:
        ref_state, m = ref_step(ref_state, b)
        ref_losses.append(float(m["sup_loss"]))

    # sharded flash-CE trajectory
    sh_step = make_sharded_fused_ce_train_step(mc, opt, mesh, state, batches[0])
    sh_state = shard_state(state, mesh)
    sh_losses = []
    for b in batches:
        sh_state, m = sh_step(sh_state, b)
        sh_losses.append(float(m["sup_loss"]))

    # step 0 runs on identical params -> tight; later steps drift because
    # Adam amplifies fp32 reduction-order differences -> loose trend check
    np.testing.assert_allclose(sh_losses[0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(sh_losses, ref_losses, rtol=3e-2)
    assert sh_losses[-1] < sh_losses[0]  # it actually trains


def test_sharded_fused_ce_grads_with_data_axis():
    """Regression: with the batch sharded on the data axis, each data shard
    computes only its rows' dW/db contribution — the backward must psum them
    over the data axis (round-3 fix; the r2 code silently treated the
    partial head gradients as replicated)."""
    from ikea_recommender_tpu.core.mesh import DATA_AXIS

    mesh = make_mesh(MeshSpec(2, 4))
    rs = np.random.RandomState(3)
    B, F, A, valid = 16, 8, 64 * 4, 64 * 4 - 5
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.2)
    b = jnp.asarray(rs.randn(A).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, valid, (B,)), jnp.int32)

    def loss_sharded(h, w, b):
        per = sharded_fused_softmax_ce(
            h, w, b, labels, mesh, valid, data_axis=DATA_AXIS
        )
        return jnp.mean(per)

    def loss_ref(h, w, b):
        return jnp.mean(_ref(h, w, b, labels, valid))

    gs = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(h, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    for a, e in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-5)


@pytest.mark.parametrize("spec", [MeshSpec(1, 4), MeshSpec(2, 2)])
def test_sharded_fused_ce_topk_matches_dense(spec):
    """r4 combined op (closed r3 gap): ONE sharded pass = CE (with grads)
    + global top-k ids, vs dense CE + dense lax.top_k."""
    from ikea_recommender_tpu.parallel.fused_ce import (
        sharded_fused_softmax_ce_topk,
    )

    if spec.data * spec.model > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(spec)
    rs = np.random.RandomState(3)
    B, F, A, valid, k = 16, 8, 64 * spec.model, 64 * spec.model - 5, 6
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.2)
    b = jnp.asarray(rs.randn(A).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, valid, (B,)), jnp.int32)
    weights = jnp.asarray(rs.rand(B).astype(np.float32))

    def loss_sharded(h, w, b):
        per, top_i = sharded_fused_softmax_ce_topk(
            h, w, b, labels, k, mesh, valid
        )
        return jnp.sum(per * weights), top_i

    (got, top_i) = jax.jit(loss_sharded)(h, w, b)
    want = jnp.sum(_ref(h, w, b, labels, valid) * weights)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)

    logits = h @ w + b
    logits = jnp.where(jnp.arange(A) < valid, logits, -1e9)
    _, ref_i = jax.lax.top_k(logits, k)
    np.testing.assert_array_equal(np.asarray(top_i), np.asarray(ref_i))

    g_got = jax.jit(jax.grad(lambda *a: loss_sharded(*a)[0], argnums=(0, 1, 2)))(h, w, b)
    g_want = jax.grad(lambda h, w, b: jnp.sum(_ref(h, w, b, labels, valid) * weights), argnums=(0, 1, 2))(h, w, b)
    for a, e, name in zip(g_got, g_want, "h w b".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-5,
            err_msg=f"grad {name}",
        )
