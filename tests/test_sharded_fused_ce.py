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
