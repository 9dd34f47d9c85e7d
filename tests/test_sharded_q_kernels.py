"""Action-sharded Q-kernel parity: every parallel/q_kernels.py op matches
its dense single-device computation (values, tie order, gradients), and the
fused SQN/SMORL/SARM train steps produce identical results with and without
a mesh (8 virtual CPU devices, ragged action dim exercising shard padding).
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.core.mesh import DATA_AXIS, MeshSpec, make_mesh
from ikea_recommender_tpu.models.families import model_config_from_train
from ikea_recommender_tpu.parallel.q_kernels import (
    sharded_linear_argmax,
    sharded_multihead_max,
    sharded_multihead_row_logit,
    sharded_row_logit,
    sharded_sup_topk,
    sharded_weighted_multihead_argmax,
)
from ikea_recommender_tpu.parallel.sharding import shard_state
from ikea_recommender_tpu.train.state import (
    make_double_q_state,
    make_optimizer,
    make_train_state,
)
from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

B, F, K = 16, 8, 3
A_REAL = 57  # ragged: pads to 64 on a 4-wide model axis
A_PAD = 64


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshSpec(data=2, model=4))


def _head(rs, multi=False):
    if multi:
        w = jnp.asarray(rs.randn(K, F, A_PAD).astype(np.float32))
        b = jnp.asarray(rs.randn(K, A_PAD).astype(np.float32))
    else:
        w = jnp.asarray(rs.randn(F, A_PAD).astype(np.float32))
        b = jnp.asarray(rs.randn(A_PAD).astype(np.float32))
    return w, b


def test_sharded_linear_argmax_matches_dense(mesh):
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w, b = _head(rs)
    got = jax.jit(
        lambda h, w, b: sharded_linear_argmax(h, w, b, A_REAL, mesh, DATA_AXIS)
    )(h, w, b)
    dense = jnp.argmax((h @ w + b)[:, :A_REAL], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(dense))


def test_sharded_linear_argmax_tie_break_lowest_global(mesh):
    # identical logits everywhere -> dense argmax picks column 0; the
    # cross-shard merge must too (every shard reports max 0 at its lowest id)
    h = jnp.zeros((B, F), jnp.float32)
    w = jnp.zeros((F, A_PAD), jnp.float32)
    b = jnp.zeros((A_PAD,), jnp.float32)
    got = sharded_linear_argmax(h, w, b, A_REAL, mesh, DATA_AXIS)
    np.testing.assert_array_equal(np.asarray(got), 0)


def test_sharded_weighted_multihead_argmax_matches_dense(mesh):
    rs = np.random.RandomState(1)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w, b = _head(rs, multi=True)
    qw = jnp.asarray([1.0, 0.5, 2.0])
    got = jax.jit(
        lambda h, w, b: sharded_weighted_multihead_argmax(
            h, w, b, qw, A_REAL, mesh, DATA_AXIS
        )
    )(h, w, b)
    dense_logits = jnp.einsum("bf,kfa->bka", h, w) + b  # (B, K, A)
    wsum = jnp.einsum("bka,k->ba", dense_logits, qw)[:, :A_REAL]
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.argmax(wsum, axis=1))
    )


def test_sharded_row_logit_values_and_grads(mesh):
    rs = np.random.RandomState(2)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w, b = _head(rs)
    idx = jnp.asarray(rs.randint(0, A_REAL, (B,)), jnp.int32)

    def sharded(h, w, b):
        return jnp.sum(sharded_row_logit(h, w, b, idx, mesh, DATA_AXIS) ** 2)

    def dense(h, w, b):
        vals = jnp.take_along_axis(h @ w + b, idx[:, None], axis=1)[:, 0]
        return jnp.sum(vals**2)

    np.testing.assert_allclose(
        float(jax.jit(sharded)(h, w, b)), float(dense(h, w, b)), rtol=1e-5
    )
    gs = jax.jit(jax.grad(sharded, argnums=(0, 1, 2)))(h, w, b)
    gd = jax.grad(dense, argnums=(0, 1, 2))(h, w, b)
    for a, e in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-5)


def test_sharded_multihead_row_logit_values_and_grads(mesh):
    rs = np.random.RandomState(3)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w, b = _head(rs, multi=True)
    idx = jnp.asarray(rs.randint(0, A_REAL, (B,)), jnp.int32)

    def sharded(h, w, b):
        return jnp.sum(
            sharded_multihead_row_logit(h, w, b, idx, mesh, DATA_AXIS) ** 2
        )

    def dense(h, w, b):
        all_logits = jnp.einsum("bf,kfa->bka", h, w) + b
        vals = jnp.take_along_axis(
            all_logits, idx[:, None, None], axis=2
        )[:, :, 0]
        return jnp.sum(vals**2)

    np.testing.assert_allclose(
        float(jax.jit(sharded)(h, w, b)), float(dense(h, w, b)), rtol=1e-5
    )
    gs = jax.jit(jax.grad(sharded, argnums=(0, 1, 2)))(h, w, b)
    gd = jax.grad(dense, argnums=(0, 1, 2))(h, w, b)
    for a, e in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-5)


def test_sharded_multihead_max_matches_dense(mesh):
    rs = np.random.RandomState(4)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w, b = _head(rs, multi=True)
    got = jax.jit(
        lambda h, w, b: sharded_multihead_max(h, w, b, A_REAL, mesh, DATA_AXIS)
    )(h, w, b)
    dense_logits = (jnp.einsum("bf,kfa->bka", h, w) + b)[:, :, :A_REAL]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.max(dense_logits, axis=2)), rtol=1e-5
    )


def test_sharded_sup_topk_matches_dense(mesh):
    rs = np.random.RandomState(5)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w, b = _head(rs)
    k = 5
    got = jax.jit(
        lambda h, w, b: sharded_sup_topk(h, w, b, k, A_REAL, mesh, DATA_AXIS)
    )(h, w, b)
    _, dense_i = jax.lax.top_k((h @ w + b)[:, :A_REAL], k)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(dense_i))


# ---------------------------------------------------------------------------
# step-level parity: fused step with mesh == fused step without mesh
# ---------------------------------------------------------------------------


def _batch(rs, A, T):
    return {
        "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(B).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(B) < 0.3),
        "valid": jnp.ones((B,), bool),
    }


@pytest.mark.parametrize("family", ["sqn", "smorl", "sarm"])
def test_fused_step_mesh_matches_single_device(mesh, family):
    """The sharded fused train path (the round-3 capability: fused kernels
    stay ON under a mesh) steps to the same params as the single-device
    fused path, on a model padded identically (align=4)."""
    T = 5
    tc = TrainConfig(
        model=family, embedding_size=F, hidden_state_size=F, state_size=T,
        fused_ce=True,
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A_REAL), align=4)
    mc = replace(mc, fused_ce=True)  # bypass the catalog-size gate
    opt = make_optimizer(0.01)
    rl = RLStepConfig()
    rs_aux = np.random.RandomState(7)
    aux = {}
    if family == "smorl":
        aux = {
            "div_embedding": 0.1
            * jnp.asarray(rs_aux.randn(A_REAL + 1, F), jnp.float32),
            "unpopular_mask": jnp.asarray(np.arange(A_REAL) % 3 == 0),
        }
    if family in ("sqn", "smorl"):
        state, _ = make_double_q_state(jax.random.key(0), mc, 0.01)
    else:
        state, _ = make_train_state(jax.random.key(0), mc, 0.01)
    rs = np.random.RandomState(11)
    batch = _batch(rs, A_REAL, T)

    step_plain = make_train_step(mc, opt, rl, **aux, donate=False)
    s1, m1 = step_plain(state, batch)

    step_mesh = make_train_step(
        mc, opt, rl, **aux, donate=False, jit=False,
        mesh=mesh, data_axis=DATA_AXIS,
    )
    sharded = shard_state(state, mesh)
    s2, m2 = jax.jit(step_mesh.raw)(sharded, batch, step_mesh.aux)

    np.testing.assert_allclose(
        float(m1["sup_loss"]), float(m2["sup_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["q_loss"]), float(m2["q_loss"]), rtol=1e-4, atol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5
        ),
        s1.params,
        s2.params,
    )
