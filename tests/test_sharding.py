"""Multi-device sharding tests on the 8-device virtual CPU mesh:
- sharded top-k / CE / embedding-lookup kernels vs unsharded references;
- the full double-Q train step jitted over a (data, model) mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh, DATA_AXIS, MODEL_AXIS
from ikea_recommender_tpu.models.families import model_config_from_train
from ikea_recommender_tpu.parallel.sharding import (
    make_sharded_train_step,
    shard_state,
    state_shardings,
)
from ikea_recommender_tpu.parallel.topk import (
    sharded_embedding_lookup,
    sharded_softmax_ce,
    sharded_top_k,
)
from ikea_recommender_tpu.train.state import make_double_q_state, make_optimizer
from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step


def _mesh(data=2, model=4):
    assert len(jax.devices()) >= data * model
    return make_mesh(MeshSpec(data=data, model=model))


def test_sharded_top_k_matches_dense():
    mesh = _mesh(1, 4)
    rs = np.random.RandomState(0)
    logits = jnp.asarray(rs.randn(6, 32).astype(np.float32))
    vals, idx = sharded_top_k(logits, 5, mesh)
    ref_vals, ref_idx = jax.lax.top_k(logits, 5)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


def test_sharded_softmax_ce_matches_dense():
    mesh = _mesh(1, 4)
    rs = np.random.RandomState(1)
    logits = jnp.asarray(rs.randn(8, 24).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 24, 8))
    ce = sharded_softmax_ce(logits, labels, mesh)
    ref = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(ref), rtol=1e-5)


def test_sharded_embedding_lookup_matches_dense():
    mesh = _mesh(1, 4)
    rs = np.random.RandomState(2)
    table = jnp.asarray(rs.randn(32, 6).astype(np.float32))
    ids = jnp.asarray(rs.randint(0, 32, size=(5, 7)))
    out = sharded_embedding_lookup(table, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), rtol=1e-6)


@pytest.mark.parametrize("family", ["gru4rec", "sqn", "smorl"])
def test_sharded_train_step_runs_and_matches_single_device(family):
    """The mesh-jitted step must produce the same params as the unsharded
    step (same inputs, same RNG path)."""
    mesh = _mesh(2, 2)
    A, B, T = 16, 8, 4
    train_cfg = TrainConfig(
        model=family, embedding_size=8, hidden_state_size=8, state_size=T
    )
    data_cfg = DataConfig(num_items=A)
    # align=2 pads vocab rows / action dim to the model-axis multiple
    mc = model_config_from_train(train_cfg, data_cfg, align=2)
    opt = make_optimizer(0.01)
    rl = RLStepConfig()
    aux = {}
    if family == "smorl":
        aux = {
            "div_embedding": jnp.asarray(
                np.random.RandomState(3).randn(A + 1, 8).astype(np.float32)
            ),
            "unpopular_mask": jnp.asarray(np.arange(A) % 2 == 0),
        }
    step_plain = make_train_step(mc, opt, rl, **aux, jit=True, donate=False)

    rs = np.random.RandomState(4)
    batch = {
        "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(B).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(B) < 0.3),
        "valid": jnp.ones((B,), bool),
    }

    if family in ("sqn", "smorl"):
        state, _ = make_double_q_state(jax.random.key(0), mc, 0.01)
    else:
        from ikea_recommender_tpu.train.state import make_train_state

        state, _ = make_train_state(jax.random.key(0), mc, 0.01)

    def emb_of(params):
        # double-Q params are a (net0, net1) tuple
        return (params[0] if isinstance(params, tuple) else params)[
            "backbone"
        ]["embedding"]

    # single-device result
    s1, m1 = step_plain(state, batch)
    ref_emb = np.asarray(emb_of(s1.params))

    # sharded result
    raw_step = make_train_step(mc, opt, rl, **aux, jit=False)
    sharded = shard_state(state, mesh)
    step_sh = make_sharded_train_step(raw_step, mesh, state, batch)
    s2, m2 = step_sh(sharded, batch)
    np.testing.assert_allclose(np.asarray(emb_of(s2.params)), ref_emb, atol=2e-5)
    np.testing.assert_allclose(float(m1["sup_loss"]), float(m2["sup_loss"]), rtol=1e-4)

    # and the sharding actually landed where intended: vocab rows on model
    emb_spec = emb_of(s2.params).sharding.spec
    assert MODEL_AXIS in tuple(emb_spec)
