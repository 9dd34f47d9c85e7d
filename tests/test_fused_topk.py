"""Fused blockwise / sharded head+top-k+CE vs the dense path.

Top-k (values, ids, tie order) must be EXACT; CE to accumulation order;
the whole EvalProtocol must produce identical metrics either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh
from ikea_recommender_tpu.models.families import (
    init_model,
    mask_pad_logits,
    model_config_from_train,
)
from ikea_recommender_tpu.ops.fused_topk import blockwise_head_topk_ce, eval_head
from ikea_recommender_tpu.parallel.topk import sharded_head_topk_ce


def _dense(h, kernel, bias, action_dim):
    logits = h @ kernel + bias
    col = jnp.arange(logits.shape[1])
    return jnp.where(col[None, :] < action_dim, logits, -1e9)


@pytest.mark.parametrize("A,block", [(200, 64), (200, 4096), (203, 50)])
def test_blockwise_matches_dense(A, block):
    rs = np.random.RandomState(0)
    B, F, k = 16, 8, 7
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    kernel = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(A).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, A - 3, (B,)), jnp.int32)

    dense = _dense(h, kernel, bias, A - 3)  # 3 "padded" columns
    want_v, want_i = jax.lax.top_k(dense, k)
    want_ce = optax.softmax_cross_entropy_with_integer_labels(dense, labels)

    got_v, got_i, got_ce = jax.jit(
        lambda h, kk, bb, ll: blockwise_head_topk_ce(
            h, kk, bb, k, A - 3, labels=ll, block_cols=block
        )
    )(h, kernel, bias, labels)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_ce), np.asarray(want_ce), rtol=1e-5)


def test_blockwise_tie_breaking_matches_dense():
    # Massive ties: constant logits -> top-k must pick the LOWEST indices
    B, F, A, k = 4, 8, 100, 10
    h = jnp.zeros((B, F), jnp.float32)
    kernel = jnp.zeros((F, A), jnp.float32)
    bias = jnp.zeros((A,), jnp.float32)
    _, got_i, _ = blockwise_head_topk_ce(h, kernel, bias, k, A, block_cols=16)
    want = jnp.broadcast_to(jnp.arange(k), (B, k))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want))


def test_sharded_head_topk_ce_matches_dense():
    mesh = make_mesh(MeshSpec(2, 4))
    rs = np.random.RandomState(1)
    B, F, A_pad, A, k = 8, 8, 160, 155, 6
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    kernel = jnp.asarray(rs.randn(F, A_pad).astype(np.float32) * 0.3)
    bias = jnp.asarray(rs.randn(A_pad).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, A, (B,)), jnp.int32)

    dense = _dense(h, kernel, bias, A)
    want_v, want_i = jax.lax.top_k(dense, k)
    want_ce = optax.softmax_cross_entropy_with_integer_labels(dense, labels)

    got_v, got_i, got_ce = jax.jit(
        lambda h, kk, bb, ll: sharded_head_topk_ce(
            h, kk, bb, k, A, mesh, labels=ll, block_cols=16
        )
    )(h, kernel, bias, labels)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_ce), np.asarray(want_ce), rtol=1e-5)


def test_sharded_topk_k_exceeds_shard_width():
    # k > A_pad / n_shards: every shard contributes all its columns and the
    # global merge still recovers the exact dense top-k.
    mesh = make_mesh(MeshSpec(1, 8))
    rs = np.random.RandomState(5)
    B, F, A, k = 4, 8, 24, 10  # shard width 3 < k
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    kernel = jnp.asarray(rs.randn(F, A).astype(np.float32))
    bias = jnp.asarray(rs.randn(A).astype(np.float32))
    dense = _dense(h, kernel, bias, A)
    want_v, want_i = jax.lax.top_k(dense, k)
    got_v, got_i, _ = sharded_head_topk_ce(h, kernel, bias, k, A, mesh)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-6)


@pytest.mark.parametrize("family,head_idx", [
    ("gru4rec", 0), ("sqn", 1), ("smorl", 0), ("sarm", 2),
])
def test_eval_protocol_fused_matches_dense(family, head_idx):
    from ikea_recommender_tpu.eval.protocol import EvalProtocol

    A, B, T = 60, 24, 5
    tc = TrainConfig(
        model=family, embedding_size=8, hidden_state_size=8, state_size=T
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A))
    params = init_model(jax.random.key(0), mc)
    rs = np.random.RandomState(2)
    kw = dict(
        topk_hr_ndcg=(5, 10),
        topk_cov=(1, 5),
        topk_div=2,
        topk_nov=3,
        div_embedding=jnp.asarray(rs.randn(A + 1, 8).astype(np.float32)),
        unpopular_mask=jnp.asarray(np.arange(A) % 3 == 0),
        head_idx=head_idx,
    )
    proto_d = EvalProtocol(mc, fused=False, **kw)
    proto_f = EvalProtocol(mc, fused=True, **kw)
    assert proto_f.fused and not proto_d.fused

    data = {
        "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
    }
    res_d = proto_d.evaluate_device(params, data, batch_size=10)
    res_f = proto_f.evaluate_device(params, data, batch_size=10)

    # index-derived metrics: exact; CE: accumulation order only
    np.testing.assert_array_equal(res_f.hr, res_d.hr)
    np.testing.assert_array_equal(res_f.ndcg, res_d.ndcg)
    np.testing.assert_array_equal(res_f.reps, res_d.reps)
    assert res_f.coverage == res_d.coverage
    np.testing.assert_allclose(res_f.div_rew, res_d.div_rew, rtol=1e-6)
    np.testing.assert_allclose(res_f.nov_rew, res_d.nov_rew, rtol=1e-6)
    np.testing.assert_allclose(res_f.loss, res_d.loss, rtol=1e-5)


def test_eval_protocol_sharded_fused_matches_dense():
    """Model-sharded eval (the large-catalog path) == dense single-device."""
    from ikea_recommender_tpu.eval.protocol import EvalProtocol
    from ikea_recommender_tpu.parallel.sharding import shard_state
    from ikea_recommender_tpu.train.state import make_train_state

    mesh = make_mesh(MeshSpec(2, 4))
    A, B, T = 50, 16, 5
    tc = TrainConfig(model="gru4rec", embedding_size=8, hidden_state_size=8, state_size=T)
    mc = model_config_from_train(tc, DataConfig(num_items=A), align=4)
    state, _ = make_train_state(jax.random.key(0), mc, 0.01)
    rs = np.random.RandomState(3)
    kw = dict(topk_hr_ndcg=(5, 10), topk_cov=(1, 5), topk_div=1, topk_nov=1)

    data = {
        "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
    }
    res_d = EvalProtocol(mc, fused=False, **kw).evaluate_device(
        state.params, data, batch_size=8
    )
    sharded = shard_state(state, mesh)
    res_s = EvalProtocol(mc, mesh=mesh, **kw).evaluate_device(
        sharded.params, data, batch_size=8
    )
    np.testing.assert_array_equal(res_s.hr, res_d.hr)
    np.testing.assert_array_equal(res_s.ndcg, res_d.ndcg)
    assert res_s.coverage == res_d.coverage
    np.testing.assert_allclose(res_s.loss, res_d.loss, rtol=1e-5)


def test_blockwise_multihead_max_matches_dense():
    from ikea_recommender_tpu.ops.fused_topk import blockwise_multihead_max

    rs = np.random.RandomState(6)
    B, F, K, A_pad, A = 8, 8, 5, 64, 57
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    kernel = jnp.asarray(rs.randn(K, F, A_pad).astype(np.float32))
    bias = jnp.asarray(rs.randn(K, A_pad).astype(np.float32))
    dense = jnp.einsum("bf,kfa->bka", h, kernel) + bias[None]
    col = jnp.arange(A_pad)
    dense = jnp.where(col[None, None, :] < A, dense, -1e30)
    want = jnp.max(dense, axis=2)
    got = jax.jit(
        lambda h, kk, bb: blockwise_multihead_max(h, kk, bb, A, block_cols=16)
    )(h, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_sarm_lean_step_matches_dense():
    """SARM fused path (fused CE on head 0 + row gather-dots + blockwise
    per-head max) == the dense (B, 5, A) step, to accumulation order."""
    from dataclasses import replace

    from ikea_recommender_tpu.train.state import make_optimizer, make_train_state
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

    A, B, T = 40, 12, 5
    tc = TrainConfig(model="sarm", embedding_size=8, hidden_state_size=8, state_size=T)
    mc_dense = model_config_from_train(tc, DataConfig(num_items=A))
    mc_fused = replace(mc_dense, fused_ce=True)
    assert not mc_dense.fused_ce
    opt = make_optimizer(0.01)
    rl = RLStepConfig(sarm_gamma=0.5)
    state, _ = make_train_state(jax.random.key(0), mc_dense, 0.01)

    rs = np.random.RandomState(7)
    batch = {
        "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(B).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(B) < 0.3),
        "valid": jnp.asarray(rs.rand(B) < 0.9),
    }
    s_d, m_d = make_train_step(mc_dense, opt, rl, donate=False)(state, batch)
    s_f, m_f = make_train_step(mc_fused, opt, rl, donate=False)(state, batch)
    np.testing.assert_allclose(float(m_f["sup_loss"]), float(m_d["sup_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_f["q_loss"]), float(m_d["q_loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_f.params["backbone"]["embedding"]),
        np.asarray(s_d.params["backbone"]["embedding"]),
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s_f.params["q_heads"]["kernel"]),
        np.asarray(s_d.params["q_heads"]["kernel"]),
        atol=2e-6,
    )


def test_recommender_fused_matches_dense():
    from ikea_recommender_tpu.run.serve import Recommender

    A, B, T = 40, 6, 5
    tc = TrainConfig(model="gru4rec", embedding_size=8, hidden_state_size=8, state_size=T)
    mc = model_config_from_train(tc, DataConfig(num_items=A))
    params = init_model(jax.random.key(1), mc)
    rs = np.random.RandomState(4)
    states = rs.randint(0, A, (B, T)).astype(np.int32)
    lengths = rs.randint(1, T + 1, (B,)).astype(np.int32)

    dense = Recommender(params, mc, fused=False)
    fused = Recommender(params, mc, fused=True)
    dv, di = dense.recommend(states, lengths, k=5)
    fv, fi = fused.recommend(states, lengths, k=5)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(di))
    np.testing.assert_allclose(np.asarray(fv), np.asarray(dv), rtol=1e-6)
