"""Fused argmax / row_logit kernels vs dense references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikea_recommender_tpu.ops.fused_argmax import (
    fused_linear_argmax,
    fused_weighted_multihead_argmax,
    row_logit,
)


@pytest.mark.parametrize("A,valid", [(384, 384), (300, 300), (384, 300)])
def test_linear_argmax_matches_dense(A, valid):
    rs = np.random.RandomState(0)
    B, F = 16, 8
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32))
    b = jnp.asarray(rs.randn(A).astype(np.float32))
    got = fused_linear_argmax(h, w, b, valid)
    logits = h @ w + b
    logits = jnp.where(jnp.arange(A) < valid, logits, -1e30)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.argmax(logits, 1)))


def test_linear_argmax_tie_breaks_low_id_across_blocks():
    B, F, A = 2, 4, 300  # block 128 -> ties span blocks
    h = jnp.ones((B, F), jnp.float32)
    w = jnp.zeros((F, A), jnp.float32)
    b = jnp.zeros((A,), jnp.float32).at[jnp.asarray([7, 200])].set(5.0)
    b = jnp.stack([b, jnp.zeros((A,))])  # row 1: all-zero -> argmax 0
    got0 = fused_linear_argmax(h, w, jnp.asarray(b[0]), A)
    got1 = fused_linear_argmax(h, w, jnp.asarray(b[1]), A)
    assert np.all(np.asarray(got0) == 7)  # first of the two tied maxima
    assert np.all(np.asarray(got1) == 0)  # all-tied -> lowest id


def test_weighted_multihead_argmax_matches_rl_ops():
    from ikea_recommender_tpu.ops.rl import get_max_action, get_weighted_q_target

    rs = np.random.RandomState(1)
    B, F, K, A, valid = 8, 8, 3, 384, 380
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(K, F, A).astype(np.float32))
    b = jnp.asarray(rs.randn(K, A).astype(np.float32))
    qw = jnp.asarray([1.0, 0.5, 2.0])
    got = fused_weighted_multihead_argmax(h, w, b, qw, valid)
    q_all = jnp.einsum("bf,kfa->bka", h, w) + b  # (B, K, A)
    q_all = jnp.where(jnp.arange(A) < valid, q_all, -1e30)
    want = get_max_action(get_weighted_q_target(q_all, qw))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_row_logit_matches_dense_and_grads():
    rs = np.random.RandomState(2)
    B, F, A = 8, 8, 64
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32))
    b = jnp.asarray(rs.randn(A).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, A, B), jnp.int32)

    got = row_logit(h, w, b, idx)
    want = jnp.take_along_axis(h @ w + b, idx[:, None], 1).squeeze(1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    loss_row = lambda h, w, b: jnp.sum(row_logit(h, w, b, idx) ** 2)
    loss_ref = lambda h, w, b: jnp.sum(
        jnp.take_along_axis(h @ w + b, idx[:, None], 1).squeeze(1) ** 2
    )
    g1 = jax.grad(loss_row, argnums=(0, 1, 2))(h, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-6)


def test_multihead_row_logit_matches_gather_from_3d():
    from ikea_recommender_tpu.ops.rl import gather_from_3d

    rs = np.random.RandomState(3)
    B, F, K, A = 8, 8, 3, 64
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(K, F, A).astype(np.float32))
    b = jnp.asarray(rs.randn(K, A).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, A, B), jnp.int32)
    from ikea_recommender_tpu.ops.fused_argmax import multihead_row_logit

    got = multihead_row_logit(h, w, b, idx)
    q_all = jnp.einsum("bf,kfa->bka", h, w) + b
    want = gather_from_3d(q_all, idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)


def test_row_logit_vjps_match_dense_reference():
    """The one-hot-matmul w/b gradients (which replace autodiff's slow
    lane-dim scatter) must match the dense path's grads to fp32 rounding."""
    from ikea_recommender_tpu.ops.fused_argmax import (
        multihead_row_logit,
        row_logit,
    )
    from ikea_recommender_tpu.ops.rl import gather_from_3d

    rs = np.random.RandomState(7)
    B, F, K, A = 8, 8, 3, 64
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    wK = jnp.asarray(rs.randn(K, F, A).astype(np.float32))
    bK = jnp.asarray(rs.randn(K, A).astype(np.float32))
    w1 = jnp.asarray(rs.randn(F, A).astype(np.float32))
    b1 = jnp.asarray(rs.randn(A).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, A, B), jnp.int32)
    ct = jnp.asarray(rs.randn(B, K).astype(np.float32))
    ct1 = jnp.asarray(rs.randn(B).astype(np.float32))

    def got_multi(h, w, b):
        return (multihead_row_logit(h, w, b, idx) * ct).sum()

    def ref_multi(h, w, b):
        q_all = jnp.einsum("bf,kfa->bka", h, w) + b
        return (gather_from_3d(q_all, idx) * ct).sum()

    g = jax.grad(got_multi, argnums=(0, 1, 2))(h, wK, bK)
    e = jax.grad(ref_multi, argnums=(0, 1, 2))(h, wK, bK)
    for a, x in zip(g, e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def got_one(h, w, b):
        return (row_logit(h, w, b, idx) * ct1).sum()

    def ref_one(h, w, b):
        logits = h @ w + b
        return (jnp.take_along_axis(logits, idx[:, None], 1)[:, 0] * ct1).sum()

    g = jax.grad(got_one, argnums=(0, 1, 2))(h, w1, b1)
    e = jax.grad(ref_one, argnums=(0, 1, 2))(h, w1, b1)
    for a, x in zip(g, e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)


def test_row_logit_vjp_duplicate_indices():
    """Duplicate idx values must ACCUMULATE in dw/db like the scatter did."""
    from ikea_recommender_tpu.ops.fused_argmax import row_logit

    B, F, A = 4, 4, 16
    h = jnp.ones((B, F), jnp.float32)
    w = jnp.ones((F, A), jnp.float32)
    b = jnp.zeros((A,), jnp.float32)
    idx = jnp.asarray([3, 3, 3, 5], jnp.int32)
    db = jax.grad(lambda b: row_logit(h, w, b, idx).sum())(b)
    assert float(db[3]) == 3.0 and float(db[5]) == 1.0 and float(db.sum()) == 4.0
