"""Fused softmax-CE kernel vs optax reference (value + grads).

Runs in Pallas interpret mode on CPU (conftest forces the CPU backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ikea_recommender_tpu.ops.fused_ce import fused_softmax_ce


def _ref_per_example(h, w, b, labels, valid_dim):
    logits = h @ w + b
    col = jnp.arange(logits.shape[1])
    logits = jnp.where(col < valid_dim, logits, -1e30)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


@pytest.mark.parametrize(
    "B,F,A,valid",
    [
        (8, 16, 384, 384),    # exact block tail
        (8, 16, 300, 300),    # ragged tail (A not multiple of block)
        (8, 16, 384, 300),    # padded action columns masked
    ],
)
def test_fused_ce_matches_optax(B, F, A, valid):
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(A).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, valid, (B,)), jnp.int32)

    got = fused_softmax_ce(h, w, b, labels, valid)
    want = _ref_per_example(h, w, b, labels, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # weighted-mean loss gradient parity (the exact pattern the train steps use)
    weights = jnp.asarray(rs.rand(B).astype(np.float32))

    def loss_fused(h, w, b):
        return jnp.sum(fused_softmax_ce(h, w, b, labels, valid) * weights)

    def loss_ref(h, w, b):
        return jnp.sum(_ref_per_example(h, w, b, labels, valid) * weights)

    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(h, w, b)
    g_want = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    for got_i, want_i, name in zip(g_got, g_want, "h w b".split()):
        np.testing.assert_allclose(
            np.asarray(got_i), np.asarray(want_i), rtol=2e-4, atol=2e-5,
            err_msg=f"grad {name}",
        )
    # padded weight columns must receive exactly zero gradient
    if valid < A:
        assert np.all(np.asarray(g_got[1])[:, valid:] == 0.0)
        assert np.all(np.asarray(g_got[2])[valid:] == 0.0)


def test_fused_ce_under_jit_and_large_batch():
    rs = np.random.RandomState(1)
    B, F, A = 64, 32, 1024
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.05)
    b = jnp.zeros((A,), jnp.float32)
    labels = jnp.asarray(rs.randint(0, A, (B,)), jnp.int32)

    f = jax.jit(lambda h, w, b: fused_softmax_ce(h, w, b, labels, A).mean())
    got = f(h, w, b)
    want = _ref_per_example(h, w, b, labels, A).mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.mark.parametrize("precision,rtol", [("high", 5e-4), ("default", 5e-2)])
def test_fused_ce_reduced_precision_close(precision, rtol):
    """head_precision="high" (manual bf16x3 split, ops/fused_ce.py:_dot3)
    and "default" (single bf16 pass) must stay close to the fp32 reference —
    value AND gradients. These are the train-step fast paths
    (TrainConfig.head_precision; profiled in scripts/profile_step.py)."""
    rs = np.random.RandomState(1)
    B, F, A, valid = 8, 16, 300, 300
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(A).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, valid, (B,)), jnp.int32)

    def mean_loss(fn):
        return lambda h, w, b: jnp.mean(fn(h, w, b))

    got_fn = mean_loss(lambda h, w, b: fused_softmax_ce(h, w, b, labels, valid, precision))
    ref_fn = mean_loss(lambda h, w, b: _ref_per_example(h, w, b, labels, valid))

    got, g_got = jax.value_and_grad(got_fn, argnums=(0, 1, 2))(h, w, b)
    want, g_want = jax.value_and_grad(ref_fn, argnums=(0, 1, 2))(h, w, b)
    np.testing.assert_allclose(float(got), float(want), rtol=rtol)
    for a, e in zip(g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=rtol * 50, atol=rtol
        )


def test_fused_ce_topk_matches_separate_paths():
    """fused_softmax_ce_topk = fused_softmax_ce values/grads + dense top-k
    indices, from ONE blockwise pass (the SMORL lean-step op)."""
    from ikea_recommender_tpu.ops.fused_ce import fused_softmax_ce_topk

    B, F, A, valid, k = 8, 16, 384, 300, 5
    rs = np.random.RandomState(1)
    h = jnp.asarray(rs.randn(B, F).astype(np.float32))
    w = jnp.asarray(rs.randn(F, A).astype(np.float32) * 0.1)
    b = jnp.asarray(rs.randn(A).astype(np.float32) * 0.1)
    labels = jnp.asarray(rs.randint(0, valid, (B,)), jnp.int32)

    ce, top_i = fused_softmax_ce_topk(h, w, b, labels, k, valid)
    want_ce = _ref_per_example(h, w, b, labels, valid)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(want_ce),
                               rtol=2e-5, atol=2e-5)

    logits = h @ w + b
    logits = jnp.where(jnp.arange(A) < valid, logits, -1e30)
    _, want_i = jax.lax.top_k(logits, k)
    np.testing.assert_array_equal(np.asarray(top_i), np.asarray(want_i))

    # grads flow through the CE output exactly like fused_softmax_ce
    def loss_combined(h, w, b):
        ce, _ = fused_softmax_ce_topk(h, w, b, labels, k, valid)
        return ce.mean()

    def loss_separate(h, w, b):
        return fused_softmax_ce(h, w, b, labels, valid).mean()

    gc = jax.grad(loss_combined, argnums=(0, 1, 2))(h, w, b)
    gs = jax.grad(loss_separate, argnums=(0, 1, 2))(h, w, b)
    for a, e in zip(gc, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)
