"""HR/NDCG rank-kernel golden values (derived from the reference's
hand-computed synthetic batch in test/test_evaluation.py)."""

import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.ops.ranking import hit_ranks, hr_ndcg_at_k, topk_indices


def test_hit_ranks_basic():
    preds = jnp.array(
        [
            [10.0, 9, 8, 7, 6],  # ranking: 0,1,2,3,4
            [0.0, 10, 9, 8, 7],  # ranking: 1,2,3,4,0
            [1.0, 9, 8, 7, 11],  # ranking: 4,1,2,3,0
        ]
    )
    idx = topk_indices(preds, 5)
    np.testing.assert_array_equal(idx[0], [0, 1, 2, 3, 4])
    hit, rank = hit_ranks(idx, jnp.array([0, 0, 4]))
    np.testing.assert_array_equal(hit, [True, True, True])
    np.testing.assert_array_equal(rank, [1, 5, 1])


def test_hr_ndcg_sums():
    preds = jnp.array(
        [
            [10.0, 9, 8, 7, 6],
            [0.0, 10, 9, 8, 7],
            [1.0, 9, 8, 7, 11],
        ]
    )
    labels = jnp.array([1, 1, 0])  # ranks in top-5: 2, 1, 5
    hits, ndcg = hr_ndcg_at_k(preds, labels, top_k=[1, 2, 5])
    np.testing.assert_array_equal(hits, [1, 2, 3])
    expect_ndcg_5 = 1 / np.log2(3) + 1.0 + 1 / np.log2(6)
    np.testing.assert_allclose(ndcg[2], expect_ndcg_5, rtol=1e-6)
    np.testing.assert_allclose(ndcg[1], 1 / np.log2(3) + 1.0, rtol=1e-6)
    np.testing.assert_allclose(ndcg[0], 1.0, rtol=1e-6)


def test_valid_mask_excludes_padded_rows():
    preds = jnp.array([[5.0, 1.0], [5.0, 1.0]])
    labels = jnp.array([0, 0])
    hits, ndcg = hr_ndcg_at_k(preds, labels, [1], valid=jnp.array([True, False]))
    np.testing.assert_array_equal(hits, [1])
    np.testing.assert_allclose(ndcg, [1.0])


def test_tie_break_matches_lower_index():
    preds = jnp.array([[1.0, 1.0, 1.0]])
    idx = topk_indices(preds, 3)
    np.testing.assert_array_equal(idx[0], [0, 1, 2])
