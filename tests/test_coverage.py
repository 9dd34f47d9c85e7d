"""Coverage accumulator: device boolean scatter == reference host set-union
(golden values from reference test_coverage.py)."""

import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.data.item_frequency import unpopular_mask
from ikea_recommender_tpu.ops.coverage import (
    coverage_ratios,
    init_coverage,
    update_coverage,
)


def test_coverage_ratios_golden():
    covered = np.zeros((1, 10), dtype=bool)
    covered[0, [1, 2]] = True  # will also get 10,20,30,40 out of range in ref;
    # here catalog is 10 wide: use the in-range analogue
    covered[0, [5, 6, 7, 8]] = True  # 6 covered of 10
    unpop = unpopular_mask({1, 2, 3, 4, 5}, 10)
    unpop_cov, all_cov = coverage_ratios(jnp.asarray(covered), jnp.asarray(unpop), 10)
    np.testing.assert_allclose(all_cov, [6 / 10])
    np.testing.assert_allclose(unpop_cov, [3 / 5])


def test_update_coverage_matches_set_union():
    preds = jnp.array(
        [
            [10.0, 9, 8, 7, 6],  # top1: 0, top2: 0,1
            [0.0, 10, 9, 8, 7],  # top1: 1, top2: 1,2
            [1.0, 9, 8, 7, 11],  # top1: 4, top2: 4,1
        ]
    )
    cov = init_coverage(5, 2)
    # Pre-mark ids {0} for k=1 and {0,1,4} for k=2 (reference test's prior sets,
    # restricted to the 5-wide catalog).
    cov = cov.at[0, 0].set(True)
    cov = cov.at[1, jnp.array([0, 1, 4])].set(True)
    cov = update_coverage(cov, preds, top_k=[1, 2])
    np.testing.assert_array_equal(np.flatnonzero(cov[0]), [0, 1, 4])
    np.testing.assert_array_equal(np.flatnonzero(cov[1]), [0, 1, 2, 4])


def test_update_coverage_valid_mask():
    preds = jnp.array([[10.0, 1.0], [1.0, 10.0]])
    cov = init_coverage(2, 1)
    cov = update_coverage(cov, preds, [1], valid=jnp.array([True, False]))
    np.testing.assert_array_equal(np.asarray(cov[0]), [True, False])
