"""Golden values matching the reference's test_tensor_operations.py
(3-head SMORL shapes)."""

import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.ops.rl import (
    gather_from_3d,
    get_max_action,
    get_weighted_q_target,
    weighted_q_loss,
)

Q_ACC = jnp.array([[1.0, 2, 3, 4, 5], [-1, -2, -3, -4, -5]])
Q_DIV = jnp.array([[10.0, 20, 30, 40, 50], [0.1, 0.2, 0.3, 0.4, 0.5]])
Q_NOV = jnp.array([[100.0, 200, 300, 400, 500], [11, 21, 31, 41, 51]])
ALL_Q = jnp.stack([Q_ACC, Q_DIV, Q_NOV], axis=1)  # (2, 3, 5)


def test_gather_from_3d():
    res = gather_from_3d(ALL_Q, jnp.array([3, 1]))
    np.testing.assert_allclose(res, [[4, 40, 400], [-2, 0.2, 21]], rtol=1e-6)


def test_weighted_q_loss():
    q = jnp.array([[4.0, 40, 400], [-2, 0.2, 21]])
    w = jnp.array([0.1, 0.5, 0.4])
    np.testing.assert_allclose(weighted_q_loss(q, w), [180.4, 8.3], rtol=1e-5)


def test_get_weighted_q_target_and_max_action():
    q3 = ALL_Q[:, :, :3]
    w = jnp.array([0.1, 0.5, 0.4])
    res = get_weighted_q_target(q3, w)
    expect = np.array(
        [
            [0.1 * 1 + 0.5 * 10 + 0.4 * 100, 0.1 * 2 + 0.5 * 20 + 0.4 * 200,
             0.1 * 3 + 0.5 * 30 + 0.4 * 300],
            [0.1 * -1 + 0.5 * 0.1 + 0.4 * 11, 0.1 * -2 + 0.5 * 0.2 + 0.4 * 21,
             0.1 * -3 + 0.5 * 0.3 + 0.4 * 31],
        ]
    )
    np.testing.assert_allclose(res, expect, rtol=1e-5)
    np.testing.assert_array_equal(get_max_action(res), [2, 2])
