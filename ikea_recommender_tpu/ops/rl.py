"""RL tensor operations (multi-head Q gathering / scalarization).

jnp equivalents of the reference's ``utils/tensor_operations.py:4-84``,
golden-tested against the same hand-computed values
(``test/test_tensor_operations.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_from_3d(q_tensor: jax.Array, action_idxs: jax.Array) -> jax.Array:
    """(B, K, A) Q-values + (B,) action ids -> (B, K): every head's value for
    the sample's chosen action (reference ``tensor_operations.py:4-33``)."""
    return jnp.take_along_axis(
        q_tensor, action_idxs[:, None, None], axis=2
    ).squeeze(-1)


def weighted_q_loss(q_vals: jax.Array, w: jax.Array) -> jax.Array:
    """(B, K) per-head values x (K,) weights -> (B,) scalarized
    (reference ``tensor_operations.py:36-48``)."""
    return q_vals @ w


def get_weighted_q_target(q_vals: jax.Array, w: jax.Array) -> jax.Array:
    """(B, K, A) x (K,) -> (B, A) weighted head-sum
    (reference ``tensor_operations.py:51-71``).

    Broadcast-multiply + reduce, NOT an einsum: the ``bka,k->ba``
    contraction lowers pathologically on TPU (~2 min compile)."""
    return jnp.sum(q_vals * w[None, :, None], axis=1)


def get_max_action(q_vals: jax.Array) -> jax.Array:
    """(B, A) -> (B,) argmax action (reference ``tensor_operations.py:74-84``)."""
    return jnp.argmax(q_vals, axis=1)
