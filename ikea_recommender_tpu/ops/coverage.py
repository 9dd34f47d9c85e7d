"""Catalog-coverage accumulation — device boolean scatter instead of host sets.

The reference accumulates, per k, a Python set of every action id that ever
appeared in a top-k recommendation across the epoch
(``evaluate/coverage.py:24-74``). Here the accumulator is a
(len(topk), num_actions) bool array updated by scatter on device; coverage
ratios are masked popcounts. Exact (set-union == boolean OR) and
cross-device mergeable with a single ``any``-reduce.

Note: the reference applies NO output->input remap here (it accepts
tokenizers and ignores them) — coverage lives in output-token space; kept.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.ops.ranking import topk_indices


def init_coverage(num_actions: int, num_ks: int) -> jax.Array:
    return jnp.zeros((num_ks, num_actions), dtype=bool)


def update_coverage_from_topk(
    covered: jax.Array,  # (n_k, A) bool
    idx: jax.Array,  # (B, >= max k) top-k predicted action ids
    top_k: Sequence[int],
    valid: jax.Array | None = None,
) -> jax.Array:
    new_rows = []
    for i, k in enumerate(top_k):
        ids = idx[:, :k]
        if valid is not None:
            updates = jnp.broadcast_to(valid[:, None], ids.shape)
        else:
            updates = jnp.ones(ids.shape, dtype=bool)
        row = covered[i].at[ids.reshape(-1)].max(updates.reshape(-1))
        new_rows.append(row)
    return jnp.stack(new_rows)


def update_coverage(
    covered: jax.Array,  # (n_k, A) bool
    predictions: jax.Array,  # (B, A)
    top_k: Sequence[int],
    valid: jax.Array | None = None,
) -> jax.Array:
    idx = topk_indices(predictions, max(top_k))
    return update_coverage_from_topk(covered, idx, top_k, valid)


def coverage_ratios(
    covered: jax.Array,  # (n_k, A) bool
    unpopular_mask: jax.Array,  # (A,) bool
    num_actions: int,
) -> Tuple[jax.Array, jax.Array]:
    """-> (unpopular_coverage (n_k,), all_coverage (n_k,)) matching
    reference ``coverage.py:4-21``: |covered ∩ unpopular| / |unpopular| and
    |covered| / num_actions."""
    n_unpop = jnp.maximum(jnp.sum(unpopular_mask), 1)
    unpop_cov = jnp.sum(covered & unpopular_mask[None, :], axis=1) / n_unpop
    all_cov = jnp.sum(covered, axis=1) / num_actions
    return unpop_cov.astype(jnp.float32), all_cov.astype(jnp.float32)
