"""Top-k ranking and HR@k / NDCG@k kernels — fully on device.

The reference computes HR/NDCG with ``torch.topk`` + an O(B*k) Python-level
``np.vectorize`` rank scan on the host (``evaluate/eval_protocol.py:12-100``).
Here the whole protocol is a fused jnp computation: one top-k over the
catalog dim, an equality-based rank extraction, and masked segment sums.

Rank semantics preserved exactly: rank r in [1, k] is the position of the
true action among the top-k predictions (ties in scores resolve to the lower
index, matching torch/jax top-k), NDCG contribution = 1 / log2(rank + 1),
0 when not in the top-k.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def topk_indices(predictions: jax.Array, k: int) -> jax.Array:
    """(B, A) scores -> (B, k) top-k action ids (descending, index-tiebreak)."""
    _, idx = jax.lax.top_k(predictions, k)
    return idx


def hit_ranks(topk_idx: jax.Array, true_idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, maxk) top-k ids + (B,) labels -> (hit (B,) bool, rank (B,) int).

    rank is 1-based position within the top-k list; 0 when not present.
    """
    matches = topk_idx == true_idx[:, None]  # (B, maxk)
    hit = jnp.any(matches, axis=1)
    rank = jnp.where(hit, jnp.argmax(matches, axis=1) + 1, 0)
    return hit, rank


def hr_ndcg_from_topk(
    topk_idx: jax.Array,
    true_idx: jax.Array,
    top_k: Sequence[int],
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batch sums of hits and NDCG for each k from PRECOMPUTED (B, >=max k)
    top-k ids (the fused eval path computes those once for every metric —
    ops/fused_topk.py). Returns (hits (len(top_k),), ndcg (len(top_k),))."""
    hit, rank = hit_ranks(topk_idx, true_idx)
    if valid is None:
        valid = jnp.ones_like(hit)
    hits, ndcgs = [], []
    for k in top_k:
        hit_k = hit & (rank <= k) & valid
        ndcg_k = jnp.where(hit_k, 1.0 / jnp.log2(rank.astype(jnp.float32) + 1.0), 0.0)
        hits.append(jnp.sum(hit_k))
        ndcgs.append(jnp.sum(ndcg_k))
    return jnp.stack(hits).astype(jnp.float32), jnp.stack(ndcgs)


def hr_ndcg_at_k(
    predictions: jax.Array,
    true_idx: jax.Array,
    top_k: Sequence[int],
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batch sums of hits and NDCG for each k (reference
    ``eval_protocol.py:62-100`` — sums, normalized by the caller).

    Returns (hits (len(top_k),), ndcg (len(top_k),)).
    """
    idx = topk_indices(predictions, max(top_k))
    return hr_ndcg_from_topk(idx, true_idx, top_k, valid)


def hr_ndcg_by_type_from_topk(
    topk_idx: jax.Array,
    true_idx: jax.Array,
    action_types: jax.Array,  # (B,) int in [0, num_types)
    num_types: int,
    top_k: Sequence[int],
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-action-type HR/NDCG sums from precomputed top-k ids — the
    old-generation eval capability (reference
    ``old/sqn_evaluation_old.py:13-291``: separate HR/NDCG dicts for click
    vs buy events) as one fused segment-sum.

    Returns (hits (num_types, n_k), ndcg (num_types, n_k), counts (num_types,)).
    """
    hit, rank = hit_ranks(topk_idx, true_idx)
    if valid is None:
        valid = jnp.ones_like(hit)
    onehot = jax.nn.one_hot(action_types, num_types, dtype=jnp.float32)  # (B, T)
    onehot = onehot * valid[:, None]
    hits, ndcgs = [], []
    for k in top_k:
        hit_k = (hit & (rank <= k)).astype(jnp.float32)
        ndcg_k = jnp.where(
            hit_k > 0, 1.0 / jnp.log2(rank.astype(jnp.float32) + 1.0), 0.0
        )
        hits.append(onehot.T @ hit_k)  # (num_types,)
        ndcgs.append(onehot.T @ ndcg_k)
    counts = jnp.sum(onehot, axis=0)
    return jnp.stack(hits, axis=1), jnp.stack(ndcgs, axis=1), counts


def hr_ndcg_by_action_type(
    predictions: jax.Array,
    true_idx: jax.Array,
    action_types: jax.Array,
    num_types: int,
    top_k: Sequence[int],
    valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    idx = topk_indices(predictions, max(top_k))
    return hr_ndcg_by_type_from_topk(
        idx, true_idx, action_types, num_types, top_k, valid
    )
