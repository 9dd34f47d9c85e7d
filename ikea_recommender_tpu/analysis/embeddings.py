"""Embedding-space analysis (reference
``ikea/results/embedding_analysis.py:11-77``): cosine-similarity structure of
a trained item-embedding matrix, nearest-neighbor lookups."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cosine_similarity_matrix(emb: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(V, E) -> (V, V) cosine similarities (device matmul)."""
    emb = jnp.asarray(emb)
    norm = jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), eps)
    unit = emb / norm
    return unit @ unit.T


def nearest_neighbors(
    emb: jax.Array, item_ids: jax.Array, k: int = 10, eps: float = 1e-8
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k most similar items for each query id (excluding the item
    itself). Returns (neighbor_ids (Q, k), similarities (Q, k))."""
    emb = jnp.asarray(emb)
    item_ids = jnp.asarray(item_ids)
    norm = jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), eps)
    unit = emb / norm
    sims = unit[item_ids] @ unit.T  # (Q, V)
    sims = sims.at[jnp.arange(len(item_ids)), item_ids].set(-jnp.inf)
    vals, idx = jax.lax.top_k(sims, k)
    return np.asarray(idx), np.asarray(vals)
