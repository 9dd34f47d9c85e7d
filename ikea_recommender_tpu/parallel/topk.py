"""Explicit shard_map kernels for the action-sharded catalog dimension.

When logits (B, A) are sharded over the ``model`` axis (A split across
devices), two ops need cross-shard structure:

- **sharded top-k**: local top-k per shard (k small vs A), all_gather of the
  k candidates per shard (k * n_shards values — tiny), then a global top-k
  over candidates. Exact: the global top-k is always a subset of the union
  of local top-ks. Collective payload is O(k * n_shards), not O(A).

- **sharded softmax CE**: shard-local max + exp-sums, psum for the global
  logsumexp, and a psum'd gather of the label logit. Numerically identical
  to the unsharded computation.

These mirror what XLA's GSPMD generates for annotated programs, but exposed
as building blocks (eval at 10^6-catalog scale, custom serving paths).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ikea_recommender_tpu.core.mesh import MODEL_AXIS


def sharded_top_k(
    logits: jax.Array, k: int, mesh: Mesh, data_axis: str | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over an action-sharded (B, A) array.

    Returns (values (B, k), GLOBAL indices (B, k)).
    """
    n_shards = mesh.shape[MODEL_AXIS]
    A = logits.shape[-1]
    shard_A = A // n_shards
    if A % n_shards:
        raise ValueError(f"action dim {A} not divisible by model axis {n_shards}")

    def local(logits_shard):
        # logits_shard: (B, A/n)
        vals, idx = jax.lax.top_k(logits_shard, k)
        my = jax.lax.axis_index(MODEL_AXIS)
        gidx = idx + my * shard_A
        # gather candidates from every shard: (n, B, k)
        all_vals = jax.lax.all_gather(vals, MODEL_AXIS)
        all_idx = jax.lax.all_gather(gidx, MODEL_AXIS)
        cat_vals = jnp.moveaxis(all_vals, 0, 1).reshape(vals.shape[0], -1)
        cat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(vals.shape[0], -1)
        g_vals, g_pos = jax.lax.top_k(cat_vals, k)
        g_idx = jnp.take_along_axis(cat_idx, g_pos, axis=1)
        return g_vals, g_idx

    batch_spec = data_axis  # None = replicated batch, or "data" for DP
    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=P(batch_spec, MODEL_AXIS),
        out_specs=(P(batch_spec), P(batch_spec)),
    )(logits)


def sharded_softmax_ce(
    logits: jax.Array, labels: jax.Array, mesh: Mesh, data_axis: str | None = None
) -> jax.Array:
    """Per-sample softmax cross-entropy over an action-sharded (B, A) array.

    labels are GLOBAL action ids. Returns (B,) losses.
    """
    n_shards = mesh.shape[MODEL_AXIS]
    A = logits.shape[-1]
    shard_A = A // n_shards
    if A % n_shards:
        raise ValueError(f"action dim {A} not divisible by model axis {n_shards}")

    def local(logits_shard, labels_rep):
        my = jax.lax.axis_index(MODEL_AXIS)
        local_max = jnp.max(logits_shard, axis=-1)
        g_max = jax.lax.pmax(local_max, MODEL_AXIS)  # (B,)
        sum_exp = jnp.sum(jnp.exp(logits_shard - g_max[:, None]), axis=-1)
        g_sum = jax.lax.psum(sum_exp, MODEL_AXIS)
        lse = g_max + jnp.log(g_sum)
        # label logit: owned by exactly one shard; psum the masked gather
        loc_label = labels_rep - my * shard_A
        in_range = (loc_label >= 0) & (loc_label < shard_A)
        safe = jnp.clip(loc_label, 0, shard_A - 1)
        picked = jnp.take_along_axis(logits_shard, safe[:, None], axis=1).squeeze(1)
        label_logit = jax.lax.psum(jnp.where(in_range, picked, 0.0), MODEL_AXIS)
        return lse - label_logit

    batch_spec = data_axis
    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(batch_spec, MODEL_AXIS), P(batch_spec)),
        out_specs=P(batch_spec),
    )(logits, labels)


def sharded_embedding_lookup(
    table: jax.Array, ids: jax.Array, mesh: Mesh, data_axis: str | None = None
) -> jax.Array:
    """Row-sharded embedding lookup: each shard owns rows
    [my * V/n, (my+1) * V/n); out-of-shard ids contribute zero and a psum
    assembles the full vectors. The table must be padded to a multiple of
    the model-axis size."""
    n_shards = mesh.shape[MODEL_AXIS]
    V = table.shape[0]
    shard_V = V // n_shards
    if V % n_shards:
        raise ValueError(f"vocab {V} not divisible by model axis {n_shards}")

    def local(table_shard, ids_rep):
        my = jax.lax.axis_index(MODEL_AXIS)
        loc = ids_rep - my * shard_V
        in_range = (loc >= 0) & (loc < shard_V)
        safe = jnp.clip(loc, 0, shard_V - 1)
        vecs = table_shard[safe]  # (..., E)
        vecs = jnp.where(in_range[..., None], vecs, 0.0)
        return jax.lax.psum(vecs, MODEL_AXIS)

    batch_spec = data_axis
    nd = ids.ndim
    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(MODEL_AXIS, None), P(*([batch_spec] + [None] * (nd - 1)))),
        out_specs=P(*([batch_spec] + [None] * nd)),
    )(table, ids)
