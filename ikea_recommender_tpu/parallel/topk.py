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


def sharded_head_topk_ce(
    h: jax.Array,  # (B, F) backbone features
    kernel: jax.Array,  # (F, A_pad) head weights, columns sharded on model
    bias: jax.Array,  # (A_pad,)
    k: int,
    action_dim: int,  # REAL catalog size (A_pad - action_dim columns masked)
    mesh: Mesh,
    labels: jax.Array | None = None,  # (B,) global ids, for per-sample CE
    data_axis: str | None = None,
    block_cols: int | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array | None]:
    """Fused head + top-k + CE over an ACTION-SHARDED head: each shard runs
    the blockwise scan (ops/fused_topk.py) on its local columns — logits
    never materialize, not even per shard — then k candidates + logsumexp
    pieces + the label logit merge across the model axis (payload O(B*k)).

    -> (top_vals (B, k), GLOBAL top_idx (B, k), per_sample_ce (B,) | None).
    Exact top-k vs the dense computation (tie order included); CE exact to
    accumulation order. This is the large-catalog eval/serving path that
    replaces reference ``evaluate/eval_protocol.py:173-233``.
    """
    from ikea_recommender_tpu.ops.fused_topk import (
        DEFAULT_BLOCK_COLS,
        blockwise_head_topk_ce,
    )

    n_shards = mesh.shape[MODEL_AXIS]
    A_pad = kernel.shape[1]
    if A_pad % n_shards:
        raise ValueError(f"action dim {A_pad} not divisible by model axis {n_shards}")
    shard_A = A_pad // n_shards
    want_ce = labels is not None
    if labels is None:
        labels = jnp.zeros((h.shape[0],), jnp.int32)
    blk = min(block_cols or DEFAULT_BLOCK_COLS, shard_A)

    def local(h_l, kernel_l, bias_l, labels_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        top_v, top_i, m, s, lbl = blockwise_head_topk_ce(
            h_l,
            kernel_l,
            bias_l,
            k,
            action_dim,
            labels=labels_l,
            block_cols=blk,
            col_offset=my * shard_A,
            raw_pieces=True,
        )
        # top-k merge: shard-major concat keeps ascending global column
        # order, so ties resolve to the lower global index like dense top_k
        all_v = jax.lax.all_gather(top_v, MODEL_AXIS)  # (n, B, k)
        all_i = jax.lax.all_gather(top_i, MODEL_AXIS)
        cat_v = jnp.moveaxis(all_v, 0, 1).reshape(top_v.shape[0], -1)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(top_v.shape[0], -1)
        g_v, pos = jax.lax.top_k(cat_v, k)
        g_i = jnp.take_along_axis(cat_i, pos, axis=1)
        # logsumexp merge + label logit (owned by exactly one shard; the
        # others carry the -1e30 sentinel, so a pmax recovers it)
        g_m = jax.lax.pmax(m, MODEL_AXIS)
        g_s = jax.lax.psum(s * jnp.exp(m - g_m), MODEL_AXIS)
        g_lbl = jax.lax.pmax(lbl, MODEL_AXIS)
        per_ce = (g_m + jnp.log(g_s)) - g_lbl
        return g_v, g_i, per_ce

    b = data_axis
    g_v, g_i, per_ce = shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(b, None), P(None, MODEL_AXIS), P(MODEL_AXIS), P(b)),
        out_specs=(P(b), P(b), P(b)),
    )(h, kernel, bias, labels)
    return g_v, g_i, (per_ce if want_ce else None)


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
