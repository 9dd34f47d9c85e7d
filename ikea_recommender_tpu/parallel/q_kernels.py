"""Action-sharded Q-head kernels: the fused double-Q target/value ops under
shard_map over the ``model`` axis.

Round 2 turned every fused kernel OFF under a mesh (XLA cannot partition a
Pallas custom call), so SQN/SMORL/SARM fell back to GSPMD-partitioned dense
(B, K, A) logits — the exact traffic the single-chip kernels were built to
kill. These wrappers run the SAME kernels per shard on the head's local
columns and merge with O(B) collectives:

- **sharded argmax** (SQN target action / SMORL weighted target action):
  each shard's Pallas kernel returns its local (max, argmax) — the kernel's
  own fp32 max, so the cross-shard comparison uses the exact kernel values —
  then ``pmax`` + lowest-global-id tie-break reproduces dense ``jnp.argmax``
  exactly (within a shard the kernel tie-breaks low; across shards the
  lower shard owns lower global columns).
- **sharded row logits** (Q(s, a) gather-dots): the owning shard computes
  the O(B*F) gather-dot, others contribute zero, one psum assembles (B,) /
  (B, K). Differentiable — plain jnp under shard_map, the psum transposes
  cleanly; the w/b cotangents stay shard-local.
- **sharded per-head max** (SARM self-bootstrapped targets): per-shard
  blockwise max (ops/fused_topk.py) + ``pmax``.

Collective payload per op: O(B) or O(B*K) scalars — independent of the
catalog size. Reference: single GPU, nothing to mirror (SURVEY.md #35-38).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ikea_recommender_tpu.core.mesh import MODEL_AXIS
from ikea_recommender_tpu.ops.fused_argmax import (
    fused_linear_argmax,
    fused_weighted_multihead_argmax,
    multihead_row_logit,
    row_logit,
)

_INT_MAX = jnp.iinfo(jnp.int32).max


def _shard_cols(A_pad: int, mesh: Mesh) -> int:
    n = mesh.shape[MODEL_AXIS]
    if A_pad % n:
        raise ValueError(f"action dim {A_pad} not divisible by model axis {n}")
    return A_pad // n


def _merge_shard_argmax(m: jax.Array, gidx: jax.Array) -> jax.Array:
    """(per-shard max, per-shard GLOBAL argmax) -> global argmax with dense
    tie-breaking (lowest global id wins across shards)."""
    g_max = jax.lax.pmax(m, MODEL_AXIS)
    cand = jnp.where(m == g_max, gidx, _INT_MAX)
    return jax.lax.pmin(cand, MODEL_AXIS)


def sharded_linear_argmax(
    h: jax.Array,  # (B, F)
    w: jax.Array,  # (F, A_pad), columns sharded on the model axis
    b: jax.Array,  # (A_pad,)
    valid_dim: int,  # REAL catalog size
    mesh: Mesh,
    data_axis: str | None = None,
    precision: str = "highest",
) -> jax.Array:
    """argmax_a (h @ w + b)[:, :valid_dim] over an action-sharded head ->
    (B,) GLOBAL int32 ids. Exact vs the dense argmax incl. tie order.
    NOT differentiable (stop_gradient inside, like fused_linear_argmax)."""
    shard_a = _shard_cols(w.shape[1], mesh)

    def local(h_l, w_l, b_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        local_valid = jnp.clip(valid_dim - my * shard_a, 0, shard_a)
        idx, m = fused_linear_argmax(
            h_l, w_l, b_l, local_valid, precision, with_max=True
        )
        return _merge_shard_argmax(m, idx + my * shard_a)

    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(data_axis, None), P(None, MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=P(data_axis),
    )(jax.lax.stop_gradient(h), jax.lax.stop_gradient(w), jax.lax.stop_gradient(b))


def sharded_weighted_multihead_argmax(
    h: jax.Array,  # (B, F)
    w: jax.Array,  # (K, F, A_pad), last dim sharded on the model axis
    b: jax.Array,  # (K, A_pad)
    q_weights: jax.Array,  # (K,)
    valid_dim: int,
    mesh: Mesh,
    data_axis: str | None = None,
    precision: str = "highest",
) -> jax.Array:
    """SMORL scalarized target action over an action-sharded multihead:
    argmax_a sum_k q_weights[k] * (h @ w[:,k,:] + b[k]) -> (B,) GLOBAL ids.
    NOT differentiable."""
    shard_a = _shard_cols(w.shape[2], mesh)

    def local(h_l, w_l, b_l, qw_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        local_valid = jnp.clip(valid_dim - my * shard_a, 0, shard_a)
        idx, m = fused_weighted_multihead_argmax(
            h_l, w_l, b_l, qw_l, local_valid, precision, with_max=True
        )
        return _merge_shard_argmax(m, idx + my * shard_a)

    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(data_axis, None),
            P(None, None, MODEL_AXIS),
            P(None, MODEL_AXIS),
            P(),
        ),
        out_specs=P(data_axis),
    )(
        jax.lax.stop_gradient(h),
        jax.lax.stop_gradient(w),
        jax.lax.stop_gradient(b),
        jnp.asarray(q_weights, jnp.float32),
    )


def sharded_row_logit(
    h: jax.Array,  # (B, F)
    w: jax.Array,  # (F, A_pad), columns sharded
    b: jax.Array,  # (A_pad,)
    idx: jax.Array,  # (B,) GLOBAL action ids
    mesh: Mesh,
    data_axis: str | None = None,
) -> jax.Array:
    """(h @ w + b)[i, idx[i]] over an action-sharded head -> (B,).
    The owning shard gather-dots its local columns; one psum assembles.
    Differentiable in h, w, b (w/b cotangents stay shard-local; dh psums
    through the transpose)."""
    shard_a = _shard_cols(w.shape[1], mesh)

    def local(h_l, w_l, b_l, idx_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        loc = idx_l.astype(jnp.int32) - my * shard_a
        in_range = (loc >= 0) & (loc < shard_a)
        safe = jnp.where(in_range, loc, 0)
        vals = row_logit(h_l, w_l, b_l, safe)
        return jax.lax.psum(jnp.where(in_range, vals, 0.0), MODEL_AXIS)

    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(data_axis, None),
            P(None, MODEL_AXIS),
            P(MODEL_AXIS),
            P(data_axis),
        ),
        out_specs=P(data_axis),
    )(h, w, b, idx)


def sharded_multihead_row_logit(
    h: jax.Array,  # (B, F)
    w: jax.Array,  # (K, F, A_pad), last dim sharded
    b: jax.Array,  # (K, A_pad)
    idx: jax.Array,  # (B,) GLOBAL ids
    mesh: Mesh,
    data_axis: str | None = None,
) -> jax.Array:
    """Per-head gathered logits over an action-sharded multihead -> (B, K).
    Differentiable (the lean ``gather_from_3d`` under sharding)."""
    shard_a = _shard_cols(w.shape[2], mesh)

    def local(h_l, w_l, b_l, idx_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        loc = idx_l.astype(jnp.int32) - my * shard_a
        in_range = (loc >= 0) & (loc < shard_a)
        safe = jnp.where(in_range, loc, 0)
        vals = multihead_row_logit(h_l, w_l, b_l, safe)  # (B, K)
        return jax.lax.psum(
            jnp.where(in_range[:, None], vals, 0.0), MODEL_AXIS
        )

    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(data_axis, None),
            P(None, None, MODEL_AXIS),
            P(None, MODEL_AXIS),
            P(data_axis),
        ),
        out_specs=P(data_axis),
    )(h, w, b, idx)


def sharded_multihead_max(
    h: jax.Array,  # (B, F)
    w: jax.Array,  # (K, F, A_pad), last dim sharded
    b: jax.Array,  # (K, A_pad)
    valid_dim: int,
    mesh: Mesh,
    data_axis: str | None = None,
    precision: Optional[str] = None,
) -> jax.Array:
    """Per-head max over an action-sharded multihead -> (B, K) — SARM's
    self-bootstrapped targets. Per-shard blockwise max + pmax.
    NOT differentiable (targets sit under stop_gradient)."""
    from ikea_recommender_tpu.ops.fused_topk import blockwise_multihead_max

    shard_a = _shard_cols(w.shape[2], mesh)

    def local(h_l, w_l, b_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        local_valid = jnp.clip(valid_dim - my * shard_a, 0, shard_a)
        m = blockwise_multihead_max(
            h_l, w_l, b_l, local_valid, precision=precision
        )
        return jax.lax.pmax(m, MODEL_AXIS)

    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(data_axis, None),
            P(None, None, MODEL_AXIS),
            P(None, MODEL_AXIS),
        ),
        out_specs=P(data_axis),
    )(
        jax.lax.stop_gradient(h),
        jax.lax.stop_gradient(w),
        jax.lax.stop_gradient(b),
    )


def sharded_sup_topk(
    h: jax.Array,  # (B, F)
    kernel: jax.Array,  # (F, A_pad) sup head, columns sharded
    bias: jax.Array,  # (A_pad,)
    k: int,
    action_dim: int,
    mesh: Mesh,
    data_axis: str | None = None,
) -> jax.Array:
    """Top-k GLOBAL ids of the sup head over sharded columns -> (B, k),
    forward-only (for the SMORL online rewards). Exact vs dense top-k
    (tie order included) — thin wrapper over sharded_head_topk_ce."""
    from ikea_recommender_tpu.parallel.topk import sharded_head_topk_ce

    _, top_i, _ = sharded_head_topk_ce(
        jax.lax.stop_gradient(h),
        jax.lax.stop_gradient(kernel),
        jax.lax.stop_gradient(bias),
        k,
        action_dim,
        mesh,
        labels=None,
        data_axis=data_axis,
    )
    return jax.lax.stop_gradient(top_i)


# ---------------------------------------------------------------------------
# Replicated-kernel data-parallel islands (the lazy action-major Q-head
# path on a mesh).
#
# The lazy optimizer keeps the Q-head ACTION-MAJOR ((A, K*F) kernel_am +
# packed row moments — train/lazy_adam.py) and REPLICATED across the mesh:
# its per-step update touches only the batch's B action rows, so the whole
# data-parallel exchange is the O(B*K*F) cotangent-row all-gather GSPMD
# inserts at the scatter — ~KBs/step instead of the dense path's
# O(A*K*F) gradient all-reduce (SCALING.md's ~25x "sparse-sync" lever).
# XLA cannot partition a Pallas custom call, so the forward max/argmax
# kernels over the full replicated kernel run in a shard_map island that
# splits ONLY the batch rows across the data axis; there is no collective
# in the island at all. The model axis re-runs the same kernel on the same
# rows (cheap: the fused argmax is O(B/D * A * F) bf16 — a few % of the
# step), while the heavy sup-head CE stays action-sharded as before.
# ---------------------------------------------------------------------------


def _dp_island(fn, mesh: Mesh, data_axis: str | None, n_batch: int, n_args: int):
    """shard_map wrapper: the first ``n_batch`` array args are row-sharded
    on the data axis, the remaining ``n_args - n_batch`` replicated; every
    output is row-sharded. No collectives inside."""
    in_specs = tuple(
        P(data_axis) if i < n_batch else P() for i in range(n_args)
    )
    return shard_map(
        fn, mesh=mesh, check_vma=False, in_specs=in_specs,
        out_specs=P(data_axis),
    )


def dp_linear_argmax_am(
    h: jax.Array,  # (B, F)
    kernel_am: jax.Array,  # (A_pad, F) action-major, REPLICATED
    bias: jax.Array,  # (A_pad,) or (1, A_pad)
    valid_dim: int,
    mesh: Mesh,
    data_axis: str | None = None,
    precision: str = "highest",
) -> jax.Array:
    """fused_linear_argmax over the replicated action-major single head,
    batch split on the data axis (SQN lazy target action). NOT diff."""
    from ikea_recommender_tpu.ops.fused_argmax import fused_linear_argmax

    def local(h_l, k_l, b_l):
        return fused_linear_argmax(
            h_l, k_l, b_l, valid_dim, precision, action_major=True
        )

    return _dp_island(local, mesh, data_axis, 1, 3)(
        jax.lax.stop_gradient(h),
        jax.lax.stop_gradient(kernel_am),
        jax.lax.stop_gradient(bias),
    )


def dp_weighted_multihead_argmax_am(
    h: jax.Array,  # (B, F)
    kernel_am: jax.Array,  # (A_pad, K*F) action-major, REPLICATED
    bias: jax.Array,  # (K, A_pad)
    q_weights: jax.Array,  # (K,)
    valid_dim: int,
    mesh: Mesh,
    data_axis: str | None = None,
    precision: str = "highest",
) -> jax.Array:
    """SMORL scalarized target action over the replicated action-major
    multihead, batch split on the data axis. NOT differentiable."""
    from ikea_recommender_tpu.ops.fused_argmax import (
        fused_weighted_multihead_argmax,
    )

    def local(h_l, k_l, b_l, qw_l):
        return fused_weighted_multihead_argmax(
            h_l, k_l, b_l, qw_l, valid_dim, precision, action_major=True
        )

    return _dp_island(local, mesh, data_axis, 1, 4)(
        jax.lax.stop_gradient(h),
        jax.lax.stop_gradient(kernel_am),
        jax.lax.stop_gradient(bias),
        jnp.asarray(q_weights, jnp.float32),
    )
