"""Sharded fused softmax-CE: the flash-CE Pallas kernel under shard_map.

Combines the two large-catalog mechanisms:

- per shard, the head weight columns stream through VMEM with an online
  logsumexp — the (B, A/M) shard logits never materialize in HBM
  (``ops/fused_ce.py``);
- across the ``model`` axis, shard-local logsumexps merge with a
  pmax-stabilized psum and the label logit (owned by exactly one shard)
  psums — the same collective structure as
  ``parallel.topk.sharded_softmax_ce`` but without ever forming logits.

Autodiff structure: the custom VJP sits OUTSIDE shard_map, and the backward
runs its own shard_map — shard_map itself is never transposed, so the
gradients don't depend on replicated-output transpose semantics. Backward
recomputes per-shard logits blockwise with the GLOBAL lse: ``dW``/``db``
stay shard-local, ``dh`` is psummed. Collective payload per step: O(B)
scalars forward, one (B, F) psum backward — independent of A.

Exact semantics: identical to dense CE over -1e9-masked padded logits
(``models.families.mask_pad_logits``) to fp32 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ikea_recommender_tpu.core.mesh import MODEL_AXIS
from ikea_recommender_tpu.ops.fused_ce import _bwd_call, _fwd


def _shard_a(w, mesh: Mesh) -> int:
    n = mesh.shape[MODEL_AXIS]
    A = w.shape[1]
    if A % n:
        raise ValueError(f"action dim {A} not divisible by model axis {n}")
    return A // n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def sharded_fused_softmax_ce(
    h: jax.Array,  # (B, F) — replicated or data-sharded
    w: jax.Array,  # (F, A) — A padded to a multiple of the model axis
    b: jax.Array,  # (A,)
    labels: jax.Array,  # (B,) GLOBAL action ids
    mesh: Mesh,
    valid_dim: int,
    data_axis: str | None = None,
    precision: str = "highest",
) -> jax.Array:
    """Per-sample CE over a column-sharded head without materializing
    logits. Returns (B,) fp32 losses. Differentiable in h, w, b.
    ``precision``: MXU passes of the per-shard kernels (ops/fused_ce.py)."""
    loss, _ = _fwd_sharded(h, w, b, labels, mesh, valid_dim, data_axis, precision)
    return loss


def _fwd_sharded(h, w, b, labels, mesh, valid_dim, data_axis, precision):
    shard_a = _shard_a(w, mesh)

    def local(h_l, w_l, b_l, lbl_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        # this shard owns global action columns [my*shard_a, (my+1)*shard_a)
        local_valid = jnp.clip(valid_dim - my * shard_a, 0, shard_a)
        loc_labels = lbl_l.astype(jnp.int32) - my * shard_a  # non-owner: no match
        lse_s, lbl_s = _fwd(h_l, w_l, b_l, loc_labels, local_valid, precision)
        # merge shard logsumexps (a fully-padded shard's lse_s ~ -1e30 -> 0)
        g = jax.lax.pmax(lse_s, MODEL_AXIS)
        lse = g + jnp.log(jax.lax.psum(jnp.exp(lse_s - g), MODEL_AXIS))
        lbl = jax.lax.psum(lbl_s, MODEL_AXIS)
        return lse - lbl, lse

    loss, lse = shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(data_axis, None),
            P(None, MODEL_AXIS),
            P(MODEL_AXIS),
            P(data_axis),
        ),
        out_specs=(P(data_axis), P(data_axis)),
    )(h, w, b, labels)
    return loss, lse


def _vjp_fwd(h, w, b, labels, mesh, valid_dim, data_axis, precision):
    loss, lse = _fwd_sharded(h, w, b, labels, mesh, valid_dim, data_axis, precision)
    return loss, (h, w, b, labels, lse)


def _vjp_bwd(mesh, valid_dim, data_axis, precision, res, ct):
    h, w, b, labels, lse = res
    shard_a = _shard_a(w, mesh)

    def local(h_l, w_l, b_l, lbl_l, lse_l, ct_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        local_valid = jnp.clip(valid_dim - my * shard_a, 0, shard_a)
        loc_labels = lbl_l.astype(jnp.int32) - my * shard_a
        dh_s, dw, db = _bwd_call(
            h_l, w_l, b_l, loc_labels, lse_l, ct_l, local_valid, precision
        )
        if data_axis is not None:
            # each data shard computed only its rows' contribution to the
            # (replicated-over-data) head gradient — sum them. Without this
            # the P(None, MODEL_AXIS) out_spec silently treated the partial
            # dW/db as already replicated across the data axis.
            dw = jax.lax.psum(dw, data_axis)
            db = jax.lax.psum(db, data_axis)
        return jax.lax.psum(dh_s, MODEL_AXIS), dw, db

    dh, dw, db = shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(data_axis, None),
            P(None, MODEL_AXIS),
            P(MODEL_AXIS),
            P(data_axis),
            P(data_axis),
            P(data_axis),
        ),
        out_specs=(P(data_axis, None), P(None, MODEL_AXIS), P(MODEL_AXIS)),
    )(h, w, b, labels, lse, ct)
    return dh.astype(h.dtype), dw.astype(w.dtype), db.astype(b.dtype), None


sharded_fused_softmax_ce.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Combined single-pass CE + top-k over the sharded head (SMORL train path)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def sharded_fused_softmax_ce_topk(
    h: jax.Array,  # (B, F)
    w: jax.Array,  # (F, A_pad) columns sharded on the model axis
    b: jax.Array,  # (A_pad,)
    labels: jax.Array,  # (B,) GLOBAL action ids
    k: int,
    mesh: Mesh,
    valid_dim: int,
    data_axis: str | None = None,
    precision: str = "highest",
):
    """Sharded analog of ``ops.fused_ce.fused_softmax_ce_topk``: ONE
    blockwise pass per shard yields the supervised CE (flash logsumexp +
    label logit, differentiable through the same sharded backward) AND the
    global top-k ids feeding the SMORL online rewards — previously the
    mesh train path ran ``sharded_fused_softmax_ce`` + ``sharded_sup_topk``
    as two full passes over the head (r3 known-gap). Merge payloads stay
    O(B*k) + O(B) scalars. Returns ``(per_example_ce (B,), top_idx (B, k))``;
    the indices are discrete (grad-free consumers by design)."""
    out, _ = _ce_topk_fwd_sharded(
        h, w, b, labels, k, mesh, valid_dim, data_axis, precision
    )
    return out


def _ce_topk_fwd_sharded(h, w, b, labels, k, mesh, valid_dim, data_axis, precision):
    from ikea_recommender_tpu.ops.fused_topk import (
        DEFAULT_BLOCK_COLS,
        blockwise_head_topk_ce,
    )

    shard_a = _shard_a(w, mesh)

    def local(h_l, w_l, b_l, lbl_l):
        my = jax.lax.axis_index(MODEL_AXIS)
        top_v, top_i, m, s, lbl = blockwise_head_topk_ce(
            h_l,
            w_l,
            b_l,
            k,
            valid_dim,
            labels=lbl_l.astype(jnp.int32),
            block_cols=min(DEFAULT_BLOCK_COLS, shard_a),
            col_offset=my * shard_a,
            raw_pieces=True,
            precision=precision,
        )
        # top-k merge (shard-major concat keeps dense tie order —
        # parallel/topk.py:sharded_head_topk_ce)
        all_v = jax.lax.all_gather(top_v, MODEL_AXIS)
        all_i = jax.lax.all_gather(top_i, MODEL_AXIS)
        cat_v = jnp.moveaxis(all_v, 0, 1).reshape(top_v.shape[0], -1)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(top_v.shape[0], -1)
        g_v, pos = jax.lax.top_k(cat_v, k)
        g_i = jnp.take_along_axis(cat_i, pos, axis=1)
        # logsumexp + label-logit merge (sentinel-safe pmax)
        g_m = jax.lax.pmax(m, MODEL_AXIS)
        g_s = jax.lax.psum(s * jnp.exp(m - g_m), MODEL_AXIS)
        g_lbl = jax.lax.pmax(lbl, MODEL_AXIS)
        lse = g_m + jnp.log(g_s)
        return lse - g_lbl, g_i, lse

    per_ce, top_i, lse = shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(data_axis, None),
            P(None, MODEL_AXIS),
            P(MODEL_AXIS),
            P(data_axis),
        ),
        out_specs=(P(data_axis), P(data_axis), P(data_axis)),
    )(h, w, b, labels)
    return (per_ce, top_i), (h, w, b, labels, lse)


def _ce_topk_vjp_fwd(h, w, b, labels, k, mesh, valid_dim, data_axis, precision):
    return _ce_topk_fwd_sharded(
        h, w, b, labels, k, mesh, valid_dim, data_axis, precision
    )


def _ce_topk_vjp_bwd(k, mesh, valid_dim, data_axis, precision, res, cts):
    # top_idx is int32 — no tangent; reuse the sharded CE backward verbatim
    return _vjp_bwd(mesh, valid_dim, data_axis, precision, res, cts[0])


sharded_fused_softmax_ce_topk.defvjp(_ce_topk_vjp_fwd, _ce_topk_vjp_bwd)
