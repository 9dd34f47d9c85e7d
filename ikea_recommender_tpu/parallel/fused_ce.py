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
