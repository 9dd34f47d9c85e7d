"""Lazy (sparse-row) Adam for the embedding table.

Dense Adam touches every (V, E) row of params + m + v every step — at large
catalogs that is the dominant HBM traffic of the whole train step, yet a
batch only gathers B*T rows. Lazy Adam (the standard production embedding
optimizer, cf. TF LazyAdamOptimizer / torch SparseAdam) updates only the
rows referenced this step:

- the embedding gather happens OUTSIDE the autodiff boundary, so the
  cotangent arrives as per-position rows (B*T, E) instead of a dense (V, E)
  scatter-add;
- duplicate ids within the batch are merged by sort + segment-sum (exact:
  the summed gradient equals the dense row gradient);
- m/v/param rows for the touched ids are gathered, Adam-updated with global
  step-count bias correction, and scattered back with ``mode="drop"`` on a
  sentinel id for duplicate slots (and the frozen pad row).

SEMANTICS NOTE: this is NOT bit-identical to dense Adam — momentum/variance
decay is applied to a row only when it is touched (that is the "lazy" in
lazy Adam). The reference trains with dense torch Adam; lazy is an opt-in
(``TrainConfig.optimizer = "lazy_adam"``).

PERFORMANCE NOTE (measured on the attached v5e): each sparse gather/scatter
is LATENCY-bound (~25-30us regardless of row count) while XLA fuses the
dense update into one streaming pass, so at the reference's 70k catalog the
dense path wins; the sparse path's constant cost only pays off where the
dense traffic (7 x table bytes per step) clearly exceeds ~6 such ops —
multi-million-row tables and/or model-sharded settings. Measurements on the
shared-tunnel chip are too noisy to certify a crossover; default stays
"adam" everywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EmbAdamState:
    # m and v packed side by side as (V, 2E): the sparse row updates are
    # LATENCY-bound (each gather/scatter costs ~25-30us on this TPU
    # regardless of row count), so one packed moment buffer halves the
    # gather/scatter count vs separate m and v arrays.
    mv: jax.Array  # (V, 2E) = [m | v]

    @property
    def m(self) -> jax.Array:
        E = self.mv.shape[1] // 2
        return self.mv[:, :E]

    @property
    def v(self) -> jax.Array:
        E = self.mv.shape[1] // 2
        return self.mv[:, E:]


def init_emb_adam(embedding: jax.Array, mv_dtype=None) -> EmbAdamState:
    """``mv_dtype`` (config ``optimizer_mv_dtype``) stores the moment buffer
    in a reduced dtype; the update math always runs fp32 (the update casts
    mv rows to fp32 and back — see emb_row_adam_update)."""
    V, E = embedding.shape
    return EmbAdamState(mv=jnp.zeros((V, 2 * E), mv_dtype or embedding.dtype))


def dedupe_row_grads(
    ids: jax.Array, grads: jax.Array, sentinel: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge duplicate ids: returns (upd_ids, upd_grads) of the same static
    length where each unique id appears exactly once with its summed grad
    and every duplicate slot carries ``sentinel`` (to be dropped)."""
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    g = grads[order]
    new_seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (sid[1:] != sid[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(new_seg)  # segment index per sorted position
    gsum = jax.ops.segment_sum(g, seg, num_segments=n)  # (n, E)
    first = new_seg.astype(bool).at[0].set(True)
    upd_ids = jnp.where(first, sid, sentinel)
    upd_grads = gsum[seg]  # first slot of each segment sees the full sum
    return upd_ids, upd_grads


def emb_adam_update(
    embedding: jax.Array,  # (V, E)
    state: EmbAdamState,
    ids: jax.Array,  # (N,) int32 — rows touched this step (duplicates ok)
    row_grads: jax.Array,  # (N, E) — dL/d(gathered rows)
    step: jax.Array,  # int32 global step (0-based; bias corr uses step+1)
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    frozen_row: Optional[int] = None,
    selected: Optional[jax.Array] = None,  # scalar bool; False -> identity
) -> Tuple[jax.Array, EmbAdamState]:
    V = embedding.shape[0]
    ids = ids.reshape(-1).astype(jnp.int32)
    row_grads = row_grads.reshape(ids.shape[0], -1).astype(jnp.float32)

    upd_ids, g = dedupe_row_grads(ids, row_grads, sentinel=V)
    if frozen_row is not None:
        upd_ids = jnp.where(upd_ids == frozen_row, V, upd_ids)
    gid = jnp.minimum(upd_ids, V - 1)  # safe gather; drops happen at scatter

    E = embedding.shape[1]
    mv_rows = state.mv[gid].astype(jnp.float32)  # (n, 2E), math in fp32
    p_rows = embedding[gid].astype(jnp.float32)

    m_new = b1 * mv_rows[:, :E] + (1.0 - b1) * g
    v_new = b2 * mv_rows[:, E:] + (1.0 - b2) * g * g
    t = (step + 1).astype(jnp.float32)
    m_hat = m_new / (1.0 - b1**t)
    v_hat = v_new / (1.0 - b2**t)
    p_new = p_rows - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    if selected is not None:
        # double-Q predication: identity writes for the unselected net (the
        # big buffers must stay out of the cond — see qhead_col_adam_update)
        p_new = jnp.where(selected, p_new, p_rows)
        m_new = jnp.where(selected, m_new, mv_rows[:, :E])
        v_new = jnp.where(selected, v_new, mv_rows[:, E:])

    emb2 = embedding.at[upd_ids].set(p_new.astype(embedding.dtype), mode="drop")
    mv2 = state.mv.at[upd_ids].set(
        jnp.concatenate([m_new, v_new], axis=1).astype(state.mv.dtype),
        mode="drop",
    )
    return emb2, EmbAdamState(mv=mv2)


# ---------------------------------------------------------------------------
# Lazy-column Q-head Adam, stored ACTION-MAJOR (the transpose of the row
# treatment, laid out so the sparse updates ARE row updates)
# ---------------------------------------------------------------------------
#
# The Q-head TD gradient touches only the B batch-action columns of the
# (K, F, A) kernel — dW is 99.6% zeros at the RetailRocket point — yet dense
# Adam materializes dW (a 933us lane scatter before round 3's one-hot matmul,
# ~414us after) and streams the full (K, F, A) m/v/param arrays (~470us
# measured in isolation; docs/performance.md "Remaining headroom").
#
# Layout is the whole game on this chip (measured, scripts/bench_col_scatter.py
# + the r4 layout hunt in docs/performance.md): column scatters into an
# A-minor buffer are fast only while XLA can pin the buffer in VMEM (hard
# cliff at ~109MB; in a real train step nothing gets pinned) — an
# HBM-resident column scatter of B=256 ids costs ~300-450us per buffer,
# while ROW gathers/scatters of B contiguous rows are ~20-60us wherever the
# buffer lives. So the lazy Q-head state keeps EVERYTHING action-major:
#
#   kernel_am : (A, K*F)        row a = all heads' weight columns for action a
#   bias      : (K, A)          (tiny; 2D trailing-axis scatter is fine)
#   mv        : (A, K*2*(F+1))  packed [m_w, m_b, v_w, v_b] per head
#
# The fused argmax/max kernels read kernel_am directly (action-major block
# specs in ops/fused_argmax.py / ops/fused_topk.py); non-fused consumers
# (toy-scale dense eval, apply_model) transpose on the fly — a
# correctness-only path. Same lazy semantics as the row variant: moment
# decay applies only when a column is touched — opt-in via
# ``TrainConfig.qhead_optimizer``, accuracy-gated e2e in
# tests/test_lazy_qhead.py.


@struct.dataclass
class ColAdamState:
    mv: jax.Array  # (A, K * 2*(F+1)) action-major packed moments


def to_action_major(kernel: jax.Array) -> jax.Array:
    """(K, F, A) or (F, A) canonical head kernel -> (A, K*F) kernel_am."""
    k3 = kernel if kernel.ndim == 3 else kernel[None]
    K, F, A = k3.shape
    return k3.reshape(K * F, A).T.reshape(A, K * F)


def from_action_major(kernel_am: jax.Array, K: int) -> jax.Array:
    """(A, K*F) -> canonical (K, F, A) (or (F, A) when K == 1... callers
    keep the K axis; squeeze at the call site if needed)."""
    A, KF = kernel_am.shape
    F = KF // K
    return kernel_am.T.reshape(K, F, A)


def init_col_adam(kernel_am: jax.Array, K: int, mv_dtype=None) -> ColAdamState:
    """``mv_dtype`` (config ``optimizer_mv_dtype``) stores the moment buffer
    in a reduced dtype; update math stays fp32 (qhead_row_adam_update)."""
    A, KF = kernel_am.shape
    F = KF // K
    return ColAdamState(
        mv=jnp.zeros((A, K * 2 * (F + 1)), mv_dtype or kernel_am.dtype)
    )


def sort_batch_ids(idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(sorted ids, inverse permutation back to batch order)."""
    order = jnp.argsort(idx)
    sids = jnp.take(idx, order)
    inv = jnp.argsort(order)
    return sids, inv


def gather_qhead_rows(
    kernel_am: jax.Array,  # (A, K*F)
    bias: jax.Array,  # (K, A) or (A,)
    ids: jax.Array,  # (n,) action ids (any order)
    K: int,
) -> Tuple[jax.Array, jax.Array]:
    """((n, K, F) weight rows, (K, n) bias entries) at the given actions."""
    b2 = bias if bias.ndim == 2 else bias[None]
    n = ids.shape[0]
    rows = jnp.take(kernel_am, ids, axis=0).reshape(n, K, -1)
    return rows, jnp.take(b2, ids, axis=1)


def q_from_rows(h: jax.Array, rows: jax.Array, b_cols: jax.Array) -> jax.Array:
    """(B, K) Q values: rows (B, K, F) gathered at each example's action."""
    return jnp.einsum("bf,bkf->bk", h, rows) + b_cols.T


def _dedupe_sorted_rowgrads(sids: jax.Array, g: jax.Array) -> jax.Array:
    """Merge duplicate SORTED ids: every slot of an equal-id run receives
    the FULL summed gradient; duplicate scatters then write identical
    values (no sentinel/drop machinery needed). g: (B, C) -> (B, C)."""
    new_seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (sids[1:] != sids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(new_seg)  # (B,)
    gsum = jax.ops.segment_sum(g, seg, num_segments=g.shape[0])
    return gsum[seg]


def qhead_row_adam_update(
    kernel_am: jax.Array,  # (A, K*F)
    bias: jax.Array,  # (K, A) or (A,)
    state: ColAdamState,
    sids: jax.Array,  # (B,) SORTED action ids (duplicates ok)
    g_wrows: jax.Array,  # (B, K, F) dL/d(sorted kernel rows)
    g_bcols: jax.Array,  # (K, B) dL/d(sorted bias entries)
    step: jax.Array,  # int32 count BEFORE this update (bias corr uses +1)
    lr: float,
    *,
    w_rows: Optional[jax.Array] = None,  # pre-gathered (B, K, F) sorted rows
    b_cols: Optional[jax.Array] = None,  # (K, B)
    selected: Optional[jax.Array] = None,  # scalar bool; False -> identity
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, ColAdamState]:
    """``selected``: double-Q predication — the big buffers must stay OUT
    of the double-Q ``lax.cond`` (XLA conditional copy insertion
    materializes full pass-through copies), so the step updates BOTH nets
    outside the cond and the unselected net performs identity writes."""
    squeeze = bias.ndim == 1
    b2_ = bias if bias.ndim == 2 else bias[None]
    A = kernel_am.shape[0]
    B = sids.shape[0]
    K = b2_.shape[0]
    F = kernel_am.shape[1] // K

    # pack [w grads | bias grad] per (row, head): (B, K*(F+1))
    g = jnp.concatenate(
        [g_wrows, g_bcols.T[:, :, None]], axis=2
    ).astype(jnp.float32).reshape(B, K * (F + 1))
    g = _dedupe_sorted_rowgrads(sids, g)

    mv_rows = jnp.take(state.mv, sids, axis=0).astype(jnp.float32)  # (B, 2C)
    C = K * (F + 1)
    m = mv_rows[:, :C]
    v = mv_rows[:, C:]
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * g * g
    t = (step + 1).astype(jnp.float32)
    upd = lr * (m2 / (1.0 - b1**t)) / (jnp.sqrt(v2 / (1.0 - b2**t)) + eps)
    if selected is not None:
        upd = jnp.where(selected, upd, 0.0)
        m2 = jnp.where(selected, m2, m)
        v2 = jnp.where(selected, v2, v)

    if w_rows is None or b_cols is None:
        w_rows, b_cols = gather_qhead_rows(kernel_am, b2_, sids, K)
    upd = upd.reshape(B, K, F + 1)
    new_w_rows = w_rows.astype(jnp.float32) - upd[:, :, :F]
    new_b_cols = b_cols.astype(jnp.float32) - upd[:, :, F].T

    new_kernel = kernel_am.at[sids, :].set(
        new_w_rows.reshape(B, K * F).astype(kernel_am.dtype)
    )
    new_bias = b2_.at[:, sids].set(new_b_cols.astype(b2_.dtype))
    new_mv = state.mv.at[sids, :].set(
        jnp.concatenate([m2, v2], axis=1).astype(state.mv.dtype)
    )
    if squeeze:
        new_bias = new_bias[0]
    return new_kernel, new_bias, ColAdamState(mv=new_mv)
