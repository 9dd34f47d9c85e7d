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


def init_emb_adam(embedding: jax.Array) -> EmbAdamState:
    V, E = embedding.shape
    return EmbAdamState(mv=jnp.zeros((V, 2 * E), embedding.dtype))


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
    mv_rows = state.mv[gid]  # (n, 2E)
    p_rows = embedding[gid]

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
# Lazy-COLUMN Adam for the Q heads (the transpose of the row treatment)
# ---------------------------------------------------------------------------
#
# The Q-head TD gradient touches only the B batch-action columns of the
# (K, F, A) kernel — dW is 99.6% zeros at the RetailRocket point — yet dense
# Adam materializes dW (a 933us lane scatter before round 3's one-hot matmul,
# ~414us after) and streams the full (K, F, A) m/v/param arrays (~470us
# measured in isolation; docs/performance.md "Remaining headroom").
#
# The lazy-column path never forms a dense dW: the step gathers the SORTED
# action columns outside autodiff (sorted minor-axis gathers are ~10x
# cheaper than unsorted on this chip — scripts/bench_col_scatter.py), the
# cotangent arrives as per-slot columns (K, F, B), duplicates are merged by
# segment-sum over the sorted runs, and only the touched columns' param +
# moment slices move (~20us scatters). Same lazy semantics as the row
# variant: moment decay applies only when a column is touched (untouched
# columns' params also hold still, where dense Adam lets them ring down
# under momentum) — opt-in via ``TrainConfig.qhead_optimizer``, accuracy-
# gated e2e in tests/test_lazy_qhead.py.


@struct.dataclass
class ColAdamState:
    # (A, K * 2*(F+1)) — ACTION-MAJOR: row a holds head k's packed
    # [m_w (F), m_b, v_w (F), v_b] for its column. Row gathers/scatters of
    # B contiguous ~KB rows stay fast wherever the buffer lives (HBM row
    # writes are sequential); every minor-axis (column) layout measured
    # either VMEM-dependent or relayout-copy pathologies (see
    # scripts/bench_col_scatter.py + the r4 cliff notes in
    # docs/performance.md). ONE gather + ONE scatter per step covers both
    # moments of kernel and bias together.
    mv: jax.Array


def init_col_adam(kernel: jax.Array, bias: jax.Array) -> ColAdamState:
    """kernel (K, F, A) or (F, A); bias (K, A) or (A,)."""
    k3 = kernel if kernel.ndim == 3 else kernel[None]
    K, F, A = k3.shape
    return ColAdamState(mv=jnp.zeros((A, K * 2 * (F + 1)), k3.dtype))


def sort_batch_ids(idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(sorted ids, inverse permutation back to batch order)."""
    order = jnp.argsort(idx)
    sids = jnp.take(idx, order)
    inv = jnp.argsort(order)
    return sids, inv


def _take_cols2d(arr3: jax.Array, ids: jax.Array) -> jax.Array:
    """(K, C, A) -> (K, C, n) column gather THROUGH A 2D VIEW.

    jnp's 3D mixed indexing (``arr[:, :, ids]`` / ``.at[:, :, ids]``) makes
    XLA materialize transpose copies of the full operand around the
    gather/scatter (measured: 2 x full-buffer copies per op at the
    (K, 130, 70852) moment buffer — hundreds of us). The contiguous
    (K*C, A) reshape is free and the 2D trailing-axis form lowers to a
    clean in-place gather/scatter."""
    K, C, A = arr3.shape
    return jnp.take(arr3.reshape(K * C, A), ids, axis=1).reshape(K, C, -1)


def _set_cols2d(arr3: jax.Array, ids: jax.Array, vals3: jax.Array) -> jax.Array:
    """(K, C, A).at[:, :, ids].set(vals) through the 2D view (see
    ``_take_cols2d``)."""
    K, C, A = arr3.shape
    flat = arr3.reshape(K * C, A).at[:, ids].set(vals3.reshape(K * C, -1))
    return flat.reshape(K, C, A)


def gather_qhead_cols(
    kernel: jax.Array, bias: jax.Array, sids: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """SORTED action columns of the head: ((K, F, B), (K, B))."""
    k3 = kernel if kernel.ndim == 3 else kernel[None]
    b2 = bias if bias.ndim == 2 else bias[None]
    return _take_cols2d(k3, sids), jnp.take(b2, sids, axis=1)


def _dedupe_sorted_colgrads(sids: jax.Array, g: jax.Array) -> jax.Array:
    """Merge duplicate SORTED ids: every slot of an equal-id run receives
    the FULL summed gradient (K, C, B) -> (K, C, B). Duplicate scatters
    then write identical values — no sentinel/drop machinery needed."""
    K, C, B = g.shape
    new_seg = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (sids[1:] != sids[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(new_seg)  # (B,)
    gsum = jax.ops.segment_sum(
        g.reshape(K * C, B).T, seg, num_segments=B
    )  # (B, K*C)
    return gsum[seg].T.reshape(K, C, B)


def _col_adam_math(
    mv_cols: jax.Array,  # (K, 2(F+1), B) gathered moment columns
    g: jax.Array,  # (K, F+1, B) dedupe-summed [kernel|bias] column grads
    step: jax.Array,
    lr: float,
    b1: float,
    b2: float,
    eps: float,
) -> Tuple[jax.Array, jax.Array]:
    """-> (param update (K, F+1, B), new packed moments (K, 2(F+1), B))."""
    C = g.shape[1]
    m = mv_cols[:, :C].astype(jnp.float32)
    v = mv_cols[:, C:].astype(jnp.float32)
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * g * g
    t = (step + 1).astype(jnp.float32)
    upd = lr * (m2 / (1.0 - b1**t)) / (jnp.sqrt(v2 / (1.0 - b2**t)) + eps)
    return upd, jnp.concatenate([m2, v2], axis=1)


def qhead_col_adam_update(
    kernel: jax.Array,  # (K, F, A) or (F, A)
    bias: jax.Array,  # (K, A) or (A,)
    state: ColAdamState,
    sids: jax.Array,  # (B,) SORTED action ids (duplicates ok)
    g_wcols: jax.Array,  # (K, F, B) dL/d(sorted kernel columns)
    g_bcols: jax.Array,  # (K, B) dL/d(sorted bias entries)
    step: jax.Array,  # int32 global step (0-based; bias corr uses step+1)
    lr: float,
    *,
    w_cols: Optional[jax.Array] = None,  # pre-gathered sorted cols (reuse
    b_cols: Optional[jax.Array] = None,  # the forward's gather)
    selected: Optional[jax.Array] = None,  # scalar bool; False -> identity
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, ColAdamState]:
    """``selected``: double-Q predication. The (K, F, A)-class buffers must
    NOT flow through the double-Q ``lax.cond`` — XLA's conditional copy
    insertion materializes full copies of every large buffer a branch
    passes through (measured ~220us/step of pure copies at the RetailRocket
    SMORL point). Instead the step updates BOTH nets' columns outside the
    cond, with the unselected net's scatter writing back its own gathered
    values (an identity write of B columns, ~20us)."""
    squeeze = kernel.ndim == 2
    k3 = kernel if not squeeze else kernel[None]
    bs = bias if bias.ndim == 2 else bias[None]
    K, F, A = k3.shape

    g = jnp.concatenate(
        [g_wcols, g_bcols[:, None, :]], axis=1
    ).astype(jnp.float32)  # (K, F+1, B)
    g = _dedupe_sorted_colgrads(sids, g)
    B = sids.shape[0]
    mv_cols = (
        jnp.take(state.mv, sids, axis=0)  # (B, K*2(F+1)) contiguous rows
        .reshape(B, K, 2 * (F + 1))
        .transpose(1, 2, 0)
    )
    upd, mv2 = _col_adam_math(mv_cols, g, step, lr, b1, b2, eps)
    if selected is not None:
        upd = jnp.where(selected, upd, 0.0)
        mv2 = jnp.where(selected, mv2, mv_cols)

    if w_cols is None or b_cols is None:
        w_cols, b_cols = gather_qhead_cols(k3, bs, sids)
    new_w_cols = w_cols.astype(jnp.float32) - upd[:, :F]
    new_b_cols = b_cols.astype(jnp.float32) - upd[:, F]

    new_kernel = _set_cols2d(k3, sids, new_w_cols.astype(k3.dtype))
    new_bias = bs.at[:, sids].set(new_b_cols.astype(bs.dtype))
    new_mv = state.mv.at[sids, :].set(
        mv2.transpose(2, 0, 1).reshape(B, K * 2 * (F + 1)).astype(state.mv.dtype)
    )
    if squeeze:
        new_kernel = new_kernel[0]
    if bias.ndim == 1:
        new_bias = new_bias[0]
    return new_kernel, new_bias, ColAdamState(mv=new_mv)


def sarm_qhead_update(
    kernel: jax.Array,  # (K, F, A) full SARM head stack
    bias: jax.Array,  # (K, A)
    new_k0: jax.Array,  # (F, A) head 0 after its DENSE Adam update (the CE
    new_b0: jax.Array,  # (A,)   gradient is dense over all columns)
    state: ColAdamState,  # moments for heads 1..K-1: ((K-1), 2(F+1), A)
    sids: jax.Array,  # (B,) SORTED action ids
    g_wcols: jax.Array,  # (K-1, F, B) TD grads of heads 1..K-1 sorted cols
    g_bcols: jax.Array,  # (K-1, B)
    step: jax.Array,
    lr: float,
    *,
    w_cols: Optional[jax.Array] = None,
    b_cols: Optional[jax.Array] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, ColAdamState]:
    """SARM split update: head 0 (supervised CE + TD — dense gradient) is
    Adam-updated densely by the caller; heads 1..K-1 (pure TD — sparse
    column gradient) go through the lazy-column path. One whole-plane write
    installs head 0 and ONE all-head column scatter installs the lazy
    columns (head 0's scatter slots carry its freshly-updated values, so
    the scatter never clobbers the dense update)."""
    K, F, A = kernel.shape
    g = jnp.concatenate(
        [g_wcols, g_bcols[:, None, :]], axis=1
    ).astype(jnp.float32)  # (K-1, F+1, B)
    g = _dedupe_sorted_colgrads(sids, g)
    B = sids.shape[0]
    mv_cols = (
        jnp.take(state.mv, sids, axis=0)
        .reshape(B, K - 1, 2 * (F + 1))
        .transpose(1, 2, 0)
    )
    upd, mv2 = _col_adam_math(mv_cols, g, step, lr, b1, b2, eps)

    if w_cols is None or b_cols is None:
        w_cols, b_cols = gather_qhead_cols(kernel, bias, sids)
        w_cols, b_cols = w_cols[1:], b_cols[1:]
    new_w_cols = w_cols.astype(jnp.float32) - upd[:, :F]
    new_b_cols = b_cols.astype(jnp.float32) - upd[:, F]

    all_w_cols = jnp.concatenate(
        [jnp.take(new_k0, sids, axis=1)[None], new_w_cols.astype(kernel.dtype)],
        axis=0,
    )  # (K, F, B)
    all_b_cols = jnp.concatenate(
        [jnp.take(new_b0, sids)[None], new_b_cols.astype(bias.dtype)], axis=0
    )  # (K, B)
    # head-0 plane write through the 2D view (rows 0..F-1 of (K*F, A)),
    # then ONE all-head column scatter whose head-0 slots carry the fresh
    # dense values — ordering keeps both writes in place.
    flat = kernel.reshape(K * F, A).at[:F, :].set(new_k0)
    flat = flat.at[:, sids].set(all_w_cols.reshape(K * F, -1))
    new_kernel = flat.reshape(K, F, A)
    new_bias = bias.at[0].set(new_b0).at[:, sids].set(all_b_cols)
    new_mv = state.mv.at[sids, :].set(
        mv2.transpose(2, 0, 1).reshape(B, (K - 1) * 2 * (F + 1)).astype(state.mv.dtype)
    )
    return new_kernel, new_bias, ColAdamState(mv=new_mv)
