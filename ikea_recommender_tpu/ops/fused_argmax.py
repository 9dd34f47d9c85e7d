"""Fused linear-head argmax (Pallas): argmax_a (h @ W + b) without
materializing the (B, A) logits.

The double-Q target computation needs only ``argmax_a Q_main(s', a)`` and a
single gathered Q value per row (``train/steps.py``) — yet the straight
implementation materializes (B, A) Q-logits three times per step (72MB each
at the RetailRocket catalog). This kernel streams the head weights through
VMEM in action blocks keeping a running (max, argmax); the gathered Q value
is then an O(B*F) gather-dot (``row_logit``), no kernel needed.

Forward-only by design: targets sit under ``stop_gradient`` in every
consumer. Ties resolve to the LOWEST action id (jnp.argmax convention).

The multi-head variant computes the argmax of the WEIGHTED HEAD SUM —
SMORL's scalarized target action (``get_weighted_q_target`` +
``get_max_action``, reference ``smorl_gru.py:278-295``) — streaming all K
heads' columns per block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ikea_recommender_tpu.ops.fused_ce import _dot

_NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block(A: int, B: int = 256) -> int:
    # Same VMEM budget rule as ops/fused_ce.py:_block — the (B, BLK) logits
    # tile is capped at ~2MB so large batches still fit scoped vmem.
    cap = max(128, (2 * 1024 * 1024 // (4 * max(B, 1))) // 128 * 128)
    for blk in (2048, 1024, 512, 256, 128):
        if blk <= cap and (A % blk == 0 or A > blk):
            return blk
    return 128


def _argmax_kernel(valid_ref, h_ref, w_ref, b_ref, out_ref, max_ref,
                   m_acc, i_acc, *, block: int, prec, am: bool = False):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, _NEG)
        i_acc[:] = jnp.zeros_like(i_acc)

    # w block (F, BLK) canonical, or (BLK, F) action-major (transposed dot)
    logits = _dot(h_ref[:], w_ref[:], prec, transpose_b=am) + b_ref[:]
    col = j * block + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < valid_ref[0, 0], logits, _NEG)

    blk_max = jnp.max(logits, axis=1, keepdims=True)  # (B, 1)
    # lowest-id tie-break within the block (jnp.argmax convention)
    blk_arg = jnp.min(
        jnp.where(logits == blk_max, col, jnp.iinfo(jnp.int32).max),
        axis=1,
        keepdims=True,
    )
    better = blk_max > m_acc[:]  # strict: earlier blocks win ties
    m_acc[:] = jnp.where(better, blk_max, m_acc[:])
    i_acc[:] = jnp.where(better, blk_arg, i_acc[:])

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = i_acc[:]
        max_ref[:] = m_acc[:]


def fused_linear_argmax(h, w, b, valid_dim, precision: str = "highest",
                        with_max: bool = False, action_major: bool = False):
    """argmax over a linear head: (B, F) x (F, A) -> (B,) int32 action ids.

    Identical to ``jnp.argmax(h @ w + b masked to valid_dim, axis=1)``
    including lowest-id tie-breaking. NOT differentiable (use under
    stop_gradient — as all consumers do). ``with_max=True`` additionally
    returns the (B,) max logit — the exact kernel-computed value, which the
    action-sharded merge compares across shards (parallel/q_kernels.py).
    ``action_major=True``: w is the lazy-optimizer (A, F) layout
    (train/lazy_adam.py) — blocks stream as (BLK, F) with a transposed
    MXU dot, no relayout of the 54MB head."""
    # argmax is piecewise-constant: zero tangent everywhere. Stop gradients
    # BEFORE the pallas_call (which has no JVP rule) so callers may pass
    # differentiated params.
    h, w, b = map(jax.lax.stop_gradient, (h, w, b))
    B, F = h.shape
    A = w.shape[0] if action_major else w.shape[1]
    blk = _block(A, B)
    grid = pl.cdiv(A, blk)
    # No w/b padding to a block multiple: the edge tile's unspecified tail
    # values are rejected by the in-kernel ``col < valid_dim`` mask before
    # any reduce (same rationale as ops/fused_ce.py:_fwd).
    kern = functools.partial(
        _argmax_kernel, block=blk, prec=precision, am=action_major
    )
    w_spec = (
        pl.BlockSpec((blk, F), lambda j: (j, 0), memory_space=pltpu.VMEM)
        if action_major
        else pl.BlockSpec((F, blk), lambda j: (0, j), memory_space=pltpu.VMEM)
    )
    out, mx = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, F), lambda j: (0, 0), memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(
        jnp.asarray(valid_dim, jnp.int32).reshape(1, 1),
        h.astype(jnp.float32),
        w,
        b.reshape(1, A),
    )
    out = jax.lax.stop_gradient(out[:, 0])
    if with_max:
        return out, jax.lax.stop_gradient(mx[:, 0])
    return out


def _wargmax_kernel(valid_ref, h_ref, w_ref, b_ref, qw_ref, out_ref, max_ref,
                    m_acc, i_acc, *, block: int, K: int, prec,
                    am: bool = False, F: int = 0):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, _NEG)
        i_acc[:] = jnp.zeros_like(i_acc)

    # w block layout (K, F, BLK), or (BLK, K*F) action-major
    wsum = jnp.zeros((h_ref.shape[0], block), jnp.float32)
    for k in range(K):  # K is tiny (<=5), static unroll
        wk = w_ref[:, k * F:(k + 1) * F] if am else w_ref[k]
        logits_k = _dot(h_ref[:], wk, prec, transpose_b=am) + b_ref[k]
        wsum = wsum + qw_ref[0, k] * logits_k
    col = j * block + jax.lax.broadcasted_iota(jnp.int32, wsum.shape, 1)
    wsum = jnp.where(col < valid_ref[0, 0], wsum, _NEG)

    blk_max = jnp.max(wsum, axis=1, keepdims=True)
    blk_arg = jnp.min(
        jnp.where(wsum == blk_max, col, jnp.iinfo(jnp.int32).max),
        axis=1,
        keepdims=True,
    )
    better = blk_max > m_acc[:]
    m_acc[:] = jnp.where(better, blk_max, m_acc[:])
    i_acc[:] = jnp.where(better, blk_arg, i_acc[:])

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = i_acc[:]
        max_ref[:] = m_acc[:]


def fused_weighted_multihead_argmax(h, w, b, q_weights, valid_dim,
                                    precision: str = "highest",
                                    with_max: bool = False,
                                    action_major: bool = False):
    """SMORL target action: argmax_a sum_k q_weights[k] * (h @ w[:,k,:] + b[k])
    without materializing any (B, K, A) logits.

    w: (K, F, A) stacked head kernel (models/heads.py layout), or the lazy
    optimizer's (A, K*F) action-major layout (``action_major=True``);
    b: (K, A). Returns (B,) int32 (+ the (B,) max weighted sum if
    ``with_max``). NOT differentiable."""
    h, w, b = map(jax.lax.stop_gradient, (h, w, b))  # see fused_linear_argmax
    B, F = h.shape
    K = b.shape[0]
    A = w.shape[0] if action_major else w.shape[2]
    blk = _block(A, B * K)
    grid = pl.cdiv(A, blk)
    # No w/b padding — see fused_linear_argmax.
    kern = functools.partial(
        _wargmax_kernel, block=blk, K=K, prec=precision,
        am=action_major, F=F,
    )
    w_spec = (
        pl.BlockSpec((blk, K * F), lambda j: (j, 0), memory_space=pltpu.VMEM)
        if action_major
        else pl.BlockSpec((K, F, blk), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    )
    out, mx = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, F), lambda j: (0, 0), memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((K, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(
        jnp.asarray(valid_dim, jnp.int32).reshape(1, 1),
        h.astype(jnp.float32),
        w,
        b,
        jnp.asarray(q_weights, jnp.float32).reshape(1, K),
    )
    out = jax.lax.stop_gradient(out[:, 0])
    if with_max:
        return out, jax.lax.stop_gradient(mx[:, 0])
    return out


def _onehot_colgrad(outer, idx, A):
    """dW columns -> dense dW via a one-hot MXU matmul instead of autodiff's
    lane-dim scatter (the scatter of B columns into the (.., A) minor axis
    measured 933µs at B=256/A=70852/K=3 — ~6x this matmul's cost; see
    docs/performance.md). outer: (..., B) fp32 column grads; returns
    (..., A). Exact to fp32 rounding: the one-hot is exactly representable
    in bf16, and the fp32 ``outer`` is split bf16-hi/lo (two single-pass MXU
    dots; the lo term keeps full fp32-level accuracy)."""
    oh = jax.nn.one_hot(idx, A, dtype=jnp.bfloat16)  # (B, A), exact
    hi = outer.astype(jnp.bfloat16)
    r1 = outer - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)  # 3rd split:
    # hi+mid alone is ~16 mantissa bits (1e-5 rel); the scatter this
    # replaces was exact fp32, so keep ~24 bits
    nd = outer.ndim
    dn = (((nd - 1,), (0,)), ((), ()))
    dot = lambda x: jax.lax.dot_general(
        x, oh, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    return dot(hi) + dot(mid) + dot(lo)


def take_cols_sorted(w, idx, axis):
    """``jnp.take(w, idx, axis)`` via sort -> gather -> inverse-permute.

    Minor-axis gathers with UNSORTED ids cost ~126us on this chip at the
    (3, 64, 70852) head (B=256) while the same gather with sorted ids is
    under measurement noise (scripts/bench_col_scatter.py); the argsort of
    256 ids plus the inverse permutation of the small (.., B) result are
    ~free. Exact: a permutation gather composed with its inverse."""
    order = jnp.argsort(idx)
    sids = jnp.take(idx, order)
    inv = jnp.argsort(order)
    return jnp.take(jnp.take(w, sids, axis=axis), inv, axis=axis)


@jax.custom_vjp
def row_logit(h, w, b, idx):
    """One logit per row: (h @ w + b)[i, idx[i]] as an O(B*F) gather-dot —
    no (B, A) matmul. Differentiable in h, w, b; the w gradient runs as a
    one-hot matmul (``_onehot_colgrad``), not autodiff's slow lane scatter."""
    w_cols = take_cols_sorted(w, idx, axis=1)  # (F, B)
    return jnp.einsum("bf,fb->b", h, w_cols) + jnp.take(b, idx)


def _rl_fwd(h, w, b, idx):
    return row_logit(h, w, b, idx), (h, w, b.shape[0], idx)


def _rl_bwd(res, dq):  # dq: (B,)
    h, w, A, idx = res
    w_cols = take_cols_sorted(w, idx, axis=1)  # (F, B)
    dh = jnp.einsum("b,fb->bf", dq, w_cols)
    outer = jnp.einsum("b,bf->fb", dq, h)  # (F, B)
    dw = _onehot_colgrad(outer, idx, A)  # (F, A)
    db = _onehot_colgrad(dq[None, :], idx, A)[0]  # (A,)
    return dh, dw, db, None


row_logit.defvjp(_rl_fwd, _rl_bwd)


@jax.custom_vjp
def multihead_row_logit(h, w, b, idx):
    """One logit per row per head: (B, F) x (K, F, A) -> (B, K) at idx[i]
    (the lean ``gather_from_3d`` — no (B, K, A) materialization).
    Differentiable in h, w, b; w gradient via one-hot matmul (see
    ``row_logit``)."""
    w_cols = take_cols_sorted(w, idx, axis=2)  # (K, F, B)
    return jnp.einsum("bf,kfb->bk", h, w_cols) + jnp.take(b, idx, axis=1).T


def _mrl_fwd(h, w, b, idx):
    return multihead_row_logit(h, w, b, idx), (h, w, b.shape[1], idx)


def _mrl_bwd(res, dq):  # dq: (B, K)
    h, w, A, idx = res
    w_cols = take_cols_sorted(w, idx, axis=2)  # (K, F, B)
    dh = jnp.einsum("bk,kfb->bf", dq, w_cols)
    outer = jnp.einsum("bk,bf->kfb", dq, h)  # (K, F, B)
    dw = _onehot_colgrad(outer, idx, A)  # (K, F, A)
    db = _onehot_colgrad(dq.T, idx, A)  # (K, A)
    return dh, dw, db, None


multihead_row_logit.defvjp(_mrl_fwd, _mrl_bwd)
