"""Fused head + top-k + softmax-CE over column blocks — evaluation and
serving never materialize the (B, A) logits.

The reference's eval hotspot forwards the full logits then host-topks them
(``evaluate/eval_protocol.py:173-233``); the round-1 port kept dense logits
on device, which at the IKEA operating point (val batch 5000, A=70852) is a
1.4GB fp32 tensor per scan step and does not fit at all at the 10^6-catalog
scale the sharded kernels target. Here one ``lax.scan`` over W-column blocks
of the head computes, per sample:

- running top-k (flash-style merge: concat the carry with the block's local
  top-k, re-top-k — exact, and tie-breaking matches a dense
  ``lax.top_k`` because earlier blocks sit first in the concat);
- running logsumexp (max-rescaled accumulation);
- the label logit (for per-sample CE).

Peak memory is O(B * W) instead of O(B * A); each block is one
(B, F) x (F, W) MXU matmul with the same dot contract as
``models/heads.py:linear_apply``, so per-element logits are bit-identical
to the dense path and every index-derived metric (HR/NDCG/coverage/
repetitions/rewards) is EXACTLY equal. Only the CE differs by float
accumulation order (~1e-6).

Every metric kernel the eval protocol needs consumes the (B, k) top-k ids,
so this one scan replaces the whole dense forward (see
``eval/protocol.py``'s fused path and ``run/serve.py``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.models.gru import matmul_precision

# Masked (padded / not-yet-seen) logit sentinel. Finite so the running-max
# rescale exp(m_old - m_new) never sees inf - inf.
_NEG = -1e30

# Default column-block width: 5000-row eval batches make (B, W) fp32 blocks
# of ~80MB — far under the dense 1.4GB at A=70852 and big enough to keep the
# MXU busy.
DEFAULT_BLOCK_COLS = 4096


_EVAL_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _head_logits_block(h, kernel_blk, bias_blk, precision=None):
    """Same contract as models/heads.py:linear_apply. With precision=None
    (the default everywhere) logits are bit-identical to the dense path;
    a named precision trades exactness for MXU passes (eval_precision)."""
    prec = (
        matmul_precision(h.dtype)
        if precision is None
        else _EVAL_PRECISIONS[precision]
    )
    return (
        jnp.dot(
            h,
            kernel_blk,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        + bias_blk
    )


def blockwise_head_topk_ce(
    h: jax.Array,  # (B, F) backbone features
    kernel: jax.Array,  # (F, A_pad) head weights (may carry padded columns)
    bias: jax.Array,  # (A_pad,)
    k: int,
    action_dim: int,  # REAL catalog size; cols >= action_dim are masked
    labels: Optional[jax.Array] = None,  # (B,) global action ids, for CE
    block_cols: int = DEFAULT_BLOCK_COLS,
    col_offset: jax.Array | int = 0,  # global id of kernel column 0
    raw_pieces: bool = False,  # return (top_v, top_i, max, sumexp, label_logit)
    precision: Optional[str] = None,  # None = dense-bit-parity (HIGHEST@fp32)
) -> Tuple[jax.Array, ...]:
    """-> (top_vals (B, k), top_idx (B, k), per_sample_ce (B,) or None).

    Exact top-k (values, indices, tie order) vs dense ``lax.top_k`` over
    ``mask_pad_logits``-masked logits; CE matches
    ``optax.softmax_cross_entropy_with_integer_labels`` to accumulation
    order. ``col_offset`` lets an action-sharded caller (shard_map over the
    model axis) run this on its local kernel slice with GLOBAL ids/masking;
    the per-shard (top, max, sumexp, label-logit) pieces then merge exactly
    (parallel/topk.py:sharded_head_topk_ce).
    """
    B, F = h.shape
    A_pad = kernel.shape[1]
    block_cols = min(block_cols, A_pad)
    # k may exceed block_cols (or even A_pad, for one shard of a sharded
    # head): each block contributes min(k, block_cols) candidates into the
    # k-wide carry; unfilled slots keep the -1e30 sentinel (id 0) and lose
    # every later merge. Callers need k <= GLOBAL action_dim for the final
    # top-k to be fully real.
    k_blk = min(k, block_cols)
    n_blocks = -(-A_pad // block_cols)
    pad_to = n_blocks * block_cols
    if pad_to != A_pad:
        # internal block padding: masked below via the LOCAL column bound
        # (the global action_dim test alone is wrong under a shard offset)
        kernel = jnp.pad(kernel, ((0, 0), (0, pad_to - A_pad)))
        bias = jnp.pad(bias, (0, pad_to - A_pad))

    h32 = h.astype(h.dtype)  # keep caller's compute dtype for the matmul
    want_ce = labels is not None
    if not want_ce:
        labels = jnp.zeros((B,), jnp.int32)

    init = (
        jnp.full((B, k), _NEG, jnp.float32),  # top values
        jnp.zeros((B, k), jnp.int32),  # top ids
        jnp.full((B,), _NEG, jnp.float32),  # running max
        jnp.zeros((B,), jnp.float32),  # running sum of exp
        jnp.full((B,), _NEG, jnp.float32),  # label logit
    )

    def body(carry, j):
        top_v, top_i, m, s, lbl = carry
        start = j * block_cols
        kb = jax.lax.dynamic_slice(kernel, (0, start), (F, block_cols))
        bb = jax.lax.dynamic_slice(bias, (start,), (block_cols,))
        logits = _head_logits_block(h32, kb, bb, precision)  # (B, W) f32
        local_cols = start + jnp.arange(block_cols, dtype=jnp.int32)
        cols = col_offset + local_cols
        ok = (cols < action_dim) & (local_cols < A_pad)
        logits = jnp.where(ok[None, :], logits, _NEG)

        # exact running top-k: earlier blocks first in the concat, so equal
        # values resolve to the lower global index like dense top_k
        bv, bi = jax.lax.top_k(logits, k_blk)
        cat_v = jnp.concatenate([top_v, bv], axis=1)
        cat_i = jnp.concatenate([top_i, cols[bi]], axis=1)
        nv, pos = jax.lax.top_k(cat_v, k)
        ni = jnp.take_along_axis(cat_i, pos, axis=1)

        # flash-style logsumexp accumulation
        bm = jnp.max(logits, axis=1)
        new_m = jnp.maximum(m, bm)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=1
        )

        loc = labels - (col_offset + start)
        in_blk = (loc >= 0) & (loc < block_cols)
        safe = jnp.clip(loc, 0, block_cols - 1)
        picked = jnp.take_along_axis(logits, safe[:, None], axis=1)[:, 0]
        lbl = jnp.where(in_blk, picked, lbl)
        return (nv, ni, new_m, s, lbl), None

    (top_v, top_i, m, s, lbl), _ = jax.lax.scan(
        body, init, jnp.arange(n_blocks, dtype=jnp.int32)
    )
    if raw_pieces:
        return top_v, top_i, m, s, lbl
    per_ce = (m + jnp.log(s)) - lbl if want_ce else None
    return top_v, top_i, per_ce


def blockwise_multihead_max(
    h: jax.Array,  # (B, F)
    kernel: jax.Array,  # (K, F, A_pad) stacked head kernel (heads.py layout)
    bias: jax.Array,  # (K, A_pad)
    action_dim: int,
    block_cols: int = DEFAULT_BLOCK_COLS,
    precision: str | None = None,
) -> jax.Array:
    """max_a (h @ kernel[k] + bias[k])[.., :action_dim] per head ->
    (B, K), never materializing (B, K, A). SARM's self-bootstrapped target
    (``max over outs_next``, reference ``sarm.py:143-146``) needs exactly
    this. Forward-only: inputs are stop-gradiented (targets sit under
    stop_gradient in every consumer). ``precision``: "highest"/"high"/
    "default" MXU passes (TrainConfig.head_precision); None = the repo's
    dtype-derived policy (fp32 -> HIGHEST)."""
    prec_map = {
        None: matmul_precision(h.dtype),
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }
    mm_prec = prec_map[precision]
    h, kernel, bias = map(jax.lax.stop_gradient, (h, kernel, bias))
    B, F = h.shape
    K, _, A_pad = kernel.shape
    block_cols = min(block_cols, A_pad)
    n_blocks = -(-A_pad // block_cols)
    pad_to = n_blocks * block_cols
    if pad_to != A_pad:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad_to - A_pad)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_to - A_pad)))

    def body(m, j):
        start = j * block_cols
        cols = start + jnp.arange(block_cols, dtype=jnp.int32)
        ok = (cols < action_dim) & (cols < A_pad)
        outs = []
        for k in range(K):  # K <= 5, static unroll of plain MXU matmuls
            kb = jax.lax.dynamic_slice(
                kernel, (k, 0, start), (1, F, block_cols)
            )[0]
            bb = jax.lax.dynamic_slice(bias, (k, start), (1, block_cols))[0]
            logits = (
                jnp.dot(
                    h, kb, preferred_element_type=jnp.float32,
                    precision=mm_prec,
                )
                + bb
            )
            logits = jnp.where(ok[None, :], logits, _NEG)
            outs.append(jnp.max(logits, axis=1))
        return jnp.maximum(m, jnp.stack(outs, axis=1)), None

    init = jnp.full((B, K), _NEG, jnp.float32)
    m, _ = jax.lax.scan(body, init, jnp.arange(n_blocks, dtype=jnp.int32))
    return m


def blockwise_multihead_max_am(
    h: jax.Array,  # (B, F)
    kernel_am: jax.Array,  # (A_pad, K*F) action-major (train/lazy_adam.py)
    bias: jax.Array,  # (K, A_pad)
    action_dim: int,
    block_cols: int = DEFAULT_BLOCK_COLS,
    precision: str | None = None,
) -> jax.Array:
    """``blockwise_multihead_max`` over the lazy optimizer's action-major
    kernel layout: weight blocks stream as (BLK, K*F) rows with a
    transposed MXU dot — no relayout of the head."""
    prec_map = {
        None: matmul_precision(h.dtype),
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }
    mm_prec = prec_map[precision]
    h, kernel_am, bias = map(jax.lax.stop_gradient, (h, kernel_am, bias))
    B, F = h.shape
    A_pad, KF = kernel_am.shape
    K = KF // F
    block_cols = min(block_cols, A_pad)
    n_blocks = -(-A_pad // block_cols)
    pad_to = n_blocks * block_cols
    if pad_to != A_pad:
        kernel_am = jnp.pad(kernel_am, ((0, pad_to - A_pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad_to - A_pad)))

    dn = (((1,), (1,)), ((), ()))  # contract F with F (rhs transposed)

    def body(m, j):
        start = j * block_cols
        cols = start + jnp.arange(block_cols, dtype=jnp.int32)
        ok = (cols < action_dim) & (cols < A_pad)
        wb = jax.lax.dynamic_slice(
            kernel_am, (start, 0), (block_cols, KF)
        )  # (BLK, K*F)
        outs = []
        for k in range(K):
            logits = (
                jax.lax.dot_general(
                    h, wb[:, k * F:(k + 1) * F], dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=mm_prec,
                )
                + jax.lax.dynamic_slice(bias, (k, start), (1, block_cols))[0]
            )
            logits = jnp.where(ok[None, :], logits, _NEG)
            outs.append(jnp.max(logits, axis=1))
        return jnp.maximum(m, jnp.stack(outs, axis=1)), None

    init = jnp.full((B, K), _NEG, jnp.float32)
    m, _ = jax.lax.scan(body, init, jnp.arange(n_blocks, dtype=jnp.int32))
    return m


def eval_head(params: Dict, model_cfg, head_idx: int) -> Tuple[jax.Array, jax.Array]:
    """(kernel (F, A_pad), bias (A_pad,)) of the head the eval protocol
    scores with (reference ``evaluate/eval_protocol.py:103-120`` selects the
    head from the model's output tuple; here we select its weights so the
    fused path can block over them)."""
    fam = model_cfg.family
    if fam == "sarm":
        mh = params["q_heads"]
        if "kernel0" in mh:  # lazy action-major SARM state (train/lazy_adam)
            if head_idx == 0:
                return mh["kernel0"], mh["bias0"]
            from ikea_recommender_tpu.train.lazy_adam import from_action_major

            krest = from_action_major(
                mh["kernel_am"], mh["bias_rest"].shape[0]
            )
            return krest[head_idx - 1], mh["bias_rest"][head_idx - 1]
        return mh["kernel"][head_idx], mh["bias"][head_idx]
    if head_idx == 0:
        return params["sup_head"]["kernel"], params["sup_head"]["bias"]
    if fam == "sqn" and head_idx == 1:
        return params["q_head"]["kernel"], params["q_head"]["bias"]
    raise ValueError(
        f"fused eval supports single linear heads; family={fam} head_idx={head_idx}"
    )
