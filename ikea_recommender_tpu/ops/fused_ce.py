"""Fused full-catalog softmax cross-entropy (Pallas TPU kernel).

The supervised head's CE over the whole catalog is the HBM-traffic hot spot
of every train step: at the reference's RetailRocket operating point the
(B=256, A=70852) fp32 logits are 72MB, and the unfused path materializes
them several times per step (forward matmul output, softmax read, backward
dlogits, two backward matmul reads). The reference pays the same cost in
cuBLAS + the torch CE kernel (``models/GRU4Rec/model.py:131-158``).

This kernel never writes logits to HBM. It streams the head weight matrix
(F, A) through VMEM in action-dim blocks:

- forward: online (flash-style) logsumexp over blocks + label-logit gather
  by index compare; emits per-example ``lse`` and ``label_logit`` only.
- backward (custom VJP): recomputes each logits block from (h, W_blk) in
  VMEM, forms ``dlogits = (softmax - onehot) * ct`` blockwise, and
  accumulates ``dh`` in VMEM scratch while writing ``dW``/``db`` blocks —
  the only HBM traffic is W read (fwd+bwd) and dW/db written once.

Per-step HBM traffic for the head drops from ~5 logits passes (~360MB) to
~3 W passes (~54MB). Numerics are fp32 and match
``optax.softmax_cross_entropy_with_integer_labels`` to float tolerance.

Padded action columns (``ModelConfig.action_align`` > 1) are masked inside
the kernel (logits -inf, dlogits 0) via the static ``valid_dim``, matching
the -1e9 mask semantics of the unfused head path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# fp32 MXU passes for the head matmuls: "highest" = 6-pass fp32 emulation
# (reference-parity numerics, models/gru.py:matmul_precision), "default" =
# single bf16 pass (fastest, ~8-bit mantissa logits). Mosaic does not lower
# Precision.HIGH inside Pallas kernels; the near-fp32 middle ground is the
# manual 3-pass bf16x3 split ("high") below. The step-decomposition profile
# (scripts/profile_step.py) showed the 6-pass CE matmuls — not HBM traffic —
# dominate the train step at the RetailRocket point; see docs/performance.md.
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def _dot3(a, b, transpose_a=False, transpose_b=False):
    """bf16x3 matmul: split each fp32 operand into a bf16 high part and a
    bf16 residual; three single-pass bf16 MXU dots with fp32 accumulation
    recover ~21 mantissa bits (vs 6 passes for full fp32). The a_lo@b_lo
    term is below fp32 rounding and is dropped."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ca = ((0,) if transpose_a else (1,), (1,) if transpose_b else (0,))
    dn = (ca, ((), ()))
    dot = lambda x, y: jax.lax.dot_general(
        x, y, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)


def _dot(a, b, prec, transpose_a=False, transpose_b=False):
    """Matmul at a named precision; "high" routes to the manual bf16x3."""
    if prec == "high":
        return _dot3(a, b, transpose_a, transpose_b)
    ca = ((0,) if transpose_a else (1,), (1,) if transpose_b else (0,))
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(ca, ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISIONS[prec],
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block(A: int, B: int = 256) -> int:
    # One W block (F<=256, BLK) fp32 plus a few (B, BLK) fp32 tiles (logits,
    # softmax, dlogits in the bwd) must sit in VMEM with double buffering.
    # Cap the (B, BLK) tile at ~2MB so the bwd's ~2.2x working set stays
    # inside the 16MB scoped-vmem limit at any batch (measured: B=512 with
    # BLK=2048 exceeds it by 2.85MB).
    cap = max(128, (2 * 1024 * 1024 // (4 * max(B, 1))) // 128 * 128)
    for blk in (2048, 1024, 512, 256, 128):
        if blk <= cap and (A % blk == 0 or A > blk):
            return blk
    return 128


# ---------------------------------------------------------------------------
# forward: online logsumexp + label logit
# ---------------------------------------------------------------------------


def _fwd_kernel(valid_ref, h_ref, w_ref, b_ref, lbl_ref, lse_ref,
                lbl_logit_ref, m_acc, s_acc, g_acc, *, block: int, prec):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, _NEG)
        s_acc[:] = jnp.zeros_like(s_acc)
        g_acc[:] = jnp.zeros_like(g_acc)

    logits = _dot(h_ref[:], w_ref[:], prec) + b_ref[:]  # (B, BLK) fp32
    col = j * block + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < valid_ref[0, 0], logits, _NEG)

    m_old = m_acc[:]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1, keepdims=True))
    s_acc[:] = s_acc[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_acc[:] = m_new
    # label match qualified by column validity: an out-of-range localized
    # label (sharded use, parallel/fused_ce.py) must contribute 0, not the
    # -inf of a masked padded column.
    g_acc[:] += jnp.sum(
        jnp.where((col == lbl_ref[:]) & (col < valid_ref[0, 0]), logits, 0.0),
        axis=1,
        keepdims=True,
    )

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        lse_ref[:] = m_acc[:] + jnp.log(s_acc[:])
        lbl_logit_ref[:] = g_acc[:]


def _fwd(h, w, b, labels, valid_dim, precision: str = "highest"):
    B, F = h.shape
    A = w.shape[1]
    blk = _block(A, B)
    grid = pl.cdiv(A, blk)
    # No host-side padding of w/b to a block multiple: Pallas pads the edge
    # tile itself, and every use of the tail columns is masked by the
    # ``col < valid_dim`` guards in the kernels. The explicit jnp.pad this
    # replaces cost ~55MB/step of pure copy traffic at A=70852
    # (pad write + padded-dw slice; docs/performance.md).
    lbl2 = labels.astype(jnp.int32).reshape(B, 1)
    valid2 = jnp.asarray(valid_dim, jnp.int32).reshape(1, 1)
    kern = functools.partial(_fwd_kernel, block=blk, prec=precision)
    lse, lbl_logit = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, F), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(valid2, h.astype(jnp.float32), w, b.reshape(1, A), lbl2)
    return lse[:, 0], lbl_logit[:, 0]


# ---------------------------------------------------------------------------
# backward: blockwise (softmax - onehot) with dh accumulation
# ---------------------------------------------------------------------------


def _bwd_kernel(valid_ref, h_ref, w_ref, b_ref, lbl_ref, lse_ref, ct_ref,
                dw_ref, db_ref, dh_ref, dh_acc, *, block: int, prec):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        dh_acc[:] = jnp.zeros_like(dh_acc)

    logits = _dot(h_ref[:], w_ref[:], prec) + b_ref[:]
    col = j * block + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.where(col < valid_ref[0, 0], jnp.exp(logits - lse_ref[:]), 0.0)
    onehot = ((col == lbl_ref[:]) & (col < valid_ref[0, 0])).astype(jnp.float32)
    dlogits = (p - onehot) * ct_ref[:]  # (B, BLK)

    dw_ref[:] = _dot(h_ref[:], dlogits, prec, transpose_a=True)  # (F, BLK)
    db_ref[:] = jnp.sum(dlogits, axis=0, keepdims=True)
    # Zero w's tail columns before the contraction over BLK: with an
    # unpadded edge tile their contents are unspecified, and 0 * NaN from
    # the (zeroed) dlogits tail would poison dh.
    colw = j * block + jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 1)
    w_safe = jnp.where(colw < valid_ref[0, 0], w_ref[:], 0.0)
    dh_acc[:] += _dot(dlogits, w_safe, prec, transpose_b=True)  # (B, F)

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        dh_ref[:] = dh_acc[:]


def _bwd_call(h, w, b, labels, lse, ct, valid_dim, precision: str = "highest"):
    B, F = h.shape
    A = w.shape[1]
    blk = _block(A, B)
    grid = pl.cdiv(A, blk)
    # No w/b padding — see _fwd. Edge-tile dw/db stores are masked by
    # Mosaic; the dh contraction masks the tail columns of w in-kernel.
    kern = functools.partial(_bwd_kernel, block=blk, prec=precision)
    dw, db, dh = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, F), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((F, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, F), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, A), jnp.float32),
            jax.ShapeDtypeStruct((1, A), jnp.float32),
            jax.ShapeDtypeStruct((B, F), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, F), jnp.float32)],
        interpret=_interpret(),
    )(
        jnp.asarray(valid_dim, jnp.int32).reshape(1, 1),
        h.astype(jnp.float32),
        w,
        b.reshape(1, A),
        labels.astype(jnp.int32).reshape(B, 1),
        lse.reshape(B, 1),
        ct.astype(jnp.float32).reshape(B, 1),
    )
    return dh, dw, db[0]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_softmax_ce(h, w, b, labels, valid_dim, precision: str = "highest"):
    """Per-example CE(-log softmax at label) of ``h @ w + b`` without ever
    materializing the (B, A) logits in HBM.

    h: (B, F) features; w: (F, A) head kernel; b: (A,) bias;
    labels: (B,) int; valid_dim: count of real (unpadded) actions — a
    python int or a traced int32 scalar (the sharded path passes each
    shard's own count). Returns (B,) fp32 losses. Differentiable in h, w, b.
    """
    lse, lbl = _fwd(h, w, b, labels, valid_dim, precision)
    return lse - lbl


def _vjp_fwd(h, w, b, labels, valid_dim, precision: str):
    lse, lbl = _fwd(h, w, b, labels, valid_dim, precision)
    return lse - lbl, (h, w, b, labels, lse, valid_dim)


def _vjp_bwd(precision: str, res, ct):
    h, w, b, labels, lse, valid_dim = res
    dh, dw, db = _bwd_call(h, w, b, labels, lse, ct, valid_dim, precision)
    return dh.astype(h.dtype), dw.astype(w.dtype), db.astype(b.dtype), None, None


fused_softmax_ce.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# CE + top-k in ONE forward pass (SMORL's online rewards need the sup head's
# top-k in the same step that takes the sup CE gradient; computing them
# separately paid two full passes over the same (B, A) logits)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_softmax_ce_topk(h, w, b, labels, k, valid_dim, precision="highest"):
    """Per-example CE of ``h @ w + b`` AND the logits' top-k indices from a
    single blockwise pass (ops/fused_topk.py's scan computes the flash
    logsumexp, label logit and running top-k together). Returns
    ``(per_example_ce (B,) fp32, top_idx (B, k) int32)``.

    Differentiable in h, w, b through the CE output only (the indices are
    discrete — the reward path that consumes them is grad-free by design,
    reference ``smorl_gru.py:297-308`` computes them under no_grad). The
    backward pass is the same Pallas kernel as ``fused_softmax_ce``.
    """
    out, _res = _ce_topk_fwd(h, w, b, labels, k, valid_dim, precision)
    return out


def _ce_topk_fwd(h, w, b, labels, k, valid_dim, precision):
    from ikea_recommender_tpu.ops.fused_topk import blockwise_head_topk_ce

    _tv, top_i, m, s, lbl = blockwise_head_topk_ce(
        h, w, b, k, valid_dim,
        labels=labels, raw_pieces=True, precision=precision,
    )
    lse = m + jnp.log(s)
    return (lse - lbl, top_i), (h, w, b, labels, lse)


def _ce_topk_bwd(k, valid_dim, precision, res, cts):
    h, w, b, labels, lse = res
    ct = cts[0]  # cotangent of the CE output; top_idx is int (no tangent)
    dh, dw, db = _bwd_call(h, w, b, labels, lse, ct, valid_dim, precision)
    return dh.astype(h.dtype), dw.astype(w.dtype), db.astype(b.dtype), None


fused_softmax_ce_topk.defvjp(_ce_topk_fwd, _ce_topk_bwd)
