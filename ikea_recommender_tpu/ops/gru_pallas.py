"""Fused Pallas GRU scan — the framework's flagship TPU kernel.

Replaces the reference's cuDNN fused GRU (``models/GRU4Rec/model.py:49-77``)
with a hand-written TPU kernel. The input projection ``x @ W_i + b_i`` is a
single large MXU matmul hoisted OUTSIDE the kernel (``models/gru.py``); what
remains — the serial recurrence — is where XLA's ``lax.scan`` pays per-step
HBM round-trips for the hidden state and per-iteration loop overhead. This
kernel keeps ``h``, ``W_h`` and ``b_h`` resident in VMEM across ALL
timesteps and pipelines the per-step ``xw_t`` slices via the sequential TPU
grid (grid = (batch_tiles, T): Pallas double-buffers the HBM->VMEM DMAs of
the next timestep's block while the current one computes).

Internal layout is TIME-MAJOR (T, B, ·): TPU blocks tile the last two dims,
so per-timestep slices become (1, B_tile, 3H) blocks whose trailing dims are
full array dims — exactly what the Mosaic lowering wants. The wrappers
transpose from the public batch-major (B, T, ·) convention; XLA fuses those
transposes into the surrounding matmuls.

Gate math matches torch (r|z|n ordering, ``n = tanh(xn + r * (h W_hn +
b_hn))``), and the length-mask freeze ``h_t = m? h~ : h_{t-1}`` reproduces
packed-sequence semantics.

The backward pass is a second Pallas kernel running the time-reversed
adjoint recurrence. No activation stash beyond the forward's own output
sequence is needed: ``y_t == h_t``, so the backward recomputes the gates
from ``(xw_t, h_{t-1})`` with one extra VMEM-resident matmul per step —
FLOPs for HBM bandwidth, the right trade on TPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _batch_tile(B: int, H: int, backward: bool = False) -> int:
    """Largest batch tile whose VMEM working set fits the ~16MB scoped
    limit. The budget is H-dependent: the backward keeps THREE (H, 3H)
    weight-sized buffers resident (wh + the dwh output block + the dwh
    accumulator — 9.4MB at H=512), plus ~18H bytes per batch row of
    double-buffered streamed blocks (xw, y_prev, gy, dxw). The old
    H-blind tile (BT = B up to 512) made the backward fail to compile at
    H=512, T>=50 (docs/performance.md r3 regime table) — now it tiles
    down instead."""
    fixed = (3 if backward else 1) * H * 3 * H * 4
    # backward per-row: double-buffered streamed blocks (xw 6H, y_prev 2H,
    # gy 2H, dxw 6H) + dh carry H + the kernel-stack temporaries Mosaic
    # keeps live across the matmuls (hw, dxw_t, dhw — 9H). The r4 estimate
    # (18H) missed the stack temporaries and still OOMed the 16MB scoped
    # limit at H=512/T=200 (measured 17.92MB at BT=128 ⇒ ~34H/row); 36H
    # matches measurement with slack.
    per_row = (36 if backward else 11) * H * 4
    # Backward budget is tighter still: measured scoped usage varies with T
    # (Mosaic buffered 16.64M at H=512/BT=64/T=50 but fit the same tile at
    # T=200), so leave ~3MB slack. Effect on chosen tiles: H=512 drops to
    # BT=32; every B=256 tile the r4 regime table measured is unchanged;
    # B>=512 backward tiles at H in (160, 256] halve vs the r4 math — which
    # under the measured ~34H/row would have exceeded 16MB there anyway
    # (e.g. B=512/H=256: 2.36M + 512*34*256*4 ≈ 20M), so the r4 tile was a
    # latent OOM, never hit because no shipped config runs batch >= 512.
    budget = (13 if backward else 14) * 1024 * 1024
    best = None
    for bt in (512, 256, 128, 64, 32, 16, 8):
        if bt <= B and B % bt == 0:
            if best is None:
                best = bt  # largest divisor as fallback
            if fixed + per_row * bt <= budget:
                return bt
    if B <= 512 and fixed + per_row * B <= budget:
        return B
    return best if best is not None else B


def _split3(a):
    H = a.shape[-1] // 3
    return a[:, :H], a[:, H : 2 * H], a[:, 2 * H :]


# ---------------------------------------------------------------------------
# forward kernel (time-major: xw (T, B, 3H), mask (T, B), y (T, B, H))
# ---------------------------------------------------------------------------


def _fwd_kernel(xw_ref, wh_ref, bh_ref, m_ref, y_ref, hfin_ref, h_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    h = h_ref[:]
    xw_t = xw_ref[0].astype(jnp.float32)
    hw = (
        jnp.dot(h, wh_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        + bh_ref[:].astype(jnp.float32)
    )
    xr, xz, xn = _split3(xw_t)
    hr, hz, hn = _split3(hw)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    cand = (1.0 - z) * n + z * h
    h_new = jnp.where(m_ref[0] > 0, cand, h)
    h_ref[:] = h_new
    y_ref[0] = h_new.astype(y_ref.dtype)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        hfin_ref[:] = h_new.astype(hfin_ref.dtype)


def _forward(xw_tm: jax.Array, wh: jax.Array, bh: jax.Array, mask_tm: jax.Array):
    T, B, H3 = xw_tm.shape
    H = H3 // 3
    BT = _batch_tile(B, H)
    nb = B // BT
    grid = (nb, T)
    y, hfin = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BT, H3), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, 1), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, H), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), xw_tm.dtype),
            jax.ShapeDtypeStruct((B, H), xw_tm.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((BT, H), jnp.float32)],
        interpret=_interpret(),
    )(xw_tm, wh, bh.reshape(1, H3), mask_tm)
    return y, hfin


# ---------------------------------------------------------------------------
# backward kernel (time-reversed adjoint recurrence)
# ---------------------------------------------------------------------------


def _bwd_kernel(
    xw_ref,
    wh_ref,
    bh_ref,
    m_ref,
    yprev_ref,  # h_{t-1} block (index clamped at t=0; zeroed in-kernel)
    gy_ref,
    ghfin_ref,
    dxw_ref,
    dwh_ref,
    dbh_ref,
    dh_ref,
    dwh_acc,
    dbh_acc,
):
    t = pl.program_id(1)
    T = pl.num_programs(1)
    ta = T - 1 - t  # actual timestep processed

    @pl.when(t == 0)
    def _():
        dh_ref[:] = ghfin_ref[:].astype(jnp.float32)
        dwh_acc[:] = jnp.zeros_like(dwh_acc)
        dbh_acc[:] = jnp.zeros_like(dbh_acc)

    dh = dh_ref[:] + gy_ref[0].astype(jnp.float32)
    h_prev = jnp.where(
        ta == 0,
        jnp.zeros(yprev_ref.shape[1:], jnp.float32),
        yprev_ref[0].astype(jnp.float32),
    )

    # Recompute gates from (xw_t, h_{t-1}) — y stores h exactly.
    hw = (
        jnp.dot(h_prev, wh_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        + bh_ref[:].astype(jnp.float32)
    )
    xr, xz, xn = _split3(xw_ref[0].astype(jnp.float32))
    hr, hz, hn = _split3(hw)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)

    m = m_ref[0]  # (BT, 1)
    dh_t = dh * m
    dh_skip = dh * (1.0 - m)

    dn = dh_t * (1.0 - z)
    dz = dh_t * (h_prev - n)
    da_n = dn * (1.0 - n * n)
    dr = da_n * hn
    dhn = da_n * r
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)

    dxw_t = jnp.concatenate([da_r, da_z, da_n], axis=1)  # (BT, 3H)
    dhw = jnp.concatenate([da_r, da_z, dhn], axis=1)  # (BT, 3H)

    dxw_ref[0] = dxw_t.astype(dxw_ref.dtype)
    dwh_acc[:] += jnp.dot(h_prev.T, dhw, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    dbh_acc[:] += jnp.sum(dhw, axis=0, keepdims=True)

    dh_ref[:] = (
        dh_t * z
        + jnp.dot(dhw, wh_ref[:].astype(jnp.float32).T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        + dh_skip
    )

    @pl.when(t == T - 1)
    def _():
        dwh_ref[0] = dwh_acc[:]
        dbh_ref[0] = dbh_acc[:]


def _backward(xw_tm, wh, bh, mask_tm, y_tm, gy_tm, g_hfin):
    T, B, H3 = xw_tm.shape
    H = H3 // 3
    BT = _batch_tile(B, H, backward=True)
    nb = B // BT
    grid = (nb, T)

    dxw, dwh_parts, dbh_parts = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BT, H3), lambda i, t: (T - 1 - t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H3), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, 1), lambda i, t: (T - 1 - t, i, 0), memory_space=pltpu.VMEM),
            # h_{t-1} = y[ta - 1] (clamped; value replaced by zeros at ta=0)
            pl.BlockSpec(
                (1, BT, H),
                lambda i, t: (jnp.maximum(T - 2 - t, 0), i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, BT, H), lambda i, t: (T - 1 - t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, H), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, H3), lambda i, t: (T - 1 - t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, H3), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H3), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H3), xw_tm.dtype),
            jax.ShapeDtypeStruct((nb, H, H3), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, H3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),
            pltpu.VMEM((H, H3), jnp.float32),
            pltpu.VMEM((1, H3), jnp.float32),
        ],
        interpret=_interpret(),
    )(xw_tm, wh, bh.reshape(1, H3), mask_tm, y_tm, gy_tm, g_hfin)
    dwh = jnp.sum(dwh_parts, axis=0).astype(wh.dtype)
    dbh = jnp.sum(dbh_parts, axis=(0, 1)).astype(bh.dtype)
    return dxw, dwh, dbh


# ---------------------------------------------------------------------------
# custom-vjp wrapper (time-major internal, batch-major public API)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gru_scan_fused(xw_tm, wh, bh, mask_tm):
    return _forward(xw_tm, wh, bh, mask_tm)


def _fused_fwd(xw_tm, wh, bh, mask_tm):
    y, hfin = _forward(xw_tm, wh, bh, mask_tm)
    return (y, hfin), (xw_tm, wh, bh, mask_tm, y)


def _fused_bwd(res, cot):
    xw_tm, wh, bh, mask_tm, y = res
    gy_tm, g_hfin = cot
    dxw, dwh, dbh = _backward(xw_tm, wh, bh, mask_tm, y, gy_tm, g_hfin)
    return dxw, dwh, dbh, jnp.zeros_like(mask_tm)


_gru_scan_fused.defvjp(_fused_fwd, _fused_bwd)


def gru_scan_pallas(
    xw: jax.Array,  # (B, T, 3H) precomputed x W_i + b_i
    wh: jax.Array,  # (H, 3H)
    bh: jax.Array,  # (3H,)
    mask: Optional[jax.Array] = None,  # (B, T) float; None = no masking
    reverse: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for ``models.gru._gru_scan``.

    Returns (output_seq (B, T, H), final_h (B, H)).
    """
    B, T, H3 = xw.shape
    if mask is None:
        mask = jnp.ones((B, T), dtype=jnp.float32)
    mask = mask.astype(jnp.float32)  # f32 mask regardless of compute dtype
    # (bf16 minor-dim inserts are unsupported by Mosaic)
    if reverse:
        xw = jnp.flip(xw, axis=1)
        mask = jnp.flip(mask, axis=1)
    xw_tm = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H)
    # (T, B, 1): trailing length-1 dim EQUALS the full array dim, so any
    # batch tile divisible by 8 is legal (the r4 (T, 8, B) layout forced
    # BT % 128 == 0, which blocked the small tiles the H=512 backward
    # needs); each (1, BT, 1) block pads to 128 lanes in VMEM — still
    # tiny (~BT*512B) and fully streamed.
    mask_tm = jnp.swapaxes(mask, 0, 1)[:, :, None]
    y_tm, hfin = _gru_scan_fused(xw_tm, wh, bh, mask_tm)
    y = jnp.swapaxes(y_tm, 0, 1)
    if reverse:
        y = jnp.flip(y, axis=1)
    return y, hfin
