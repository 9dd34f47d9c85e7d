"""GRU encoder as a length-masked ``lax.scan``.

TPU-native replacement for the reference's cuDNN packed-sequence GRU
(``models/GRU4Rec/model.py:49-77``). Packed sequences don't exist on TPU
(dynamic shapes defeat XLA); instead the recurrence is masked:

    h_t = mask_t * GRUCell(x_t, h_{t-1}) + (1 - mask_t) * h_{t-1},
    mask_t = t < true_len

which reproduces packed semantics exactly, including the reference's
"empty state consumes one pad token" convention (true_len is always >= 1).
With masking off the cell consumes pad tokens too — the reference's
``use_packed_seq=False`` path.

Cell math matches torch.nn.GRU (gate order r|z|n):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

The input projection x W_i for all timesteps is hoisted out of the scan into
one (B*T, E) x (E, 3H) matmul — the MXU-friendly shape — leaving only the
small recurrent (B, H) x (H, 3H) matmul inside the scan. A fused Pallas
kernel for the recurrent part lives in ``ops/gru_pallas.py``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def matmul_precision(dtype) -> Optional[jax.lax.Precision]:
    """float32 compute means real float32 math: JAX's default matmul
    precision is allowed to drop to bf16 passes, which breaks parity with the
    reference's fp32 cuDNN GRU. bf16 compute keeps the fast default path."""
    return jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32 else None


def init_gru_layer(
    key: jax.Array, input_dim: int, hidden_dim: int, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """torch.nn.GRU default init: U(-1/sqrt(H), 1/sqrt(H)) for all leaves."""
    k_wi, k_wh, k_bi, k_bh = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_dim)
    uni = lambda k, shape: jax.random.uniform(
        k, shape, dtype=dtype, minval=-bound, maxval=bound
    )
    return {
        "wi": uni(k_wi, (input_dim, 3 * hidden_dim)),
        "wh": uni(k_wh, (hidden_dim, 3 * hidden_dim)),
        "bi": uni(k_bi, (3 * hidden_dim,)),
        "bh": uni(k_bh, (3 * hidden_dim,)),
    }


def _gru_scan(
    xw: jax.Array,  # (B, T, 3H) precomputed x W_i + b_i
    wh: jax.Array,  # (H, 3H)
    bh: jax.Array,  # (3H,)
    mask: Optional[jax.Array],  # (B, T) float or None
    h0: Optional[jax.Array] = None,
    reverse: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the recurrence; returns (output_seq (B,T,H), final_h (B,H))."""
    B, T, H3 = xw.shape
    H = H3 // 3

    h_init = jnp.zeros((B, H), dtype=xw.dtype) if h0 is None else h0

    prec = matmul_precision(xw.dtype)

    def step(h, inputs):
        if mask is None:
            xw_t = inputs
        else:
            xw_t, m_t = inputs
        hw = jnp.dot(h, wh, precision=prec) + bh
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        if mask is not None:
            h_new = jnp.where(m_t[:, None] > 0, h_new, h)
        return h_new, h_new

    xs = jnp.swapaxes(xw, 0, 1)  # (T, B, 3H)
    if mask is None:
        inputs = xs
    else:
        inputs = (xs, jnp.swapaxes(mask, 0, 1).astype(xw.dtype))
    final_h, ys = jax.lax.scan(step, h_init, inputs, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), final_h


def gru_layer_apply(
    params: Dict[str, jax.Array],
    x_seq: jax.Array,  # (B, T, E_in)
    lengths: Optional[jax.Array],  # (B,) int or None for unmasked
    reverse: bool = False,
    scan_impl: str = "xla",
) -> Tuple[jax.Array, jax.Array]:
    """One GRU direction over the sequence. Returns (y_seq, final_h)."""
    B, T, _ = x_seq.shape
    xw = (
        jnp.einsum(
            "bte,eh->bth",
            x_seq,
            params["wi"],
            precision=matmul_precision(x_seq.dtype),
        )
        + params["bi"]
    )
    mask = None
    if lengths is not None:
        t_idx = jnp.arange(T)[None, :]
        mask = (t_idx < lengths[:, None]).astype(x_seq.dtype)
    if scan_impl == "auto":
        # Measured regime rule (scripts/bench_gru_regime.py on the real
        # v5e, docs/performance.md): the Pallas kernel's VMEM-pinning wins
        # for long sequences (~25-35% at T>=50..200, H<=256) and loses at
        # short T. At H=512 it now COMPILES at every T (r5 H-aware tiles)
        # but measures 1.3-1.5x slower: the backward's 9.4MB weight-
        # resident working set forces batch tiles too small to feed the
        # MXU, so XLA keeps H=512.
        H = params["wh"].shape[0]
        scan_impl = "pallas" if (T * H >= 12800 and H <= 256) else "xla"
    if scan_impl == "pallas":
        from ikea_recommender_tpu.ops.gru_pallas import gru_scan_pallas

        return gru_scan_pallas(
            xw, params["wh"], params["bh"], mask=mask, reverse=reverse
        )
    return _gru_scan(xw, params["wh"], params["bh"], mask, reverse=reverse)
