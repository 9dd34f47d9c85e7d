"""Linear output heads (supervised logits + Q-value heads).

torch.nn.Linear-equivalent init: weight and bias ~ U(-1/sqrt(fan_in),
1/sqrt(fan_in)). Multi-head Q outputs are a single stacked (K, F, A) kernel
-> one batched einsum on the MXU instead of K separate matmuls
(reference stacks K separate nn.Linear outputs, ``smorl_gru.py:124-137``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.models.gru import matmul_precision


def init_linear(
    key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(
            k_w, (in_dim, out_dim), dtype=dtype, minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(
            k_b, (out_dim,), dtype=dtype, minval=-bound, maxval=bound
        ),
    }


def linear_apply(params: Dict[str, jax.Array], h: jax.Array) -> jax.Array:
    return (
        jnp.dot(
            h,
            params["kernel"],
            preferred_element_type=jnp.float32,
            precision=matmul_precision(h.dtype),
        )
        + params["bias"]
    )


def init_multihead(
    key: jax.Array, num_heads: int, in_dim: int, out_dim: int, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """Kernel layout (K, F, A): leading head axis, so each head is a
    contiguous (F, A) plane with the standard TPU (8, 128) tiling — the
    same shape class as a single linear head. Rounds 1-2 stored (F, K, A);
    with K=3..5 as a middle dim the (K, A) trailing plane tiled T(4, 128)
    and every hand-off between the Pallas custom-calls, the gather/scatter
    of row logits, and the optimizer inserted a 54MB layout-conversion
    copy (device trace, docs/performance.md)."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(
            k_w, (num_heads, in_dim, out_dim), dtype=dtype, minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(
            k_b, (num_heads, out_dim), dtype=dtype, minval=-bound, maxval=bound
        ),
    }


def multihead_apply(params: Dict[str, jax.Array], h: jax.Array) -> jax.Array:
    """(B, F) -> (B, K, A) stacked Q-head outputs.

    K separate plain MXU matmuls (K <= 5, static unroll) — clean transposed
    gradients per head. (A fused `bf,kfa->bka` einsum's transposed
    contraction lowers pathologically on TPU: ~150s compile at the
    reference's shapes.)"""
    K = params["kernel"].shape[0]
    outs = [
        jnp.dot(
            h,
            params["kernel"][k],
            preferred_element_type=jnp.float32,
            precision=matmul_precision(h.dtype),
        )
        for k in range(K)
    ]
    return jnp.stack(outs, axis=1) + params["bias"][None, :, :]
