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
    """Kernel layout (F, K, A): the apply reshapes it to (F, K*A) — a free
    bitcast — so forward AND backward are single plain MXU matmuls. (A
    direct `bf,kfa->bka` einsum's transposed gradient contraction lowers
    pathologically on TPU: ~150s compile at the reference's shapes.)"""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(
            k_w, (in_dim, num_heads, out_dim), dtype=dtype, minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(
            k_b, (num_heads, out_dim), dtype=dtype, minval=-bound, maxval=bound
        ),
    }


def multihead_apply(params: Dict[str, jax.Array], h: jax.Array) -> jax.Array:
    """(B, F) -> (B, K, A) stacked Q-head outputs."""
    F, K, A = params["kernel"].shape
    out = jnp.dot(
        h,
        params["kernel"].reshape(F, K * A),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(h.dtype),
    )
    return out.reshape(h.shape[0], K, A) + params["bias"][None, :, :]
