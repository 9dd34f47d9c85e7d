"""Online reward / behavioral metric kernels — all jnp, all on device.

Replaces the reference's mixed torch/numpy/host-set implementations
(``evaluate/diversity.py``, ``novelty.py``, ``repetitiveness.py``) with fused
device computations. The dual-vocabulary output->input token remap is a
precomputed int32 gather table (``data.tokenizer.build_output_to_input_table``)
instead of the reference's per-element CPU ``Tensor.apply_`` (quirk 11).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.ops.ranking import topk_indices


def get_last_action(
    states: jax.Array, lengths: jax.Array, padding_pos: str
) -> jax.Array:
    """Last real item of each state (reference ``diversity.py:4-12``):
    end padding -> s[len - 1]; beg padding -> s[:, -1]."""
    if padding_pos == "end":
        idx = jnp.clip(lengths - 1, 0, states.shape[1] - 1)
        return jnp.take_along_axis(states, idx[:, None], axis=1).squeeze(1)
    return states[:, -1]


def diversity_from_topk(
    states: jax.Array,  # (B, T) input-token ids
    pred_idx: jax.Array,  # (B, k) top-k predicted action ids
    lengths: jax.Array,  # (B,)
    padding_pos: str,
    div_embedding: jax.Array,  # (V_in, E) FROZEN pretrained embedding
    out_to_in: Optional[jax.Array] = None,  # (A,) output->input remap table
    eps: float = 1e-6,
) -> jax.Array:
    """reward = 1 - mean cosine-sim(emb(last item), emb(top-k preds))
    (reference ``diversity.py:15-73``). Range [0, 2]."""
    last = get_last_action(states, lengths, padding_pos)  # (B,)
    if out_to_in is not None:
        pred_idx = out_to_in[pred_idx]
    div_embedding = jax.lax.stop_gradient(div_embedding)
    e_last = div_embedding[last]  # (B, E)
    e_pred = div_embedding[pred_idx]  # (B, k, E)
    # torch.nn.CosineSimilarity(eps): denom = max(||a||*||b||, eps)
    num = jnp.einsum("be,bke->bk", e_last, e_pred)
    denom = jnp.maximum(
        jnp.linalg.norm(e_last, axis=-1)[:, None] * jnp.linalg.norm(e_pred, axis=-1),
        eps,
    )
    sim = num / denom
    return 1.0 - jnp.mean(sim, axis=1)  # (B,)


def diversity_rewards(
    states: jax.Array,  # (B, T) input-token ids
    predictions: jax.Array,  # (B, A) output-head scores
    lengths: jax.Array,  # (B,)
    padding_pos: str,
    topk: int,
    div_embedding: jax.Array,
    out_to_in: Optional[jax.Array] = None,
    eps: float = 1e-6,
) -> jax.Array:
    return diversity_from_topk(
        states,
        topk_indices(predictions, topk),
        lengths,
        padding_pos,
        div_embedding,
        out_to_in=out_to_in,
        eps=eps,
    )


def novelty_from_topk(
    pred_idx: jax.Array,  # (B, k) top-k predicted action ids
    unpopular_mask: jax.Array,  # (A,) bool
    reward: float = 1.0,
) -> jax.Array:
    """Per-sample mean of (top-k prediction is unpopular) * reward
    (reference ``novelty.py:12-47``; no vocab remap there either — the
    unpopular set lives in output-token space)."""
    nov = unpopular_mask[pred_idx].astype(jnp.float32) * reward
    return jnp.mean(nov, axis=1)


def novelty_rewards(
    predictions: jax.Array,  # (B, A)
    unpopular_mask: jax.Array,  # (A,) bool
    reward: float = 1.0,
    topk: int = 1,
) -> jax.Array:
    return novelty_from_topk(topk_indices(predictions, topk), unpopular_mask, reward)


def repetitions_from_topk(
    states: jax.Array,  # (B, T) input-token ids
    idx: jax.Array,  # (B, >= max k) top-k predicted action ids
    top_k: Sequence[int],
    out_to_in: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Total count, per k, of top-k predicted items already present in the
    input state (reference ``repetitiveness.py:21-57``: broadcast equality,
    summed over batch). Returns (len(top_k),) float sums."""
    if out_to_in is not None:
        idx = out_to_in[idx]
    eq = states[:, :, None] == idx[:, None, :]  # (B, T, maxk)
    if valid is not None:
        eq = eq & valid[:, None, None]
    out = []
    for k in top_k:
        out.append(jnp.sum(eq[:, :, :k]))
    return jnp.stack(out).astype(jnp.float32)


def repetition_counts(
    states: jax.Array,  # (B, T) input-token ids
    predictions: jax.Array,  # (B, A)
    top_k: Sequence[int],
    out_to_in: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    return repetitions_from_topk(
        states,
        topk_indices(predictions, max(top_k)),
        top_k,
        out_to_in=out_to_in,
        valid=valid,
    )
