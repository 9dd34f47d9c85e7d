"""Shared embedding + GRU backbone.

Every model family in the reference is structurally
``Embedding -> GRU -> {heads}`` over one shared backbone
(``models/GRU4Rec/model.py:6-82``, ``models/SQN/sqn_gru.py:10-112``,
``models/SMORL/smorl_gru.py:14-139``, ``models/SARM/sarm.py:5-76``); here
that structure is explicit.

Conventions preserved from the reference:
- embedding table has ``num_items + 1`` rows; the pad id defaults to
  ``num_items`` (the extra row);
- embedding init N(0, 0.01) ("like in paper");
- ``train_pad_embed=False`` zeroes the pad row at init and masks its gradient
  (torch ``padding_idx`` semantics) — see :func:`embedding_grad_mask`;
- head input is the FINAL GRU layer's last hidden state; the reference reads
  the first layer's (``h[0]``, quirk 4 in SURVEY.md §2) — opt back in with
  ``head_layer="first"``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.models.gru import gru_layer_apply, init_gru_layer


@dataclass(frozen=True)
class BackboneConfig:
    num_items: int  # input vocabulary size (pad row is extra)
    embedding_dim: int = 64
    hidden_dim: int = 64
    gru_layers: int = 1
    bidirectional: bool = False
    pad_id: Optional[int] = None  # defaults to num_items
    train_pad_embed: bool = True
    masked_recurrence: bool = True  # the reference's use_packed_seq
    head_layer: str = "last"  # "last" (correct) | "first" (reference quirk 4)
    dropout: float = 0.0  # applied to the head input (BidirGRU4Rec)
    scan_impl: str = "xla"  # "xla" | "pallas" | "auto" (regime rule, models/gru.py)
    compute_dtype: str = "float32"
    # Pad the table's row count up to a multiple (sharding divisibility +
    # aligned TPU tiles). Extra rows are never indexed. 1 = exact reference
    # dims.
    vocab_align: int = 1

    @property
    def num_embeddings(self) -> int:
        rows = self.num_items + 1
        a = self.vocab_align
        return -(-rows // a) * a

    @property
    def padding_idx(self) -> int:
        return self.num_items if self.pad_id is None else self.pad_id

    @property
    def feature_dim(self) -> int:
        return self.hidden_dim * (2 if self.bidirectional else 1)


def init_backbone(key: jax.Array, cfg: BackboneConfig) -> Dict:
    k_emb, k_gru = jax.random.split(key)
    emb = 0.01 * jax.random.normal(
        k_emb, (cfg.num_embeddings, cfg.embedding_dim), dtype=jnp.float32
    )
    if not cfg.train_pad_embed:
        emb = emb.at[cfg.padding_idx].set(0.0)

    layers: List[Dict] = []
    n_dir = 2 if cfg.bidirectional else 1
    keys = jax.random.split(k_gru, cfg.gru_layers * n_dir)
    for layer in range(cfg.gru_layers):
        in_dim = cfg.embedding_dim if layer == 0 else cfg.hidden_dim * n_dir
        entry = {"fwd": init_gru_layer(keys[layer * n_dir], in_dim, cfg.hidden_dim)}
        if cfg.bidirectional:
            entry["bwd"] = init_gru_layer(
                keys[layer * n_dir + 1], in_dim, cfg.hidden_dim
            )
        layers.append(entry)
    return {"embedding": emb, "gru": layers}


def embedding_grad_mask(cfg: BackboneConfig) -> Optional[jnp.ndarray]:
    """(V+1, 1) multiplier zeroing the pad row's gradient when the pad
    embedding is frozen. None when fully trainable."""
    if cfg.train_pad_embed:
        return None
    mask = jnp.ones((cfg.num_embeddings, 1), dtype=jnp.float32)
    return mask.at[cfg.padding_idx].set(0.0)


def apply_backbone(
    params: Dict,
    cfg: BackboneConfig,
    states: jax.Array,  # (B, T) int32
    lengths: jax.Array,  # (B,) int32
    *,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    inputs_embeds: Optional[jax.Array] = None,
) -> jax.Array:
    """Encode a batch of padded sessions -> (B, feature_dim) head input.

    ``inputs_embeds`` (B, T, E) bypasses the table gather — the lazy-Adam
    path gathers rows OUTSIDE the grad so the embedding cotangent stays in
    per-row form (train/lazy_adam.py) instead of a dense (V, E) scatter."""
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    if inputs_embeds is None:
        x = params["embedding"].astype(compute_dtype)[states]  # (B, T, E)
    else:
        x = inputs_embeds.astype(compute_dtype)
    lens = lengths if cfg.masked_recurrence else None

    finals_fwd: List[jax.Array] = []
    finals_bwd: List[jax.Array] = []
    seq = x
    for layer_params in params["gru"]:
        y_fwd, h_fwd = gru_layer_apply(
            jax.tree.map(lambda p: p.astype(compute_dtype), layer_params["fwd"]),
            seq,
            lens,
            scan_impl=cfg.scan_impl,
        )
        finals_fwd.append(h_fwd)
        if cfg.bidirectional:
            y_bwd, h_bwd = gru_layer_apply(
                jax.tree.map(lambda p: p.astype(compute_dtype), layer_params["bwd"]),
                seq,
                lens,
                reverse=True,
                scan_impl=cfg.scan_impl,
            )
            finals_bwd.append(h_bwd)
            seq = jnp.concatenate([y_fwd, y_bwd], axis=-1)
        else:
            seq = y_fwd

    pick = 0 if cfg.head_layer == "first" else -1
    if cfg.bidirectional:
        h = jnp.concatenate([finals_fwd[pick], finals_bwd[pick]], axis=-1)
    else:
        h = finals_fwd[pick]

    if cfg.dropout > 0.0 and not deterministic:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    return h.astype(jnp.float32)
