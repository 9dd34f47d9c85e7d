"""Serving path: jitted top-k recommendation over session states.

The reference's serving story is notebook-side ``predict_and_get_urls``
(``ikea/results/result_analysis.py:129+``): forward a state, top-k, map to
product metadata. Here the compute is a single jitted function (optionally
action-sharded over a mesh for very large catalogs).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.models.families import ModelConfig, apply_model


class Recommender:
    """Bundles trained params + model config into a batch scorer."""

    def __init__(self, params, model_cfg: ModelConfig, head_idx: int = 0):
        self.params = params
        self.model_cfg = model_cfg
        self.head_idx = head_idx
        self._topk = jax.jit(self._topk_fn, static_argnums=(3,))

    def _topk_fn(self, params, states, lengths, k):
        outs = apply_model(params, self.model_cfg, states, lengths)
        preds = outs[self.head_idx]
        vals, idx = jax.lax.top_k(preds, k)
        return vals, idx

    def recommend(
        self, states: jax.Array, lengths: jax.Array, k: int = 10
    ) -> Tuple[jax.Array, jax.Array]:
        """(B, T) states + (B,) lengths -> (scores (B, k), action ids (B, k))."""
        return self._topk(self.params, jnp.asarray(states), jnp.asarray(lengths), k)

    def scores(self, states: jax.Array, lengths: jax.Array) -> jax.Array:
        outs = apply_model(
            self.params, self.model_cfg, jnp.asarray(states), jnp.asarray(lengths)
        )
        return outs[self.head_idx]
