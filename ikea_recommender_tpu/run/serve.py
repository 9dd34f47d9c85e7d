"""Serving path: jitted top-k recommendation over session states.

The reference's serving story is notebook-side ``predict_and_get_urls``
(``ikea/results/result_analysis.py:129+``): forward a state, top-k, map to
product metadata. Here the compute is a single jitted function; big
catalogs go through the fused blockwise head+top-k scan
(``ops/fused_topk.py`` — the (B, A) logits never materialize), and an
action-sharded head over a mesh goes through the sharded variant
(``parallel/topk.py:sharded_head_topk_ce``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.models.families import (
    FUSED_CE_MIN_ACTIONS,
    ModelConfig,
    apply_features,
    apply_model,
)
from ikea_recommender_tpu.ops.fused_topk import blockwise_head_topk_ce, eval_head


class Recommender:
    """Bundles trained params + model config into a batch scorer."""

    def __init__(
        self,
        params,
        model_cfg: ModelConfig,
        head_idx: int = 0,
        mesh=None,
        fused: Optional[bool] = None,
    ):
        self.params = params
        self.model_cfg = model_cfg
        self.head_idx = head_idx
        self.mesh = mesh
        fam = model_cfg.family
        can_fuse = (
            fam == "sarm" or head_idx == 0 or (fam == "sqn" and head_idx == 1)
        )
        from ikea_recommender_tpu.core.mesh import MODEL_AXIS

        self._model_sharded = mesh is not None and mesh.shape[MODEL_AXIS] > 1
        if fused is None:
            fused = self._model_sharded or (
                model_cfg.action_dim >= FUSED_CE_MIN_ACTIONS
            )
        self.fused = bool(fused) and can_fuse
        self._topk = jax.jit(self._topk_fn, static_argnums=(3,))

    def _topk_fn(self, params, states, lengths, k):
        if self.fused:
            h = apply_features(params, self.model_cfg, states, lengths)
            kernel, bias = eval_head(params, self.model_cfg, self.head_idx)
            if self._model_sharded:
                from ikea_recommender_tpu.parallel.topk import sharded_head_topk_ce

                vals, idx, _ = sharded_head_topk_ce(
                    h, kernel, bias, k, self.model_cfg.action_dim, self.mesh
                )
            else:
                vals, idx, _ = blockwise_head_topk_ce(
                    h, kernel, bias, k, self.model_cfg.action_dim
                )
            return vals, idx
        outs = apply_model(params, self.model_cfg, states, lengths)
        preds = outs[self.head_idx]
        return jax.lax.top_k(preds, k)

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
