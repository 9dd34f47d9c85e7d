"""The evaluation protocol — fully on device.

Computes, over an evaluation buffer (reference
``evaluate/eval_protocol.py:123-263``):

- mean CE loss (mean-of-batch-means, the reference's normalization — quirk 8);
- HR@k and NDCG@k for each k (normalized by sample count);
- catalog coverage CV@k over all items and over the unpopular set,
  accumulated across the whole pass (device boolean scatter, exact
  set-union semantics);
- mean online diversity reward (1 - cos-sim to the last state item,
  frozen pretrained embedding);
- mean online novelty reward (top-k ∩ unpopular);
- summed repetition counts R@k (top-k predictions already in the state).

The reference's host round-trips (``preds.to("cpu")``, np.vectorize rank
scan, Python set unions — ``eval_protocol.py:199-233``) are replaced by one
jitted accumulator update per batch; only the final normalization touches
the host. The same batch function doubles as the reference's
``update_train_metrics`` (``eval_protocol.py:266-359``): trainers thread a
separate accumulator through training batches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ikea_recommender_tpu.core.mesh import DATA_AXIS

from ikea_recommender_tpu.models.families import (
    FUSED_CE_MIN_ACTIONS,
    ModelConfig,
    apply_features,
    apply_model,
)
from ikea_recommender_tpu.ops.coverage import (
    init_coverage,
    update_coverage_from_topk,
)
from ikea_recommender_tpu.ops.fused_topk import blockwise_head_topk_ce, eval_head
from ikea_recommender_tpu.ops.ranking import hr_ndcg_from_topk, topk_indices
from ikea_recommender_tpu.ops.rewards import (
    diversity_from_topk,
    novelty_from_topk,
    repetitions_from_topk,
)
from ikea_recommender_tpu.parallel.topk import sharded_head_topk_ce


@struct.dataclass
class EvalAccum:
    """Device-side running totals over batches."""

    loss_sum: jax.Array  # () float — sum of per-batch mean CE
    n_batches: jax.Array  # () int
    n_samples: jax.Array  # () int
    hits: jax.Array  # (n_k,) float
    ndcg: jax.Array  # (n_k,) float
    reps: jax.Array  # (n_k,) float
    div_rew_sum: jax.Array  # () float
    nov_rew_sum: jax.Array  # () float
    covered: jax.Array  # (n_cov_k, A) bool
    # per-action-type HR/NDCG (old-generation capability; empty when off)
    type_hits: jax.Array  # (n_types, n_k) float
    type_ndcg: jax.Array  # (n_types, n_k) float
    type_count: jax.Array  # (n_types,) int32


@dataclass
class EvalResult:
    """Normalized metrics; field names mirror the reference's 7-tuple."""

    loss: float
    hr: np.ndarray  # (n_k,)
    ndcg: np.ndarray  # (n_k,)
    coverage: Dict[int, Tuple[float, float]]  # k -> (unpop_cov, all_cov)
    div_rew: float
    nov_rew: float
    reps: np.ndarray  # (n_k,)
    # type name -> {"hr": (n_k,), "ndcg": (n_k,), "count": int}; populated
    # when the protocol runs with type_names (reference
    # old/sqn_evaluation_old.py per-action-type dicts). "total" excluded —
    # it equals the standard hr/ndcg.
    by_type: Optional[Dict[str, Dict[str, Any]]] = None


class EvalProtocol:
    """Bundles the metric configuration + jitted per-batch update."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        *,
        topk_hr_ndcg: Sequence[int] = (5, 10, 20),
        topk_cov: Sequence[int] = (1, 5, 10),
        topk_div: int = 1,
        topk_nov: int = 1,
        nov_rew_sig: float = 1.0,
        padding_pos: str = "end",
        div_embedding: Optional[jax.Array] = None,
        unpopular_mask: Optional[jax.Array] = None,
        out_to_in: Optional[jax.Array] = None,
        head_idx: int = 0,
        mesh=None,
        fused: Optional[bool] = None,
        type_names: Optional[Sequence[str]] = None,
        eval_precision: Optional[str] = None,
    ):
        self.model_cfg = model_cfg
        # None (default) = bit-parity with the dense eval path (HIGHEST fp32
        # head matmuls); "high"/"default" trade MXU passes for throughput —
        # near-tie top-k order may then differ from dense
        # (MetricsConfig.eval_precision; docs/performance.md).
        self.eval_precision = eval_precision
        # Per-action-type HR/NDCG (reference old/sqn_evaluation_old.py):
        # type id i in the buffer's action_type column maps to type_names[i].
        self.type_names = tuple(type_names or ())
        self.num_types = len(self.type_names)
        # Optional (data, model) mesh: scanned eval batches are pinned to
        # the data axis and the accumulator to replicated; parameter
        # shardings ride in on the (committed) params argument.
        self.mesh = mesh
        self.topk_hr_ndcg = tuple(topk_hr_ndcg)
        self.topk_cov = tuple(topk_cov)
        self.topk_div = topk_div
        self.topk_nov = topk_nov
        self.nov_rew_sig = nov_rew_sig
        self.padding_pos = padding_pos
        self.num_actions = model_cfg.action_dim
        self.head_idx = head_idx
        if div_embedding is None:
            # Degenerate frozen embedding => diversity reward constant 0.
            div_embedding = jnp.ones((model_cfg.backbone.num_items + 1, 1))
        self.div_embedding = jnp.asarray(div_embedding)
        if unpopular_mask is None:
            unpopular_mask = jnp.zeros((self.num_actions,), dtype=bool)
        self.unpopular_mask = jnp.asarray(unpopular_mask)
        self._unpop_host = np.asarray(unpopular_mask)  # finalize, no readback
        self.out_to_in = None if out_to_in is None else jnp.asarray(out_to_in)

        # Fused (blockwise / sharded) eval: one head+top-k+CE scan replaces
        # the dense (B, A) logits (ops/fused_topk.py). Auto-on for big
        # catalogs and whenever the head is model-axis-sharded; only single
        # linear eval heads qualify (not SMORL's stacked Q output).
        fam = model_cfg.family
        can_fuse = (
            fam == "sarm"
            or head_idx == 0
            or (fam == "sqn" and head_idx == 1)
        )
        from ikea_recommender_tpu.core.mesh import MODEL_AXIS

        self._model_sharded = mesh is not None and mesh.shape[MODEL_AXIS] > 1
        if fused is None:
            fused = self._model_sharded or (
                self.num_actions >= FUSED_CE_MIN_ACTIONS
            )
        self.fused = bool(fused) and can_fuse
        # widest top-k any metric needs — computed once per batch
        self._max_k = max(
            [max(self.topk_hr_ndcg), max(self.topk_cov), topk_div, topk_nov]
        )

        # aux arrays ride as jit ARGUMENTS (closure-captured device arrays
        # become HLO literal constants, which the TPU compile path handles
        # pathologically slowly — minutes per program).
        self._aux = {
            "div_embedding": self.div_embedding,
            "unpopular_mask": self.unpopular_mask,
        }
        if self.out_to_in is not None:
            self._aux["out_to_in"] = self.out_to_in
        self._update = jax.jit(self._batch_update, donate_argnums=(1,))

    # -- accumulators ------------------------------------------------------
    def init_accum(self) -> EvalAccum:
        n_k = len(self.topk_hr_ndcg)
        return EvalAccum(
            loss_sum=jnp.zeros(()),
            n_batches=jnp.zeros((), jnp.int32),
            n_samples=jnp.zeros((), jnp.int32),
            hits=jnp.zeros((n_k,)),
            ndcg=jnp.zeros((n_k,)),
            reps=jnp.zeros((n_k,)),
            div_rew_sum=jnp.zeros(()),
            nov_rew_sum=jnp.zeros(()),
            covered=init_coverage(self.num_actions, len(self.topk_cov)),
            type_hits=jnp.zeros((self.num_types, n_k)),
            type_ndcg=jnp.zeros((self.num_types, n_k)),
            type_count=jnp.zeros((self.num_types,), jnp.int32),
        )

    # -- per-batch update (jitted) ----------------------------------------
    def _batch_update(
        self,
        params: Any,
        accum: EvalAccum,
        state: jax.Array,
        action: jax.Array,
        true_len: jax.Array,
        valid: jax.Array,
        aux: Any,
        action_type: Optional[jax.Array] = None,
    ) -> EvalAccum:
        div_embedding = aux["div_embedding"]
        unpopular_mask = aux["unpopular_mask"]
        out_to_in = aux.get("out_to_in")

        if self.fused:
            # ONE blockwise head scan -> (top-K ids, per-sample CE); the
            # (B, A) logits never materialize. Every metric below consumes
            # the id prefix it needs — exactly equal to the dense path.
            h = apply_features(params, self.model_cfg, state, true_len)
            kernel, bias = eval_head(params, self.model_cfg, self.head_idx)
            if self._model_sharded:
                from ikea_recommender_tpu.core.mesh import DATA_AXIS as _D

                _, idx, per_ce = sharded_head_topk_ce(
                    h,
                    kernel,
                    bias,
                    self._max_k,
                    self.num_actions,
                    self.mesh,
                    labels=action,
                    data_axis=_D,
                )
            else:
                _, idx, per_ce = blockwise_head_topk_ce(
                    h, kernel, bias, self._max_k, self.num_actions,
                    labels=action, precision=self.eval_precision,
                )
        else:
            outs = apply_model(params, self.model_cfg, state, true_len)
            preds = outs[self.head_idx]
            per_ce = optax.softmax_cross_entropy_with_integer_labels(preds, action)
            idx = topk_indices(preds, self._max_k)

        w = valid.astype(per_ce.dtype)
        batch_loss = jnp.sum(per_ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        div = diversity_from_topk(
            state,
            idx[:, : self.topk_div],
            true_len,
            self.padding_pos,
            div_embedding,
            out_to_in=out_to_in,
        )
        nov = novelty_from_topk(
            idx[:, : self.topk_nov], unpopular_mask, self.nov_rew_sig
        )
        hits, ndcg = hr_ndcg_from_topk(idx, action, self.topk_hr_ndcg, valid=valid)
        reps = repetitions_from_topk(
            state, idx, self.topk_hr_ndcg, out_to_in=out_to_in, valid=valid
        )
        covered = update_coverage_from_topk(
            accum.covered, idx, self.topk_cov, valid=valid
        )

        type_hits, type_ndcg, type_count = (
            accum.type_hits, accum.type_ndcg, accum.type_count
        )
        if self.num_types > 0 and action_type is not None:
            from ikea_recommender_tpu.ops.ranking import hr_ndcg_by_type_from_topk

            th, tn, tc = hr_ndcg_by_type_from_topk(
                idx, action, action_type, self.num_types,
                self.topk_hr_ndcg, valid=valid,
            )
            type_hits = type_hits + th
            type_ndcg = type_ndcg + tn
            type_count = type_count + tc.astype(jnp.int32)

        return EvalAccum(
            loss_sum=accum.loss_sum + batch_loss,
            n_batches=accum.n_batches + 1,
            n_samples=accum.n_samples + jnp.sum(valid.astype(jnp.int32)),
            hits=accum.hits + hits,
            ndcg=accum.ndcg + ndcg,
            reps=accum.reps + reps,
            div_rew_sum=accum.div_rew_sum + jnp.sum(div * w),
            nov_rew_sum=accum.nov_rew_sum + jnp.sum(nov * w),
            covered=covered,
            type_hits=type_hits,
            type_ndcg=type_ndcg,
            type_count=type_count,
        )

    def update(
        self, params, accum, state, action, true_len, valid, action_type=None
    ) -> EvalAccum:
        return self._update(
            params, accum, state, action, true_len, valid, self._aux, action_type
        )

    # -- normalization -----------------------------------------------------
    def finalize(self, accum: EvalAccum) -> EvalResult:
        # ONE host transfer for the whole accumulator: every int()/float()/
        # np.asarray below would otherwise be its own device readback —
        # ~15-25 synchronous round-trips per eval point (real cost on the
        # tunneled chip, and extra syncs on any deployment).
        accum = jax.device_get(accum)
        n = max(int(accum.n_samples), 1)
        n_b = max(int(accum.n_batches), 1)
        # coverage_ratios semantics (ops/coverage.py) on the host copy
        covered = np.asarray(accum.covered)
        unpop = self._unpop_host
        n_unpop = max(int(unpop.sum()), 1)
        unpop_cov = (covered & unpop[None, :]).sum(axis=1) / n_unpop
        all_cov = covered.sum(axis=1) / self.num_actions
        coverage = {
            k: (float(unpop_cov[i]), float(all_cov[i]))
            for i, k in enumerate(self.topk_cov)
        }
        by_type = None
        if self.num_types > 0:
            th = np.asarray(accum.type_hits)
            tn = np.asarray(accum.type_ndcg)
            tc = np.asarray(accum.type_count)
            by_type = {
                name: {
                    "hr": th[i] / max(int(tc[i]), 1),
                    "ndcg": tn[i] / max(int(tc[i]), 1),
                    "count": int(tc[i]),
                }
                for i, name in enumerate(self.type_names)
            }
        return EvalResult(
            loss=float(accum.loss_sum) / n_b,
            hr=np.asarray(accum.hits) / n,
            ndcg=np.asarray(accum.ndcg) / n,
            coverage=coverage,
            div_rew=float(accum.div_rew_sum) / n,
            nov_rew=float(accum.nov_rew_sum) / n,
            reps=np.asarray(accum.reps) / n,
            by_type=by_type,
        )

    # -- whole-buffer evaluation ------------------------------------------
    def evaluate(self, params, eval_buf, batch_size: int) -> EvalResult:
        from ikea_recommender_tpu.data.replay_buffer import eval_batches

        accum = self.init_accum()
        for b in eval_batches(eval_buf, batch_size):
            accum = self.update(
                params,
                accum,
                jnp.asarray(b.state),
                jnp.asarray(b.action),
                jnp.asarray(b.true_len),
                jnp.asarray(b.valid),
                None if b.action_type is None else jnp.asarray(b.action_type),
            )
        return self.finalize(accum)

    # -- device-resident scanned evaluation (one dispatch for the pass) ----
    @staticmethod
    def device_eval_data(eval_buf) -> Dict[str, jax.Array]:
        data = {
            "state": jnp.asarray(eval_buf.state),
            "action": jnp.asarray(eval_buf.action),
            "true_len": jnp.asarray(eval_buf.true_len),
        }
        if getattr(eval_buf, "action_type", None) is not None:
            data["action_type"] = jnp.asarray(eval_buf.action_type)
        return data

    def _constrain(self, tree, spec):
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, spec)
        return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, sh), tree)

    def _scanned_update(self, params, accum, data, idx_mat, valid_mat, aux):
        def body(acc, xs):
            idx, valid = xs
            batch = {
                "state": jnp.take(data["state"], idx, axis=0),
                "action": jnp.take(data["action"], idx, axis=0),
                "true_len": jnp.take(data["true_len"], idx, axis=0),
                "valid": valid,
            }
            if "action_type" in data:
                batch["action_type"] = jnp.take(data["action_type"], idx, axis=0)
            batch = self._constrain(batch, P(DATA_AXIS))
            acc = self._batch_update(
                params,
                acc,
                batch["state"],
                batch["action"],
                batch["true_len"],
                batch["valid"],
                aux,
                batch.get("action_type"),
            )
            return acc, None

        accum, _ = jax.lax.scan(body, accum, (idx_mat, valid_mat))
        return self._constrain(accum, P())

    def evaluate_device(self, params, data: Dict[str, jax.Array], batch_size: int) -> EvalResult:
        """Whole eval pass as ONE jitted lax.scan over a device-resident
        buffer — no per-batch host dispatch or transfer."""
        if not hasattr(self, "_scan_jit"):
            self._scan_jit = jax.jit(self._scanned_update, donate_argnums=(1,))
        n = int(data["state"].shape[0])
        n_b = -(-n // batch_size)
        idx = np.zeros((n_b, batch_size), dtype=np.int32)
        valid = np.zeros((n_b, batch_size), dtype=bool)
        rows = np.arange(n)
        for i in range(n_b):
            take = rows[i * batch_size : (i + 1) * batch_size]
            idx[i, : len(take)] = take
            valid[i, : len(take)] = True
        accum = self._scan_jit(
            params,
            self.init_accum(),
            data,
            jnp.asarray(idx),
            jnp.asarray(valid),
            self._aux,
        )
        return self.finalize(accum)
