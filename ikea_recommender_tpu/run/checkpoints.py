"""Checkpointing: best-model export + full-train-state resume.

Two mechanisms, matching and extending the reference:

- :class:`BestModelTracker` — saves the winning network's params whenever the
  watched validation metric improves (reference ``utils/save_best_model.py``).
  The comparator is fixed: the reference's ``if max:`` tests the *builtin*
  ``max`` (quirk 5) so min-mode silently never worked and the initial best of
  0 assumed nonnegative metrics; here mode is explicit and the initial best
  is ±inf. Stores model dims + epoch + model_idx metadata like the reference.

- :class:`CheckpointManager` — orbax full-state checkpoints (params, both
  optimizer states, step, PRNG key) with resume. The reference has NO resume
  capability (SURVEY.md §5) — training always restarted from scratch.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten_params(params: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params_npz(params: Any, path: str) -> None:
    np.savez_compressed(path, **_flatten_params(params))


def load_params_npz(template: Any, path: str) -> Any:
    data = np.load(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_k, leaf in leaves_paths:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path_k
        )
        arr = data[key]
        new_leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class BestModelTracker:
    def __init__(
        self,
        out_dir: str,
        metric_name: str,
        mode: str = "max",
        write_files: bool = True,
    ):
        """``write_files=False`` keeps all best-model bookkeeping but skips
        the npz/json writes — non-zero processes of a multi-host run track
        the (replicated) metric without racing on the filesystem."""
        if mode not in ("max", "min"):
            raise ValueError("mode must be 'max' or 'min'")
        self.out_dir = out_dir
        self.metric_name = metric_name
        self.mode = mode
        self.write_files = write_files
        self.best = -np.inf if mode == "max" else np.inf
        self.best_epoch: Optional[int] = None
        self.best_model_idx: Optional[int] = None
        os.makedirs(out_dir, exist_ok=True)

    @property
    def params_path(self) -> str:
        return os.path.join(self.out_dir, "best_model.npz")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.out_dir, "best_model.json")

    def improved(self, value: float) -> bool:
        return value > self.best if self.mode == "max" else value < self.best

    def __call__(
        self,
        value: float,
        epoch: int,
        params: Any,
        model_idx: int = 1,
        dims: Optional[Dict] = None,
    ) -> bool:
        """Save `params` if `value` improves the watched metric."""
        if not self.improved(value):
            return False
        self.best = value
        self.best_epoch = epoch
        self.best_model_idx = model_idx
        if not self.write_files:
            return True
        save_params_npz(params, self.params_path)
        meta = {
            "epoch": int(epoch),
            "model_idx": int(model_idx),
            "metric_name": self.metric_name,
            "metric_value": float(value),
        }
        if dims:
            meta.update(dims)
        with open(self.meta_path, "w") as fh:
            json.dump(meta, fh, indent=2)
        return True

    def load_best(self, template: Any) -> Any:
        return load_params_npz(template, self.params_path)

    def restore(
        self,
        value: float,
        epoch: int,
        model_idx: int,
        params: Any = None,
        dims: Optional[Dict] = None,
    ) -> None:
        """Rehydrate tracker state from a resumed checkpoint (the best-model
        scalars ride in the orbax payload — run/trainer.py). Re-materializes
        the best-model files when ``params`` is given so a resume landing in
        a fresh ``exp_dir`` still has them. Without this, a resumed run
        starts the comparator at ±inf and the *final* test eval can silently
        ship a later, worse model (reference contract:
        utils/save_best_model.py:4-41 — the best model is whole-run best)."""
        self.best = float(value)
        self.best_epoch = int(epoch)
        self.best_model_idx = int(model_idx)
        if not self.write_files or params is None:
            return
        if not os.path.exists(self.params_path):
            save_params_npz(params, self.params_path)
            meta = {
                "epoch": int(epoch),
                "model_idx": int(model_idx),
                "metric_name": self.metric_name,
                "metric_value": float(value),
            }
            if dims:
                meta.update(dims)
            with open(self.meta_path, "w") as fh:
                json.dump(meta, fh, indent=2)


class CheckpointManager:
    """Full train-state save/restore via orbax (resume capability)."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 2):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any) -> None:
        self.mngr.save(step, args=self._ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_template: Any) -> Any:
        step = self.latest_step()
        if step is None:
            return None
        return self.mngr.restore(
            step, args=self._ocp.args.StandardRestore(state_template)
        )
