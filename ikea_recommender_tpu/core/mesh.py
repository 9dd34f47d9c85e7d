"""Device mesh construction.

The reference is single-process / single-GPU (SURVEY.md §0); scaling here is a
new capability: a 2-D ``(data, model)`` mesh where the batch is sharded on
``data`` and the embedding table rows + output-head columns are sharded on
``model`` (ICI collectives inserted by XLA under jit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def make_mesh(
    spec: Optional[MeshSpec] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Build a (data, model) mesh over the given (or all) devices.

    With no spec, all devices go on the data axis (pure DP).
    """
    if devices is None:
        devices = jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    if spec.num_devices > len(devices):
        raise ValueError(
            f"mesh {spec} needs {spec.num_devices} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: spec.num_devices]).reshape(spec.data, spec.model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshSpec(1, 1), devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharded over the data axis, replicated over model."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
