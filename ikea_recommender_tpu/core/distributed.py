"""Multi-host runtime plumbing.

The reference has no distributed backend at all (SURVEY.md §2 #38 — its
"communication" is GCS files + wandb). TPU-native equivalent:

- ``initialize()`` — ``jax.distributed.initialize`` driven by standard env
  vars (a no-op on single-process runs);
- per-host data loading: each process loads its own shard of the replay
  buffer and ``host_local_batch_to_global`` assembles the global sharded
  array (``jax.make_array_from_process_local_data``) — host-local batches
  feed the ``data`` mesh axis without any cross-host gather.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ikea_recommender_tpu.core.mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host JAX runtime. Arguments default from env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); no-op
    when unset or single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0")
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_shard(n: int) -> slice:
    """Row range of a length-n dataset owned by this process (contiguous
    block partitioning)."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n // np_)
    return slice(p * per, min((p + 1) * per, n))


def host_local_batch_to_global(
    batch: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, jax.Array]:
    """Assemble per-process host-local batches into global arrays sharded on
    the data axis (one device transfer per process, no cross-host traffic)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
