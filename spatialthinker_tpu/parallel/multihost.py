"""Multi-host (multi-slice) support: one python process per host, one global
SPMD program (the TPU-native replacement for the reference's Ray actor
launch + NCCL rendezvous, /root/reference/verl/single_controller/ray/base.py).

Pattern: every host loads its slice of the global batch, assembles global
jax.Arrays with make_array_from_process_local_data, and runs the same jitted
step; host-side stages (reward scoring, decoding) run on each host's slice and
are allgathered where the driver needs global views.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_if_needed(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env/auto-detection (no-op single host)."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception:
        pass  # single-process / already initialized


def process_local_slice(global_size: int) -> Tuple[int, int]:
    """[start, end) of this host's rows in a globally sharded batch."""
    n = jax.process_count()
    if global_size % n:
        raise ValueError(f"global batch {global_size} not divisible by {n} hosts")
    per = global_size // n
    i = jax.process_index()
    return i * per, (i + 1) * per


def global_batch_array(local: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Assemble a global array from each host's local shard (single-host:
    plain device_put with the sharding)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def allgather_host_data(local: np.ndarray) -> np.ndarray:
    """Gather per-host numpy rows to every host (reward metrics, decode text
    bookkeeping). Single-host: identity."""
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(local, tiled=True))


def host_local_rows(global_array: jax.Array, mesh: Mesh, spec: P) -> np.ndarray:
    """This host's row-slice of a globally sharded device array, as numpy —
    the inverse of global_batch_array (single-host: the whole array)."""
    if jax.process_count() == 1:
        return np.asarray(global_array)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.global_array_to_host_local_array(global_array, mesh, spec)
    )


def global_array_from_full(full: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Global device array from a FULL host value that every process holds
    identically (e.g. after an entry allgather): each process contributes the
    shards its addressable devices own, sliced from the full value — no
    assumption about device order beyond the sharding itself."""
    full = np.asarray(full)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(full, sharding)
    return jax.make_array_from_callback(full.shape, sharding, lambda idx: full[idx])


def fetch_global(arr: jax.Array, mesh: Mesh, spec: P) -> np.ndarray:
    """FULL host value of a (possibly non-fully-addressable) global array on
    every process: local row block + allgather. ``spec`` must shard axis 0
    only (the repo's batch convention) so rank-order tiling reconstructs the
    global row order."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    return allgather_host_data(host_local_rows(arr, mesh, spec))


def allgather_pyobj(obj) -> list:
    """Gather an arbitrary picklable object from every process; returns the
    per-rank list on every process (ragged rollout inputs — per-prompt patch
    arrays — can't ride the uniform-shape allgather above)."""
    import pickle

    if jax.process_count() == 1:
        return [obj]
    data = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    lens = allgather_host_data(np.asarray([len(data)], dtype=np.int64))
    width = int(lens.max())
    padded = np.zeros((1, width), dtype=np.uint8)
    padded[0, : len(data)] = data
    rows = allgather_host_data(padded)  # (n_proc, width)
    return [
        pickle.loads(rows[i, : int(lens[i])].tobytes()) for i in range(len(lens))
    ]


def negotiate_row_count(local_rows: int) -> int:
    """Agree on a common per-host row count (max over hosts) for stages whose
    local row counts are data-dependent, e.g. FFD packing — hosts pad their
    rows up to the agreed count (padding rows carry segment id 0 -> masked)."""
    if jax.process_count() == 1:
        return local_rows
    counts = allgather_host_data(np.asarray([local_rows], dtype=np.int64))
    return int(counts.max())
