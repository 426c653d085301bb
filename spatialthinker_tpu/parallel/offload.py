"""Host offload for sharded pytrees (params / optimizer state).

The reference offloads FSDP flat params and optimizer state to CPU between
uses (/root/reference/verl/workers/fsdp_workers.py:252-280) — at 7B on
16GB-class chips this is a fits-or-OOMs feature. The TPU-native equivalent
must work when the pytree is a GLOBAL jax.Array sharded across processes:
``jax.device_get`` on a non-fully-addressable array raises, so each process
keeps numpy copies of only its ADDRESSABLE shards and the restore rebuilds
the global array with ``make_array_from_single_device_arrays``.

Replicated leaves store one buffer per distinct shard index (not per device),
so a fully-replicated 7B tree costs one host copy per process, not one per
chip.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import numpy as np


class HostLeaf(NamedTuple):
    """One offloaded array: unique shard buffers + the device placement map."""

    buffers: Tuple[np.ndarray, ...]          # one per DISTINCT shard index
    placement: Tuple[Tuple[Any, int], ...]   # (device, buffer position) per addressable device
    sharding: Any
    shape: Tuple[int, ...]
    dtype: Any


def _is_host_leaf(x) -> bool:
    return isinstance(x, HostLeaf)


def offload_to_host(tree):
    """Device pytree -> host pytree of per-process shard buffers. The caller
    drops its reference to the device tree; HBM frees once XLA's last use
    retires."""

    def leaf(x):
        if not isinstance(x, jax.Array):
            return x
        index_to_pos = {}
        buffers: List[np.ndarray] = []
        placement = []
        for s in x.addressable_shards:
            key = str(s.index)
            if key not in index_to_pos:
                index_to_pos[key] = len(buffers)
                buffers.append(np.asarray(s.data))
            placement.append((s.device, index_to_pos[key]))
        return HostLeaf(tuple(buffers), tuple(placement), x.sharding, x.shape, x.dtype)

    return jax.tree.map(leaf, tree)


def restore_from_host(tree):
    """Inverse of offload_to_host: re-assemble the global sharded arrays."""

    def leaf(h):
        if not _is_host_leaf(h):
            return h
        singles = [jax.device_put(h.buffers[pos], d) for d, pos in h.placement]
        return jax.make_array_from_single_device_arrays(h.shape, h.sharding, singles)

    return jax.tree.map(leaf, tree, is_leaf=_is_host_leaf)


def is_offloaded(tree) -> bool:
    return any(_is_host_leaf(x) for x in jax.tree.leaves(tree, is_leaf=_is_host_leaf))
