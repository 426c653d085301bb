"""Device mesh construction: the TPU-native replacement for the reference's
process-group plumbing (FSDP device mesh + Ulysses mesh + vLLM TP mesh,
/root/reference/verl/workers/fsdp_workers.py:104-125 and :310-316).

One mesh, three axes:
- ``data``  — replica axis (HSDP's ddp dim); batch is sharded here.
- ``fsdp``  — parameter-shard axis (ZeRO-3); batch is ALSO sharded here for
  activations (fsdp is a data axis from the activations' perspective).
- ``model`` — tensor-parallel axis (attention heads / mlp intermediate).

The same mesh serves training and decoding: there is no weight-sync or
sharding-manager machinery (reference fsdp_vllm.py) because both phases read
one pjit-sharded param pytree.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"
AXES = (DATA_AXIS, FSDP_AXIS, MODEL_AXIS)

# batch dims shard over both data-like axes
BATCH_AXES = (DATA_AXIS, FSDP_AXIS)


def create_mesh(
    data_size: int = 1,
    fsdp_size: int = -1,
    model_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp_size == -1:
        assert n % (data_size * model_size) == 0, (
            f"{n} devices not divisible by data={data_size} * model={model_size}"
        )
        fsdp_size = n // (data_size * model_size)
    assert data_size * fsdp_size * model_size == n, (
        f"mesh {data_size}x{fsdp_size}x{model_size} != {n} devices"
    )
    dev_array = np.asarray(devices).reshape(data_size, fsdp_size, model_size)
    return Mesh(dev_array, AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
