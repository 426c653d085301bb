"""Parameter sharding rules for the Qwen2.5-VL param pytree.

Megatron-style tensor parallelism on the ``model`` axis (column-parallel
qkv/gate/up, row-parallel o/down) combined with ZeRO-3 parameter sharding on
the ``fsdp`` axis. Rules are path-based over the functional pytree, so they
apply uniformly to the stacked (L, ...) decoder leaves.

This is the declarative TPU equivalent of the reference's FSDP wrap policy +
vLLM tensor_parallel_size (/root/reference/verl/workers/fsdp_workers.py:237-280,
/root/reference/verl/workers/rollout/vllm_rollout_spmd.py:72): instead of
wrapping modules and syncing two copies, every array gets one PartitionSpec.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, MODEL_AXIS

# (path-suffix match, spec) — first match wins. Paths are "/"-joined key paths
# WITHOUT the leading stacked-layer dim (specs below are for the per-layer
# shape; stacked leaves get None prepended automatically).
_TEXT_RULES: Tuple[Tuple[str, P], ...] = (
    # fused QKV (Hkv, E, G) with G = (h/hkv+2)*d, group-major (the stored byte
    # order IS the batched-dot layout — see text.fused_qkv): column-parallel
    # over the leading KV-GROUP dim, so each model shard owns whole GQA groups
    # (q heads + their k/v) and attention stays shard-local; caps model_size
    # at num_key_value_heads
    ("self_attn/qkv_proj", P(MODEL_AXIS, FSDP_AXIS, None)),
    ("self_attn/qkv_bias", P(MODEL_AXIS, None)),
    ("self_attn/o_proj", P(MODEL_AXIS, FSDP_AXIS)),
    # fused gate/up (2, E, I): column-parallel on I; the explicit 2-dim keeps
    # silu(gate)*up local per shard
    ("mlp/gate_up_proj", P(None, FSDP_AXIS, MODEL_AXIS)),
    ("mlp/down_proj", P(MODEL_AXIS, FSDP_AXIS)),
    ("input_layernorm", P()),
    ("post_attention_layernorm", P()),
    ("embed_tokens", P(MODEL_AXIS, FSDP_AXIS)),  # vocab x embed
    ("lm_head", P(FSDP_AXIS, MODEL_AXIS)),
    ("text/norm", P()),
)

_VISION_RULES: Tuple[Tuple[str, P], ...] = (
    ("blocks/qkv_bias", P(MODEL_AXIS)),
    ("blocks/qkv", P(FSDP_AXIS, MODEL_AXIS)),
    ("blocks/proj_bias", P()),
    ("blocks/proj", P(MODEL_AXIS, FSDP_AXIS)),
    ("mlp/gate_bias", P(MODEL_AXIS)),
    ("mlp/up_bias", P(MODEL_AXIS)),
    ("mlp/down_bias", P()),
    ("mlp/gate_proj", P(FSDP_AXIS, MODEL_AXIS)),  # vision MLP (text MLP is fused)
    ("mlp/up_proj", P(FSDP_AXIS, MODEL_AXIS)),
    ("mlp/down_proj", P(MODEL_AXIS, FSDP_AXIS)),
    ("blocks/norm1", P()),
    ("blocks/norm2", P()),
    ("patch_embed", P(None, FSDP_AXIS)),
    ("merger/ln_q", P()),
    ("merger/fc1_bias", P(MODEL_AXIS)),
    ("merger/fc1", P(FSDP_AXIS, MODEL_AXIS)),
    ("merger/fc2_bias", P()),
    ("merger/fc2", P(MODEL_AXIS, FSDP_AXIS)),
)

RULES = _VISION_RULES + _TEXT_RULES


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def spec_for_path(path_str: str, ndim: int) -> P:
    for suffix, spec in RULES:
        if suffix in path_str:
            spec_tuple = tuple(spec)
            if len(spec_tuple) < ndim:
                # stacked layer leaves: prepend None for the (L,) dim
                spec_tuple = (None,) * (ndim - len(spec_tuple)) + spec_tuple
            elif len(spec_tuple) > ndim:
                spec_tuple = spec_tuple[-ndim:] if ndim > 0 else ()
            if all(s is None for s in spec_tuple):
                return P()
            return P(*spec_tuple)
    return P()  # replicate unknown leaves (norms, scalars)


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching the param pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), np.ndim(leaf)), params
    )


def _degrade_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop a dim's mesh axes when its size doesn't divide them: a leaf whose
    heads/columns can't split over the model axis REPLICATES there instead of
    failing. This is what lets ring sequence parallelism (ops/ring.py) run
    with sp > num_kv_heads — attention params replicate over the model axis
    while the MLP stays tensor-parallel."""
    out = []
    for d, entry in enumerate(tuple(spec)):
        if entry is None or d >= len(shape):
            out.append(None if d >= len(shape) else entry)
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        out.append(entry if shape[d] % size == 0 else None)
    return P(*out)


def param_shardings(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree.map(
        lambda spec, leaf: NamedSharding(mesh, _degrade_spec(spec, np.shape(leaf), mesh)),
        param_specs(params), params,
    )


def shard_params(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Place a (host) param pytree onto the mesh with the standard rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
