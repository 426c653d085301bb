"""Ulysses-style sequence parallelism: all-to-all head<->sequence re-sharding
around attention.

Capability parity with the reference's DeepSpeed-Ulysses integration
(/root/reference/verl/utils/ulysses.py:63-238 and
models/transformers/flash_attention_utils.py:98-148): a sequence-sharded
activation enters attention, an all-to-all redistributes it to head-sharded
full-sequence, attention runs, and the inverse all-to-all restores sequence
sharding. On TPU the collective is jax.lax.all_to_all over an ICI mesh axis
inside shard_map — no process groups, no autograd-function plumbing (JAX
differentiates through the collective natively).

Like the reference's shipped configs (sp=1), this is an opt-in capability:
the default path lets pjit/XLA pick shardings.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .attention import attention


class UlyssesSpec(NamedTuple):
    """Sequence-parallel wiring handed down into the model forward: the mesh,
    the axis carrying the sp degree, and the axes the batch dim is sharded
    over (so the shard_map region preserves pjit's batch sharding). Built by
    the trainer from actor.ulysses_sequence_parallel_size (reference chain:
    fsdp_workers.py:113-125 -> flash_attention_utils.py:98-148)."""

    mesh: Mesh
    axis: str
    batch_axes: Tuple[str, ...] = ()
    backend: str = "ulysses"   # "ulysses" (head exchange) | "ring" (KV rotation)


def gather_seq_scatter_heads(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, S/sp, H, D) -> (B, S, H/sp, D) inside shard_map."""
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)


def gather_heads_scatter_seq(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, S, H/sp, D) -> (B, S/sp, H, D) inside shard_map."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)


def ulysses_attention(
    q: jnp.ndarray,  # (B, S, Hq, D) — global shapes; seq sharded on `sp_axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    sp_axis: str,
    *,
    segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = True,
    batch_axes: Tuple[str, ...] = (),
) -> jnp.ndarray:
    """Sequence-parallel attention: callers hold sequence-sharded q/k/v; heads
    are exchanged for sequence via all-to-all, full-sequence attention runs on
    each shard's head slice, and the output returns to sequence sharding.
    ``batch_axes`` names the mesh axes the batch dim is sharded over (so the
    region composes with pjit's data/fsdp batch sharding).

    Requirements (same as the reference's Ulysses): num heads (incl. kv heads)
    divisible by the sp degree.
    """
    sp = mesh.shape[sp_axis]
    if q.shape[2] % sp or k.shape[2] % sp:
        raise ValueError(f"q/kv heads ({q.shape[2]}, {k.shape[2]}) must divide sp={sp}")

    b_spec = batch_axes if batch_axes else None
    seq_spec = P(b_spec, sp_axis, None, None)
    seg_spec = P(b_spec, sp_axis) if segment_ids is not None else None

    def inner(q_l, k_l, v_l, seg_l):
        q_full = gather_seq_scatter_heads(q_l, sp_axis)  # (B, S, Hq/sp, D)
        k_full = gather_seq_scatter_heads(k_l, sp_axis)
        v_full = gather_seq_scatter_heads(v_l, sp_axis)
        seg_full = (
            jax.lax.all_gather(seg_l, sp_axis, axis=1, tiled=True) if seg_l is not None else None
        )
        # backend auto: the shard-local full-sequence attention picks the
        # Pallas flash kernel at training lengths — masked XLA SDPA OOMs at
        # s=8192, which is exactly where sp is worth turning on
        out = attention(
            q_full, k_full, v_full, segment_ids=seg_full, causal=causal, backend="auto"
        )
        return gather_heads_scatter_seq(out, sp_axis)

    from jax import shard_map

    specs_in = (seq_spec, seq_spec, seq_spec, seg_spec)
    return shard_map(
        inner, mesh=mesh, in_specs=specs_in, out_specs=seq_spec
    )(q, k, v, segment_ids)


def pad_seq_to_multiple(x: jnp.ndarray, multiple: int, axis: int = 1):
    """Pad the sequence dim to a multiple of the sp degree (parity:
    reference ulysses_pad_and_slice_inputs). Returns (padded, pad_size)."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad
