"""Attention dispatcher: one entry point, multiple backends.

The reference gets attention from flash-attn CUDA kernels
(/root/reference/verl/models/transformers/flash_attention_utils.py:34-37);
here the contract is jnp-native:

- ``xla`` backend: grouped-query scaled-dot-product attention as einsums with
  fp32 softmax — XLA fuses and tiles this onto the MXU; correct for any mask.
- ``flash`` backend: the Pallas TPU kernel (ops/flash_attention.py) for the
  long-sequence hot path, selected automatically when shapes/dtypes allow.

Layout is B S H D everywhere (batch, sequence, heads, head_dim) — the natural
layout for TPU (contraction dims last) and for sequence-sharded meshes.

Masking model (replaces CUDA varlen/cu_seqlens): ``segment_ids`` (B, S) int32
marks packed sub-sequences; tokens attend only within their segment. Segment
id 0 is reserved for padding (attends to nothing). ``causal`` adds the
autoregressive constraint. This gives static shapes for packed batches — the
TPU-native equivalent of the reference's rmpad/flash_attn_varlen path
(/root/reference/verl/workers/actor/dp_actor.py:85-139).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_attention_mask(
    q_segment_ids: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,
    causal: bool = True,
    q_offset: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Build a boolean (B, 1, Sq, Skv) mask from segment ids.

    Padding convention: segment id 0 never attends / is never attended.
    ``q_offset`` (B,) shifts query positions for decode (q at absolute
    position offset+i attends kv positions <= offset+i).
    """
    same = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]) & (
        q_segment_ids[:, :, None] != 0
    )
    if causal:
        sq, skv = q_segment_ids.shape[1], kv_segment_ids.shape[1]
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        if q_offset is not None:
            q_pos = q_pos[None] + q_offset[:, None, None]
            kv_pos = kv_pos[None]
            same = same & (kv_pos <= q_pos)
        else:
            same = same & (kv_pos <= q_pos)[None]
    return same[:, None, :, :]


def xla_attention(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,  # (B, Skv, Hkv, D)
    mask: Optional[jnp.ndarray] = None,  # (B, 1, Sq, Skv) bool
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Grouped-query SDPA with fp32 softmax. KV heads are broadcast to query
    groups inside the einsum (no materialized repeat_kv)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv
    scale = scale if scale is not None else d**-0.5

    qg = q.reshape(b, sq, hkv, groups, d)
    # scores: (B, Hkv, G, Sq, Skv)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    probs_mask = None
    if mask is not None:
        m = mask[:, :, None, :, :]
        scores = jnp.where(m, scores, NEG_INF)
        probs_mask = m
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if probs_mask is not None:
        # fully-masked (padding) rows would softmax to uniform; zero them so
        # they emit zeros and contribute no gradient (flash-kernel semantics)
        probs = probs * probs_mask
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(b, sq, hq, d)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = True,
    q_offset: Optional[jnp.ndarray] = None,
    causal_offset: Optional[int] = None,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Unified attention entry point. q:(B,Sq,Hq,D), k/v:(B,Skv,Hkv,D).

    ``q_offset`` is a per-row (B,) traced offset (decode); ``causal_offset``
    is a STATIC scalar offset (chunked prefill) — the static form keeps the
    flash kernel eligible, where the masked-SDPA fallback would materialize a
    (B, Hq, Sq, Skv) fp32 score tensor (3GB at 3B long-context shapes)."""
    b, sq, hq, d = q.shape
    kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids

    if backend in ("auto", "flash") and _flash_eligible(q, k, causal, segment_ids, q_offset, causal_offset):
        from .flash_attention import flash_attention

        blk = _flash_block(sq, k.shape[1])
        if causal_offset is not None:
            # cross-length chunked prefill holds the FULL kv prefix in VMEM
            # alongside the scores block; 512-blocks overflow the 16MB scoped
            # vmem at long prefixes (measured: chunk 512 x prefix 5120 OOMs)
            blk = min(blk, 256)
        try:
            return flash_attention(
                q, k, v, segment_ids=segment_ids, kv_segment_ids=kv_seg,
                causal=causal, scale=scale, causal_offset=causal_offset or 0,
                block_q=blk, block_k=blk,
            )
        except Exception:
            if backend == "flash":
                raise
            # fall through to XLA path

    if q_offset is None and causal_offset is not None:
        q_offset = jnp.full((b,), causal_offset, dtype=jnp.int32)
    mask = None
    if segment_ids is not None:
        mask = make_attention_mask(segment_ids, kv_seg, causal=causal, q_offset=q_offset)
    elif causal:
        ones = jnp.ones((b, sq), dtype=jnp.int32)
        kv_ones = jnp.ones((b, k.shape[1]), dtype=jnp.int32)
        mask = make_attention_mask(ones, kv_ones, causal=True, q_offset=q_offset)
    return xla_attention(q, k, v, mask=mask, scale=scale)


def _flash_block(sq: int, skv: int) -> Optional[int]:
    """Largest kernel block dividing both lengths (None = no legal block).
    The trainer buckets prompts to 512 and responses/packed rows to 256, so
    training forwards are 256-aligned (e.g. 2304 = 2048 + 256) — 512-only
    blocks would silently push the GRPO-shape forwards onto masked XLA SDPA."""
    for blk in (512, 256, 128):
        if sq % blk == 0 and skv % blk == 0:
            return blk
    return None


def _flash_shape_eligible(q, k, causal, segment_ids, q_offset, causal_offset=None) -> bool:
    """Shape-only eligibility (backend-independent, so tests pin it on CPU):
    a legal block exists, same q/kv length (or a static chunked-prefill
    offset), no traced decode offset. Measured on v5e (b=2, 16 q-heads,
    d=128): ~parity at 1024, 1.5x at 2048, 2.5x at 4096; XLA fails outright
    at 8192 where flash runs — so the self-attention threshold is 1024. The
    static-offset (chunked prefill) path has no threshold: the fallback's
    fp32 score tensor is the memory hog the chunking exists to avoid."""
    if q_offset is not None:
        return False
    b, sq, hq, d = q.shape
    if d % 8 != 0:
        return False
    skv = k.shape[1]
    if _flash_block(sq, skv) is None:
        return False
    if causal_offset is not None:
        return True
    if sq != skv:
        return False
    return sq >= 1024


def _flash_eligible(q, k, causal, segment_ids, q_offset, causal_offset=None) -> bool:
    if jax.default_backend() != "tpu":
        return False
    return _flash_shape_eligible(q, k, causal, segment_ids, q_offset, causal_offset)
