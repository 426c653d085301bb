"""Qwen2.5-VL combined model: vision tower + multimodal merge + text decoder.

The merge scatters vision embeddings into image-token slots with a cumulative
index gather — static shapes, no boolean masked_scatter (the TPU-safe
equivalent of HF's masked_scatter in Qwen2_5_VLModel.forward)."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.quant import embed_rows
from .config import Qwen25VLConfig
from .text import KVCache, forward_hidden, init_text_params, logits_from_hidden
from .vision import init_vision_params, vision_forward

Params = Dict[str, Any]


class VisionInputs(NamedTuple):
    """Static-shape packed vision inputs (host-prepared, see vision.prepare_vision_aux).

    ``index_offset`` (B,) — when present, row b's merged vision embeddings
    start at that index of the packed embeds instead of the batch-wide running
    count. Multi-host packs carry per-host padding between the host slices, so
    the start of each row's patches is precomputed host-side."""

    patches: jnp.ndarray        # (N, C*T*P*P)
    pos_ids: jnp.ndarray        # (N, 2)
    seg_full: jnp.ndarray       # (N,)
    seg_window: jnp.ndarray     # (N,)
    reverse_index: jnp.ndarray  # (N/unit,)
    index_offset: Optional[jnp.ndarray] = None  # (B,)


def merge_multimodal_embeds(
    text_embeds: jnp.ndarray,   # (B, S, E)
    vision_embeds: jnp.ndarray,  # (Nv, E) packed across the whole batch, natural order
    image_token_mask: jnp.ndarray,  # (B, S) bool
    index_offset: Optional[jnp.ndarray] = None,  # (B,) row start into vision_embeds
) -> jnp.ndarray:
    b, s, e = text_embeds.shape
    flat_mask = image_token_mask.reshape(-1)
    if index_offset is None:
        idx = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
    else:
        within = jnp.cumsum(image_token_mask.astype(jnp.int32), axis=1) - 1
        idx = (index_offset[:, None].astype(jnp.int32) + within).reshape(-1)
    idx = jnp.clip(idx, 0, vision_embeds.shape[0] - 1)
    gathered = jnp.take(vision_embeds, idx, axis=0).reshape(b, s, e)
    return jnp.where(flat_mask.reshape(b, s, 1), gathered.astype(text_embeds.dtype), text_embeds)


def embed_inputs(
    params: Params,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,          # (B, S)
    vision: Optional[VisionInputs] = None,
    *,
    remat: bool = False,
) -> jnp.ndarray:
    """Token embeddings with vision embeddings merged into image-token slots
    (B, S, E). Chunked prefill embeds the whole prompt once (the vision tower
    is not chunkable — images must be merged before the sequence is split)."""
    embeds = embed_rows(
        params["text"]["embed_tokens"], input_ids, dtype=params["text"]["norm"].dtype
    )
    if vision is not None:
        vision_embeds = vision_forward(
            params["vision"],
            cfg.vision,
            vision.patches,
            vision.pos_ids,
            vision.seg_full,
            vision.seg_window,
            vision.reverse_index,
            remat=remat,
        )
        image_mask = input_ids == cfg.image_token_id
        embeds = merge_multimodal_embeds(
            embeds, vision_embeds, image_mask, index_offset=vision.index_offset
        )
    return embeds


def forward(
    params: Params,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,          # (B, S)
    position_ids: jnp.ndarray,       # (3, B, S)
    *,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S); 0 = pad
    vision: Optional[VisionInputs] = None,
    cache: Optional[KVCache] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    remat: bool = False,
    sp=None,
    int4_i8dot: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Returns (hidden_states (B,S,E), updated cache)."""
    embeds = embed_inputs(params, cfg, input_ids, vision, remat=remat)
    return forward_hidden(
        params["text"],
        cfg.text,
        inputs_embeds=embeds,
        position_ids=position_ids,
        segment_ids=segment_ids,
        cache=cache,
        kv_segment_ids=kv_segment_ids,
        remat=remat,
        sp=sp,
        int4_i8dot=int4_i8dot,
    )


def prefill_forward(
    params: Params,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,          # (B, P)
    position_ids: jnp.ndarray,       # (3, B, P)
    segment_ids: jnp.ndarray,        # (B, P) int32
    cache: KVCache,
    kv_segment_ids: jnp.ndarray,
    vision: Optional[VisionInputs] = None,
    prefill_chunk: int = 0,
    prefill_rows: int = 0,
) -> Tuple[jnp.ndarray, KVCache]:
    """Prompt prefill into ``cache`` — one forward, or sequence-chunked when
    ``prefill_chunk`` > 0 (vLLM enable_chunked_prefill equivalent: bounds the
    MLP/activation footprint by B*chunk tokens). The vision tower is not
    chunkable (images merge into the embeds before the sequence splits), so
    embeddings are computed once up front. Shared by the dense and continuous
    rollout engines. Returns (last chunk's hidden states, filled cache).

    ``prefill_rows`` > 0 chunks along the BATCH axis instead: row groups run
    ordinary full-length forwards (flash attention at the full sequence, no
    causal-offset pass against a live cache prefix, one weight read per
    group) and scatter their rows into ``cache``. Same activation bound as
    sequence chunking (rows*P tokens vs B*chunk), measurably higher prefill
    MFU at uniform prompt lengths — the long-context bench shapes use this.
    In rows mode the returned hidden is the LAST-position slice (B, 1, E)
    only (all engines sample from exactly that slice)."""
    p = input_ids.shape[1]
    b = input_ids.shape[0]
    if prefill_rows and prefill_rows < b:
        # vision prompts embed once up front (the packed tower output is not
        # row-sliceable before the merge); text-only groups embed locally so
        # no (B, P, E) buffer outlives its group
        embeds = embed_inputs(params, cfg, input_ids, vision) if vision is not None else None
        ln, _, hkv, _, d = cache.k.shape
        is_int4 = cache.k.dtype == jnp.uint8
        width = cache.k.shape[3] * (2 if is_int4 else 1)
        marker = jnp.uint8 if is_int4 else cache.k.dtype
        new_arrays = list(cache.arrays())
        tails = []
        length = cache.length
        for r0 in range(0, b, prefill_rows):
            r1 = min(r0 + prefill_rows, b)
            sub = KVCache.init(ln, r1 - r0, width, hkv, d, dtype=marker)
            if embeds is not None and prefill_chunk and prefill_chunk < p:
                # vision rows compose with sequence chunking too: the merged
                # embeds pre-slice per group, so the activation bound stays
                # rows*chunk even for image prompts
                h = None
                for c in range(0, p, prefill_chunk):
                    e = min(c + prefill_chunk, p)
                    h, sub = forward_hidden(
                        params["text"], cfg.text,
                        inputs_embeds=embeds[r0:r1, c:e],
                        position_ids=position_ids[:, r0:r1, c:e],
                        segment_ids=segment_ids[r0:r1, c:e],
                        cache=sub, kv_segment_ids=kv_segment_ids[r0:r1],
                        attend_to_cache=True,
                    )
            elif embeds is not None:
                h, sub = forward_hidden(
                    params["text"], cfg.text,
                    inputs_embeds=embeds[r0:r1],
                    position_ids=position_ids[:, r0:r1],
                    segment_ids=segment_ids[r0:r1],
                    cache=sub, kv_segment_ids=kv_segment_ids[r0:r1],
                )
            else:
                h, sub = prefill_forward(
                    params, cfg, input_ids[r0:r1], position_ids[:, r0:r1],
                    segment_ids[r0:r1], sub, kv_segment_ids[r0:r1],
                    vision=None, prefill_chunk=prefill_chunk,
                )
            tails.append(h[:, -1:, :])
            for i, sa in enumerate(sub.arrays()):
                idx = (0, r0) + (0,) * (sa.ndim - 2)
                new_arrays[i] = jax.lax.dynamic_update_slice(new_arrays[i], sa, idx)
            length = sub.length
        hidden = jnp.concatenate(tails, axis=0)
        if len(new_arrays) == 4:
            k_, v_, ks_, vs_ = new_arrays
            return hidden, KVCache(k_, v_, length, ks_, vs_)
        return hidden, KVCache(new_arrays[0], new_arrays[1], length)
    if prefill_chunk and prefill_chunk < p:
        # Vision prompts embed ONCE up front (the tower is not chunkable).
        # Text-only prompts embed per chunk instead: a (B, P, E) bf16 embeds
        # buffer plus its live per-chunk slices costs ~2x B*P*E HBM — at
        # b=320/p=2048/3B that's ~5 GB, the difference between fitting and
        # OOM for the long-context decode batch the int4 KV cache admits.
        embeds = embed_inputs(params, cfg, input_ids, vision) if vision is not None else None
        hidden = None
        for c in range(0, p, prefill_chunk):
            e = min(c + prefill_chunk, p)
            chunk_embeds = (
                embeds[:, c:e]
                if embeds is not None
                else embed_inputs(params, cfg, input_ids[:, c:e], None)
            )
            hidden, cache = forward_hidden(
                params["text"], cfg.text,
                inputs_embeds=chunk_embeds,
                position_ids=position_ids[:, :, c:e],
                segment_ids=segment_ids[:, c:e],
                cache=cache, kv_segment_ids=kv_segment_ids,
                attend_to_cache=True,
            )
        return hidden, cache
    return forward(
        params, cfg, input_ids, position_ids,
        segment_ids=segment_ids, vision=vision, cache=cache,
        kv_segment_ids=kv_segment_ids,
    )


def fanout_rows(x: jnp.ndarray, n: int, axis: int = 0) -> jnp.ndarray:
    """Repeat each index along ``axis`` n times (grouped-sampling fanout:
    row i maps to rows i*n..i*n+n-1). broadcast+reshape rather than
    jnp.repeat — XLA fuses it into the consuming write without materializing
    a gathered n-x intermediate (which OOMs for prompt-KV-sized operands)."""
    s = x.shape
    wide = jnp.broadcast_to(
        jnp.expand_dims(x, axis + 1), (*s[: axis + 1], n, *s[axis + 1 :])
    )
    return wide.reshape(*s[:axis], s[axis] * n, *s[axis + 1 :])


def forward_logits(
    params: Params,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    *,
    segment_ids: Optional[jnp.ndarray] = None,
    vision: Optional[VisionInputs] = None,
    cache: Optional[KVCache] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    hidden, cache = forward(
        params, cfg, input_ids, position_ids,
        segment_ids=segment_ids, vision=vision, cache=cache,
        kv_segment_ids=kv_segment_ids, remat=remat,
    )
    return logits_from_hidden(params["text"], hidden, cfg.text), cache


def init_params(cfg: Qwen25VLConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "text": init_text_params(cfg.text, k1, dtype),
        "vision": init_vision_params(cfg.vision, k2, dtype),
    }
