"""Qwen2.5-VL text decoder in functional JAX.

Pure functions over a param pytree (nested dicts of jnp arrays); no module
framework in the hot path, so sharding is a tree_map of PartitionSpecs and HF
weight loading is a key mapping. Architecture contract: GQA attention with
QKV biases, mRoPE, RMSNorm (fp32 accumulation), SwiGLU MLP, optional tied
embeddings — the same computation HF's Qwen2_5_VLTextModel performs for the
reference's actor/ref/critic forwards
(/root/reference/verl/workers/fsdp_workers.py:149-236).

Layout decisions (TPU-first):
- linear weights stored (in, out): forward is x @ W, feeding the MXU directly.
- decoder layers are STACKED: every leaf in params["layers"] carries a leading
  (num_layers,) dim and the stack runs under lax.scan — one layer is traced &
  compiled once regardless of depth, and sharding rules apply uniformly.
- attention layout B S H D; mRoPE cos/sin computed once per forward.
- KV cache is a scan carry (pure function in/out), shaped (L, B, Smax, Hkv, D).
- remat: jax.checkpoint on the scanned layer body when requested.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.decode_attention import decode_attention
from ...ops.quant import (
    embed_rows, fused_silu_quant_dot, is_quantized, linear, quantized_dot,
    w4_swiglu,
)
from .config import TextConfig
from .rope import apply_rotary, compute_cos_sin, make_inv_freq

Params = Dict[str, Any]


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def swiglu_mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU with gate/up fused into one contiguous weight: p["gate_up_proj"]
    is (2, E, I) — decode reads one buffer instead of two, and the (2, E, I)
    memory order matches the layout XLA's dot wants (storing (E, 2, I) makes
    XLA materialize a transposed copy of the whole stack at runtime: a 3GB HLO
    temp at 3B). The separate leading 2 (instead of a flat 2I column dim)
    keeps the tensor-parallel sharding on I local to each shard
    (silu(gate)*up never crosses shards). Matmuls go through ops.quant.linear
    so an int8-quantized rollout tree (ops/quant.py) dispatches to the W8A8
    MXU path with no second code path.

    The QUANTIZED tree stores gate_up re-laid-out 2D (E, 2I), gate columns
    first (quantize_params): one wide W8A8 matmul whose natively-2D (m, 2I)
    output feeds the Pallas silu->quantize junction kernel without a Mosaic
    relayout; prefill-scale m dispatches to the fused junction + int8 down
    dot, decode falls through to the XLA pipeline. (Under rollout TP the 2D
    column dim no longer keeps silu(gate)*up shard-local — XLA inserts the
    collective; the training tree keeps the TP-local (2, E, I) form.)"""
    gup = p["gate_up_proj"]
    if is_quantized(gup) and gup["qvalue"].ndim == 2:  # rollout 2D layout
        if "gate_up_w4" in p:  # w4a8: int4 decode copies (small-m path)
            out = w4_swiglu(p, x, out_dtype=x.dtype)
            if out is not None:
                return out
        gu = linear(x, gup, contract_axis=0)  # (..., 2I)
        fused = fused_silu_quant_dot(gu, p["down_proj"], out_dtype=x.dtype)
        if fused is not None:  # silu-mul + down-input quantize in one HBM pass
            return fused
        i = gu.shape[-1] // 2
        return linear(jax.nn.silu(gu[..., :i]) * gu[..., i:],
                      p["down_proj"], contract_axis=0)
    gu = linear(x, gup, contract_axis=1)  # "...e,tei->...ti"
    return linear(jax.nn.silu(gu[..., 0, :]) * gu[..., 1, :], p["down_proj"], contract_axis=0)


def fused_qkv(attn_p: Params, normed: jnp.ndarray, h: int, hkv: int, d: int):
    """One wide QKV matmul -> (q, k, v). attn_p["qkv_proj"] is (Hkv, E, G)
    with G = (h/hkv + 2) * d: per KV group the columns are [q heads of the
    group | k | v]. Group-major q ordering equals the natural HF head order
    (GQA assigns head i to group i // (h/hkv)), so no permutation exists
    anywhere — the loader just reshapes. The group axis leads (Hkv, E, G) so
    the stored bytes match the batched-dot layout XLA wants — storing
    (E, Hkv, G) makes XLA keep a transposed runtime copy of the whole stack.
    Sharded on the Hkv axis for TP."""
    qper = h // hkv
    fused = linear(normed, attn_p["qkv_proj"], contract_axis=1) + attn_p["qkv_bias"]
    lead = fused.shape[:-2]
    q = fused[..., : qper * d].reshape(*lead, h, d)
    k = fused[..., qper * d : (qper + 1) * d]
    v = fused[..., (qper + 1) * d :]
    return q, k, v


class KVCache(NamedTuple):
    """Dense KV cache, head-major (L, B, Hkv, Smax, D): decode reads one
    contiguous (S, D) stripe per kv head — the layout the Pallas decode kernel
    (ops/decode_attention.py) tiles directly. The stacked (L, ...) buffers are
    CARRIED through the layer scan and updated in place with a one-token
    dynamic_update_slice at the layer index (XLA aliases scan carries), so a
    decode step's cache traffic is the read the attention itself needs — not a
    full-cache copy per layer. With dtype int8 the values are quantized per
    token-head (symmetric max-abs scales in bf16: ~56% of bf16 HBM traffic).

    int4 mode (marker dtype: UINT8 buffers): values are packed two tokens per
    byte, SPLIT-HALF along the sequence — token t lives in byte row
    t % (Smax/2), low nibble for t < Smax/2, high nibble otherwise. The
    packed row index never depends on the token's nibble half, the unpack is
    two arithmetic shifts, and the decode kernel processes the two halves as
    two online-softmax block updates (order-independent), so no interleave or
    lane-strided op ever exists. Scales stay per-token at index t (unpacked).
    ~30% of bf16 HBM traffic; quality sits below int8 (AWQ-class 4-bit) —
    opt-in via rollout.kv_cache_dtype=int4 (all engines; the paged pools
    pack page-locally, rollout/paged.py)."""

    k: jnp.ndarray  # (L, B, Hkv, Smax, D) | uint8 (L, B, Hkv, Smax/2, D) int4
    v: jnp.ndarray
    length: jnp.ndarray  # () int32 — filled prefix length (uniform across batch)
    k_scale: Optional[jnp.ndarray] = None  # (L, B, Hkv, Smax) — int8/int4 modes
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def init(cls, num_layers, batch, max_len, num_kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
        # a PYTHON int, not a traced scalar: chunked prefill runs a static
        # python loop, so lengths stay static and the cross-chunk attention
        # can slice the live cache prefix + use the flash kernel's static
        # causal_offset. Decode loops re-bind length to a traced scalar.
        zero_len = 0
        sshape = (num_layers, batch, num_kv_heads, max_len)
        if dtype == jnp.int8:
            return cls(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8), zero_len,
                jnp.zeros(sshape, jnp.bfloat16), jnp.zeros(sshape, jnp.bfloat16),
            )
        if dtype == jnp.uint8:  # int4 marker: packed (Smax/2, D) byte rows
            assert max_len % 2 == 0, max_len
            pshape = (num_layers, batch, num_kv_heads, max_len // 2, head_dim)
            return cls(
                jnp.zeros(pshape, jnp.uint8), jnp.zeros(pshape, jnp.uint8), zero_len,
                jnp.zeros(sshape, jnp.bfloat16), jnp.zeros(sshape, jnp.bfloat16),
            )
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), zero_len)

    def arrays(self) -> tuple:
        """The carried leaves (k, v[, k_scale, v_scale]) for the layer scan."""
        if self.k.dtype in (jnp.int8, jnp.uint8):
            return (self.k, self.v, self.k_scale, self.v_scale)
        return (self.k, self.v)


def _quantize_kv(x: jnp.ndarray):
    """(B, S, H, D) -> int8 values + (B, S, H) bf16 scales (symmetric max-abs)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


def _dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]).astype(dtype)


def _quantize_kv4(x: jnp.ndarray):
    """(..., S, D) -> int4 values in [-7, 7] (as int8) + (..., S) bf16 scales."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-6) / 7.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


KV4_BIAS = 8  # stored nibble = value + 8 (unsigned [1, 15]; values clip ±7)


def _pack_nibbles(low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    """Two int4-valued int8 arrays -> one uint8 (biased: (low+8) | (high+8)<<4).

    The +8 bias makes the stored nibbles UNSIGNED so the Pallas decode
    kernels unpack with just `& 15` / `>> 4` + one convert and fold the -8
    into the dot epilogue (q.(u-8) = q.u - 8*sum(q)). The classic two's-
    complement sign-extend costs 6 VPU ops per element, which left the int4
    decode-attention kernel at 249 GB/s vs the int8 kernel's 621 — unpack-
    bound, not HBM-bound."""
    u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8)
    bias = jnp.int8(KV4_BIAS)
    return (u8(low + bias) & jnp.uint8(0xF)) | (u8(high + bias) << 4)


def _unpack_nibbles(p: jnp.ndarray):
    """uint8 -> (low int8, high int8): unbias the stored [1,15] nibbles."""
    x = p.astype(jnp.int32)
    lo = (x & 15) - KV4_BIAS
    hi = (x >> 4) - KV4_BIAS
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _unpack_kv4(packed: jnp.ndarray, seq_axis: int) -> jnp.ndarray:
    """Packed (..., S/2, D) -> int8 (..., S, D): low nibbles are tokens
    [0, S/2), high nibbles [S/2, S) (split-half layout)."""
    low, high = _unpack_nibbles(packed)
    return jnp.concatenate([low, high], axis=seq_axis)


def repack_kv4(src: jnp.ndarray, total: int) -> jnp.ndarray:
    """Re-lay a packed int4 buffer holding tokens [0, p) of a width-p cache
    (L, B, Hkv, p/2, D) into the split-half layout of a width-``total`` cache
    (L, B, Hkv, total/2, D). The nibble half of token t is t // (S/2), so a
    width change is a one-time unpack/repack pass over the prompt KV."""
    p = 2 * src.shape[3]
    half_t = total // 2
    toks = _unpack_kv4(src, seq_axis=3)  # (L, B, Hkv, p, D) int8
    n_low = min(p, half_t)
    low = toks[:, :, :, :n_low]
    if n_low < half_t:
        low = jnp.pad(low, ((0, 0), (0, 0), (0, 0), (0, half_t - n_low), (0, 0)))
    if p > half_t:
        high = jnp.pad(
            toks[:, :, :, half_t:],
            ((0, 0), (0, 0), (0, 0), (0, half_t - (p - half_t)), (0, 0)),
        )
    else:
        high = jnp.zeros_like(low)
    return _pack_nibbles(low, high)


def _update_kv4(arr: jnp.ndarray, q4: jnp.ndarray, layer_idx, start):
    """Write int4 token rows [start, start+s) into the packed
    (L, B, Hkv, Smax/2, D) uint8 buffer (split-half nibble layout). A static
    python ``start`` (chunked prefill) splits at the half boundary; a traced
    ``start`` requires s == 1 (the decode write)."""
    half = arr.shape[3]
    b, hkv, s, d = q4.shape
    u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8)
    if isinstance(start, int):
        parts = []
        n_low = max(0, min(s, half - start))
        if n_low:
            parts.append((start, q4[:, :, :n_low], False))
        if n_low < s:
            parts.append((start + n_low - half, q4[:, :, n_low:], True))
        for row, qpart, is_high in parts:
            width = qpart.shape[2]
            slab = jax.lax.dynamic_slice(
                arr, (layer_idx, 0, 0, row, 0), (1, b, hkv, width, d)
            )
            qb = u8(qpart + jnp.int8(KV4_BIAS))[None]  # biased storage
            if is_high:
                merged = (slab & jnp.uint8(0x0F)) | (qb << 4)
            else:
                merged = (slab & jnp.uint8(0xF0)) | (qb & jnp.uint8(0xF))
            arr = jax.lax.dynamic_update_slice(arr, merged, (layer_idx, 0, 0, row, 0))
        return arr
    assert s == 1, "traced int4 KV writes are single-token (decode)"
    row = jax.lax.rem(start, half)
    slab = jax.lax.dynamic_slice(arr, (layer_idx, 0, 0, row, 0), (1, b, hkv, 1, d))
    qb = u8(q4 + jnp.int8(KV4_BIAS))[None]  # biased storage
    low_m = (slab & jnp.uint8(0xF0)) | (qb & jnp.uint8(0xF))
    high_m = (slab & jnp.uint8(0x0F)) | (qb << 4)
    merged = jnp.where(start >= half, high_m, low_m)
    return jax.lax.dynamic_update_slice(arr, merged, (layer_idx, 0, 0, row, 0))


def attention_inputs(p: Params, cfg: TextConfig, x: jnp.ndarray, cos, sin):
    """Shared head of every decoder layer (training, dense-cache decode, AND
    the continuous engine's per-slot decode — rollout/continuous._decode_layer):
    rms-norm -> fused QKV -> mRoPE. The engines differ only in how they WRITE
    k/v into their cache; keeping this sequence in one place keeps the two
    decode paths numerically pinned to the training forward."""
    normed = rms_norm(x, p["input_layernorm"], cfg.rms_norm_eps)
    q, k, v = fused_qkv(
        p["self_attn"], normed, cfg.num_attention_heads, cfg.num_key_value_heads,
        cfg.head_dim,
    )
    q, k = apply_rotary(q, k, cos, sin)
    return q, k, v


def finish_layer(p: Params, cfg: TextConfig, x: jnp.ndarray, out: jnp.ndarray):
    """Shared tail of every decoder layer: o_proj residual + SwiGLU MLP
    residual. ``out`` is the attention output (B, S, H, D)."""
    b, s = out.shape[:2]
    x = x + linear(out.reshape(b, s, -1), p["self_attn"]["o_proj"], contract_axis=0)
    return x + swiglu_mlp(p["mlp"], rms_norm(x, p["post_attention_layernorm"], cfg.rms_norm_eps))


def _layer(
    p: Params,
    cfg: TextConfig,
    x: jnp.ndarray,  # (B, S, E)
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    cache_arrays,  # FULL stacked (k, v[, k_scale, v_scale]) — (L, B, Hkv, Smax, D)
    layer_idx,  # () int32 — this layer's slot in the stack
    cache_length: Optional[jnp.ndarray],
    kv_segment_ids: Optional[jnp.ndarray] = None,  # (B, Smax) incl. cached prefix
    attend_to_cache: bool = False,  # chunked prefill: s>1 queries see the cached prefix
    sp=None,  # Optional[UlyssesSpec] — sequence-parallel attention (training only)
    int4_i8dot: bool = False,  # int4 decode dots on the int8 MXU (rollout.int4_i8dot)
):
    """One decoder layer. ``cache_arrays`` is the whole layer stack carried
    through the scan; the write is a one-token in-place dynamic_update_slice
    at ``layer_idx`` (aliased by XLA), and decode attention reads the stack
    through the Pallas kernel without materializing a layer slice.
    Returns (x, updated cache_arrays or None)."""
    b, s, _ = x.shape
    q, k, v = attention_inputs(p, cfg, x, cos, sin)

    if cache_arrays is None:
        if sp is not None and getattr(sp, "backend", "ulysses") == "ring":
            from ...ops.ring import ring_attention

            out = ring_attention(
                q, k, v, sp.mesh, sp.axis, segment_ids=segment_ids,
                causal=True, batch_axes=sp.batch_axes,
            )
        elif sp is not None:
            from ...ops.ulysses import ulysses_attention

            out = ulysses_attention(
                q, k, v, sp.mesh, sp.axis, segment_ids=segment_ids,
                causal=True, batch_axes=sp.batch_axes,
            )
        else:
            out = attention(q, k, v, segment_ids=segment_ids, causal=True)
        new_arrays = None
    else:
        cache_dtype = cache_arrays[0].dtype
        quantized = cache_dtype == jnp.int8
        quantized4 = cache_dtype == jnp.uint8  # int4 split-half packed
        k_hm = k.transpose(0, 2, 1, 3)  # (B, Hkv, s, D) head-major for the cache
        v_hm = v.transpose(0, 2, 1, 3)
        if quantized4:
            kq, ks = _quantize_kv4(k_hm)  # scales (B, Hkv, s)
            vq, vs = _quantize_kv4(v_hm)
            ck = _update_kv4(cache_arrays[0], kq, layer_idx, cache_length)
            cv = _update_kv4(cache_arrays[1], vq, layer_idx, cache_length)
            cks = jax.lax.dynamic_update_slice(
                cache_arrays[2], ks[None], (layer_idx, 0, 0, cache_length)
            )
            cvs = jax.lax.dynamic_update_slice(
                cache_arrays[3], vs[None], (layer_idx, 0, 0, cache_length)
            )
            new_arrays = (ck, cv, cks, cvs)
        elif quantized:
            kq, ks = _quantize_kv(k_hm)  # scales (B, Hkv, s)
            vq, vs = _quantize_kv(v_hm)
            ck = jax.lax.dynamic_update_slice(
                cache_arrays[0], kq[None], (layer_idx, 0, 0, cache_length, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache_arrays[1], vq[None], (layer_idx, 0, 0, cache_length, 0)
            )
            cks = jax.lax.dynamic_update_slice(
                cache_arrays[2], ks[None], (layer_idx, 0, 0, cache_length)
            )
            cvs = jax.lax.dynamic_update_slice(
                cache_arrays[3], vs[None], (layer_idx, 0, 0, cache_length)
            )
            new_arrays = (ck, cv, cks, cvs)
        else:
            ck = jax.lax.dynamic_update_slice(
                cache_arrays[0], k_hm.astype(cache_dtype)[None],
                (layer_idx, 0, 0, cache_length, 0),
            )
            cv = jax.lax.dynamic_update_slice(
                cache_arrays[1], v_hm.astype(cache_dtype)[None],
                (layer_idx, 0, 0, cache_length, 0),
            )
            new_arrays = (ck, cv)

        kv_seg = kv_segment_ids
        if kv_seg is None:
            # token width: the packed int4 buffer has Smax/2 byte rows, so the
            # per-token scale buffer is the width authority when quantized
            width = new_arrays[2].shape[3] if len(new_arrays) > 2 else ck.shape[3]
            kv_positions = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
            kv_seg = jnp.where(kv_positions < cache_length + s, 1, 0).astype(jnp.int32)

        if s > 1 and not attend_to_cache:
            # prefill (cache starts empty): queries only see the prompt's own
            # k/v — attend locally instead of over the full (P+R) cache buffer
            # (saves the masked decode-region columns and keeps the flash
            # kernel eligible)
            out = attention(q, k, v, segment_ids=segment_ids, causal=True)
        elif s > 1:
            # chunked prefill: this chunk's queries attend the cached prefix
            # plus the chunk itself. With a static (python-int) cache length
            # the live prefix is sliced and the flash kernel runs with a
            # static causal_offset — the masked-SDPA fallback materializes a
            # (B, Hq, s, Skv) fp32 score tensor, which is exactly the memory
            # the chunking exists to avoid.
            scales = (new_arrays[2], new_arrays[3]) if (quantized or quantized4) else (None, None)
            q_seg = segment_ids if segment_ids is not None else jnp.ones((b, s), jnp.int32)
            if isinstance(cache_length, int):
                end = cache_length + s
                k_all, v_all = _layer_kv(
                    new_arrays[0], new_arrays[1], layer_idx, x.dtype, *scales, end=end
                )
                out = attention(
                    q, k_all, v_all, segment_ids=q_seg, kv_segment_ids=kv_seg[:, :end],
                    causal=True, causal_offset=cache_length,
                )
            else:
                k_all, v_all = _layer_kv(
                    new_arrays[0], new_arrays[1], layer_idx, x.dtype, *scales
                )
                q_offset = jnp.full((b,), cache_length, dtype=jnp.int32)
                out = attention(
                    q, k_all, v_all, segment_ids=q_seg, kv_segment_ids=kv_seg,
                    causal=True, q_offset=q_offset,
                )
        else:
            scales = (new_arrays[2], new_arrays[3]) if (quantized or quantized4) else (None, None)
            out = decode_attention(
                q[:, 0], new_arrays[0], new_arrays[1], kv_seg, layer_idx, *scales,
                int4_i8dot=int4_i8dot,
            )[:, None]

    return finish_layer(p, cfg, x, out), new_arrays


def _layer_kv(ck, cv, layer_idx, dtype, k_scale=None, v_scale=None, end=None):
    """Materialize one layer's cache as (B, S, Hkv, D) for the chunked-prefill
    attention (decode goes through ops/decode_attention instead). ``end``
    (static) slices the live prefix so only written cells are read."""
    k_l = jax.lax.dynamic_index_in_dim(ck, layer_idx, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(cv, layer_idx, 0, keepdims=False)
    if ck.dtype == jnp.uint8:  # int4 split-half: unpack only written rows
        half = ck.shape[3]

        def unpack_live(p_l):
            n_low = min(end, half) if end is not None else half
            low, high = _unpack_nibbles(jax.lax.slice_in_dim(p_l, 0, n_low, axis=2))
            parts = [low]
            if end is None or end > half:
                n_high = (end - half) if end is not None else half
                if n_high < n_low:
                    _, high = _unpack_nibbles(
                        jax.lax.slice_in_dim(p_l, 0, n_high, axis=2)
                    )
                parts.append(high[:, :, :n_high] if end is not None else high)
            return jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]

        k_l = unpack_live(k_l)
        v_l = unpack_live(v_l)
    elif end is not None:
        k_l = jax.lax.slice_in_dim(k_l, 0, end, axis=2)
        v_l = jax.lax.slice_in_dim(v_l, 0, end, axis=2)
    if k_scale is not None:
        ks = jax.lax.dynamic_index_in_dim(k_scale, layer_idx, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(v_scale, layer_idx, 0, keepdims=False)
        if end is not None:
            ks = jax.lax.slice_in_dim(ks, 0, end, axis=2)
            vs = jax.lax.slice_in_dim(vs, 0, end, axis=2)
        k_l = _dequantize_kv(k_l, ks, dtype)
        v_l = _dequantize_kv(v_l, vs, dtype)
    return k_l.transpose(0, 2, 1, 3), v_l.transpose(0, 2, 1, 3)


def forward_hidden(
    params: Params,
    cfg: TextConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,  # (B, S)
    inputs_embeds: Optional[jnp.ndarray] = None,  # (B, S, E)
    position_ids: jnp.ndarray = None,  # (3, B, S)
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S); 0 = padding
    cache: Optional[KVCache] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,  # (B, Smax) validity of cache slots
    remat: bool = False,
    attend_to_cache: bool = False,
    sp=None,  # Optional[UlyssesSpec] — Ulysses sequence parallelism (no-cache path)
    int4_i8dot: bool = False,  # int4 decode dots on the int8 MXU (rollout.int4_i8dot)
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack; returns (hidden_states (B,S,E), updated cache)."""
    if inputs_embeds is None:
        inputs_embeds = embed_rows(
            params["embed_tokens"], input_ids, dtype=params["norm"].dtype
        )
    x = inputs_embeds

    inv_freq = jnp.asarray(make_inv_freq(cfg.head_dim, cfg.rope_theta), dtype=jnp.float32)
    cos, sin = compute_cos_sin(position_ids, inv_freq, cfg.mrope_section, dtype=x.dtype)

    if cache is None:

        def body(x, layer_p):
            x, _ = _layer(layer_p, cfg, x, cos, sin, segment_ids, None, None, None, sp=sp)
            return x, None

        if remat:
            # "dots" saves matmul outputs across the layer scan (less
            # recompute, but the saved gate_up stack is L*B*S*2I bf16 — 6GB at
            # 1B/seq-4096); "full" (or remat="full") saves only layer inputs
            # and recomputes the body in backward — the fit-or-OOM knob for
            # single-chip 1B+ training (sharding.remat_policy).
            policy = (
                None if remat == "full"
                else jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )
            body = jax.checkpoint(body, policy=policy)
        x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    else:
        # the stacked cache rides in the CARRY (not xs/ys): each layer's write
        # is an in-place one-slot update at its index, so a decode step never
        # copies the cache (the xs/ys formulation re-materializes every
        # layer's full buffer into the stacked output each step)
        quantized = cache.k.dtype in (jnp.int8, jnp.uint8)

        def body(carry, layer_p):
            x, arrays, idx = carry
            x, arrays = _layer(
                layer_p, cfg, x, cos, sin, segment_ids, arrays, idx,
                cache.length, kv_segment_ids, attend_to_cache=attend_to_cache,
                int4_i8dot=int4_i8dot,
            )
            return (x, arrays, idx + 1), None

        init = (x, cache.arrays(), jnp.zeros((), jnp.int32))
        (x, arrays, _), _ = jax.lax.scan(body, init, params["layers"])
        new_length = cache.length + inputs_embeds.shape[1]
        if quantized:
            new_cache = KVCache(arrays[0], arrays[1], new_length, arrays[2], arrays[3])
        else:
            new_cache = KVCache(arrays[0], arrays[1], new_length)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_cache


def logits_from_hidden(params: Params, hidden: jnp.ndarray, cfg: TextConfig) -> jnp.ndarray:
    head = params["embed_tokens"] if cfg.tie_word_embeddings else params["lm_head"]
    if is_quantized(head):
        # rollout tree: int8 MXU dot; the per-vocab-row scales are exactly the
        # per-output-column dequant the logits need
        axis = 1 if cfg.tie_word_embeddings else 0
        return quantized_dot(hidden, head, axis, out_dtype=jnp.float32)
    head = head.T if cfg.tie_word_embeddings else head
    return jnp.dot(hidden, head.astype(hidden.dtype), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_text_params(cfg: TextConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random init with leaves stacked over layers (leading num_layers dim)."""
    e, h, hkv, d = cfg.hidden_size, cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inter, L = cfg.intermediate_size, cfg.num_hidden_layers
    keys = jax.random.split(key, 9)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    qper = h // hkv
    layers = {
        "self_attn": {
            "qkv_proj": dense(keys[0], (L, hkv, e, (qper + 2) * d)),
            "qkv_bias": jnp.zeros((L, hkv, (qper + 2) * d), dtype),
            "o_proj": dense(keys[3], (L, h * d, e)),
        },
        "mlp": {
            "gate_up_proj": dense(keys[4], (L, 2, e, inter)),
            "down_proj": dense(keys[6], (L, inter, e)),
        },
        "input_layernorm": jnp.ones((L, e), dtype),
        "post_attention_layernorm": jnp.ones((L, e), dtype),
    }
    params: Params = {
        "embed_tokens": dense(keys[7], (cfg.vocab_size, e)),
        "layers": layers,
        "norm": jnp.ones((e,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(keys[8], (e, cfg.vocab_size))
    return params
