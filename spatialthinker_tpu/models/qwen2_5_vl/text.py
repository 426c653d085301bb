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
    """SwiGLU with gate/up fused into one wide matmul: p["gate_up_proj"] is
    (E, 2, I) so decode reads one contiguous weight instead of two — the
    decode step is weight-read-bound, and XLA tiles the single wide matmul
    onto the MXU far better than two half-width ones. The separate (2, I)
    dims (instead of a flat 2I) keep the tensor-parallel sharding on I local
    to each shard (silu(gate)*up never crosses shards)."""
    gu = jnp.einsum("...e,eti->...ti", x, p["gate_up_proj"])
    return jnp.dot(jax.nn.silu(gu[..., 0, :]) * gu[..., 1, :], p["down_proj"])


def fused_qkv(attn_p: Params, normed: jnp.ndarray, h: int, hkv: int, d: int):
    """One wide QKV matmul -> (q, k, v). attn_p["qkv_proj"] is (E, Hkv, G)
    with G = (h/hkv + 2) * d: per KV group the columns are [q heads of the
    group | k | v]. Group-major q ordering equals the natural HF head order
    (GQA assigns head i to group i // (h/hkv)), so no permutation exists
    anywhere — the loader just reshapes. Sharded on the Hkv axis for TP."""
    qper = h // hkv
    fused = jnp.einsum("...e,egf->...gf", normed, attn_p["qkv_proj"]) + attn_p["qkv_bias"]
    lead = fused.shape[:-2]
    q = fused[..., : qper * d].reshape(*lead, h, d)
    k = fused[..., qper * d : (qper + 1) * d]
    v = fused[..., (qper + 1) * d :]
    return q, k, v


class KVCache(NamedTuple):
    """Dense KV cache; with dtype int8 the values are quantized per token-head
    (symmetric max-abs scales in bf16: ~44% of the bf16 cache's HBM traffic)."""

    k: jnp.ndarray  # (L, B, Smax, Hkv, D)
    v: jnp.ndarray  # (L, B, Smax, Hkv, D)
    length: jnp.ndarray  # () int32 — filled prefix length (uniform across batch)
    k_scale: Optional[jnp.ndarray] = None  # (L, B, Smax, Hkv) — int8 mode only
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def init(cls, num_layers, batch, max_len, num_kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (num_layers, batch, max_len, num_kv_heads, head_dim)
        zero_len = jnp.zeros((), jnp.int32)
        if dtype == jnp.int8:
            sshape = (num_layers, batch, max_len, num_kv_heads)
            return cls(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8), zero_len,
                jnp.zeros(sshape, jnp.bfloat16), jnp.zeros(sshape, jnp.bfloat16),
            )
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), zero_len)


def _quantize_kv(x: jnp.ndarray):
    """(B, S, H, D) -> int8 values + (B, S, H) bf16 scales (symmetric max-abs)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


def _dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale.astype(jnp.float32)[..., None]).astype(dtype)


def _layer(
    p: Params,
    cfg: TextConfig,
    x: jnp.ndarray,  # (B, S, E)
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    segment_ids: Optional[jnp.ndarray],
    cache_kv,  # per-layer (k, v) or (k, v, k_scale, v_scale) — (B, Smax, Hkv, D)
    cache_length: Optional[jnp.ndarray],
    kv_segment_ids: Optional[jnp.ndarray] = None,  # (B, Smax) incl. cached prefix
    attend_to_cache: bool = False,  # chunked prefill: s>1 queries see the cached prefix
):
    """One decoder layer. Returns (x, updated per-layer kv or None)."""
    attn_p = p["self_attn"]
    b, s, _ = x.shape
    h, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    normed = rms_norm(x, p["input_layernorm"], cfg.rms_norm_eps)
    q, k, v = fused_qkv(attn_p, normed, h, hkv, d)
    q, k = apply_rotary(q, k, cos, sin)

    if cache_kv is None:
        out = attention(q, k, v, segment_ids=segment_ids, causal=True)
        new_kv = None
    else:
        cache_dtype = cache_kv[0].dtype
        quantized = cache_dtype == jnp.int8
        if quantized:
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            k_store = jax.lax.dynamic_update_slice(cache_kv[0], kq, (0, cache_length, 0, 0))
            v_store = jax.lax.dynamic_update_slice(cache_kv[1], vq, (0, cache_length, 0, 0))
            ks_all = jax.lax.dynamic_update_slice(cache_kv[2], ks, (0, cache_length, 0))
            vs_all = jax.lax.dynamic_update_slice(cache_kv[3], vs, (0, cache_length, 0))
            k_all = _dequantize_kv(k_store, ks_all, x.dtype)
            v_all = _dequantize_kv(v_store, vs_all, x.dtype)
        else:
            k_store = k_all = jax.lax.dynamic_update_slice(
                cache_kv[0], k.astype(cache_dtype), (0, cache_length, 0, 0)
            )
            v_store = v_all = jax.lax.dynamic_update_slice(
                cache_kv[1], v.astype(cache_dtype), (0, cache_length, 0, 0)
            )
        if s > 1 and not attend_to_cache:
            # prefill (cache starts empty): queries only see the prompt's own
            # k/v — attend locally instead of over the full (P+R) cache buffer
            # (saves the masked decode-region columns and keeps the flash
            # kernel eligible)
            out = attention(q, k, v, segment_ids=segment_ids, causal=True)
        elif s > 1:
            # chunked prefill: this chunk's queries attend the cached prefix
            # plus the chunk itself (causal via absolute q_offset positions;
            # kv cells beyond the chunk end are masked by causality even if
            # kv_segment_ids marks them)
            q_seg = segment_ids if segment_ids is not None else jnp.ones((b, s), jnp.int32)
            kv_seg = kv_segment_ids
            if kv_seg is None:
                kv_positions = jax.lax.broadcasted_iota(jnp.int32, (b, k_all.shape[1]), 1)
                kv_seg = jnp.where(kv_positions < cache_length + s, 1, 0).astype(jnp.int32)
            q_offset = jnp.full((b,), cache_length, dtype=jnp.int32)
            out = attention(
                q, k_all, v_all, segment_ids=q_seg, kv_segment_ids=kv_seg,
                causal=True, q_offset=q_offset,
            )
        else:
            if kv_segment_ids is None:
                kv_positions = jax.lax.broadcasted_iota(jnp.int32, (b, k_all.shape[1]), 1)
                kv_seg = jnp.where(kv_positions < cache_length + s, 1, 0).astype(jnp.int32)
            else:
                kv_seg = kv_segment_ids
            q_seg = segment_ids if segment_ids is not None else jnp.ones((b, s), dtype=jnp.int32)
            q_offset = jnp.full((b,), cache_length, dtype=jnp.int32)
            out = attention(
                q, k_all, v_all, segment_ids=q_seg, kv_segment_ids=kv_seg,
                causal=True, q_offset=q_offset,
            )
        new_kv = (k_store, v_store, ks_all, vs_all) if quantized else (k_store, v_store)

    x = x + jnp.dot(out.reshape(b, s, h * d), attn_p["o_proj"])
    x = x + swiglu_mlp(p["mlp"], rms_norm(x, p["post_attention_layernorm"], cfg.rms_norm_eps))
    return x, new_kv


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
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack; returns (hidden_states (B,S,E), updated cache)."""
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids, axis=0)
    x = inputs_embeds

    inv_freq = jnp.asarray(make_inv_freq(cfg.head_dim, cfg.rope_theta), dtype=jnp.float32)
    cos, sin = compute_cos_sin(position_ids, inv_freq, cfg.mrope_section, dtype=x.dtype)

    if cache is None:

        def body(x, layer_p):
            x, _ = _layer(layer_p, cfg, x, cos, sin, segment_ids, None, None)
            return x, None

        if remat:
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )
        x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    else:

        quantized = cache.k.dtype == jnp.int8

        def body(x, xs):
            if quantized:
                layer_p, k_layer, v_layer, ks_layer, vs_layer = xs
                per_layer = (k_layer, v_layer, ks_layer, vs_layer)
            else:
                layer_p, k_layer, v_layer = xs
                per_layer = (k_layer, v_layer)
            x, new_kv = _layer(
                layer_p, cfg, x, cos, sin, segment_ids, per_layer,
                cache.length, kv_segment_ids, attend_to_cache=attend_to_cache,
            )
            return x, new_kv

        if quantized:
            x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(
                body, x, (params["layers"], cache.k, cache.v, cache.k_scale, cache.v_scale)
            )
            new_cache = KVCache(
                new_k, new_v, cache.length + inputs_embeds.shape[1], new_ks, new_vs
            )
        else:
            x, (new_k, new_v) = jax.lax.scan(body, x, (params["layers"], cache.k, cache.v))
            new_cache = KVCache(new_k, new_v, cache.length + inputs_embeds.shape[1])

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_cache


def logits_from_hidden(params: Params, hidden: jnp.ndarray, cfg: TextConfig) -> jnp.ndarray:
    head = params["embed_tokens"].T if cfg.tie_word_embeddings else params["lm_head"]
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
            "qkv_proj": dense(keys[0], (L, e, hkv, (qper + 2) * d)),
            "qkv_bias": jnp.zeros((L, hkv, (qper + 2) * d), dtype),
            "o_proj": dense(keys[3], (L, h * d, e)),
        },
        "mlp": {
            "gate_up_proj": dense(keys[4], (L, e, 2, inter)),
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
