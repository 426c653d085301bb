"""On-device rollout engine: batched prefill + autoregressive decode under jit.

This replaces vLLM (/root/reference/verl/workers/rollout/vllm_rollout_spmd.py)
in the TPU design. Because training and decoding share one pjit-sharded param
pytree, the entire hybrid-engine machinery of the reference — FSDP state_dict
gather, vLLM load_weights, sleep/wake memory dance
(/root/reference/verl/workers/sharding_manager/fsdp_vllm.py:76-116) — does not
exist here: generate_sequences reads the same arrays the optimizer just wrote.

v0 architecture (dense KV):
- prefill: one jitted forward over the left-padded prompt block (B, P),
  writing KV for all positions; prompt padding handled by kv segment ids.
- decode: jitted lax.scan over R steps; each step embeds one token per
  sequence, attends to the cache, samples (temperature/top-k/top-p), tracks
  EOS. Early-exit when every sequence finished via jax.lax.while_loop
  wrapping fixed-size chunks (compilation-stable).
- mRoPE: generated tokens continue at (max prompt position + 1 + step) on all
  three channels; the per-sample start comes in precomputed from the host.

Memory: KV cache (L, B, Hkv, P+R, D) bf16 or int8+scales, sharded (fsdp on
batch, model on heads), carried in place through the decode loop (see
text.KVCache); decode attention is the Pallas kernel in ops/decode_attention.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen2_5_vl import Qwen25VLConfig, forward
from ..models.qwen2_5_vl.model import VisionInputs, fanout_rows, prefill_forward
from ..models.qwen2_5_vl.text import KVCache, logits_from_hidden
from .sampling import SamplingParams, get_response_mask, sample_tokens, sampled_token_logp


class RolloutResult(NamedTuple):
    responses: jnp.ndarray       # (B, R) int32, pad after EOS
    response_mask: jnp.ndarray   # (B, R) int32, 1 up to & incl. EOS
    rollout_log_probs: jnp.ndarray  # (B, R) fp32 — sampled-token log-probs


class DecodeState(NamedTuple):
    cache: KVCache
    kv_seg: jnp.ndarray       # (B, P+R) validity of each cache slot
    cur_tokens: jnp.ndarray   # (B,) last emitted token
    finished: jnp.ndarray     # (B,) bool
    key: jax.Array
    step: jnp.ndarray         # () int32


def _decode_step(
    params, cfg: Qwen25VLConfig, state: DecodeState, gen_pos_start: jnp.ndarray,
    prompt_len: int, sampling: SamplingParams, eos_id: int, pad_id: int,
    int4_i8dot: bool = False,
):
    b = state.cur_tokens.shape[0]
    pos = (gen_pos_start[None, :] + state.step).astype(jnp.int32)  # (1, B)
    position_ids = jnp.broadcast_to(pos[:, :, None], (3, b, 1))

    kv_seg = jax.lax.dynamic_update_slice(
        state.kv_seg, jnp.ones((b, 1), jnp.int32), (0, prompt_len + state.step)
    )
    cache = state.cache._replace(length=prompt_len + state.step)
    hidden, new_cache = forward(
        params, cfg, state.cur_tokens[:, None], position_ids,
        segment_ids=jnp.ones((b, 1), jnp.int32), cache=cache, kv_segment_ids=kv_seg,
        int4_i8dot=int4_i8dot,
    )
    logits = logits_from_hidden(params["text"], hidden, cfg.text)[:, 0, :]  # (B, V) fp32

    key, subkey = jax.random.split(state.key)
    sampled = sample_tokens(logits, subkey, sampling)
    # token logp under the tempered (behavior) distribution, via logsumexp
    # reduction — avoids materializing a (B, V) log-softmax every decode step
    token_logp = sampled_token_logp(logits, sampled, sampling)

    next_tokens = jnp.where(state.finished, pad_id, sampled)
    token_logp = jnp.where(state.finished, 0.0, token_logp)
    finished = state.finished | (next_tokens == eos_id)

    new_state = DecodeState(
        cache=new_cache, kv_seg=kv_seg, cur_tokens=next_tokens,
        finished=finished, key=key, step=state.step + 1,
    )
    return new_state, (next_tokens, token_logp)


def generate(
    params,
    cfg: Qwen25VLConfig,
    input_ids: jnp.ndarray,       # (B, P) left-padded prompts
    prompt_segment_ids: jnp.ndarray,  # (B, P) 1 = valid
    position_ids: jnp.ndarray,    # (3, B, P) mRoPE for the prompt
    gen_pos_start: jnp.ndarray,   # (B,) first generated position (max prompt pos + 1)
    *,
    max_new_tokens: int,
    sampling: SamplingParams,
    key: jax.Array,
    vision: Optional[VisionInputs] = None,
    kv_cache_dtype=jnp.bfloat16,
    prefill_chunk: int = 0,
    prefill_rows: int = 0,
    n: int = 1,
    int4_i8dot: bool = False,
) -> RolloutResult:
    """Jittable generation: prefill + scan-decode. Callers jit this with
    static (cfg, max_new_tokens, sampling, prefill_chunk, n) per bucket shape.

    ``prefill_chunk`` > 0 splits the prompt forward into sequence chunks (the
    vLLM enable_chunked_prefill equivalent): the MLP/logit activation
    footprint is bounded by b*chunk tokens instead of b*P — at 3B, batch 64,
    P=2048 the unchunked gate_up temp alone is 5.4GB, which is the difference
    between fitting a long-context batch and OOM.

    ``n`` > 1 is GROUPED sampling (vLLM SamplingParams.n / GRPO rollout.n):
    each prompt is prefilled ONCE (text stack AND vision tower), the prompt KV
    is broadcast to n decode lanes, and n continuations sample independently.
    Returns B*n rows ordered [prompt0 x n, prompt1 x n, ...] (the trainer's
    repeat(interleave=True) order). At rollout.n=5 this cuts prefill compute —
    the dominant cost at training shapes — by 5x."""
    b, p = input_ids.shape
    cfgt = cfg.text
    bn = b * n
    # cache width rounds up to 128 so the Pallas decode kernel always has a
    # legal S block (a non-multiple width silently falls back to the ~3x
    # slower XLA path); pad cells stay invalid in kv_seg
    # 256 for int4 so the PACKED row count (total/2) stays a 128-multiple —
    # an odd-x-128 row count silently drops the decode kernel to the XLA path
    mult = 256 if kv_cache_dtype == jnp.uint8 else 128
    total = -(-(p + max_new_tokens) // mult) * mult

    # prefill writes a prompt-width cache for the b unique prompts; with n==1
    # that IS the decode cache (allocated at full width up front)
    cache = KVCache.init(
        cfgt.num_hidden_layers, b, p if n > 1 else total,
        cfgt.num_key_value_heads, cfgt.head_dim, dtype=kv_cache_dtype,
    )
    seg32 = prompt_segment_ids.astype(jnp.int32)
    prefill_seg = seg32 if n > 1 else jnp.concatenate(
        [seg32, jnp.zeros((b, total - p), jnp.int32)], axis=1
    )

    # ---- prefill ----
    hidden, cache = prefill_forward(
        params, cfg, input_ids, position_ids, seg32, cache, prefill_seg,
        vision=vision, prefill_chunk=prefill_chunk, prefill_rows=prefill_rows,
    )
    last_logits = logits_from_hidden(params["text"], hidden[:, -1:, :], cfg.text)[:, 0, :]

    if n > 1:
        # broadcast the prompt KV into n decode lanes per prompt (row i*n+j)
        full = KVCache.init(
            cfgt.num_hidden_layers, bn, total, cfgt.num_key_value_heads,
            cfgt.head_dim, dtype=kv_cache_dtype,
        )
        if kv_cache_dtype == jnp.uint8:
            # int4 split-half packing is width-relative (token t's nibble is
            # t // (S/2)), so the prompt-width cache repacks into the
            # total-width layout before the lane fanout — a one-time unpack/
            # repack pass over the prompt KV
            from ..models.qwen2_5_vl.text import repack_kv4

            ck = fanout_rows(repack_kv4(cache.k, total), n, axis=1)
            cv = fanout_rows(repack_kv4(cache.v, total), n, axis=1)
            ks = jax.lax.dynamic_update_slice(
                full.k_scale, fanout_rows(cache.k_scale, n, axis=1), (0, 0, 0, 0)
            )
            vs = jax.lax.dynamic_update_slice(
                full.v_scale, fanout_rows(cache.v_scale, n, axis=1), (0, 0, 0, 0)
            )
            cache = KVCache(ck, cv, p, ks, vs)
        else:
            arrays = tuple(
                jax.lax.dynamic_update_slice(dst, fanout_rows(src, n, axis=1), (0,) * dst.ndim)
                for dst, src in zip(full.arrays(), cache.arrays())
            )
            if kv_cache_dtype == jnp.int8:
                cache = KVCache(arrays[0], arrays[1], p, arrays[2], arrays[3])
            else:
                cache = KVCache(arrays[0], arrays[1], p)
        last_logits = fanout_rows(last_logits, n)
        seg32 = fanout_rows(seg32, n)
        gen_pos_start = fanout_rows(gen_pos_start, n)
        b = bn
    kv_seg0 = jnp.concatenate(
        [seg32, jnp.zeros((b, total - p), jnp.int32)], axis=1
    )

    key, subkey = jax.random.split(key)
    first_token = sample_tokens(last_logits, subkey, sampling)
    first_logp = sampled_token_logp(last_logits, first_token, sampling)
    finished0 = first_token == cfg.eos_token_id

    # ---- decode remaining R-1 tokens ----
    # prefill kept length as a python int (static chunking); the while-loop
    # carry needs a traced scalar of stable dtype
    cache = cache._replace(length=jnp.asarray(cache.length, jnp.int32))
    state = DecodeState(
        cache=cache, kv_seg=kv_seg0, cur_tokens=first_token,
        finished=finished0, key=key, step=jnp.zeros((), jnp.int32),
    )

    # token fed at decode step j sits at rope position gen_pos_start + j
    step_fn = partial(
        _decode_step, params, cfg,
        gen_pos_start=gen_pos_start.astype(jnp.int32),
        prompt_len=p, sampling=sampling, eos_id=cfg.eos_token_id, pad_id=cfg.pad_token_id,
        int4_i8dot=int4_i8dot,
    )

    # while_loop (not scan) so generation stops as soon as every sequence hit
    # EOS — rollouts usually finish well before max_new_tokens, and the saved
    # steps are pure profit (vLLM gets this from continuous batching).
    tokens_buf = jnp.full((b, max_new_tokens - 1), cfg.pad_token_id, jnp.int32)
    logps_buf = jnp.zeros((b, max_new_tokens - 1), jnp.float32)

    def cond(carry):
        state, _, _ = carry
        return (state.step < max_new_tokens - 1) & ~jnp.all(state.finished)

    def body(carry):
        state, tokens_buf, logps_buf = carry
        new_state, (next_tokens, token_logp) = step_fn(state)
        tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, next_tokens[:, None], (0, state.step))
        logps_buf = jax.lax.dynamic_update_slice(logps_buf, token_logp[:, None], (0, state.step))
        return new_state, tokens_buf, logps_buf

    if max_new_tokens > 1:
        state, tokens_buf, logps_buf = jax.lax.while_loop(
            cond, body, (state, tokens_buf, logps_buf)
        )

    responses = jnp.concatenate([first_token[:, None], tokens_buf], axis=1)
    logps = jnp.concatenate([first_logp[:, None], logps_buf], axis=1)
    mask = get_response_mask(responses, cfg.eos_token_id)
    responses = jnp.where(mask == 1, responses, cfg.pad_token_id)
    return RolloutResult(responses=responses, response_mask=mask, rollout_log_probs=logps * mask)
