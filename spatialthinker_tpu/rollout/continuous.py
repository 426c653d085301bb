"""Continuous-batching rollout: fixed decode slots, per-slot KV write
positions, and host-orchestrated refill of finished slots.

This is the vLLM-style scheduling layer
(/root/reference/verl/workers/rollout/vllm_rollout_spmd.py relies on vLLM's
continuous batching) rebuilt for the jit model: two compiled kernels —
``prefill_slots`` (writes a prompt batch's KV into chosen slots) and
``decode_chunk`` (advances every active slot K tokens with per-slot lengths /
rope positions / EOS states) — plus a small host loop that harvests finished
slots between chunks and refills them from the prompt queue. Unlike the dense
``engine.generate`` (which must run until the LAST sequence of a batch
finishes), slot turnover keeps the chip busy at heterogeneous response
lengths.

Per-slot state lives on device across calls; host syncs touch only the (S,)
finished/step vectors and harvested response rows.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen2_5_vl import Qwen25VLConfig
from ..models.qwen2_5_vl.model import fanout_rows, prefill_forward
from ..models.qwen2_5_vl.text import (
    KVCache,
    _quantize_kv,
    attention_inputs,
    finish_layer,
    logits_from_hidden,
    rms_norm,
)
from ..models.qwen2_5_vl.rope import compute_cos_sin, make_inv_freq
from ..ops.decode_attention import decode_attention
from ..ops.quant import embed_rows
from .sampling import SamplingParams, sample_tokens, sampled_token_logp


class SlotState(NamedTuple):
    cache_k: jnp.ndarray     # (L, S, Hkv, T, D) head-major (see text.KVCache)
    cache_v: jnp.ndarray     # (L, S, Hkv, T, D)
    kv_seg: jnp.ndarray      # (S, T) int32 — validity of each cache slot cell
    length: jnp.ndarray      # (S,) int32 — buffer cells used (prompt P + generated)
    cur_tokens: jnp.ndarray  # (S,) int32 — next token to feed
    gen_pos: jnp.ndarray     # (S,) int32 — rope position of the next fed token
    steps: jnp.ndarray       # (S,) int32 — tokens generated so far (incl. cur)
    finished: jnp.ndarray    # (S,) bool
    active: jnp.ndarray      # (S,) bool — slot holds a real sequence
    responses: jnp.ndarray   # (S, R) int32
    logps: jnp.ndarray       # (S, R) fp32
    key: jax.Array
    k_scale: Optional[jnp.ndarray] = None  # (L, S, Hkv, T) bf16 — int8 mode only
    v_scale: Optional[jnp.ndarray] = None
    # () int32 — GLOBAL decode-step counter. Decode KV rows live in a ring of
    # the cache's last max_new cells addressed by ring % max_new: every slot
    # writes the SAME cell each step, so the per-layer cache write is a
    # dynamic_update_slice instead of a per-slot vector scatter (measured
    # 473 -> ~8 ms/token-step at 136 slots: TPU scatters with vector indices
    # serialize). Safe because a slot's occupant lives at most max_new steps
    # (refills happen between chunks), so its ring rows never collide, and
    # validity is kv_seg-driven — stale bytes under seg=0 are never read.
    ring: Optional[jnp.ndarray] = None


def init_slot_state(cfg: Qwen25VLConfig, slots: int, prompt_len: int,
                    max_new_tokens: int, key: jax.Array,
                    kv_dtype=jnp.bfloat16) -> SlotState:
    t = cfg.text
    # cache width rounds up to 128 so the Pallas decode kernel always has a
    # legal S block (a non-multiple width silently falls back to the ~3x
    # slower XLA path); the pad cells are never marked valid in kv_seg.
    # 256 for int4 so the PACKED row count (total/2) stays a 128-multiple.
    mult = 256 if kv_dtype == jnp.uint8 else 128
    total = -(-(prompt_len + max_new_tokens) // mult) * mult
    shape = (t.num_hidden_layers, slots, t.num_key_value_heads, total, t.head_dim)
    # k/v scales must be DISTINCT buffers (not one shared array): the state is
    # donated into prefill/decode, and donating the same buffer twice is an
    # XLA execution error
    k_scales = v_scales = None
    if kv_dtype in (jnp.int8, jnp.uint8):
        k_scales = jnp.zeros(shape[:-1], jnp.bfloat16)
        v_scales = jnp.zeros(shape[:-1], jnp.bfloat16)
    kv_shape = shape[:3] + ((total // 2 if kv_dtype == jnp.uint8 else total),) + shape[4:]
    return SlotState(
        cache_k=jnp.zeros(kv_shape, kv_dtype),
        cache_v=jnp.zeros(kv_shape, kv_dtype),
        k_scale=k_scales,
        v_scale=v_scales,
        kv_seg=jnp.zeros((slots, total), jnp.int32),
        length=jnp.zeros((slots,), jnp.int32),
        cur_tokens=jnp.zeros((slots,), jnp.int32),
        gen_pos=jnp.zeros((slots,), jnp.int32),
        steps=jnp.zeros((slots,), jnp.int32),
        finished=jnp.ones((slots,), bool),
        active=jnp.zeros((slots,), bool),
        responses=jnp.full((slots, max_new_tokens), cfg.pad_token_id, jnp.int32),
        logps=jnp.zeros((slots, max_new_tokens), jnp.float32),
        key=key,
        ring=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# prefill into slots
# ---------------------------------------------------------------------------


def prefill_slots(
    params, cfg: Qwen25VLConfig, state: SlotState,
    slot_ids: jnp.ndarray,        # (u * group_n,)
    input_ids: jnp.ndarray,       # (u, P) — UNIQUE prompts
    segment_ids: jnp.ndarray,     # (u, P)
    position_ids: jnp.ndarray,    # (3, u, P)
    gen_pos_start: jnp.ndarray,   # (u,)
    valid: jnp.ndarray,           # (u,) bool — False rows are queue padding
    sampling: SamplingParams,
    vision=None,                  # Optional[VisionInputs] for this prompt batch
    prefill_chunk: int = 0,       # >0: sequence-chunked prefill (token budget)
    prefill_rows: int = 0,        # >0: batch-chunked prefill (rows mode)
    group_n: int = 1,             # samples per prompt (vLLM SamplingParams.n)
) -> SlotState:
    """Run the prompt forward for u UNIQUE sequences and install each into
    ``group_n`` consecutive entries of `slot_ids` (grouped sampling: the
    prompt — text stack and vision tower — is prefilled once, the prompt KV
    fans out to n decode lanes, engine.generate n>1 parity).

    With ``prefill_chunk`` set, the prompt forward is split into sequence
    chunks of that many tokens per row — each chunk attends the scratch-cache
    prefix — bounding the per-forward activation footprint by
    u * prefill_chunk tokens (the vLLM enable_chunked_prefill /
    max_num_batched_tokens equivalent, reference scripts/config.yaml:55)."""
    u, p = input_ids.shape
    k = u * group_n
    t = cfg.text
    total = state.kv_seg.shape[1]  # TOKEN width (int4 packs cache_k rows 2:1)
    max_new = state.responses.shape[1]

    scratch = KVCache.init(t.num_hidden_layers, u, p, t.num_key_value_heads,
                           t.head_dim, dtype=state.cache_k.dtype)
    seg32 = segment_ids.astype(jnp.int32)
    hidden, scratch = prefill_forward(
        params, cfg, input_ids, position_ids, seg32, scratch, seg32,
        vision=vision, prefill_chunk=prefill_chunk, prefill_rows=prefill_rows,
    )
    last_logits = logits_from_hidden(params["text"], hidden[:, -1:, :], cfg.text)[:, 0, :]

    if group_n > 1:
        scratch_arrays = tuple(fanout_rows(a, group_n, axis=1) for a in scratch.arrays())
        if state.k_scale is not None:
            scratch = KVCache(scratch_arrays[0], scratch_arrays[1], p,
                              scratch_arrays[2], scratch_arrays[3])
        else:
            scratch = KVCache(scratch_arrays[0], scratch_arrays[1], p)
        last_logits = fanout_rows(last_logits, group_n)
        seg32 = fanout_rows(seg32, group_n)
        gen_pos_start = fanout_rows(gen_pos_start, group_n)
        valid = fanout_rows(valid, group_n)

    key, subkey = jax.random.split(state.key)
    first = sample_tokens(last_logits, subkey, sampling)
    first_logp = sampled_token_logp(last_logits, first, sampling)
    finished0 = (first == cfg.eos_token_id) | ~valid

    if state.cache_k.dtype == jnp.uint8:
        # int4: repack the width-p scratch into the slot cache's total-width
        # split-half layout, then install the WHOLE packed width (byte rows
        # pair prompt tokens with future decode cells; a fresh install must
        # also clear any stale high nibbles from the slot's previous tenant)
        from ..models.qwen2_5_vl.text import repack_kv4

        cache_k = state.cache_k.at[:, slot_ids].set(repack_kv4(scratch.k, total))
        cache_v = state.cache_v.at[:, slot_ids].set(repack_kv4(scratch.v, total))
    else:
        cache_k = state.cache_k.at[:, slot_ids, :, :p].set(scratch.k)
        cache_v = state.cache_v.at[:, slot_ids, :, :p].set(scratch.v)
    scale_updates = {}
    if state.k_scale is not None:
        scale_updates = dict(
            k_scale=state.k_scale.at[:, slot_ids, :, :p].set(scratch.k_scale),
            v_scale=state.v_scale.at[:, slot_ids, :, :p].set(scratch.v_scale),
        )
    kv_row = jnp.concatenate(
        [seg32, jnp.zeros((k, total - p), jnp.int32)], axis=1
    )
    resp_row = jnp.full((k, max_new), cfg.pad_token_id, jnp.int32).at[:, 0].set(first)
    logp_row = jnp.zeros((k, max_new), jnp.float32).at[:, 0].set(first_logp)

    return state._replace(
        cache_k=cache_k,
        cache_v=cache_v,
        **scale_updates,
        kv_seg=state.kv_seg.at[slot_ids].set(kv_row),
        length=state.length.at[slot_ids].set(p),
        cur_tokens=state.cur_tokens.at[slot_ids].set(first),
        gen_pos=state.gen_pos.at[slot_ids].set(gen_pos_start.astype(jnp.int32)),
        steps=state.steps.at[slot_ids].set(1),
        finished=state.finished.at[slot_ids].set(finished0),
        active=state.active.at[slot_ids].set(valid),
        responses=state.responses.at[slot_ids].set(resp_row),
        logps=state.logps.at[slot_ids].set(logp_row),
        key=key,
    )


# ---------------------------------------------------------------------------
# per-slot decode step (slots at DIFFERENT lengths)
# ---------------------------------------------------------------------------


def _decode_layer(layer_p, cfg, x, cos, sin, cache_arrays, layer_idx, write_row,
                  kv_seg, int4_i8dot=False):
    """One decoder layer for a single token per slot, writing KV at the
    UNIFORM ring cell ``write_row`` (a scalar — see SlotState.ring). The
    rms/qkv/rope head and o_proj/mlp tail are text.attention_inputs /
    text.finish_layer. ``cache_arrays`` is the FULL stacked (k, v[, k_scale,
    v_scale]) carried through the layer scan — the token write is an in-place
    dynamic_update_slice at (layer_idx, :, :, write_row) and attention reads
    the stack through the Pallas decode kernel (per-token-head int8 dequant
    in registers). A per-slot write position would make this a vector-index
    scatter, which serializes on TPU — measured 473 ms/token-step at 136
    slots vs ~8 ms with the uniform ring write."""
    t = cfg
    s = x.shape[0]
    quantized = cache_arrays[0].dtype == jnp.int8
    quantized4 = cache_arrays[0].dtype == jnp.uint8  # int4 split-half packed

    # slots ride the batch dim with a length-1 sequence: (S, 1, ...)
    x2 = x[:, None, :]
    q, knew, vnew = attention_inputs(layer_p, t, x2, cos, sin)

    zero = jnp.zeros((), jnp.int32)

    def dus_row(arr, val, row):  # val (S, Hkv, D) -> arr[layer_idx, :, :, row]
        return jax.lax.dynamic_update_slice(
            arr, val[None, :, :, None, :].astype(arr.dtype),
            (layer_idx, zero, zero, row, zero),
        )

    def dus_scale(arr, val):  # val (S, Hkv) -> arr[layer_idx, :, :, write_row]
        return jax.lax.dynamic_update_slice(
            arr, val[None, :, :, None].astype(arr.dtype),
            (layer_idx, zero, zero, write_row),
        )

    if quantized4:
        from ..models.qwen2_5_vl.text import KV4_BIAS, _quantize_kv4

        u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8)
        kq, ks = _quantize_kv4(knew)  # (S, 1, Hkv, D) / (S, 1, Hkv)
        vq, vs = _quantize_kv4(vnew)
        half = cache_arrays[0].shape[3]
        val_row = write_row % half
        is_high = write_row >= half  # scalar: uniform cell, uniform nibble

        def nibble_write(arr, q4):
            hkv, d = q4.shape[2], q4.shape[3]
            cur = jax.lax.dynamic_slice(
                arr, (layer_idx, zero, zero, val_row, zero), (1, s, hkv, 1, d)
            )[0, :, :, 0]  # (S, Hkv, D) uint8
            qb = u8(q4[:, 0] + jnp.int8(KV4_BIAS))  # biased storage
            merged = jnp.where(
                is_high,
                (cur & jnp.uint8(0x0F)) | (qb << 4),
                (cur & jnp.uint8(0xF0)) | (qb & jnp.uint8(0xF)),
            )
            return dus_row(arr, merged, val_row)

        cache_k = nibble_write(cache_arrays[0], kq)
        cache_v = nibble_write(cache_arrays[1], vq)
        ks_all = dus_scale(cache_arrays[2], ks[:, 0])
        vs_all = dus_scale(cache_arrays[3], vs[:, 0])
        new_arrays = (cache_k, cache_v, ks_all, vs_all)
        scales = (ks_all, vs_all)
    elif quantized:
        kq, ks = _quantize_kv(knew)  # (S, 1, Hkv, D) / (S, 1, Hkv)
        vq, vs = _quantize_kv(vnew)
        cache_k = dus_row(cache_arrays[0], kq[:, 0], write_row)
        cache_v = dus_row(cache_arrays[1], vq[:, 0], write_row)
        ks_all = dus_scale(cache_arrays[2], ks[:, 0])
        vs_all = dus_scale(cache_arrays[3], vs[:, 0])
        new_arrays = (cache_k, cache_v, ks_all, vs_all)
        scales = (ks_all, vs_all)
    else:
        cache_k = dus_row(cache_arrays[0], knew[:, 0], write_row)
        cache_v = dus_row(cache_arrays[1], vnew[:, 0], write_row)
        new_arrays = (cache_k, cache_v)
        scales = (None, None)

    out = decode_attention(
        q[:, 0].astype(x.dtype), cache_k, cache_v, kv_seg, layer_idx, *scales,
        int4_i8dot=int4_i8dot,
    )
    return finish_layer(layer_p, t, x2, out[:, None])[:, 0], new_arrays


def decode_chunk(
    params, cfg: Qwen25VLConfig, state: SlotState, sampling: SamplingParams,
    chunk: int, int4_i8dot: bool = False,
) -> SlotState:
    """Advance every unfinished slot `chunk` tokens (finished slots no-op)."""
    t = cfg.text
    inv_freq = jnp.asarray(make_inv_freq(t.head_dim, t.rope_theta), jnp.float32)
    text_params = params["text"]

    def one_step(state, _):
        s = state.cur_tokens.shape[0]
        run = state.active & ~state.finished
        # UNIFORM write cell for every slot: the cache's last max_new cells
        # form a ring addressed by the global step counter (SlotState.ring).
        # Marked valid only for running slots; validity IS kv_seg, so the
        # uniform byte write to finished/inactive slots is never read.
        total = state.kv_seg.shape[1]
        max_new = state.responses.shape[1]
        write_row = (total - max_new) + state.ring % max_new
        kv_seg = jnp.where(
            run[:, None] & (jnp.arange(total)[None] == write_row),
            1, state.kv_seg,
        )

        pos = jnp.broadcast_to(state.gen_pos[None, :, None], (3, s, 1))
        cos, sin = compute_cos_sin(pos, inv_freq, t.mrope_section, dtype=jnp.bfloat16)
        x = embed_rows(
            text_params["embed_tokens"], state.cur_tokens,
            dtype=text_params["norm"].dtype,
        )  # (S, E)
        quantized = state.k_scale is not None

        # the stacked cache rides in the scan CARRY so each layer's one-token
        # scatter is in-place (the xs/ys form copies the whole cache per step)
        def body(carry, layer_p):
            x, arrays, idx = carry
            x, arrays = _decode_layer(
                layer_p, t, x, cos, sin, arrays, idx, write_row, kv_seg,
                int4_i8dot=int4_i8dot,
            )
            return (x, arrays, idx + 1), None

        if quantized:
            arrays0 = (state.cache_k, state.cache_v, state.k_scale, state.v_scale)
        else:
            arrays0 = (state.cache_k, state.cache_v)
        init = (x, arrays0, jnp.zeros((), jnp.int32))
        (x_out, arrays, _), _ = jax.lax.scan(body, init, text_params["layers"])
        new_k, new_v = arrays[0], arrays[1]
        scale_updates = dict(k_scale=arrays[2], v_scale=arrays[3]) if quantized else {}
        hidden = rms_norm(x_out[:, None, :], text_params["norm"], t.rms_norm_eps)
        logits = logits_from_hidden(text_params, hidden, t)[:, 0, :]

        key, subkey = jax.random.split(state.key)
        sampled = sample_tokens(logits, subkey, sampling)
        logp = sampled_token_logp(logits, sampled, sampling)

        write_step = jnp.clip(state.steps, 0, max_new - 1)
        responses = jnp.where(
            run[:, None] & (jnp.arange(max_new)[None] == write_step[:, None]),
            sampled[:, None], state.responses,
        )
        logps = jnp.where(
            run[:, None] & (jnp.arange(max_new)[None] == write_step[:, None]),
            logp[:, None], state.logps,
        )
        newly_finished = run & (
            (sampled == cfg.eos_token_id) | (state.steps + 1 >= max_new)
        )
        new_state = state._replace(
            cache_k=new_k,
            cache_v=new_v,
            **scale_updates,
            kv_seg=kv_seg,
            length=jnp.where(run, state.length + 1, state.length),
            cur_tokens=jnp.where(run, sampled, state.cur_tokens),
            gen_pos=jnp.where(run, state.gen_pos + 1, state.gen_pos),
            steps=jnp.where(run, state.steps + 1, state.steps),
            finished=state.finished | newly_finished,
            responses=responses,
            logps=logps,
            ring=state.ring + 1,
            key=key,
        )
        return new_state, None

    state, _ = jax.lax.scan(one_step, state, None, length=chunk)
    return state


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


class ContinuousResult(NamedTuple):
    responses: np.ndarray        # (B, R)
    response_mask: np.ndarray    # (B, R)
    rollout_log_probs: np.ndarray  # (B, R)


def effective_prefill_chunk(
    prompt_len: int, rows: int, prefill_chunk_size: int, max_num_batched_tokens: int
) -> int:
    """Tokens per row per prefill forward (0 = unchunked). The binding
    constraint is rows * chunk <= max_num_batched_tokens; prefill_chunk_size
    caps the chunk directly. Chunks are 128-aligned (MXU tiling)."""
    chunk = prompt_len
    if max_num_batched_tokens > 0 and rows > 0:
        chunk = min(chunk, max_num_batched_tokens // rows)
    if prefill_chunk_size > 0:
        chunk = min(chunk, prefill_chunk_size)
    if chunk >= prompt_len:
        return 0
    # 128-align by rounding DOWN only — rounding a budget-derived chunk UP
    # would silently exceed max_num_batched_tokens, the knob that exists to
    # bound prefill activation memory. 128 matches the flash kernel's minimum
    # block (ops/attention._flash_block), so every aligned chunk stays on the
    # Pallas path instead of materializing masked-SDPA score tensors.
    if chunk >= 128:
        chunk = chunk // 128 * 128
    return max(chunk, 1)


def generate_continuous(
    params,
    cfg: Qwen25VLConfig,
    input_ids: np.ndarray,       # (B, P) left-padded — UNIQUE prompts
    segment_ids: np.ndarray,     # (B, P)
    position_ids: np.ndarray,    # (3, B, P)
    gen_pos_start: np.ndarray,   # (B,)
    *,
    max_new_tokens: int,
    sampling: SamplingParams,
    key: jax.Array,
    slots: int = 32,
    decode_chunk_size: int = 32,
    kv_cache_dtype=jnp.bfloat16,
    patches_list=None,           # per-prompt (N_i, Din) arrays (multimodal)
    grids_list=None,             # per-prompt (num_images, 3) grids
    vision_bucket: int = 0,      # patches per refill batch (0 = auto)
    prefill_chunk_size: int = 0,     # vLLM enable_chunked_prefill equivalent
    max_num_batched_tokens: int = 0,  # token budget per prefill forward
    prefill_rows: int = 0,       # >0: batch-chunked (rows mode) refill prefill
    refill_batch: int = 0,       # >0: cap unique prompts per refill prefill
    group_n: int = 1,            # samples per prompt; output has B*group_n rows
    mesh=None,                   # jax Mesh -> multi-host SPMD mode (see below)
    int4_i8dot: bool = False,    # int4 decode dots on the int8 MXU
) -> ContinuousResult:
    """Generate B*group_n sequences through `slots` concurrent decode lanes
    with refill. Each unique prompt is prefilled once and installed into
    group_n slots (grouped sampling). Prefill batch size is fixed (queue is
    padded), so the whole engine compiles exactly two kernels. Output row
    i*group_n + j is sample j of prompt i (repeat-interleave order).

    Multi-host (``mesh`` given and jax.process_count() > 1): the host loop's
    refill/exit decisions are data-dependent, so every process must make the
    IDENTICAL decisions — achieved by construction, not negotiation-per-knob:
    the (small) prompt batch is allgathered at entry, every process runs this
    same loop over the GLOBAL queue, slot state is sharded over the mesh's
    batch axes, prefill batches are assembled as global arrays, and each
    harvest reads the full finished/active/response rows back via
    local-shard + allgather. Each process then holds the full output and the
    caller slices its rows. Inputs are this process's LOCAL rows (the
    trainer's loader convention). The reference leans on vLLM's per-GPU
    schedulers here (/root/reference/verl/workers/rollout/vllm_rollout_spmd.py)
    — per-host dynamic batching with no cross-host agreement to maintain;
    one SPMD program needs the lockstep schedule instead."""
    # the caller's key lands inside the donated state — clone it so the
    # caller may reuse the same key array (donation deletes the buffer)
    key = jax.random.clone(key)
    # sharded SPMD mode whenever the mesh spans >1 device — NOT only >1
    # process: a single-controller pod slice (one process, N chips) must
    # shard the slot caches over the batch devices too, or every chip holds
    # the full KV. All multihost helpers degrade to identity/device_put at
    # process_count()==1, so the same code serves both.
    multihost = mesh is not None and (mesh.size > 1 or jax.process_count() > 1)
    if multihost:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import BATCH_AXES
        from ..parallel.multihost import (
            allgather_host_data,
            allgather_pyobj,
            fetch_global,
            global_array_from_full,
        )

        input_ids = allgather_host_data(np.asarray(input_ids))
        segment_ids = allgather_host_data(np.asarray(segment_ids))
        position_ids = np.transpose(
            allgather_host_data(
                np.ascontiguousarray(np.transpose(np.asarray(position_ids), (1, 0, 2)))
            ),
            (1, 0, 2),
        )
        gen_pos_start = allgather_host_data(np.asarray(gen_pos_start))
        if patches_list is not None or grids_list is not None:
            parts = allgather_pyobj(
                (list(patches_list or []), list(grids_list or []))
            )
            patches_list = [x for pl_, _ in parts for x in pl_]
            grids_list = [x for _, gl in parts for x in gl]
    b, p = input_ids.shape
    n_out = b * group_n
    slots = min(slots, n_out)
    slots = max(slots - slots % group_n, group_n)  # whole groups only
    u_batch = slots // group_n  # unique prompts per prefill
    if refill_batch > 0:
        # decouple the prefill batch from the slot count (vLLM schedules
        # prefills under a token budget separately from running sequences):
        # the refill's SCRATCH cache is u_batch x P of KV — at long prompts
        # that transient dwarfs the slot cache, so filling `slots` lanes over
        # several small refills admits far more decode lanes at the same HBM
        u_batch = max(min(u_batch, refill_batch), 1)
    if prefill_rows and prefill_rows < u_batch:
        # rows mode: the activation bound is rows*P (or rows*chunk when the
        # token budget still binds within a group), so the chunk is computed
        # against the ROW GROUP, not the whole refill batch — a budget that
        # rows already satisfy yields chunk 0 (full-length rows, unchunked MFU)
        prefill_chunk = effective_prefill_chunk(
            p, prefill_rows, prefill_chunk_size, max_num_batched_tokens
        )
    else:
        prefill_rows = 0  # inert: fall back to the sequence-chunk bound
        prefill_chunk = effective_prefill_chunk(
            p, u_batch, prefill_chunk_size, max_num_batched_tokens
        )

    # DONATE the state (arg 2): it threads linearly through the host loop, so
    # the slot caches update in place. Without donation the slots x width KV
    # cache double-buffers inside every prefill/decode call — at the flagship
    # shape that alone exceeds the HBM the slot budget was sized against (the
    # dense engine never hits this: its cache is a while_loop carry inside
    # ONE jit).
    prefill_jit = jax.jit(
        prefill_slots,
        static_argnames=("cfg", "sampling", "prefill_chunk", "prefill_rows", "group_n"),
        donate_argnums=(2,),
    )
    decode_jit = jax.jit(
        decode_chunk,
        static_argnames=("cfg", "sampling", "chunk", "int4_i8dot"),
        donate_argnums=(2,),
    )

    # slot indices >= `slots` are TRASH slots: queue-padding prefill rows land
    # on the first one (never active), so the refill batch stays fixed. The
    # slot count rounds up to a multiple of 8 so the Pallas decode kernel
    # gets its multi-row batch blocks (an odd slots+1 batch would force the
    # ~4x slower 1-row-per-program configuration); multi-host additionally
    # rounds to the mesh's batch-device count so the lane dim shards evenly.
    trash = slots
    lane_mult = 8
    if multihost:
        import math

        batch_devs = mesh.shape["data"] * mesh.shape["fsdp"]
        lane_mult = math.lcm(8, batch_devs)
    n_lanes = -(-(slots + 1) // lane_mult) * lane_mult
    if multihost:
        lane = NamedSharding(mesh, P(BATCH_AXES))
        lane1 = NamedSharding(mesh, P(None, BATCH_AXES))
        repl = NamedSharding(mesh, P())
        quantized_kv = kv_cache_dtype in (jnp.int8, jnp.uint8)  # int8 | int4
        state_sh = SlotState(
            cache_k=lane1, cache_v=lane1, kv_seg=lane, length=lane,
            cur_tokens=lane, gen_pos=lane, steps=lane, finished=lane,
            active=lane, responses=lane, logps=lane, key=repl,
            k_scale=lane1 if quantized_kv else None,
            v_scale=lane1 if quantized_kv else None,
            ring=repl,
        )
        state = jax.jit(
            init_slot_state,
            static_argnames=("cfg", "slots", "prompt_len", "max_new_tokens", "kv_dtype"),
            out_shardings=state_sh,
        )(cfg, n_lanes, p, max_new_tokens, key, kv_dtype=kv_cache_dtype)
    else:
        state = init_slot_state(cfg, n_lanes, p, max_new_tokens, key, kv_cache_dtype)

    responses = np.full((n_out, max_new_tokens), cfg.pad_token_id, dtype=np.int32)
    logps_out = np.zeros((n_out, max_new_tokens), dtype=np.float32)
    slot_owner = np.full(n_lanes, -1, dtype=np.int64)  # output-row index
    # host mirror of `active`: the host performs every install/release itself,
    # so the steady-state loop needs ONE device->host read per decode chunk
    # (which slots finished) instead of three (finished + active in harvest,
    # active.any() for the loop condition) — each fetch is a full round trip,
    # and over a relay-backed chip those round trips dominate the host loop.
    h_active = np.zeros(n_lanes, dtype=bool)
    next_prompt = 0

    multimodal = patches_list is not None and any(p is not None for p in patches_list)
    if multimodal and vision_bucket <= 0:
        from ..models.qwen2_5_vl.vision import layout_patch_count, window_patch_len

        per_prompt = [
            0 if g is None else sum(layout_patch_count(row, cfg.vision) for row in np.asarray(g))
            for g in grids_list
        ]
        vision_bucket = max(per_prompt) * u_batch
        wlen = window_patch_len(cfg.vision)
        vision_bucket = -(-vision_bucket // wlen) * wlen

    if multihost:
        # prefill rows shard over the batch devices when they divide evenly
        # (the prompt forward is the dominant FLOPs — replicating it would
        # waste every device but one per shard group); small operands stay
        # replicated. Slot state reads come back via local-shard + allgather.
        u_sharded = u_batch % batch_devs == 0

        def dev(x, row_axis=None):
            spec = (
                P(*([None] * row_axis + [BATCH_AXES]))
                if row_axis is not None and u_sharded else P()
            )
            return global_array_from_full(np.asarray(x), mesh, spec)

        def fetch_lane(arr, extra_dims: int = 0):
            return fetch_global(arr, mesh, P(*([BATCH_AXES] + [None] * extra_dims)))
    else:
        def dev(x, row_axis=None):
            return jnp.asarray(x)

        def fetch_lane(arr, extra_dims: int = 0):
            return np.asarray(arr)

    def refill(state, free_slot_list):
        nonlocal next_prompt, slot_owner
        targets = np.full(u_batch * group_n, trash, dtype=np.int64)
        rows = np.zeros(u_batch, dtype=np.int64)
        valid = np.zeros(u_batch, dtype=bool)
        free = list(free_slot_list)
        for g in range(u_batch):
            if next_prompt >= b or len(free) < group_n:
                break
            group_slots = [free.pop(0) for _ in range(group_n)]
            rows[g] = next_prompt
            valid[g] = True
            for j, slot in enumerate(group_slots):
                targets[g * group_n + j] = slot
                slot_owner[slot] = next_prompt * group_n + j
                h_active[slot] = True
            next_prompt += 1
        ids_batch = input_ids[rows].copy()
        seg_batch = segment_ids[rows].copy()
        # padding rows must carry NO tokens (image-token gather alignment)
        ids_batch[~valid] = 0
        seg_batch[~valid] = 0
        vision = None
        if multimodal:
            from ..data.packing import pack_vision_batch

            vision = pack_vision_batch(
                [patches_list[int(r)] if v else None for r, v in zip(rows, valid)],
                [grids_list[int(r)] if v else None for r, v in zip(rows, valid)],
                cfg.vision, pad_to=vision_bucket,
            )
            if vision is not None:
                # replicated: the pack interleaves rows' patches, so row
                # sharding doesn't apply; packs are identical on every host
                vision = jax.tree.map(dev, vision)
        state = prefill_jit(
            params, cfg, state,
            dev(targets),
            dev(ids_batch, 0),
            dev(seg_batch, 0),
            dev(position_ids[:, rows], 1),
            dev(gen_pos_start[rows], 0),
            dev(valid, 0),
            sampling,
            vision,
            prefill_chunk=prefill_chunk,
            prefill_rows=prefill_rows,
            group_n=group_n,
        )
        return state, free  # leftover slots stay in the caller's pool

    def harvest(state, finished_np) -> Tuple[SlotState, List[int]]:
        nonlocal responses, logps_out, slot_owner
        done_slots = [int(i) for i in np.nonzero(finished_np & h_active)[0]]
        if done_slots:
            resp_rows = fetch_lane(state.responses, 1)[done_slots]
            logp_rows = fetch_lane(state.logps, 1)[done_slots]
            for row, slot in enumerate(done_slots):
                owner = slot_owner[slot]
                if owner >= 0:
                    responses[owner] = resp_rows[row]
                    logps_out[owner] = logp_rows[row]
                    slot_owner[slot] = -1
                h_active[slot] = False
            # SHAPE-STABLE scatter: the number of finished slots varies every
            # chunk, and a `.at[idx]` whose index count changes is a fresh XLA
            # program each time — through the remote-compile relay that's
            # seconds per chunk of pure recompilation. Pad to n_lanes with an
            # out-of-bounds index (mode="drop") so one program serves every
            # chunk.
            idx = np.full(n_lanes, n_lanes, np.int32)
            idx[: len(done_slots)] = done_slots
            state = state._replace(
                active=state.active.at[jnp.asarray(idx)].set(False, mode="drop")
            )
        return state, done_slots

    # fill every slot (several refills when refill_batch caps the prefill)
    import os as _os
    import time as _time

    trace = _os.environ.get("SPATIALTHINKER_ENGINE_TRACE") == "1"
    t_acc = {"refill": 0.0, "dispatch": 0.0, "sync": 0.0, "harvest": 0.0,
             "chunks": 0, "refills": 0}
    free_pool = list(range(slots))
    while next_prompt < b and len(free_pool) >= group_n:
        t0 = _time.perf_counter()
        state, free_pool = refill(state, free_pool)
        t_acc["refill"] += _time.perf_counter() - t0
        t_acc["refills"] += 1
    while True:
        t0 = _time.perf_counter()
        state = decode_jit(params, cfg, state, sampling, decode_chunk_size,
                           int4_i8dot=int4_i8dot)
        t1 = _time.perf_counter()
        # the one fetch per sync: which slots finished during this chunk
        finished_np = np.asarray(fetch_lane(state.finished), dtype=bool)
        t2 = _time.perf_counter()
        state, done_slots = harvest(state, finished_np)
        t3 = _time.perf_counter()
        free_pool.extend(done_slots)
        t_acc["dispatch"] += t1 - t0
        t_acc["sync"] += t2 - t1
        t_acc["harvest"] += t3 - t2
        t_acc["chunks"] += 1
        while next_prompt < b and len(free_pool) >= group_n:
            t0 = _time.perf_counter()
            state, free_pool = refill(state, free_pool)
            t_acc["refill"] += _time.perf_counter() - t0
            t_acc["refills"] += 1
        if not h_active.any() and next_prompt >= b:
            break
    if trace:
        import sys as _sys

        print(f"[continuous trace] {t_acc}", file=_sys.stderr, flush=True)

    from .sampling import get_response_mask

    mask = np.asarray(get_response_mask(jnp.asarray(responses), cfg.eos_token_id))
    responses = np.where(mask == 1, responses, cfg.pad_token_id)
    return ContinuousResult(
        responses=responses, response_mask=mask, rollout_log_probs=logps_out * mask
    )
