"""Paged continuous-batching rollout: a global KV page pool, host-managed
page tables with refcounted prompt-page sharing, and preempt-and-requeue
admission — the memory-management half of vLLM
(/root/reference/verl/workers/rollout/vllm_rollout_spmd.py:69-85 sizes the
pool from gpu_memory_utilization; the vLLM scheduler pages/preempts so
concurrency follows ACTUAL memory use, not worst case).

How it differs from rollout/continuous.py (dense slots):
- a slot OCCUPIES only the pages it has filled; admission is bounded by the
  page pool (HBM budget), not by slots x worst-case reservation — the reason
  dense long-context batch caps out;
- pages hold COMPACTED tokens (no left padding): prefill gathers each
  prompt's valid tail out of the scratch cache while scattering into pages;
- grouped sampling (GRPO rollout.n) SHARES the prompt's full pages across
  the n lanes via refcounts (vLLM prefix-sharing parity) — at n=5 the
  prompt's KV is stored once, not five times; only the partial tail page is
  per-lane (decode writes into it);
- on pool exhaustion the YOUNGEST group is preempted: its pages free, its
  prompt requeues, and it recomputes later (vLLM recompute preemption). The
  oldest group is never preempted, so forward progress is guaranteed.

Device programs stay static-shape: prefill installs at fixed-size scatter
index arrays (unused entries target the reserved dummy page 0), decode is
the same carry-scan as the dense engine with per-slot (page, offset) writes,
and attention is the Pallas page-table kernel in ops/paged_attention.py.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen2_5_vl import Qwen25VLConfig
from ..models.qwen2_5_vl.model import prefill_forward
from ..models.qwen2_5_vl.text import (
    KVCache,
    _quantize_kv,
    attention_inputs,
    finish_layer,
    logits_from_hidden,
    rms_norm,
)
from ..models.qwen2_5_vl.rope import compute_cos_sin, make_inv_freq
from ..ops.paged_attention import paged_attention
from ..ops.quant import embed_rows
from .sampling import SamplingParams, get_response_mask, sample_tokens, sampled_token_logp


class PagedState(NamedTuple):
    k_pool: jnp.ndarray      # (L, N, Hkv, page, D) int8 | bf16
    v_pool: jnp.ndarray
    page_table: jnp.ndarray  # (S, P_max) int32 — dummy page 0 beyond length
    length: jnp.ndarray      # (S,) int32 — COMPACTED valid cells (prompt+gen)
    cur_tokens: jnp.ndarray  # (S,) int32
    gen_pos: jnp.ndarray     # (S,) int32 — rope position of the next fed token
    steps: jnp.ndarray       # (S,) int32
    finished: jnp.ndarray    # (S,) bool
    active: jnp.ndarray      # (S,) bool
    responses: jnp.ndarray   # (S, R) int32
    logps: jnp.ndarray       # (S, R) fp32
    key: jax.Array
    k_scale: Optional[jnp.ndarray] = None  # (L, N, Hkv, page) — int8 mode
    v_scale: Optional[jnp.ndarray] = None
    # Decode staging ring (uniform-index KV writes). Per-slot (page, offset)
    # pool writes are vector-index scatters, which SERIALIZE on TPU (the
    # continuous engine measured 473 ms/token-step from the same pattern).
    # New tokens instead accumulate in this small dense buffer at index
    # `ring` — a dynamic_update_slice, uniform across slots — attention
    # flash-merges the pool kernel's partial softmax with the staged cells,
    # and ONE batched install per chunk moves them into the pools.
    stage_k: Optional[jnp.ndarray] = None   # (L, S, Hkv, C, D) int8 | bf16 cells
    stage_v: Optional[jnp.ndarray] = None
    stage_ks: Optional[jnp.ndarray] = None  # (L, S, Hkv, C) bf16 — quantized pools
    stage_vs: Optional[jnp.ndarray] = None
    stage_seg: Optional[jnp.ndarray] = None  # (S, C) int32 — staged-cell validity
    ring: Optional[jnp.ndarray] = None       # () int32 — position within the chunk


def init_paged_state(cfg: Qwen25VLConfig, slots: int, total_pages: int,
                     page_size: int, p_max: int, max_new_tokens: int,
                     key: jax.Array, kv_dtype=jnp.bfloat16,
                     stage_width: int = 16,
                     fuse_staged: bool = False) -> PagedState:
    t = cfg.text
    pool_shape = (t.num_hidden_layers, total_pages, t.num_key_value_heads,
                  page_size, t.head_dim)
    # k/v scales must be DISTINCT buffers (not one shared array): the state is
    # donated into prefill/decode, and donating the same buffer twice is an
    # XLA execution error
    k_scales = v_scales = None
    if kv_dtype in (jnp.int8, jnp.uint8):
        k_scales = jnp.zeros(pool_shape[:-1], jnp.bfloat16)
        v_scales = jnp.zeros(pool_shape[:-1], jnp.bfloat16)
    if kv_dtype == jnp.uint8:  # int4: page-local split-half packed rows
        assert page_size % 2 == 0, page_size
        pool_shape = pool_shape[:3] + (page_size // 2, t.head_dim)
    # staging cells stay UNPACKED (int8 holds the int4 values pre-packing);
    # nibble packing happens once per chunk at install
    stage_dtype = jnp.int8 if kv_dtype in (jnp.int8, jnp.uint8) else kv_dtype
    if fuse_staged and jax.default_backend() == "tpu":
        # fused mode: the staging block rides INSIDE the paged attention
        # kernel (_staged_block_update); its cell dim is a vector minor dim
        # there, and Mosaic cannot lower the block's reshapes below 128
        # lanes ("infer-vector-layout: unsupported shape cast" at width 64 —
        # measured on chip; interpret mode does not catch it). Cells past
        # the chunk stay stage_seg=0: masked in-kernel, dropped at install.
        stage_width = max(stage_width, 128)
    stage_shape = (t.num_hidden_layers, slots, t.num_key_value_heads,
                   stage_width, t.head_dim)
    stage_ks = stage_vs = None
    if kv_dtype in (jnp.int8, jnp.uint8):
        stage_ks = jnp.zeros(stage_shape[:-1], jnp.bfloat16)
        stage_vs = jnp.zeros(stage_shape[:-1], jnp.bfloat16)
    return PagedState(
        k_pool=jnp.zeros(pool_shape, kv_dtype),
        v_pool=jnp.zeros(pool_shape, kv_dtype),
        k_scale=k_scales,
        v_scale=v_scales,
        page_table=jnp.zeros((slots, p_max), jnp.int32),
        length=jnp.zeros((slots,), jnp.int32),
        cur_tokens=jnp.zeros((slots,), jnp.int32),
        gen_pos=jnp.zeros((slots,), jnp.int32),
        steps=jnp.zeros((slots,), jnp.int32),
        finished=jnp.ones((slots,), bool),
        active=jnp.zeros((slots,), bool),
        responses=jnp.full((slots, max_new_tokens), cfg.pad_token_id, jnp.int32),
        logps=jnp.zeros((slots, max_new_tokens), jnp.float32),
        key=key,
        stage_k=jnp.zeros(stage_shape, stage_dtype),
        stage_v=jnp.zeros(stage_shape, stage_dtype),
        stage_ks=stage_ks,
        stage_vs=stage_vs,
        stage_seg=jnp.zeros((slots, stage_width), jnp.int32),
        ring=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# prefill: dense scratch cache -> compacted pages
# ---------------------------------------------------------------------------


def prefill_transient_bytes(cfg: Qwen25VLConfig, prompt_len: int, u_batch: int,
                            prefill_rows: int, cell_bytes: int) -> int:
    """Peak transient HBM of one refill-prefill program, for POOL SIZING.

    The pool budget (free HBM x gpu_memory_utilization, vLLM parity) must
    leave room for the refill program's own transients or the prefill jit
    fails to COMPILE once the pool is resident (measured: flagship-shape
    refill at util 0.9 needed 16.96G of 15.75G). Two dominant terms:
    the u_batch x padded-width scratch prompt KV (``cell_bytes`` per token,
    same accounting as the pool cell), and the gate_up activation of the
    rows actually in flight (rows x P x 2I bf16). vLLM solves the same
    problem by profiling a forward before sizing its cache
    (/root/reference: vllm gpu_memory_utilization semantics); a static
    estimate with 25% headroom avoids running a throwaway forward through
    the remote-compile relay."""
    t = cfg.text
    width = -(-prompt_len // 256) * 256  # engines round the scratch width
    scratch = u_batch * width * cell_bytes
    rows = prefill_rows if 0 < prefill_rows < u_batch else u_batch
    act = rows * prompt_len * 2 * t.intermediate_size * 2
    return int((scratch + act) * 1.25)


class PrefillInstall(NamedTuple):
    """Host-computed scatter plan (fixed shapes per refill-batch geometry)."""

    full_src_row: jnp.ndarray   # (T_full,) scratch row per full page
    full_src_pos: jnp.ndarray   # (T_full, page) scratch positions
    full_dst: jnp.ndarray       # (T_full,) pool page id (0 = unused/dummy)
    tail_src_row: jnp.ndarray   # (T_tail,) scratch row per lane tail page
    tail_src_pos: jnp.ndarray   # (T_tail, page)
    tail_dst: jnp.ndarray       # (T_tail,)
    table_rows: jnp.ndarray     # (u*group_n, P_max) page-table rows
    lengths: jnp.ndarray        # (u,) prompt lengths (compacted)


def prefill_paged(
    params, cfg: Qwen25VLConfig, state: PagedState,
    slot_ids: jnp.ndarray,        # (u * group_n,)
    input_ids: jnp.ndarray,       # (u, P) left-padded UNIQUE prompts
    segment_ids: jnp.ndarray,     # (u, P)
    position_ids: jnp.ndarray,    # (3, u, P)
    gen_pos_start: jnp.ndarray,   # (u,)
    valid: jnp.ndarray,           # (u,) bool
    install: PrefillInstall,
    sampling: SamplingParams,
    vision=None,
    prefill_chunk: int = 0,
    prefill_rows: int = 0,
    group_n: int = 1,
) -> PagedState:
    """Prompt forward for u unique prompts; the prompt KV scatters COMPACTED
    into pool pages (full pages shared by the group's n lanes, tail pages
    per lane) and each lane's slot state initializes."""
    u, p = input_ids.shape
    t = cfg.text
    quantized = state.k_scale is not None
    max_new = state.responses.shape[1]

    scratch = KVCache.init(t.num_hidden_layers, u, p, t.num_key_value_heads,
                           t.head_dim, dtype=state.k_pool.dtype)
    seg32 = segment_ids.astype(jnp.int32)
    hidden, scratch = prefill_forward(
        params, cfg, input_ids, position_ids, seg32, scratch, seg32,
        vision=vision, prefill_chunk=prefill_chunk, prefill_rows=prefill_rows,
    )
    last_logits = logits_from_hidden(params["text"], hidden[:, -1:, :], cfg.text)[:, 0, :]

    def scatter(pool, scratch_arr, src_row, src_pos, dst, scale: bool):
        # gather (T, page) tokens out of the scratch cache, then one page
        # scatter; advanced-index result (T, page, L, Hkv[, D]) reorders to
        # pool layout
        if scale:
            g = scratch_arr[:, src_row[:, None], :, src_pos]
            g = jnp.transpose(g, (2, 0, 3, 1))
        else:
            g = scratch_arr[:, src_row[:, None], :, src_pos, :]
            g = jnp.transpose(g, (2, 0, 3, 1, 4))
        return pool.at[:, dst].set(g.astype(pool.dtype))

    if state.k_pool.dtype == jnp.uint8:  # int4: unpack scratch, repack per page
        from ..models.qwen2_5_vl.text import _pack_nibbles, _unpack_kv4

        def scatter_kv(pool, packed_scratch, src_row, src_pos, dst):
            toks = _unpack_kv4(packed_scratch, seq_axis=3)  # (L, u, Hkv, P, D)
            g = toks[:, src_row[:, None], :, src_pos, :]    # (T, page, L, Hkv, D)
            g = jnp.transpose(g, (2, 0, 3, 1, 4))           # (L, T, Hkv, page, D)
            half = g.shape[3] // 2
            packed = _pack_nibbles(g[:, :, :, :half], g[:, :, :, half:])
            return pool.at[:, dst].set(packed)
    else:
        def scatter_kv(pool, scratch_arr, src_row, src_pos, dst):
            return scatter(pool, scratch_arr, src_row, src_pos, dst, False)

    k_pool = scatter_kv(state.k_pool, scratch.k, install.full_src_row,
                        install.full_src_pos, install.full_dst)
    k_pool = scatter_kv(k_pool, scratch.k, install.tail_src_row,
                        install.tail_src_pos, install.tail_dst)
    v_pool = scatter_kv(state.v_pool, scratch.v, install.full_src_row,
                        install.full_src_pos, install.full_dst)
    v_pool = scatter_kv(v_pool, scratch.v, install.tail_src_row,
                        install.tail_src_pos, install.tail_dst)
    scale_updates = {}
    if quantized:
        ks = scatter(state.k_scale, scratch.k_scale, install.full_src_row,
                     install.full_src_pos, install.full_dst, True)
        ks = scatter(ks, scratch.k_scale, install.tail_src_row,
                     install.tail_src_pos, install.tail_dst, True)
        vs = scatter(state.v_scale, scratch.v_scale, install.full_src_row,
                     install.full_src_pos, install.full_dst, True)
        vs = scatter(vs, scratch.v_scale, install.tail_src_row,
                     install.tail_src_pos, install.tail_dst, True)
        scale_updates = dict(k_scale=ks, v_scale=vs)

    from ..models.qwen2_5_vl.model import fanout_rows

    if group_n > 1:
        last_logits = fanout_rows(last_logits, group_n)
        gen_pos_start = fanout_rows(gen_pos_start, group_n)
        valid = fanout_rows(valid, group_n)
    lengths = (
        fanout_rows(install.lengths, group_n) if group_n > 1 else install.lengths
    )

    key, subkey = jax.random.split(state.key)
    first = sample_tokens(last_logits, subkey, sampling)
    first_logp = sampled_token_logp(last_logits, first, sampling)
    finished0 = (first == cfg.eos_token_id) | ~valid

    k = u * group_n
    resp_row = jnp.full((k, max_new), cfg.pad_token_id, jnp.int32).at[:, 0].set(first)
    logp_row = jnp.zeros((k, max_new), jnp.float32).at[:, 0].set(first_logp)

    return state._replace(
        k_pool=k_pool,
        v_pool=v_pool,
        **scale_updates,
        page_table=state.page_table.at[slot_ids].set(install.table_rows),
        length=state.length.at[slot_ids].set(lengths.astype(jnp.int32)),
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
# decode over pages
# ---------------------------------------------------------------------------


def _paged_decode_layer(layer_p, cfg, x, cos, sin, stage, layer_idx,
                        page_table, lengths_installed, pools, ring, stage_seg,
                        int4_i8dot=False, fuse_staged=False):
    """One decoder layer, one token per slot. The new token's KV is written
    into the STAGING ring at the uniform index ``ring`` (dynamic_update_slice
    — a per-slot pool scatter would serialize, see PagedState.stage_k);
    attention covers the INSTALLED pool cells and the staged ring cells in
    ONE paged_attention call (the staged block fuses into the kernel's last
    grid step). ``stage`` is the carried (stage_k, stage_v[, stage_ks,
    stage_vs]); the pools are read-only during the chunk. Head/tail shared
    with every other engine (text.attention_inputs / text.finish_layer)."""
    t = cfg
    int4 = pools[0].dtype == jnp.uint8
    quantized = len(pools) == 4

    x2 = x[:, None, :]
    q, knew, vnew = attention_inputs(layer_p, t, x2, cos, sin)

    zero = jnp.zeros((), jnp.int32)

    def dus_cell(arr, val):  # val (S, Hkv, D) -> arr[layer_idx, :, :, ring]
        return jax.lax.dynamic_update_slice(
            arr, val[None, :, :, None, :].astype(arr.dtype),
            (layer_idx, zero, zero, ring, zero),
        )

    def dus_scale(arr, val):  # val (S, Hkv) -> arr[layer_idx, :, :, ring]
        return jax.lax.dynamic_update_slice(
            arr, val[None, :, :, None].astype(arr.dtype),
            (layer_idx, zero, zero, ring),
        )

    if quantized:
        from ..models.qwen2_5_vl.text import _quantize_kv4

        qfn = _quantize_kv4 if int4 else _quantize_kv
        kq, ks = qfn(knew)  # (S, 1, Hkv, D) / (S, 1, Hkv) — SIGNED values
        vq, vs = qfn(vnew)
        stage_k = dus_cell(stage[0], kq[:, 0])
        stage_v = dus_cell(stage[1], vq[:, 0])
        stage_ks = dus_scale(stage[2], ks[:, 0])
        stage_vs = dus_scale(stage[3], vs[:, 0])
        new_stage = (stage_k, stage_v, stage_ks, stage_vs)
        pool_scales = (pools[2], pools[3])
    else:
        stage_k = dus_cell(stage[0], knew[:, 0])
        stage_v = dus_cell(stage[1], vnew[:, 0])
        new_stage = (stage_k, stage_v)
        pool_scales = (None, None)

    s = x.shape[0]
    d = q.shape[-1]
    scale = d**-0.5
    qh = q[:, 0].astype(x.dtype)
    if fuse_staged:
        # pool pages AND the staging ring in ONE kernel call: the staged
        # cells join the online softmax on the kernel's last grid step
        # (ops/paged_attention._staged_block_update). MEASURED SLOWER than
        # the XLA merge below at scale (the predicated last-step branch
        # runs per (si, layer) and breaks Mosaic's cross-program pipelining:
        # long shape 128 slots ~88 vs ~36 ms/token-step) — kept selectable
        # for revalidation on future Mosaic releases.
        out = paged_attention(
            qh, pools[0], pools[1], page_table, lengths_installed,
            layer_idx, *pool_scales, int4_i8dot=int4_i8dot,
            staged=(new_stage[0], new_stage[1],
                    new_stage[2] if quantized else None,
                    new_stage[3] if quantized else None,
                    stage_seg),
        ).astype(x.dtype)
        return finish_layer(layer_p, t, x2, out[:, None])[:, 0], new_stage

    # default: pool kernel emits partial-softmax stats; the chunk's staged
    # cells attend in ONE vectorized XLA block over all slots and merge via
    # the standard flash combine (all-slot einsums vectorize better than
    # per-program predicated kernel updates — see fuse_staged above)
    o1, m1, l1 = paged_attention(
        qh, pools[0], pools[1], page_table, lengths_installed,
        layer_idx, *pool_scales, return_stats=True, int4_i8dot=int4_i8dot,
    )
    hkv = new_stage[0].shape[2]
    hq = qh.shape[1]
    g = hq // hkv
    k_st = jax.lax.dynamic_index_in_dim(new_stage[0], layer_idx, 0, keepdims=False)
    v_st = jax.lax.dynamic_index_in_dim(new_stage[1], layer_idx, 0, keepdims=False)
    k_bf = k_st.astype(jnp.float32)
    v_bf = v_st.astype(jnp.float32)
    if quantized:
        ks_st = jax.lax.dynamic_index_in_dim(new_stage[2], layer_idx, 0, keepdims=False)
        vs_st = jax.lax.dynamic_index_in_dim(new_stage[3], layer_idx, 0, keepdims=False)
        k_bf = k_bf * ks_st[..., None].astype(jnp.float32)
        v_bf = v_bf * vs_st[..., None].astype(jnp.float32)
    qg = qh.reshape(s, hkv, g, d).astype(jnp.float32)
    s2 = jnp.einsum("shgd,shcd->shgc", qg, k_bf) * scale
    mask = (stage_seg > 0)[:, None, None, :]
    s2 = jnp.where(mask, s2, -1e30)
    m2 = jnp.max(s2, axis=3)                      # (S, Hkv, G)
    p2 = jnp.where(mask, jnp.exp(s2 - m2[..., None]), 0.0)
    l2 = jnp.sum(p2, axis=3)
    o2 = jnp.einsum("shgc,shcd->shgd", p2, v_bf)  # UNNORMALIZED (sums to l2)

    m1r = m1.reshape(s, hkv, g)
    l1r = l1.reshape(s, hkv, g)
    m = jnp.maximum(m1r, m2)
    a1 = l1r * jnp.exp(m1r - m)
    a2 = jnp.exp(m2 - m)
    den = a1 + a2 * l2
    safe = jnp.where(den == 0.0, 1.0, den)
    o = (
        a1[..., None] * o1.reshape(s, hkv, g, d).astype(jnp.float32)
        + a2[..., None] * o2
    ) / safe[..., None]
    out = o.reshape(s, hq, d).astype(x.dtype)

    return finish_layer(layer_p, t, x2, out[:, None])[:, 0], new_stage


def decode_chunk_paged(
    params, cfg: Qwen25VLConfig, state: PagedState, sampling: SamplingParams,
    chunk: int, int4_i8dot: bool = False, fuse_staged: bool = False,
) -> PagedState:
    """Advance every unfinished slot `chunk` tokens. The host guarantees each
    running slot's page table covers length+chunk cells before calling.

    New-token KV accumulates in the staging ring (uniform-index writes, see
    PagedState.stage_k) and installs into the pools ONCE at the end of the
    chunk — the only per-slot-indexed pool write, amortized over the whole
    chunk. ``state.length`` stays the INSTALLED cell count during the chunk
    (the pool kernel masks by it); it advances at install."""
    t = cfg.text
    inv_freq = jnp.asarray(make_inv_freq(t.head_dim, t.rope_theta), jnp.float32)
    text_params = params["text"]
    int4 = state.k_pool.dtype == jnp.uint8
    # TOKEN cells per page: the int4 pool stores page_size/2 packed byte rows,
    # but the page table, install arithmetic, and scales are in token cells
    page = state.k_pool.shape[3] * (2 if int4 else 1)
    stage_width = state.stage_seg.shape[1]
    if chunk > stage_width:
        raise ValueError(
            f"decode chunk {chunk} exceeds the staging width {stage_width} "
            "(init_paged_state stage_width must cover the chunk)"
        )
    quantized = state.k_scale is not None

    def one_step(state, _):
        s = state.cur_tokens.shape[0]
        run = state.active & ~state.finished

        pos = jnp.broadcast_to(state.gen_pos[None, :, None], (3, s, 1))
        cos, sin = compute_cos_sin(pos, inv_freq, t.mrope_section, dtype=jnp.bfloat16)
        x = embed_rows(
            text_params["embed_tokens"], state.cur_tokens,
            dtype=text_params["norm"].dtype,
        )
        # mark this step's staged cell valid for running slots only
        stage_seg = jnp.where(
            run[:, None] & (jnp.arange(stage_width)[None] == state.ring),
            1, state.stage_seg,
        )
        pools = (
            (state.k_pool, state.v_pool, state.k_scale, state.v_scale)
            if quantized else (state.k_pool, state.v_pool)
        )

        def body(carry, layer_p):
            x, stage, idx = carry
            x, stage = _paged_decode_layer(
                layer_p, t, x, cos, sin, stage, idx,
                state.page_table, state.length, pools, state.ring, stage_seg,
                int4_i8dot=int4_i8dot, fuse_staged=fuse_staged,
            )
            return (x, stage, idx + 1), None

        stage0 = (
            (state.stage_k, state.stage_v, state.stage_ks, state.stage_vs)
            if quantized else (state.stage_k, state.stage_v)
        )
        init = (x, stage0, jnp.zeros((), jnp.int32))
        (x_out, stage, _), _ = jax.lax.scan(body, init, text_params["layers"])
        stage_updates = (
            dict(stage_ks=stage[2], stage_vs=stage[3]) if quantized else {}
        )
        hidden = rms_norm(x_out[:, None, :], text_params["norm"], t.rms_norm_eps)
        logits = logits_from_hidden(text_params, hidden, t)[:, 0, :]

        key, subkey = jax.random.split(state.key)
        sampled = sample_tokens(logits, subkey, sampling)
        logp = sampled_token_logp(logits, sampled, sampling)

        max_new = state.responses.shape[1]
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
        return state._replace(
            stage_k=stage[0],
            stage_v=stage[1],
            **stage_updates,
            stage_seg=stage_seg,
            ring=state.ring + 1,
            cur_tokens=jnp.where(run, sampled, state.cur_tokens),
            gen_pos=jnp.where(run, state.gen_pos + 1, state.gen_pos),
            steps=jnp.where(run, state.steps + 1, state.steps),
            finished=state.finished | newly_finished,
            responses=responses,
            logps=logps,
            key=key,
        ), None

    state, _ = jax.lax.scan(one_step, state, None, length=chunk)
    return _install_stage(state, page)


def _install_stage(state: PagedState, page: int) -> PagedState:
    """Move the chunk's staged cells into the pools: ONE batched scatter per
    pool array (per-cell indices, but once per chunk instead of per step).
    Staged index c of a slot is its c-th step of the chunk — running slots
    form a PREFIX of the chunk (refills only happen between chunks), so the
    destination cell is simply length + c. Invalid cells scatter to an
    out-of-bounds page id and drop."""
    s, c_width = state.stage_seg.shape
    l_layers, n_pages, hkv = state.k_pool.shape[0], state.k_pool.shape[1], state.k_pool.shape[2]
    d = state.k_pool.shape[4]
    int4 = state.k_pool.dtype == jnp.uint8
    quantized = state.k_scale is not None

    valid = state.stage_seg > 0  # (S, C)
    counts = jnp.sum(state.stage_seg, axis=1)
    cells = state.length[:, None] + jnp.arange(c_width, dtype=jnp.int32)[None]
    pg_col = jnp.clip(cells // page, 0, state.page_table.shape[1] - 1)
    pg = jnp.take_along_axis(state.page_table, pg_col, axis=1)
    pg = jnp.where(valid, pg, n_pages)  # OOB -> dropped by the scatter
    off = cells % page
    m = s * c_width
    pgf = pg.reshape(m)
    offf = off.reshape(m)

    def cell_vals(stg):  # (L, S, Hkv, C, D) -> (M, L, Hkv, D)
        return jnp.transpose(stg, (1, 3, 0, 2, 4)).reshape(m, l_layers, hkv, d)

    def scale_vals(stg):  # (L, S, Hkv, C) -> (M, L, Hkv)
        return jnp.transpose(stg, (1, 3, 0, 2)).reshape(m, l_layers, hkv)

    if int4:
        from ..models.qwen2_5_vl.text import KV4_BIAS

        half = page // 2
        rowf = (offf % half).astype(jnp.int32)
        hif = (offf >= half)[:, None, None, None]
        u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8)

        def put4(pool, stg):
            qb = u8(cell_vals(stg) + jnp.int8(KV4_BIAS))  # (M, L, Hkv, D)
            # TWO sequential RMW passes (low nibbles, then high): staged cells
            # c and c+page/2 of one slot land in the SAME byte whenever the
            # chunk spans half a page — within one pass no two staged cells
            # share a byte (same nibble + same row implies a different page),
            # and the high pass's gather sees the low pass's writes
            for sel in (offf < half, offf >= half):
                pgsel = jnp.where(sel, pgf, n_pages)  # OOB -> dropped
                cur = pool[:, jnp.clip(pgsel, 0, n_pages - 1), :, rowf]
                merged = jnp.where(
                    hif,
                    (cur & jnp.uint8(0x0F)) | (qb << 4),
                    (cur & jnp.uint8(0xF0)) | (qb & jnp.uint8(0xF)),
                )
                pool = pool.at[:, pgsel, :, rowf].set(merged, mode="drop")
            return pool

        k_pool = put4(state.k_pool, state.stage_k)
        v_pool = put4(state.v_pool, state.stage_v)
    else:
        def put(pool, stg):
            return pool.at[:, pgf, :, offf].set(
                cell_vals(stg).astype(pool.dtype), mode="drop"
            )

        k_pool = put(state.k_pool, state.stage_k)
        v_pool = put(state.v_pool, state.stage_v)
    scale_updates = {}
    if quantized:
        scale_updates = dict(
            k_scale=state.k_scale.at[:, pgf, :, offf].set(
                scale_vals(state.stage_ks), mode="drop"
            ),
            v_scale=state.v_scale.at[:, pgf, :, offf].set(
                scale_vals(state.stage_vs), mode="drop"
            ),
        )
    return state._replace(
        k_pool=k_pool,
        v_pool=v_pool,
        **scale_updates,
        length=state.length + counts,
        stage_seg=jnp.zeros_like(state.stage_seg),
        ring=jnp.zeros_like(state.ring),
    )


# ---------------------------------------------------------------------------
# host orchestration: allocator, refill, preemption
# ---------------------------------------------------------------------------


class PageAllocator:
    """Host-side page pool: free list + refcounts (page 0 reserved dummy)."""

    def __init__(self, total_pages: int):
        self.free: List[int] = list(range(total_pages - 1, 0, -1))
        self.refcount = np.zeros(total_pages, dtype=np.int32)

    def alloc(self, n: int) -> Optional[List[int]]:
        if len(self.free) < n:
            return None
        pages = [self.free.pop() for _ in range(n)]
        self.refcount[pages] = 1
        return pages

    def ref(self, pages: List[int], n: int) -> None:
        self.refcount[pages] += n

    def release(self, pages: List[int]) -> None:
        self.refcount[pages] -= 1
        for p in pages:
            if self.refcount[p] == 0:
                self.free.append(p)

    @property
    def n_free(self) -> int:
        return len(self.free)


class PagedResult(NamedTuple):
    responses: np.ndarray
    response_mask: np.ndarray
    rollout_log_probs: np.ndarray
    stats: dict


def generate_paged(
    params,
    cfg: Qwen25VLConfig,
    input_ids: np.ndarray,       # (B, P) left-padded UNIQUE prompts
    segment_ids: np.ndarray,
    position_ids: np.ndarray,    # (3, B, P)
    gen_pos_start: np.ndarray,
    *,
    max_new_tokens: int,
    sampling: SamplingParams,
    key: jax.Array,
    slots: int = 32,
    page_size: int = 128,
    total_pages: int = 0,        # 0 = worst case (slots x pages-per-slot)
    decode_chunk_size: int = 32,
    kv_cache_dtype=jnp.bfloat16,
    patches_list=None,
    grids_list=None,
    vision_bucket: int = 0,
    prefill_chunk_size: int = 0,
    max_num_batched_tokens: int = 0,
    prefill_rows: int = 0,       # >0: batch-chunked (rows mode) refill prefill
    refill_batch: int = 0,       # >0: cap unique prompts per refill prefill
    group_n: int = 1,
    mesh=None,                   # jax Mesh -> multi-host SPMD mode (see below)
    int4_i8dot: bool = False,    # int4 decode dots on the int8 MXU
    fuse_staged: bool = False,   # staged cells inside the kernel (slower
                                 # today — see _paged_decode_layer)
) -> PagedResult:
    """Generate B*group_n sequences through `slots` decode lanes over a
    `total_pages` KV page pool. Output row i*group_n + j is sample j of
    prompt i (repeat-interleave order). ``stats`` reports page-pool telemetry
    (peak pages, preemptions).

    Multi-host (``mesh`` given and jax.process_count() > 1): the same
    lockstep-by-construction contract as rollout/continuous.py — the prompt
    queue is allgathered at entry and every process runs this identical host
    loop over it, so the (deterministic) page allocator, admission, and
    preemption decisions agree everywhere without negotiation. Lanes shard
    over the mesh's batch axes; the PAGE POOL shards over its page axis (the
    pool is the HBM budget — replicating it would undo the budgeting). Every
    host read of device state comes back via local-shard + allgather. Each
    process returns the FULL global output; the caller slices its rows.
    ``total_pages`` must already be negotiated (the trainer allgather-mins
    the per-process free-HBM estimate)."""
    from .continuous import effective_prefill_chunk

    # the caller's key lands inside the donated state — clone it so the
    # caller may reuse the same key array (donation deletes the buffer)
    key = jax.random.clone(key)
    # sharded SPMD mode whenever the mesh spans >1 device (see
    # rollout/continuous.py): one-process pod slices shard the page pool over
    # the batch devices exactly like multi-process runs do
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
    slots = max(slots - slots % group_n, group_n)
    u_batch = slots // group_n
    if refill_batch > 0:
        # cap the prefill batch independently of the slot count (see
        # rollout/continuous.py): the u_batch x P scratch cache is the
        # transient that competes with the PAGE POOL for HBM — small refills
        # keep the pool budget honest at long prompts
        u_batch = max(min(u_batch, refill_batch), 1)
    if prefill_rows and prefill_rows < u_batch:
        # rows mode bounds activations by rows*P per group (see
        # rollout/continuous.py): the chunk budget applies within a row group
        prefill_chunk = effective_prefill_chunk(
            p, prefill_rows, prefill_chunk_size, max_num_batched_tokens
        )
    else:
        prefill_rows = 0
        prefill_chunk = effective_prefill_chunk(
            p, u_batch, prefill_chunk_size, max_num_batched_tokens
        )
    p_max = -(-(p + max_new_tokens) // page_size) + 1   # table width (pages)
    pages_per_slot_worst = p_max
    if total_pages <= 0:
        total_pages = slots * pages_per_slot_worst + 1  # +1 dummy
    n_lanes = slots + 1  # +1 trash lane for queue-padding prefill rows
    trash = slots
    if multihost:
        # lane + page axes shard over the batch devices: round both up so the
        # shards are even (extra lanes are never targeted; extra pages only
        # grow the budget by < one page per device)
        batch_devs = mesh.shape["data"] * mesh.shape["fsdp"]
        n_lanes = -(-n_lanes // batch_devs) * batch_devs
        total_pages = -(-total_pages // batch_devs) * batch_devs

    # DONATE the state (arg 2): the host loop threads it linearly, so the old
    # buffers are dead the moment each call returns. Without donation XLA must
    # preserve the caller's pools while computing the updated ones — the
    # multi-GB page pool double-buffers INSIDE every prefill/decode call,
    # which is exactly the HBM the pool budget thought it had (measured: the
    # flagship shape OOMs with a pool sized to the dense engine's cache).
    prefill_jit = jax.jit(
        prefill_paged,
        static_argnames=("cfg", "sampling", "prefill_chunk", "prefill_rows", "group_n"),
        donate_argnums=(2,),
    )
    decode_jit = jax.jit(
        decode_chunk_paged,
        static_argnames=("cfg", "sampling", "chunk", "int4_i8dot",
                         "fuse_staged"),
        donate_argnums=(2,),
    )

    if multihost:
        lane = NamedSharding(mesh, P(BATCH_AXES))
        pool_sh = NamedSharding(mesh, P(None, BATCH_AXES))
        repl = NamedSharding(mesh, P())
        quantized_kv = kv_cache_dtype in (jnp.int8, jnp.uint8)  # int8 | int4
        # staging rides the SLOT axis (like the page table); the pools ride
        # their page axis
        stage_sh = NamedSharding(mesh, P(None, BATCH_AXES))
        state_sh = PagedState(
            k_pool=pool_sh, v_pool=pool_sh,
            page_table=lane, length=lane, cur_tokens=lane, gen_pos=lane,
            steps=lane, finished=lane, active=lane, responses=lane,
            logps=lane, key=repl,
            k_scale=pool_sh if quantized_kv else None,
            v_scale=pool_sh if quantized_kv else None,
            stage_k=stage_sh, stage_v=stage_sh,
            stage_ks=stage_sh if quantized_kv else None,
            stage_vs=stage_sh if quantized_kv else None,
            stage_seg=lane, ring=repl,
        )
        state = jax.jit(
            init_paged_state,
            static_argnames=(
                "cfg", "slots", "total_pages", "page_size", "p_max",
                "max_new_tokens", "kv_dtype", "stage_width", "fuse_staged",
            ),
            out_shardings=state_sh,
        )(cfg, n_lanes, total_pages, page_size, p_max, max_new_tokens, key,
          kv_dtype=kv_cache_dtype, stage_width=decode_chunk_size,
          fuse_staged=fuse_staged)

        # prefill rows shard over the batch devices when they divide evenly
        # (the prompt forward dominates the refill FLOPs); the page-scatter
        # plans index the GLOBAL pool, so GSPMD inserts the cross-shard
        # page writes. Small plan operands stay replicated (row_axis=None).
        u_sharded = u_batch % batch_devs == 0

        def dev(x, row_axis=None):
            spec = (
                P(*([None] * row_axis + [BATCH_AXES]))
                if row_axis is not None and u_sharded else P()
            )
            return global_array_from_full(np.asarray(x), mesh, spec)

        def fetch_lane(arr, extra_dims: int = 0):
            return fetch_global(arr, mesh, P(*([BATCH_AXES] + [None] * extra_dims)))

        def dev_table(x):
            return global_array_from_full(np.asarray(x), mesh, P(BATCH_AXES, None))
    else:
        def dev(x, row_axis=None):
            return jnp.asarray(x)

        def fetch_lane(arr, extra_dims: int = 0):
            return np.asarray(arr)

        def dev_table(x):
            return jnp.asarray(x)

        state = init_paged_state(
            cfg, n_lanes, total_pages, page_size, p_max, max_new_tokens, key,
            kv_cache_dtype, stage_width=decode_chunk_size,
            fuse_staged=fuse_staged,
        )
    allocator = PageAllocator(total_pages)

    responses = np.full((n_out, max_new_tokens), cfg.pad_token_id, dtype=np.int32)
    logps_out = np.zeros((n_out, max_new_tokens), dtype=np.float32)
    mask_out = np.zeros((n_out, max_new_tokens), dtype=np.int32)

    # host MIRRORS of the slot status flags: the host makes every scheduling
    # transition itself (install, release, preempt), and a running slot
    # advances EXACTLY decode_chunk_size cells per decode call (slots only
    # stop by finishing, which excludes them from `run`), so the steady-state
    # loop needs ONE device->host read per sync — which slots finished this
    # chunk — instead of six (active/finished/length in ensure_capacity,
    # finished/active in harvest, active.any() in the loop condition). Each
    # fetch is a full host<->device round trip; over a relay-backed chip
    # those round trips, not the decode program, set the rollout rate.
    # First-token-EOS slots (finished in the prefill itself) are discovered
    # one sync late: they idle through one decode chunk masked off and may
    # hold one transiently over-allocated page — both also true of the
    # fetch-everything loop this replaces (its harvest also ran post-decode).
    h_active = np.zeros(n_lanes, dtype=bool)
    h_finished = np.ones(n_lanes, dtype=bool)
    h_length = np.zeros(n_lanes, dtype=np.int64)

    # host bookkeeping per slot
    slot_owner = np.full(n_lanes, -1, dtype=np.int64)     # output-row index
    slot_shared: List[List[int]] = [[] for _ in range(n_lanes)]  # refcounted prompt pages
    slot_own: List[List[int]] = [[] for _ in range(n_lanes)]     # per-lane pages
    slot_capacity = np.zeros(n_lanes, dtype=np.int64)     # cells covered by table
    slot_birth = np.full(n_lanes, -1, dtype=np.int64)     # install order (for LIFO preempt)
    host_table = np.zeros((n_lanes, p_max), dtype=np.int32)
    prompt_lens = segment_ids.sum(-1).astype(np.int64)
    t_full = u_batch * (-(-p // page_size))               # static scatter sizes
    t_tail = u_batch * group_n

    work: List[int] = list(range(b))                      # prompt queue (FIFO)
    stats = {"preemptions": 0, "peak_pages": 0, "total_pages": total_pages - 1}
    birth_counter = 0

    multimodal = patches_list is not None and any(x is not None for x in patches_list)
    if multimodal and vision_bucket <= 0:
        from ..models.qwen2_5_vl.vision import layout_patch_count, window_patch_len

        per_prompt = [
            0 if g is None else sum(layout_patch_count(row, cfg.vision) for row in np.asarray(g))
            for g in grids_list
        ]
        vision_bucket = max(per_prompt) * u_batch
        wlen = window_patch_len(cfg.vision)
        vision_bucket = -(-vision_bucket // wlen) * wlen

    def pages_for_prompt(length: int) -> Tuple[int, int]:
        return int(length) // page_size, int(length) % page_size

    def try_reserve(length: int) -> Optional[Tuple[List[int], List[List[int]]]]:
        """Shared full pages + per-lane tail pages for one prompt group."""
        n_full, tail = pages_for_prompt(length)
        need = n_full + (group_n if tail else 0)
        if allocator.n_free < need:
            return None
        shared = allocator.alloc(n_full) or []
        if n_full:
            allocator.ref(shared, group_n - 1)  # one ref per lane
        tails = [allocator.alloc(1) if tail else [] for _ in range(group_n)]
        return shared, tails

    def refill(state, free_slot_list):
        nonlocal birth_counter
        targets = np.full(u_batch * group_n, trash, dtype=np.int64)
        rows = np.zeros(u_batch, dtype=np.int64)
        valid = np.zeros(u_batch, dtype=bool)
        full_src_row = np.zeros(t_full, dtype=np.int64)
        full_src_pos = np.zeros((t_full, page_size), dtype=np.int64)
        full_dst = np.zeros(t_full, dtype=np.int64)
        tail_src_row = np.zeros(t_tail, dtype=np.int64)
        tail_src_pos = np.zeros((t_tail, page_size), dtype=np.int64)
        tail_dst = np.zeros(t_tail, dtype=np.int64)
        table_rows = np.zeros((u_batch * group_n, p_max), dtype=np.int32)
        lengths = np.zeros(u_batch, dtype=np.int64)
        free = list(free_slot_list)
        fi = 0
        for g in range(u_batch):
            if not work or len(free) < group_n:
                break
            prompt_idx = work[0]
            ell = int(prompt_lens[prompt_idx])
            reserved = try_reserve(ell)
            if reserved is None:
                break  # pool pressure: admit later
            work.pop(0)
            shared, tails = reserved
            n_full, tail = pages_for_prompt(ell)
            rows[g] = prompt_idx
            valid[g] = True
            lengths[g] = ell
            pad = p - ell
            for tpage in range(n_full):
                full_src_row[fi] = g
                full_src_pos[fi] = pad + tpage * page_size + np.arange(page_size)
                full_dst[fi] = shared[tpage]
                fi += 1
            for j in range(group_n):
                slot = free.pop(0)
                lane = g * group_n + j
                targets[lane] = slot
                slot_owner[slot] = prompt_idx * group_n + j
                slot_shared[slot] = list(shared)
                slot_own[slot] = list(tails[j])
                slot_birth[slot] = birth_counter
                row = np.zeros(p_max, dtype=np.int32)
                row[:n_full] = shared
                if tail:
                    row[n_full] = tails[j][0]
                    ti = lane
                    tail_src_row[ti] = g
                    tail_src_pos[ti] = np.clip(
                        pad + n_full * page_size + np.arange(page_size), 0, p - 1
                    )
                    tail_dst[ti] = tails[j][0]
                host_table[slot] = row
                slot_capacity[slot] = (n_full + (1 if tail else 0)) * page_size
                h_active[slot] = True
                h_finished[slot] = False
                h_length[slot] = ell
            birth_counter += 1
        if not valid.any():
            return state, free, False
        ids_batch = input_ids[rows].copy()
        seg_batch = segment_ids[rows].copy()
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
                # replicated: the pack interleaves rows' patches; identical
                # on every host (global rows, deterministic plan)
                vision = jax.tree.map(dev, vision)
        # table rows in lane order (trash lanes keep zeros)
        for lane in range(u_batch * group_n):
            slot = targets[lane]
            if slot != trash:
                table_rows[lane] = host_table[slot]
        install = PrefillInstall(
            full_src_row=dev(full_src_row),
            full_src_pos=dev(full_src_pos),
            full_dst=dev(full_dst),
            tail_src_row=dev(tail_src_row),
            tail_src_pos=dev(tail_src_pos),
            tail_dst=dev(tail_dst),
            table_rows=dev(table_rows),
            lengths=dev(lengths),
        )
        state = prefill_jit(
            params, cfg, state,
            dev(targets),
            dev(ids_batch, 0),
            dev(seg_batch, 0),
            dev(position_ids[:, rows], 1),
            dev(gen_pos_start[rows], 0),
            dev(valid, 0),
            install,
            sampling,
            vision,
            prefill_chunk=prefill_chunk,
            prefill_rows=prefill_rows,
            group_n=group_n,
        )
        used = int(allocator.refcount[1:].astype(bool).sum())
        stats["peak_pages"] = max(stats["peak_pages"], used)
        return state, free, True

    def release_slot(slot: int) -> None:
        if slot_shared[slot]:
            allocator.release(slot_shared[slot])
            slot_shared[slot] = []
        for pg in slot_own[slot]:
            allocator.release([pg])
        slot_own[slot] = []
        slot_capacity[slot] = 0
        slot_birth[slot] = -1

    def preempt_youngest(active_mask: np.ndarray, state: PagedState) -> PagedState:
        """Free the youngest group's pages, requeue its prompt (recompute)."""
        births = np.where(active_mask, slot_birth, -1)
        youngest = int(births.max())
        oldest_active = int(
            np.min(np.where(active_mask, slot_birth, np.iinfo(np.int64).max))
        )
        if youngest < 0 or youngest == oldest_active:
            raise RuntimeError(
                "KV page pool too small for a single sequence at max length: "
                f"raise the pool budget or lower max_new_tokens (pool={total_pages - 1} "
                f"pages x {page_size} tokens)"
            )
        victim_slots = [
            s for s in range(len(active_mask))
            if active_mask[s] and slot_birth[s] == youngest
        ]
        prompt_idx = int(slot_owner[victim_slots[0]]) // group_n
        for s in victim_slots:
            release_slot(s)
            slot_owner[s] = -1
            h_finished[s] = True  # keep the mirror in lockstep with the flag
        work.insert(0, prompt_idx)
        stats["preemptions"] += 1
        # shape-stable scatter (see harvest): pad to `slots`, drop OOB
        pad_idx = np.full(slots, slots, np.int32)
        pad_idx[: len(victim_slots)] = victim_slots
        dev_idx = jnp.asarray(pad_idx)
        # finished while still ACTIVE: the next harvest() collects the victim
        # slots into free_pool (owner == -1 skips the response copy; the page
        # release above already happened, release_slot is idempotent). Setting
        # active=False here instead would leak the lanes out of circulation —
        # every preemption would permanently shrink the decode batch.
        return state._replace(
            finished=state.finished.at[dev_idx].set(True, mode="drop"),
        )

    def ensure_capacity(state: PagedState) -> PagedState:
        """Grow running slots' page tables to cover the next decode chunk;
        preempt (youngest-group recompute) on pool exhaustion. Runs entirely
        on the host mirrors — no device fetch."""
        while True:
            run = h_active & ~h_finished
            table_dirty = False
            ok = True
            for s in np.nonzero(run)[0]:
                budget = min(int(h_length[s]) + decode_chunk_size,
                             int(prompt_lens[slot_owner[s] // group_n]) + max_new_tokens)
                while slot_capacity[s] < budget:
                    got = allocator.alloc(1)
                    if got is None:
                        ok = False
                        break
                    pg = got[0]
                    slot_own[s].append(pg)
                    host_table[s, int(slot_capacity[s]) // page_size] = pg
                    slot_capacity[s] += page_size
                    table_dirty = True
                if not ok:
                    break
            if table_dirty:
                state = state._replace(
                    page_table=dev_table(host_table[: state.page_table.shape[0]])
                )
            if ok:
                used = int(allocator.refcount[1:].astype(bool).sum())
                stats["peak_pages"] = max(stats["peak_pages"], used)
                return state
            state = preempt_youngest(run, state)

    def harvest(state, finished_np) -> Tuple[PagedState, List[int]]:
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
                release_slot(slot)
                h_active[slot] = False
                h_finished[slot] = True
            # shape-stable scatter: pad the varying done count to `slots` with
            # an out-of-bounds index (mode="drop") so every chunk reuses ONE
            # compiled program instead of recompiling per distinct count
            # through the remote-compile relay (see rollout/continuous.py)
            idx = np.full(slots, slots, np.int32)
            idx[: len(done_slots)] = done_slots
            state = state._replace(
                active=state.active.at[jnp.asarray(idx)].set(False, mode="drop")
            )
        return state, done_slots

    # fill every slot (several refills when refill_batch caps the prefill);
    # a refill that installs nothing (pool pressure) stops the fill loop
    import os as _os
    import time as _time

    trace = _os.environ.get("SPATIALTHINKER_ENGINE_TRACE") == "1"
    t_acc = {"refill": 0.0, "capacity": 0.0, "dispatch": 0.0, "sync": 0.0,
             "harvest": 0.0, "chunks": 0, "refills": 0}
    free_pool = list(range(slots))
    installed = True
    while work and len(free_pool) >= group_n and installed:
        t0 = _time.perf_counter()
        state, free_pool, installed = refill(state, free_pool)
        t_acc["refill"] += _time.perf_counter() - t0
        t_acc["refills"] += 1
    while True:
        t0 = _time.perf_counter()
        state = ensure_capacity(state)
        t1 = _time.perf_counter()
        state = decode_jit(params, cfg, state, sampling, decode_chunk_size,
                           int4_i8dot=int4_i8dot, fuse_staged=fuse_staged)
        t2 = _time.perf_counter()
        # the one fetch per sync: which slots finished during this chunk
        running = h_active & ~h_finished
        finished_np = np.asarray(fetch_lane(state.finished), dtype=bool)
        t3 = _time.perf_counter()
        h_finished |= finished_np
        # slots still running advanced exactly the chunk; finished slots'
        # lengths are never read again (their pages release in harvest)
        h_length[running & ~finished_np] += decode_chunk_size
        state, done_slots = harvest(state, finished_np)
        t4 = _time.perf_counter()
        free_pool.extend(done_slots)
        t_acc["capacity"] += t1 - t0
        t_acc["dispatch"] += t2 - t1
        t_acc["sync"] += t3 - t2
        t_acc["harvest"] += t4 - t3
        t_acc["chunks"] += 1
        installed = True
        while work and len(free_pool) >= group_n and installed:
            t0 = _time.perf_counter()
            state, free_pool, installed = refill(state, free_pool)
            t_acc["refill"] += _time.perf_counter() - t0
            t_acc["refills"] += 1
        if not h_active.any() and not work:
            break
    if trace:
        import sys as _sys

        print(f"[paged trace] {t_acc}", file=_sys.stderr, flush=True)

    mask = np.asarray(get_response_mask(jnp.asarray(responses), cfg.eos_token_id))
    responses_out = np.where(mask == 1, responses, cfg.pad_token_id)
    return PagedResult(
        responses=responses_out, response_mask=mask,
        rollout_log_probs=logps_out * mask, stats=stats,
    )
