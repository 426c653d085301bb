"""Pallas TPU paged decode attention: one new token per slot attends its
pages of a global KV page pool through a page table.

This is the second half of vLLM's paged attention
(/root/reference/verl/workers/rollout/vllm_rollout_spmd.py:69-85 sizes the
pool from gpu_memory_utilization; the CUDA kernels walk block tables): the
dense decode kernel (ops/decode_attention.py) already covers uniform-length
carry caches, but its slots reserve worst-case length up front. Here a slot
OCCUPIES only the pages it has filled, so the number of concurrent sequences
is set by actual memory use — the admission-control half that caps
long-context batch in the dense engines.

Design (TPU-first):
- The pools are (L, N_pages, Hkv, page, D), carried through the decode layer
  scan like the dense cache. The kernel never materializes a gathered cache:
  the PAGE TABLE feeds the BlockSpec index maps (scalar prefetch), so each
  program's k/v block DMA reads pool[layer, page_table[slot, pi]] directly
  from HBM.
- Grid (S, P_max) with flash-style online softmax across the page dimension;
  scratch persists over pages, output flushes on the last page. Cells at or
  beyond the slot's length mask to -inf (pages hold COMPACTED tokens — no
  left padding — so validity is one comparison against length).
- Slots shorter than P_max point their unused table entries at page 0 (a
  reserved dummy); their blocks are fetched but fully masked. Admission is
  about MEMORY, not DMA: mixed-length batches still pay a P_max-page sweep,
  which is the right trade while lengths within a continuous batch stay
  close (the host engine refills finished slots, keeping them close).
- int8 pools dequantize in registers exactly like the dense kernel: k scales
  fold into the score matrix after q@k, v scales into the softmax weights
  before p@v.
- GQA: all query heads of a slot ride in one program (G padded to 8 rows).

The XLA fallback (CPU tests / ineligible shapes) gathers the slot's pages to
a dense (S, Hkv, P_max*page, D) view and runs masked SDPA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _staged_block_update(
    q,                 # (bsk, g, D) — the kernel's q operand (bf16/f32)
    st_k_ref, st_v_ref, st_ks_ref, st_vs_ref, st_seg_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, hkv: int, g: int, block_s: int,
):
    """One extra online-softmax update over the slots' staging-ring cells
    (the decode chunk's not-yet-installed tokens), fused into the pool
    kernel's LAST grid step. Replaces the per-layer XLA staged-cell
    attention + flash merge that dominated the paged engine's non-kernel
    overhead (the staging block is slot-major dense, so one regular
    BlockSpec covers the program's slots — no page indirection needed).
    Order-independence of the online softmax makes 'staged last' exact."""
    bsk = block_s * hkv
    d = q.shape[-1]
    hq_p = hkv * g
    c = st_k_ref.shape[-2]
    k = st_k_ref[...].reshape(bsk, c, d).astype(jnp.bfloat16)
    v = st_v_ref[...].reshape(bsk, c, d).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (bsk, g, c)
    if st_ks_ref is not None:
        s = s * (st_ks_ref[...].reshape(bsk, 1, c).astype(jnp.float32) * scale)
    else:
        s = s * scale
    valid = (st_seg_ref[...] != 0).reshape(block_s, 1, c)
    s = s.reshape(block_s, hq_p, c)
    s = jnp.where(valid, s, NEG_INF)
    m_prev = m_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    p = p.reshape(bsk, g, c)
    if st_vs_ref is not None:
        p = p * st_vs_ref[...].reshape(bsk, 1, c).astype(jnp.float32)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(block_s, hq_p, d)
    acc = acc_scr[...].reshape(block_s, hq_p, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(
        m_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    l_scr[...] = jnp.broadcast_to(
        l_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    acc_scr[...] = acc.reshape(block_s * hq_p, d)


def _paged_kernel(
    # scalar prefetch
    meta_ref,     # (1 + S,) int32: [layer_idx, lengths...]
    pt_ref,       # (S, P_max) int32 page table
    # blocks
    q_ref,        # (block_s, Hq_pad, D)
    *rest,        # k_0..k_{bs-1}, v_0.., [ks_0.., vs_0..],
                  # [staged k/v[, ks/vs], seg], o_ref + scratches
    scale: float,
    hkv: int,
    g: int,       # padded group size (multiple of 8)
    quantized: bool,
    block_s: int,
    staged: bool = False,
):
    # block_s slots per program: every grid program serializes on the one TPU
    # core, so per-program pipeline overhead is paid S*P_max times — blocking
    # slots cuts the program count block_s x and grows each pipeline wait's
    # DMA to block_s pages (the dense kernel's whole advantage is exactly its
    # multi-megabyte per-program reads). Each slot keeps its own pool spec
    # (pages are scattered; one BlockSpec can't span two table entries).
    k_refs = rest[:block_s]
    v_refs = rest[block_s:2 * block_s]
    idx = 2 * block_s
    if quantized:
        ks_refs = rest[idx:idx + block_s]
        vs_refs = rest[idx + block_s:idx + 2 * block_s]
        idx += 2 * block_s
    st = (None,) * 5
    if staged:
        st = (rest[idx], rest[idx + 1],
              rest[idx + 2] if quantized else None,
              rest[idx + 3] if quantized else None,
              rest[idx + (4 if quantized else 2)])
        idx += 5 if quantized else 3
    o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr = rest[idx:idx + 6]
    si = pl.program_id(0)
    pi = pl.program_id(1)
    page = k_refs[0].shape[-2]
    d = q_ref.shape[-1]
    hq_p = hkv * g

    @pl.when(pi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # BATCH the whole block's math: concatenating the block_s slot pages into
    # one (block_s*Hkv, page, d) operand turns 8 short per-slot VPU/MXU chains
    # into single wide ops (the per-slot loop measured ~2x slower at the same
    # DMA volume — small (Hkv, g, page) chains can't fill the vector units)
    bsk = block_s * hkv
    cell = pi * page + jax.lax.broadcasted_iota(jnp.int32, (1, 1, page), 2)
    valid = jnp.concatenate(
        [cell < meta_ref[1 + si * block_s + r] for r in range(block_s)], axis=0
    )  # (block_s, 1, page)
    q = q_ref[...].reshape(bsk, g, d)
    k = jnp.concatenate([r[0] for r in k_refs], axis=0).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (bsk, g, page)
    if quantized:
        ks = jnp.concatenate([r[0] for r in ks_refs], axis=0)
        s = s * (ks.reshape(bsk, 1, page).astype(jnp.float32) * scale)
    else:
        s = s * scale
    # validity: global cell index pi*page + j < length (compacted pages)
    s = s.reshape(block_s, hq_p, page)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    p = p.reshape(bsk, g, page)
    if quantized:
        vs = jnp.concatenate([r[0] for r in vs_refs], axis=0)
        p = p * vs.reshape(bsk, 1, page).astype(jnp.float32)
    v = jnp.concatenate([r[0] for r in v_refs], axis=0).astype(jnp.bfloat16)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    ).reshape(block_s, hq_p, d)
    acc = acc_scr[...].reshape(block_s, hq_p, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(
        m_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    l_scr[...] = jnp.broadcast_to(
        l_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    acc_scr[...] = acc.reshape(block_s * hq_p, d)

    @pl.when(pi == pl.num_programs(1) - 1)
    def _flush():
        if staged:
            _staged_block_update(
                q, *st, m_scr, l_scr, acc_scr,
                scale=scale, hkv=hkv, g=g, block_s=block_s,
            )
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # inactive slots emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)
        # softmax stats per q row (f32, scaled space) for callers that merge
        # further partial softmaxes; with `staged` fused they are final
        m_ref[...] = m_scr[...].reshape(m_ref.shape)
        l_ref[...] = l_scr[...].reshape(l_ref.shape)


def _paged_kernel_int4(
    meta_ref,     # (1 + S,) int32: [layer_idx, lengths...]
    pt_ref,       # (S, P_max) int32 page table
    q_ref,        # (block_s, Hq_pad, D)
    *rest,        # kp_0..kp_{bs-1}, vp_0.., ks_0.., vs_0..,
                  # [staged k/v/ks/vs/seg], o_ref + scratches
    scale: float,
    hkv: int,
    g: int,
    block_s: int,
    staged: bool = False,
):
    """int4 pool pages: each packed byte row holds cells (r, r + page/2) of
    its page; both nibble halves unpack into ONE fused online-softmax update
    per page (mirroring ops/decode_attention._decode_kernel_int4). block_s
    slots per program — see _paged_kernel. Staged ring cells (UNPACKED int8
    + bf16 scales) fuse as one extra update on the last grid step."""
    kp_refs = rest[:block_s]
    vp_refs = rest[block_s:2 * block_s]
    ks_refs = rest[2 * block_s:3 * block_s]
    vs_refs = rest[3 * block_s:4 * block_s]
    idx = 4 * block_s
    st = (None,) * 5
    if staged:
        st = tuple(rest[idx:idx + 5])
        idx += 5
    o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr = rest[idx:idx + 6]
    si = pl.program_id(0)
    pi = pl.program_id(1)
    half = kp_refs[0].shape[-2]
    page = 2 * half
    d = q_ref.shape[-1]
    hq_p = hkv * g

    @pl.when(pi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    from ..models.qwen2_5_vl.text import KV4_BIAS
    from .int4_mlp import nibble_u4

    # ONE fused update over both nibble halves: page-local split-half packing
    # puts the low nibbles at cells [0, half) and the high at [half, page),
    # so the concat IS natural page-cell order. The unpack stays UNSIGNED
    # (biased storage, 2 lane ops/element); the -KV4_BIAS is recovered in the
    # dot epilogues (see ops/decode_attention._block_update).
    def unpack2(p):
        return jnp.concatenate(
            [nibble_u4(p, 0).astype(jnp.bfloat16),
             nibble_u4(p, 1).astype(jnp.bfloat16)], axis=1
        )

    # batched block math — see _paged_kernel: one concat + one unpack + one
    # batched dot instead of block_s short per-slot chains
    bsk = block_s * hkv
    cell = pi * page + jax.lax.broadcasted_iota(jnp.int32, (1, 1, page), 2)
    valid = jnp.concatenate(
        [cell < meta_ref[1 + si * block_s + r] for r in range(block_s)], axis=0
    )  # (block_s, 1, page)
    q = q_ref[...].reshape(bsk, g, d)
    k_bf = unpack2(jnp.concatenate([r[0] for r in kp_refs], axis=0))  # (bsk, page, D)
    v_bf = unpack2(jnp.concatenate([r[0] for r in vp_refs], axis=0))
    ks = jnp.concatenate([r[0] for r in ks_refs], axis=0)
    vs = jnp.concatenate([r[0] for r in vs_refs], axis=0)
    s = jax.lax.dot_general(
        q, k_bf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )  # (bsk, g, page)
    s = s - KV4_BIAS * jnp.sum(q.astype(jnp.float32), axis=2, keepdims=True)
    s = s * (ks.reshape(bsk, 1, page).astype(jnp.float32) * scale)
    s = s.reshape(block_s, hq_p, page)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    p = p.reshape(bsk, g, page) * vs.reshape(bsk, 1, page).astype(jnp.float32)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v_bf,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )  # (bsk, g, d)
    pv = pv - KV4_BIAS * jnp.sum(p, axis=2, keepdims=True)
    pv = pv.reshape(block_s, hq_p, d)
    acc = acc_scr[...].reshape(block_s, hq_p, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(
        m_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    l_scr[...] = jnp.broadcast_to(
        l_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    acc_scr[...] = acc.reshape(block_s * hq_p, d)

    @pl.when(pi == pl.num_programs(1) - 1)
    def _flush():
        if staged:
            _staged_block_update(
                q, *st, m_scr, l_scr, acc_scr,
                scale=scale, hkv=hkv, g=g, block_s=block_s,
            )
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # inactive slots emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)
        # softmax stats per q row (f32, scaled space) for callers that merge
        # further partial softmaxes; with `staged` fused they are final
        m_ref[...] = m_scr[...].reshape(m_ref.shape)
        l_ref[...] = l_scr[...].reshape(l_ref.shape)


def _paged_kernel_int4_i8(
    meta_ref,     # (1 + S,) int32: [layer_idx, lengths...]
    pt_ref,       # (S, P_max) int32 page table
    q_ref,        # (block_s, Hq_pad, D)
    *rest,        # kp_0..kp_{bs-1}, vp_0.., ks_0.., vs_0..,
                  # [staged k/v/ks/vs/seg], o_ref + scratches
    scale: float,
    hkv: int,
    g: int,
    block_s: int,
    staged: bool = False,
):
    """int4 pool pages with both attention dots on the int8 MXU
    (rollout.int4_i8dot): nibbles unpack to INT8 lanes (one i32 widen per
    packed byte, then mask/shift + narrow convert) instead of the VPU-bound
    nibble->bf16 convert chain, and q + the softmax weights quantize per row
    in-register — magnitudes recovered exactly in the f32 score/output
    epilogues. Mirrors ops/decode_attention._decode_kernel_int4_i8; same
    grid/specs/scratches as _paged_kernel_int4. The staged-ring block (a
    few dozen cells) rides the bf16 path of _staged_block_update — too
    small for int8 quantization to pay."""
    kp_refs = rest[:block_s]
    vp_refs = rest[block_s:2 * block_s]
    ks_refs = rest[2 * block_s:3 * block_s]
    vs_refs = rest[3 * block_s:4 * block_s]
    idx = 4 * block_s
    st = (None,) * 5
    if staged:
        st = tuple(rest[idx:idx + 5])
        idx += 5
    o_ref, m_ref, l_ref, m_scr, l_scr, acc_scr = rest[idx:idx + 6]
    si = pl.program_id(0)
    pi = pl.program_id(1)
    half = kp_refs[0].shape[-2]
    page = 2 * half
    d = q_ref.shape[-1]
    hq_p = hkv * g

    @pl.when(pi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    from ..models.qwen2_5_vl.text import KV4_BIAS

    bsk = block_s * hkv
    cell = pi * page + jax.lax.broadcasted_iota(jnp.int32, (1, 1, page), 2)
    valid = jnp.concatenate(
        [cell < meta_ref[1 + si * block_s + r] for r in range(block_s)], axis=0
    )  # (block_s, 1, page)

    # q int8, one scale per (slot-head, g-row) — error ~0.4% of the row max,
    # folded back exactly via qscale in the score epilogue
    qf = q_ref[...].reshape(bsk, g, d).astype(jnp.float32)
    qa = jnp.max(jnp.abs(qf), axis=2, keepdims=True)
    qscale = jnp.maximum(qa, 1e-8) * (1.0 / 127.0)
    q_i8 = jnp.round(qf / qscale).astype(jnp.int8)
    sumq = jnp.sum(q_i8.astype(jnp.float32), axis=2, keepdims=True)

    # ONE widen per packed byte, reused by both nibble extracts; the only
    # per-element converts are the narrow i32->i8 ones feeding the MXU
    kp = jnp.concatenate([r[0] for r in kp_refs], axis=0).astype(jnp.int32)
    vp = jnp.concatenate([r[0] for r in vp_refs], axis=0).astype(jnp.int32)
    lo = lambda x: (x & 15).astype(jnp.int8)
    hi = lambda x: (x >> 4).astype(jnp.int8)

    def qk(k_i8):
        return jax.lax.dot_general(
            q_i8, k_i8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    # page-local split-half packing: low nibbles hold cells [0, half), high
    # [half, page) — the SCORE concat is natural page-cell order (matches
    # the valid/scale cell indexing), 16x smaller than concatenating blocks
    s = jnp.concatenate([qk(lo(kp)), qk(hi(kp))], axis=2).astype(jnp.float32)
    ks = jnp.concatenate([r[0] for r in ks_refs], axis=0)
    vs = jnp.concatenate([r[0] for r in vs_refs], axis=0)
    # debias the +8 nibble storage, restore q magnitude, fold k scales
    s = (s - KV4_BIAS * sumq) * qscale
    s = s * (ks.reshape(bsk, 1, page).astype(jnp.float32) * scale)
    s = s.reshape(block_s, hq_p, page)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(block_s, hq_p, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    p = p.reshape(bsk, g, page) * vs.reshape(bsk, 1, page).astype(jnp.float32)
    # softmax weights int8, one scale per row (p >= 0 so amax == max); the
    # epilogue restores pscale exactly
    pa = jnp.max(p, axis=2, keepdims=True)
    pscale = jnp.maximum(pa, 1e-20) * (1.0 / 127.0)
    p_i8 = jnp.round(p / pscale).astype(jnp.int8)
    sump = jnp.sum(p_i8.astype(jnp.float32), axis=2, keepdims=True)

    def pv_dot(p_part, v_i8):
        return jax.lax.dot_general(
            p_part, v_i8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    pv = (
        pv_dot(p_i8[:, :, :half], lo(vp))
        + pv_dot(p_i8[:, :, half:], hi(vp))
    ).astype(jnp.float32)
    pv = (pv - KV4_BIAS * sump) * pscale
    pv = pv.reshape(block_s, hq_p, d)
    acc = acc_scr[...].reshape(block_s, hq_p, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(
        m_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    l_scr[...] = jnp.broadcast_to(
        l_new, (block_s, hq_p, 128)
    ).reshape(block_s * hq_p, 128)
    acc_scr[...] = acc.reshape(block_s * hq_p, d)

    @pl.when(pi == pl.num_programs(1) - 1)
    def _flush():
        if staged:
            _staged_block_update(
                qf, *st, m_scr, l_scr, acc_scr,
                scale=scale, hkv=hkv, g=g, block_s=block_s,
            )
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # inactive slots emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)
        # softmax stats per q row (f32, scaled space) for callers that merge
        # further partial softmaxes; with `staged` fused they are final
        m_ref[...] = m_scr[...].reshape(m_ref.shape)
        l_ref[...] = l_scr[...].reshape(l_ref.shape)


def _block_slots(s_slots: int) -> int:
    """Slots per kernel program. Grid programs serialize on the one TPU core,
    so per-program pipeline overhead is paid (S/block_s)*P_max times — 8 slots
    per program turns 64x33 = 2112 ~131KB programs into 264 ~1MB ones
    (measured 50 -> low-teens ms per 36-layer flagship pass). Each slot needs
    its own BlockSpec pair (scattered pages), so block_s also sets the kernel
    operand count: 1 + 2*block_s (+2*block_s quantized) stays ~33 at 8."""
    import os

    bs = int(os.environ.get("SPATIALTHINKER_PAGED_BS", "8"))
    return max(1, min(bs, s_slots))


def _pallas_paged(q, k_pool, v_pool, page_table, lengths, layer_idx,
                  k_scale, v_scale, scale, int4_i8dot=False, staged=None):
    s_slots, hq, d = q.shape
    n_layers, n_pages, hkv, page, _ = k_pool.shape
    p_max = page_table.shape[1]
    g = hq // hkv
    gp = ((g + 7) // 8) * 8
    if gp != g:
        qr = q.reshape(s_slots, hkv, g, d)
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
        q = qr.reshape(s_slots, hkv * gp, d)
    hq_p = hkv * gp
    quantized = k_scale is not None
    int4 = k_pool.dtype == jnp.uint8

    # pad the slot axis to a block_s multiple: padded rows have length 0 and
    # page-table 0 (the reserved dummy page) — fetched but fully masked, and
    # dropped from the output below
    block_s = _block_slots(s_slots)
    s_pad = -(-s_slots // block_s) * block_s
    lengths = lengths.astype(jnp.int32)
    if s_pad != s_slots:
        q = jnp.pad(q, ((0, s_pad - s_slots), (0, 0), (0, 0)))
        page_table = jnp.pad(page_table, ((0, s_pad - s_slots), (0, 0)))
        lengths = jnp.pad(lengths, (0, s_pad - s_slots))

    meta = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), lengths]
    )
    if int4:
        kernel = functools.partial(
            _paged_kernel_int4_i8 if int4_i8dot else _paged_kernel_int4,
            scale=scale, hkv=hkv, g=gp, block_s=block_s,
            staged=staged is not None,
        )
    else:
        kernel = functools.partial(
            _paged_kernel, scale=scale, hkv=hkv, g=gp, quantized=quantized,
            block_s=block_s, staged=staged is not None,
        )

    # index maps receive (si, pi, meta_ref, pt_ref); the page block index is
    # the page-table entry itself — no gathered cache ever exists in HBM.
    # One pool spec per slot row of the block (pages are scattered: a single
    # BlockSpec cannot span two table entries).
    def pool_spec(r):
        return pl.BlockSpec(
            (None, 1, hkv, page, d),
            lambda si, pi, meta, pt, r=r: (meta[0], pt[si * block_s + r, pi], 0, 0, 0),
        )

    in_specs = [
        pl.BlockSpec((block_s, hq_p, d), lambda si, pi, meta, pt: (si, 0, 0)),
    ]
    in_specs += [pool_spec(r) for r in range(block_s)]
    in_specs += [pool_spec(r) for r in range(block_s)]
    args = [q] + [k_pool] * block_s + [v_pool] * block_s
    if quantized:
        # scales stay per token CELL: 2x the packed row width under int4
        cell_page = 2 * page if int4 else page

        def scale_spec(r):
            return pl.BlockSpec(
                (None, 1, hkv, cell_page),
                lambda si, pi, meta, pt, r=r: (meta[0], pt[si * block_s + r, pi], 0, 0),
            )

        in_specs += [scale_spec(r) for r in range(block_s)]
        in_specs += [scale_spec(r) for r in range(block_s)]
        args += [k_scale] * block_s + [v_scale] * block_s

    if staged is not None:
        # staging-ring cells (slot-major dense, unlike the pools): ONE
        # regular BlockSpec covers the program's slots; the same block is
        # indexed on every pi step, so Mosaic keeps it resident and the
        # update runs once on the last step (see _staged_block_update)
        st_k, st_v, st_ks, st_vs, st_seg = staged
        assert (st_ks is not None) == quantized, (
            "staged scales must accompany quantized pools (and only those)"
        )
        c = st_k.shape[3]
        if s_pad != s_slots:
            pad_s = ((0, 0), (0, s_pad - s_slots), (0, 0), (0, 0), (0, 0))
            st_k = jnp.pad(st_k, pad_s)
            st_v = jnp.pad(st_v, pad_s)
            if st_ks is not None:
                st_ks = jnp.pad(st_ks, pad_s[:-1])
                st_vs = jnp.pad(st_vs, pad_s[:-1])
            st_seg = jnp.pad(st_seg, ((0, s_pad - s_slots), (0, 0)))
        st_kv_spec = pl.BlockSpec(
            (None, block_s, hkv, c, d),
            lambda si, pi, meta, pt: (meta[0], si, 0, 0, 0),
        )
        st_sc_spec = pl.BlockSpec(
            (None, block_s, hkv, c),
            lambda si, pi, meta, pt: (meta[0], si, 0, 0),
        )
        st_seg_spec = pl.BlockSpec(
            (block_s, c), lambda si, pi, meta, pt: (si, 0)
        )
        in_specs += [st_kv_spec, st_kv_spec]
        args += [st_k, st_v]
        if st_ks is not None:
            in_specs += [st_sc_spec, st_sc_spec]
            args += [st_ks, st_vs]
        in_specs += [st_seg_spec]
        args += [st_seg]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s_pad // block_s, p_max),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_s, hq_p, d), lambda si, pi, meta, pt: (si, 0, 0)),
            # softmax stats (m, l) per q row — 128-lane replicated (scratch
            # layout); column 0 is sliced out below
            pl.BlockSpec((block_s * hq_p, 128), lambda si, pi, meta, pt: (si, 0)),
            pl.BlockSpec((block_s * hq_p, 128), lambda si, pi, meta, pt: (si, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_s * hq_p, 128), jnp.float32),
            pltpu.VMEM((block_s * hq_p, 128), jnp.float32),
            pltpu.VMEM((block_s * hq_p, d), jnp.float32),
        ],
    )
    out, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_pad, hq_p, d), q.dtype),
            jax.ShapeDtypeStruct((s_pad * hq_p, 128), jnp.float32),
            jax.ShapeDtypeStruct((s_pad * hq_p, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(meta, page_table.astype(jnp.int32), *args)
    m = m[:, 0].reshape(s_pad, hq_p)
    l = l[:, 0].reshape(s_pad, hq_p)
    if s_pad != s_slots:
        out, m, l = out[:s_slots], m[:s_slots], l[:s_slots]
    if gp != g:
        out = out.reshape(s_slots, hkv, gp, d)[:, :, :g].reshape(s_slots, hq, d)
        m = m.reshape(s_slots, hkv, gp)[:, :, :g].reshape(s_slots, hq)
        l = l.reshape(s_slots, hkv, gp)[:, :, :g].reshape(s_slots, hq)
    return out, m, l


# ---------------------------------------------------------------------------
# XLA fallback + dispatch
# ---------------------------------------------------------------------------


def _xla_paged(q, k_pool, v_pool, page_table, lengths, layer_idx, k_scale,
               v_scale, scale, staged=None):
    from ..models.qwen2_5_vl.text import _dequantize_kv, _unpack_kv4

    s_slots, hq, d = q.shape
    int4 = k_pool.dtype == jnp.uint8
    n_layers, n_pages, hkv, page, _ = k_pool.shape
    if int4:
        page = 2 * page  # packed rows -> token cells per page
    p_max = page_table.shape[1]
    g = hq // hkv

    def layer_gather(pool, unpack4=False):
        l = jax.lax.dynamic_index_in_dim(pool, layer_idx, 0, keepdims=False)
        if unpack4:  # per-page split-half nibbles -> token-ordered int8
            l = _unpack_kv4(l, seq_axis=2)
        gth = jnp.take(l, page_table.reshape(-1), axis=0)  # (S*P_max, Hkv, page, D)
        gth = gth.reshape(s_slots, p_max, hkv, page, *l.shape[3:])
        gth = jnp.moveaxis(gth, 2, 1).reshape(s_slots, hkv, p_max * page, *l.shape[3:])
        return gth

    k_l = layer_gather(k_pool, unpack4=int4)  # (S, Hkv, T, D)
    v_l = layer_gather(v_pool, unpack4=int4)
    if k_scale is not None:
        k_l = _dequantize_kv(k_l, layer_gather(k_scale), q.dtype)
        v_l = _dequantize_kv(v_l, layer_gather(v_scale), q.dtype)
    mask = (
        jnp.arange(p_max * page, dtype=jnp.int32)[None, :] < lengths[:, None]
    )[:, None, None, :]
    if staged is not None:
        # append the staging-ring cells (the decode chunk's not-yet-installed
        # tokens) to the gathered view — one softmax over pool+staged cells,
        # the exact semantics the kernel's fused _staged_block_update computes
        st_k, st_v, st_ks, st_vs, st_seg = staged
        k_st = jax.lax.dynamic_index_in_dim(st_k, layer_idx, 0, keepdims=False)
        v_st = jax.lax.dynamic_index_in_dim(st_v, layer_idx, 0, keepdims=False)
        k_st = k_st.astype(jnp.float32)
        v_st = v_st.astype(jnp.float32)
        if st_ks is not None:
            ks = jax.lax.dynamic_index_in_dim(st_ks, layer_idx, 0, keepdims=False)
            vs = jax.lax.dynamic_index_in_dim(st_vs, layer_idx, 0, keepdims=False)
            k_st = k_st * ks[..., None].astype(jnp.float32)
            v_st = v_st * vs[..., None].astype(jnp.float32)
        # (S, Hkv, C, D) cells in slot-ring order; validity from stage_seg
        k_l = jnp.concatenate([k_l.astype(jnp.float32), k_st], axis=2)
        v_l = jnp.concatenate([v_l.astype(jnp.float32), v_st], axis=2)
        mask = jnp.concatenate(
            [mask, (st_seg != 0)[:, None, None, :]], axis=3
        )
    # explicit masked softmax (not ops.attention.xla_attention) so the partial
    # stats (m, l) come back for callers that merge further partial softmaxes
    qg = q.reshape(s_slots, hkv, g, d).astype(jnp.float32)
    s = jnp.einsum("shgd,shtd->shgt", qg, k_l.astype(jnp.float32)) * scale
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=3)  # (S, Hkv, G)
    p = jnp.where(mask, jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=3)
    safe_l = jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("shgt,shtd->shgd", p, v_l.astype(jnp.float32)) / safe_l[..., None]
    return (
        out.reshape(s_slots, hq, d).astype(q.dtype),
        m.reshape(s_slots, hq),
        l.reshape(s_slots, hq),
    )


def _eligible(q, k_pool, staged=None) -> bool:
    if jax.default_backend() != "tpu":
        return False
    s_slots, hq, d = q.shape
    _, _, hkv, page, _ = k_pool.shape
    if staged is not None and staged[0].shape[3] % 128 != 0:
        # the staged cell dim is a vector minor dim inside the kernel:
        # Mosaic cannot lower the block's reshapes below 128 lanes
        # ("infer-vector-layout: unsupported shape cast" at width 64,
        # measured on chip) — init_paged_state sizes the ring accordingly
        return False
    # for int4 pools `page` is the PACKED row count, so this same check means
    # token page_size % 256 — exactly what the in-kernel 128-lane-aligned
    # scale-half slices need
    return d == 128 and hq % hkv == 0 and page % 128 == 0


def paged_attention(
    q: jnp.ndarray,           # (S, Hq, D) — one new token per slot
    k_pool: jnp.ndarray,      # (L, N_pages, Hkv, page, D) int8 | bf16
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,  # (S, P_max) int32 — pool page ids per slot
    lengths: jnp.ndarray,     # (S,) int32 — valid (compacted) cells per slot
    layer_idx,                # () int32
    k_scale: Optional[jnp.ndarray] = None,  # (L, N_pages, Hkv, page) — int8 mode
    v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    backend: str = "auto",
    return_stats: bool = False,
    int4_i8dot: bool = False,
    staged=None,
) -> jnp.ndarray:
    """Attention of one decode token per slot over its page-table pages of
    layer ``layer_idx``. Returns (S, Hq, D); with ``return_stats`` also the
    partial-softmax stats (m, l) each (S, Hq) in scaled-score space, for
    callers that merge further partial softmaxes. ``int4_i8dot`` (int4
    pools only, threaded from rollout.int4_i8dot) runs both dots on the
    int8 MXU — see _paged_kernel_int4_i8.

    ``staged`` = (stage_k (L,S,Hkv,C,D), stage_v, stage_ks (L,S,Hkv,C)|None,
    stage_vs|None, stage_seg (S,C)): the decode staging ring's
    not-yet-installed cells, attended IN the kernel as one extra
    online-softmax block on the last grid step (the per-layer XLA
    staged-cell attention + flash merge it replaces dominated the paged
    engine's non-kernel overhead). Staged cells are unpacked (int8 + bf16
    scales under quantized pools; the pool dtype's packing never applies)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    out = None
    if backend in ("auto", "pallas") and _eligible(q, k_pool, staged):
        try:
            out = _pallas_paged(
                q, k_pool, v_pool, page_table, lengths, layer_idx,
                k_scale, v_scale, scale,
                int4_i8dot=int4_i8dot and k_pool.dtype == jnp.uint8,
                staged=staged,
            )
        except Exception as e:
            if backend == "pallas":
                raise
            _warn_fallback(f"kernel raised {type(e).__name__}: {e}", q, k_pool)
    elif jax.default_backend() == "tpu":
        _warn_fallback("shape ineligible", q, k_pool)
    if out is None:
        out = _xla_paged(
            q, k_pool, v_pool, page_table, lengths, layer_idx, k_scale,
            v_scale, scale, staged=staged,
        )
    return out if return_stats else out[0]


_warned_fallbacks: set = set()


def _warn_fallback(reason: str, q, k_pool) -> None:
    """The XLA fallback gathers every slot's pages to a dense cache PER LAYER
    — measured ~16x slower than the kernel at flagship scale. Falling back
    silently turns a config error into a throughput mystery, so say it once
    per (reason, shape)."""
    key = (reason, q.shape, k_pool.shape, str(k_pool.dtype))
    if key in _warned_fallbacks:
        return
    _warned_fallbacks.add(key)
    import warnings

    warnings.warn(
        f"paged_attention: Pallas kernel unavailable ({reason}) for q={q.shape} "
        f"pool={k_pool.shape} {k_pool.dtype}; using the dense-gather XLA "
        "fallback (~16x slower at flagship scale)",
        stacklevel=3,
    )
