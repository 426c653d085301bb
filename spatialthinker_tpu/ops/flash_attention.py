"""Pallas TPU flash attention (forward + backward): online-softmax tiled
attention with causal + segment-id masking and GQA, replacing the reference's
flash-attn CUDA kernels (/root/reference/verl/models/transformers/flash_attention_utils.py).

Design (TPU-first):
- forward: grid (batch, q_heads, num_q_blocks); each program streams kv blocks
  with a fori_loop, keeping the running max/denominator/accumulator in VMEM
  scratch, and writes the per-row logsumexp L for the backward pass.
- backward: the standard two-kernel split —
    * dQ kernel: grid (batch, q_heads, num_q_blocks), streams kv blocks;
    * dKV kernel: grid (batch, q_heads, num_kv_blocks), streams q blocks
      (causal programs skip q blocks strictly below the diagonal);
  GQA gradients are produced per query head and reduced to kv heads outside
  the kernel (one reshape-sum, no atomics).
- segment ids give packed-sequence (varlen) semantics with static shapes —
  the TPU-native replacement for cu_seqlens.
- rows that are fully masked (padding, segment id 0) produce exact zeros in
  the output and in every gradient.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel_gqa(
    q_seg_ref,    # (1, block_q)
    kv_seg_ref,   # (1, block_k)
    q_ref,        # (G, block_q, D) — every query head of one kv group
    k_ref,        # (block_k, D)
    v_ref,        # (block_k, D)
    o_ref,        # (G, block_q, D)
    lse_ref,      # (G, 1, block_q)
    m_scratch,    # (G * block_q, 128) fp32
    l_scratch,    # (G * block_q, 128) fp32
    acc_scratch,  # (G * block_q, D) fp32
    *,
    scale: float,
    block_k: int,
    causal: bool,
    block_q: int,
    groups: int,
    causal_offset: int = 0,
):
    """GQA-batched forward: ONE program per (batch, kv head, q block, kv block)
    carries all `groups` query heads of the group — the KV DMA is shared 1x
    instead of fetched per head, and the q@k / p@v contractions batch over G
    into single (G*block_q, ...) MXU dots. KV streams through the GRID
    (innermost dim) with the online-softmax state in scratch — VMEM holds one
    (block_k, D) kv tile at a time, so eligibility never depends on the total
    kv length (an in-kernel full-skv ref overflows scoped VMEM past ~6k)."""
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)
    g, bq, d = q_ref.shape

    @pl.when(kv_blk == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if causal:
        # skip blocks strictly above the causal diagonal (their programs still
        # launch; the DMA-and-compute is what's saved)
        run = kv_blk * block_k <= causal_offset + (q_blk + 1) * block_q - 1
    else:
        run = True

    @pl.when(run)
    def _accumulate():
        q = q_ref[...]  # (G, bq, d) bf16; scale folded in after the dot
        q_seg = q_seg_ref[0, :]
        kv_seg = kv_seg_ref[0, :]
        k = k_ref[...]
        v = v_ref[...]

        s = jax.lax.dot_general(
            q, k, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (G, bq, bk)
        mask = (q_seg[:, None] == kv_seg[None, :]) & (q_seg[:, None] != 0)
        if causal:
            q_pos = (
                causal_offset
                + q_blk * block_q
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            )
            kv_pos = kv_blk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = mask & (kv_pos <= q_pos)
        s = jnp.where(mask[None], s, NEG_INF)

        m_prev = m_scratch[...].reshape(g, bq, 128)[:, :, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        p = jnp.where(mask[None], jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)

        l_new = l_scratch[...].reshape(g, bq, 128)[:, :, 0:1] * corr + jnp.sum(
            p, axis=2, keepdims=True
        )
        acc = acc_scratch[...].reshape(g, bq, d) * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scratch[...] = jnp.broadcast_to(m_new, (g, bq, 128)).reshape(g * bq, 128)
        l_scratch[...] = jnp.broadcast_to(l_new, (g, bq, 128)).reshape(g * bq, 128)
        acc_scratch[...] = acc.reshape(g * bq, d)

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _flush():
        m = m_scratch[...].reshape(g, bq, 128)[:, :, 0:1]
        l = l_scratch[...].reshape(g, bq, 128)[:, :, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_scratch[...].reshape(g, bq, d) / safe_l).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, NEG_INF, m + jnp.log(safe_l))
        lse_ref[...] = lse.reshape(g, 1, bq)


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k, causal_offset=0):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv
    # the G-batched scores block (groups, bq, bk) f32 dominates VMEM; shrink
    # the q block until it fits comfortably
    bq = min(block_q, sq)
    while groups * bq * block_k * 4 > 4 * 1024 * 1024 and bq > 128 and sq % (bq // 2) == 0:
        bq //= 2
    grid = (b, hkv, sq // bq, skv // block_k)

    kernel = functools.partial(
        _fwd_kernel_gqa, scale=scale, block_k=block_k, causal=causal, block_q=bq,
        groups=groups, causal_offset=causal_offset,
    )
    # BHSD layout inside the kernel: mosaic tiling wants (seq, head_dim) as
    # the trailing block dims
    q_t = q.transpose(0, 2, 1, 3)
    k_t = k.transpose(0, 2, 1, 3)
    v_t = v.transpose(0, 2, 1, 3)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, 1, bq), lambda b_, j, iq, ik: (b_, 0, iq)),
            pl.BlockSpec((None, 1, block_k), lambda b_, j, iq, ik: (b_, 0, ik)),
            pl.BlockSpec((None, groups, bq, d), lambda b_, j, iq, ik: (b_, j, iq, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b_, j, iq, ik: (b_, j, ik, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b_, j, iq, ik: (b_, j, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, groups, bq, d), lambda b_, j, iq, ik: (b_, j, iq, 0)),
            pl.BlockSpec((None, groups, 1, bq), lambda b_, j, iq, ik: (b_, j, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q_t.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((groups * bq, 128), jnp.float32),
            pltpu.VMEM((groups * bq, 128), jnp.float32),
            pltpu.VMEM((groups * bq, d), jnp.float32),
        ],
    )(q_seg.reshape(b, 1, sq), kv_seg.reshape(b, 1, skv), q_t, k_t, v_t)
    return out.transpose(0, 2, 1, 3), lse.reshape(b, hq, sq)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel_gqa(
    q_seg_ref, kv_seg_ref,           # (1, block_q), (1, Skv)
    q_ref, k_ref, v_ref,             # (G, block_q, D), (Skv, D), (Skv, D)
    do_ref,                          # (G, block_q, D)
    lse_ref,                         # (G, 1, block_q)
    delta_ref,                       # (G, 1, block_q) — rowsum(dO * O)
    dq_ref,                          # (G, block_q, D)
    dq_scratch,                      # (G * block_q, D) fp32
    *,
    scale: float,
    block_k: int,
    causal: bool,
    block_q: int,
    groups: int,
):
    """GQA-batched dQ: all G query heads of a kv group per program — shared
    KV DMA, batched (G*block_q, ...) MXU dots (see _fwd_kernel_gqa)."""
    q_blk = pl.program_id(2)
    skv = k_ref.shape[0]
    num_kv_blocks = skv // block_k
    g, bq, d = q_ref.shape
    last_kv_block = (
        jnp.minimum(num_kv_blocks, ((q_blk + 1) * block_q + block_k - 1) // block_k)
        if causal
        else num_kv_blocks
    )

    dq_scratch[...] = jnp.zeros_like(dq_scratch)
    q = q_ref[...].astype(jnp.float32) * scale        # (G, bq, d)
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...].reshape(g, bq)[:, :, None]
    delta = delta_ref[...].reshape(g, bq)[:, :, None]
    q_seg = q_seg_ref[0, :]
    q_pos = q_blk * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(kv_blk, _):
        k = k_ref[pl.ds(kv_blk * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kv_blk * block_k, block_k), :].astype(jnp.float32)
        kv_seg = kv_seg_ref[0, pl.ds(kv_blk * block_k, block_k)]

        s = jax.lax.dot_general(
            q, k, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, bq, bk)
        mask = (q_seg[:, None] == kv_seg[None, :]) & (q_seg[:, None] != 0)
        if causal:
            kv_pos = kv_blk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = mask & (kv_pos <= q_pos)
        p = jnp.where(mask[None], jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq_scratch[...] += jax.lax.dot_general(
            ds, k, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).reshape(g * bq, d)
        return ()

    jax.lax.fori_loop(0, last_kv_block, body, ())
    dq_ref[...] = (dq_scratch[...].reshape(g, bq, d) * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_gqa(
    q_seg_ref, kv_seg_ref,           # (1, block_q), (1, Skv)
    q_ref,                           # (G, block_q, D)
    k_ref, v_ref,                    # (block_k, D)
    do_ref,                          # (G, block_q, D)
    lse_ref,                         # (G, 1, block_q)
    delta_ref,                       # (G, 1, block_q)
    dk_ref, dv_ref,                  # (block_k, D) — group-summed in kernel
    dk_scratch, dv_scratch,          # (block_k, D) fp32
    *,
    scale: float,
    block_q: int,
    causal: bool,
    block_k: int,
    groups: int,
):
    """GQA-batched dK/dV with the group reduction IN kernel: the per-query-
    head gradients are contracted over (G, block_q) directly into (block_k, D)
    — no (B, Hq, Skv, D) per-head gradient buffers, no post-reduce. Grid is
    (b, hkv, kv_blocks, q_blocks) with q innermost; scratch accumulates across
    q blocks and flushes on the last one."""
    kv_blk = pl.program_id(2)
    q_blk = pl.program_id(3)
    num_q_blocks = pl.num_programs(3)
    g, bq, d = q_ref.shape

    @pl.when(q_blk == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    first_q_block = (kv_blk * block_k) // block_q if causal else 0

    @pl.when(q_blk >= first_q_block)
    def _accumulate():
        k = k_ref[...].astype(jnp.float32)
        v = v_ref[...].astype(jnp.float32)
        kv_seg = kv_seg_ref[0, pl.ds(kv_blk * block_k, block_k)]
        q = q_ref[...].astype(jnp.float32) * scale     # (G, bq, d)
        do = do_ref[...].astype(jnp.float32)
        lse = lse_ref[...].reshape(g, bq)[:, :, None]
        delta = delta_ref[...].reshape(g, bq)[:, :, None]
        q_seg = q_seg_ref[0, :]

        s = jax.lax.dot_general(
            q, k, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (G, bq, bk)
        mask = (q_seg[:, None] == kv_seg[None, :]) & (q_seg[:, None] != 0)
        if causal:
            q_pos = q_blk * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            kv_pos = kv_blk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = mask & (kv_pos <= q_pos)
        p = jnp.where(mask[None], jnp.exp(s - lse), 0.0)

        # contract over (G*bq) rows at once: group-summed gradients, one dot
        # each (reshape to 2D — Mosaic supports single contracting dims only)
        dv_scratch[...] += jax.lax.dot_general(
            p.reshape(g * bq, -1), do.reshape(g * bq, d),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_scratch[...] += jax.lax.dot_general(
            ds.reshape(g * bq, -1), q.reshape(g * bq, d),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    @pl.when(q_blk == num_q_blocks - 1)
    def _flush():
        dk_ref[...] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_scratch[...].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, q_seg, kv_seg, out, lse, g, causal, scale, block_q, block_k):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv
    # keep the (G, bq, bk) fp32 score block in VMEM (see _flash_fwd)
    bq = min(block_q, sq)
    while groups * bq * block_k * 4 > 4 * 1024 * 1024 and bq > 128 and sq % (bq // 2) == 0:
        bq //= 2

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B, Sq, Hq)
    delta = delta.transpose(0, 2, 1).reshape(b, hq, 1, sq)
    lse_in = lse.reshape(b, hq, 1, sq)

    q_t = q.transpose(0, 2, 1, 3)
    k_t = k.transpose(0, 2, 1, 3)
    v_t = v.transpose(0, 2, 1, 3)
    g_t = g.transpose(0, 2, 1, 3)

    dq_kernel = functools.partial(
        _bwd_dq_kernel_gqa, scale=scale, block_k=block_k, causal=causal,
        block_q=bq, groups=groups,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, hkv, sq // bq),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, 1, bq), lambda b_, j, iq: (b_, 0, iq)),
            pl.BlockSpec((None, 1, skv), lambda b_, j, iq: (b_, 0, 0)),
            pl.BlockSpec((None, groups, bq, d), lambda b_, j, iq: (b_, j, iq, 0)),
            pl.BlockSpec((None, None, skv, d), lambda b_, j, iq: (b_, j, 0, 0)),
            pl.BlockSpec((None, None, skv, d), lambda b_, j, iq: (b_, j, 0, 0)),
            pl.BlockSpec((None, groups, bq, d), lambda b_, j, iq: (b_, j, iq, 0)),
            pl.BlockSpec((None, groups, 1, bq), lambda b_, j, iq: (b_, j, 0, iq)),
            pl.BlockSpec((None, groups, 1, bq), lambda b_, j, iq: (b_, j, 0, iq)),
        ],
        out_specs=pl.BlockSpec((None, groups, bq, d), lambda b_, j, iq: (b_, j, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q_t.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((groups * bq, d), jnp.float32)],
    )(q_seg.reshape(b, 1, sq), kv_seg.reshape(b, 1, skv), q_t, k_t, v_t, g_t, lse_in, delta)
    dq = dq.transpose(0, 2, 1, 3)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel_gqa, scale=scale, block_q=bq, causal=causal,
        block_k=block_k, groups=groups,
    )
    dk_t, dv_t = pl.pallas_call(
        dkv_kernel,
        grid=(b, hkv, skv // block_k, sq // bq),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, 1, bq), lambda b_, j, ik, iq: (b_, 0, iq)),
            pl.BlockSpec((None, 1, skv), lambda b_, j, ik, iq: (b_, 0, 0)),
            pl.BlockSpec((None, groups, bq, d), lambda b_, j, ik, iq: (b_, j, iq, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b_, j, ik, iq: (b_, j, ik, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b_, j, ik, iq: (b_, j, ik, 0)),
            pl.BlockSpec((None, groups, bq, d), lambda b_, j, ik, iq: (b_, j, iq, 0)),
            pl.BlockSpec((None, groups, 1, bq), lambda b_, j, ik, iq: (b_, j, 0, iq)),
            pl.BlockSpec((None, groups, 1, bq), lambda b_, j, ik, iq: (b_, j, 0, iq)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, block_k, d), lambda b_, j, ik, iq: (b_, j, ik, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b_, j, ik, iq: (b_, j, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, skv, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(q_seg.reshape(b, 1, sq), kv_seg.reshape(b, 1, skv), q_t, k_t, v_t, g_t, lse_in, delta)

    dk = dk_t.transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv_t.transpose(0, 2, 1, 3).astype(v.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing + public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention_core(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k,
                          causal_offset):
    out, _ = _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k,
                        causal_offset)
    return out


def _core_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k, causal_offset):
    out, lse = _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k,
                          causal_offset)
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _core_bwd(causal, scale, block_q, block_k, causal_offset, residuals, g):
    if causal_offset:
        raise NotImplementedError(
            "flash backward with causal_offset (chunked-prefill cross attention) "
            "is inference-only"
        )
    q, k, v, q_seg, kv_seg, out, lse = residuals
    dq, dk, dv = _flash_bwd(
        q, k, v, q_seg, kv_seg, out, lse, g, causal, scale, block_q, block_k
    )
    return dq, dk, dv, None, None


_flash_attention_core.defvjp(_core_fwd, _core_bwd)


def flash_attention(
    q: jnp.ndarray,  # (B, Sq, Hq, D)
    k: jnp.ndarray,  # (B, Skv, Hkv, D)
    v: jnp.ndarray,
    *,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    causal_offset: int = 0,
) -> jnp.ndarray:
    """``causal_offset`` (static) places q row 0 at that absolute kv position:
    the chunked-prefill cross-attention case (q = one prompt chunk, kv = the
    cache prefix + chunk). Forward-only when nonzero."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    scale = scale if scale is not None else d**-0.5
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    if sq % block_q or skv % block_k:
        raise ValueError(f"seq lengths ({sq}, {skv}) must divide blocks ({block_q}, {block_k})")
    if hq % hkv:
        raise ValueError("query heads must be a multiple of kv heads")
    if sq != skv and not (causal_offset or not causal):
        raise ValueError("cross-length causal attention requires causal_offset")

    q_seg = segment_ids if segment_ids is not None else jnp.ones((b, sq), jnp.int32)
    kv_seg = kv_segment_ids if kv_segment_ids is not None else q_seg
    return _flash_attention_core(
        q, k, v, q_seg.astype(jnp.int32), kv_seg.astype(jnp.int32),
        causal, scale, block_q, block_k, int(causal_offset),
    )
