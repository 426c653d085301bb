"""Pallas TPU flash attention (forward): online-softmax tiled attention with
causal + segment-id masking and GQA, replacing the reference's flash-attn CUDA
kernels (/root/reference/verl/models/transformers/flash_attention_utils.py).

Design (TPU-first):
- grid (batch, q_heads, num_q_blocks); each program streams kv blocks with a
  fori_loop, keeping the running max/denominator/accumulator in VMEM scratch.
- segment ids give packed-sequence (varlen) semantics with static shapes —
  the TPU-native replacement for cu_seqlens.
- causal programs skip kv blocks strictly above the diagonal by bounding the
  fori_loop trip count (no wasted MXU work on masked tiles).
- GQA: kv blocks are indexed by query_head // group, no repeat_kv copy.

Gradients: the op defines a custom VJP whose backward recomputes attention
with the XLA path (exact same math) — flash speeds up all no-grad forwards
(rollout prefill, old/ref log-probs) today; a Pallas backward kernel is the
planned upgrade for the update pass (which currently picks the XLA path under
remat anyway).
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


def _flash_fwd_kernel(
    q_seg_ref,    # (1, block_q) int32
    kv_seg_ref,   # (1, Skv) int32
    q_ref,        # (block_q, D)
    k_ref,        # (Skv, D)
    v_ref,        # (Skv, D)
    o_ref,        # (block_q, D)
    m_scratch,    # (block_q, 128) fp32
    l_scratch,    # (block_q, 128) fp32
    acc_scratch,  # (block_q, D) fp32
    *,
    scale: float,
    block_k: int,
    causal: bool,
    block_q: int,
):
    q_blk = pl.program_id(2)
    skv = k_ref.shape[0]
    num_kv_blocks = skv // block_k

    if causal:
        # highest kv position any query in this block can see:
        # q_pos_max = (q_blk+1)*block_q - 1
        last_kv_block = jnp.minimum(
            num_kv_blocks, ((q_blk + 1) * block_q + block_k - 1) // block_k
        )
    else:
        last_kv_block = num_kv_blocks

    m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
    l_scratch[...] = jnp.zeros_like(l_scratch)
    acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[...].astype(jnp.float32) * scale
    q_seg = q_seg_ref[0, :]  # (block_q,)
    q_pos = q_blk * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(kv_blk, _):
        k = k_ref[pl.ds(kv_blk * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(kv_blk * block_k, block_k), :]
        kv_seg = kv_seg_ref[0, pl.ds(kv_blk * block_k, block_k)]  # (block_k,)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)

        mask = (q_seg[:, None] == kv_seg[None, :]) & (q_seg[:, None] != 0)
        if causal:
            kv_pos = kv_blk * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = mask & (kv_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scratch[:, 0:1]  # (block_q, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        # mask p explicitly: a fully-masked row has m_new == NEG_INF and would
        # otherwise produce exp(0) == 1 for every entry
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # (block_q, block_k)
        correction = jnp.exp(m_prev - m_new)  # (block_q, 1)

        l_prev = l_scratch[:, 0:1]
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)

        acc_scratch[...] = acc_scratch[...] * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)
        return ()

    jax.lax.fori_loop(0, last_kv_block, body, ())

    l = l_scratch[:, 0:1]
    # fully-masked rows (padding) produce l == 0; emit zeros for them
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[...] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _flash_attention_core(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k):
    return _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k)


def _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k):
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    groups = hq // hkv

    grid = (b, hq, sq // block_q)

    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, block_k=block_k, causal=causal, block_q=block_q
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=jax.default_backend() != "tpu",  # CPU tests validate semantics
        in_specs=[
            pl.BlockSpec((1, block_q), lambda b_, h, iq: (b_, iq), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, skv), lambda b_, h, iq: (b_, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((None, block_q, None, d), lambda b_, h, iq: (b_, iq, h, 0)),
            pl.BlockSpec((None, skv, None, d), lambda b_, h, iq: (b_, 0, h // groups, 0)),
            pl.BlockSpec((None, skv, None, d), lambda b_, h, iq: (b_, 0, h // groups, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, None, d), lambda b_, h, iq: (b_, iq, h, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q_seg, kv_seg, q, k, v)
    return out


def _xla_reference(q, k, v, q_seg, kv_seg, causal, scale):
    from .attention import make_attention_mask, xla_attention

    mask = make_attention_mask(q_seg, kv_seg, causal=causal)
    return xla_attention(q, k, v, mask=mask, scale=scale)


def _core_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k):
    out = _flash_fwd(q, k, v, q_seg, kv_seg, causal, scale, block_q, block_k)
    return out, (q, k, v, q_seg, kv_seg)


def _core_bwd(causal, scale, block_q, block_k, residuals, g):
    q, k, v, q_seg, kv_seg = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, q_seg, kv_seg, causal, scale), q, k, v
    )
    dq, dk, dv = vjp(g)
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
) -> jnp.ndarray:
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    scale = scale if scale is not None else d**-0.5
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    if sq % block_q or skv % block_k:
        raise ValueError(f"seq lengths ({sq}, {skv}) must divide blocks ({block_q}, {block_k})")
    if hq % hkv:
        raise ValueError("query heads must be a multiple of kv heads")

    q_seg = segment_ids if segment_ids is not None else jnp.ones((b, sq), jnp.int32)
    kv_seg = kv_segment_ids if kv_segment_ids is not None else q_seg
    return _flash_attention_core(
        q, k, v, q_seg.astype(jnp.int32), kv_seg.astype(jnp.int32),
        causal, scale, block_q, block_k,
    )
