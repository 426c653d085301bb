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


def _paged_kernel(
    # scalar prefetch
    meta_ref,     # (1 + S,) int32: [layer_idx, lengths...]
    pt_ref,       # (S, P_max) int32 page table
    # blocks
    q_ref,        # (1, Hq_pad, D)
    k_ref,        # (1, Hkv, page, D) int8 | bf16 — page pt[si, pi]
    v_ref,        # (1, Hkv, page, D)
    *rest,        # [ks_ref, vs_ref] if quantized, then o_ref + scratches
    scale: float,
    hkv: int,
    g: int,       # padded group size (multiple of 8)
    quantized: bool,
):
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    si = pl.program_id(0)
    pi = pl.program_id(1)
    page = k_ref.shape[-2]
    d = q_ref.shape[-1]
    length = meta_ref[1 + si]

    @pl.when(pi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # one (kv-head)-batched dot per program: (Hkv, g, d) x (Hkv, page, d)
    q = q_ref[0].reshape(hkv, g, d)
    k = k_ref[0].astype(jnp.bfloat16)  # int8 -> exact
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (Hkv, g, page)
    if quantized:
        s = s * (ks_ref[0].reshape(hkv, 1, page).astype(jnp.float32) * scale)
    else:
        s = s * scale
    # validity: global cell index pi*page + j < length (compacted pages)
    cell = pi * page + jax.lax.broadcasted_iota(jnp.int32, (1, 1, page), 2)
    valid = cell < length
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...].reshape(hkv, g, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(hkv, g, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    if quantized:
        p = p * vs_ref[0].reshape(hkv, 1, page).astype(jnp.float32)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )  # (Hkv, g, d)
    acc = acc_scr[...].reshape(hkv, g, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(m_new, (hkv, g, 128)).reshape(hkv * g, 128)
    l_scr[...] = jnp.broadcast_to(l_new, (hkv, g, 128)).reshape(hkv * g, 128)
    acc_scr[...] = acc.reshape(hkv * g, d)

    @pl.when(pi == pl.num_programs(1) - 1)
    def _flush():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # inactive slots emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)


def _paged_kernel_int4(
    meta_ref,     # (1 + S,) int32: [layer_idx, lengths...]
    pt_ref,       # (S, P_max) int32 page table
    q_ref,        # (1, Hq_pad, D)
    kp_ref,       # (1, Hkv, page/2, D) uint8 — page-local split-half nibbles
    vp_ref,
    ks_ref, vs_ref,  # (1, Hkv, page) per-cell scales
    o_ref, m_scr, l_scr, acc_scr,
    *,
    scale: float,
    hkv: int,
    g: int,
):
    """int4 pool pages: each packed byte row holds cells (r, r + page/2) of
    its page; both nibble halves unpack into ONE fused online-softmax update
    per page (mirroring ops/decode_attention._decode_kernel_int4)."""
    si = pl.program_id(0)
    pi = pl.program_id(1)
    half = kp_ref.shape[-2]
    page = 2 * half
    d = q_ref.shape[-1]
    length = meta_ref[1 + si]

    @pl.when(pi == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0].reshape(hkv, g, d)
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

    k_bf = unpack2(kp_ref[0])  # (Hkv, page, D)
    v_bf = unpack2(vp_ref[0])
    ks = ks_ref[0].reshape(hkv, 1, page).astype(jnp.float32)
    vs = vs_ref[0].reshape(hkv, 1, page).astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k_bf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )  # (Hkv, g, page)
    s = s - KV4_BIAS * jnp.sum(q.astype(jnp.float32), axis=2, keepdims=True)
    s = s * (ks * scale)
    cell = pi * page + jax.lax.broadcasted_iota(jnp.int32, (1, 1, page), 2)
    valid = cell < length
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...].reshape(hkv, g, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(hkv, g, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    p = p * vs
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), v_bf,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )  # (Hkv, g, d)
    pv = pv - KV4_BIAS * jnp.sum(p, axis=2, keepdims=True)
    acc = acc_scr[...].reshape(hkv, g, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(m_new, (hkv, g, 128)).reshape(hkv * g, 128)
    l_scr[...] = jnp.broadcast_to(l_new, (hkv, g, 128)).reshape(hkv * g, 128)
    acc_scr[...] = acc.reshape(hkv * g, d)

    @pl.when(pi == pl.num_programs(1) - 1)
    def _flush():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # inactive slots emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)


def _pallas_paged(q, k_pool, v_pool, page_table, lengths, layer_idx,
                  k_scale, v_scale, scale):
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

    meta = jnp.concatenate(
        [jnp.asarray(layer_idx, jnp.int32).reshape(1), lengths.astype(jnp.int32)]
    )
    if int4:
        kernel = functools.partial(_paged_kernel_int4, scale=scale, hkv=hkv, g=gp)
    else:
        kernel = functools.partial(
            _paged_kernel, scale=scale, hkv=hkv, g=gp, quantized=quantized,
        )
    # index maps receive (si, pi, meta_ref, pt_ref); the page block index is
    # the page-table entry itself — no gathered cache ever exists in HBM
    pool_spec = pl.BlockSpec(
        (None, 1, hkv, page, d), lambda si, pi, meta, pt: (meta[0], pt[si, pi], 0, 0, 0)
    )
    in_specs = [
        pl.BlockSpec((1, hq_p, d), lambda si, pi, meta, pt: (si, 0, 0)),
        pool_spec,
        pool_spec,
    ]
    args = [q, k_pool, v_pool]
    if quantized:
        # scales stay per token CELL: 2x the packed row width under int4
        cell_page = 2 * page if int4 else page
        scale_spec = pl.BlockSpec(
            (None, 1, hkv, cell_page),
            lambda si, pi, meta, pt: (meta[0], pt[si, pi], 0, 0),
        )
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s_slots, p_max),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hq_p, d), lambda si, pi, meta, pt: (si, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq_p, 128), jnp.float32),
            pltpu.VMEM((hq_p, 128), jnp.float32),
            pltpu.VMEM((hq_p, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_slots, hq_p, d), q.dtype),
        interpret=_interpret(),
    )(meta, page_table.astype(jnp.int32), *args)
    if gp != g:
        out = out.reshape(s_slots, hkv, gp, d)[:, :, :g].reshape(s_slots, hq, d)
    return out


# ---------------------------------------------------------------------------
# XLA fallback + dispatch
# ---------------------------------------------------------------------------


def _xla_paged(q, k_pool, v_pool, page_table, lengths, layer_idx, k_scale, v_scale, scale):
    from ..models.qwen2_5_vl.text import _dequantize_kv, _unpack_kv4
    from .attention import xla_attention

    s_slots = q.shape[0]
    int4 = k_pool.dtype == jnp.uint8
    n_layers, n_pages, hkv, page, d = k_pool.shape
    if int4:
        page = 2 * page  # packed rows -> token cells per page
    p_max = page_table.shape[1]

    def layer_gather(pool, unpack4=False):
        l = jax.lax.dynamic_index_in_dim(pool, layer_idx, 0, keepdims=False)
        if unpack4:  # per-page split-half nibbles -> token-ordered int8
            l = _unpack_kv4(l, seq_axis=2)
        g = jnp.take(l, page_table.reshape(-1), axis=0)  # (S*P_max, Hkv, page, D)
        g = g.reshape(s_slots, p_max, hkv, page, *l.shape[3:])
        g = jnp.moveaxis(g, 2, 1).reshape(s_slots, hkv, p_max * page, *l.shape[3:])
        return g

    k_l = layer_gather(k_pool, unpack4=int4)  # (S, Hkv, T, D)
    v_l = layer_gather(v_pool, unpack4=int4)
    if k_scale is not None:
        k_l = _dequantize_kv(k_l, layer_gather(k_scale), q.dtype)
        v_l = _dequantize_kv(v_l, layer_gather(v_scale), q.dtype)
    k_l = k_l.transpose(0, 2, 1, 3)  # (S, T, Hkv, D)
    v_l = v_l.transpose(0, 2, 1, 3)
    mask = (
        jnp.arange(p_max * page, dtype=jnp.int32)[None, :] < lengths[:, None]
    )[:, None, None, :]
    out = xla_attention(q[:, None].astype(k_l.dtype), k_l, v_l, mask=mask, scale=scale)
    return out[:, 0]


def _eligible(q, k_pool) -> bool:
    if jax.default_backend() != "tpu":
        return False
    s_slots, hq, d = q.shape
    _, _, hkv, page, _ = k_pool.shape
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
) -> jnp.ndarray:
    """Attention of one decode token per slot over its page-table pages of
    layer ``layer_idx``. Returns (S, Hq, D)."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    if backend in ("auto", "pallas") and _eligible(q, k_pool):
        try:
            return _pallas_paged(
                q, k_pool, v_pool, page_table, lengths, layer_idx,
                k_scale, v_scale, scale,
            )
        except Exception as e:
            if backend == "pallas":
                raise
            _warn_fallback(f"kernel raised {type(e).__name__}: {e}", q, k_pool)
    elif jax.default_backend() == "tpu":
        _warn_fallback("shape ineligible", q, k_pool)
    return _xla_paged(
        q, k_pool, v_pool, page_table, lengths, layer_idx, k_scale, v_scale, scale
    )


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
