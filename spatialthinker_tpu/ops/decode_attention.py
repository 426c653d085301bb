"""Pallas TPU decode attention over the full stacked KV cache.

This is the single-token-per-sequence attention of the rollout engines — the
role vLLM fills with its paged_attention CUDA kernels
(/root/reference/verl/workers/rollout/vllm_rollout_spmd.py gets it from vLLM).
Decode is HBM-bandwidth-bound: the step reads every live KV cell once, so the
kernel's job is to hit that floor and nothing more.

Design (TPU-first):
- The cache is the STACKED (L, B, Hkv, S, D) buffer that lives in the decode
  loop's carry. The layer to attend is selected with a scalar-prefetch index
  feeding the BlockSpec index maps — no (B, S, Hkv, D) layer slice is ever
  materialized in HBM (a jnp dynamic-slice would copy it; at 3B decode that
  copy alone doubles the step's KV traffic).
- int8 KV is dequantized IN REGISTERS: per-token-head scales fold into the
  score matrix after the q@k dot (q . (k*s) == (q . k) * s) and into the
  softmax weights before the p@v dot, so the bf16 dequantized cache never
  exists anywhere — HBM sees only int8 reads (~half the bf16 traffic).
- Measured negative results that shaped this design (on-chip, long-context
  shape b=128 s=2304 int8): (a) an all-int8 MXU variant (q and the softmax
  weights quantized in-register so both dots run int8 x int8, no K/V
  dequant converts) timed IDENTICAL to the dequant-then-bf16-dot path
  (10.34 vs 10.38 ms/36-layer pass), and (b) block-shape sweeps
  (block_b 4-32, block_s 384-2304) all land within 1% of the same
  ~530 GB/s. The kernel is pinned by the chip's achievable HBM stream rate
  for this access pattern, not by per-element compute or grid overhead —
  so the simple exact-dequant path is kept.
- Grid (B, S_blocks) with flash-style online softmax across S blocks: m/l/acc
  scratch persists across the S dimension of the grid, out is flushed at the
  last block. Head-major cache layout (S, D) trailing dims satisfies Mosaic
  tiling for both int8 (32, 128) and bf16 (8, 128) blocks.
- GQA: all query heads of one sequence ride in one program; each kv head's
  group is a static (G, D) row slice (G padded to a multiple of 8 by the
  caller when needed, e.g. the 7B's G=7).

Masking: ``kv_seg`` (B, S) int32 marks valid cache cells (left-pad zeros and
the unwritten decode tail are 0). The query is the newest token, so causality
is exactly "attend every valid cell" — no position arithmetic in the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_S = 512
INT4_BLOCK_S_CAP = 256  # packed rows per int4 block (see _pallas_decode)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _block_update(
    q, k_bf16, v_bf16, seg, ks, vs, m_scr, l_scr, acc_scr,
    *, scale, hkv, g, block_b, block_s, kv_bias: float = 0.0,
):
    """One flash-style online-softmax update of the (m, l, acc) scratches with
    a (block_b, Hkv, block_s, D) KV block. ``ks``/``vs`` are the per-token
    scales (None for bf16 caches); order across calls is irrelevant — the
    running max/sum absorbs blocks in any sequence position order.

    ``kv_bias`` != 0 means k/v carry BIASED values (stored + bias, the int4
    storage format): the true dots are recovered in the epilogues,
    q.(k-b) = q.k - b*sum(q) and p.(v-b) = p.v - b*sum(p), so the unpack
    never pays per-element sign-extension.

    ``k_bf16``/``v_bf16`` may each be a TUPLE of token-axis halves (the int4
    split-half nibbles): the halves run as separate dots and only the scores
    concatenate — concatenating the unpacked blocks themselves would re-copy
    the whole cache through the VPU."""
    n_grp = block_b * hkv
    d = q.shape[-1]

    def qdot(k_half):
        return jax.lax.dot_general(
            q, k_half, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    if isinstance(k_bf16, tuple):
        s = jnp.concatenate([qdot(kh) for kh in k_bf16], axis=2)
    else:
        s = qdot(k_bf16)  # (n_grp, g, block_s)
    if kv_bias:
        s = s - kv_bias * jnp.sum(q.astype(jnp.float32), axis=2, keepdims=True)
    if ks is not None:
        # fold softmax scale + k scales in after the dot: q.(k*s) == (q.k)*s
        s = s * (ks.reshape(n_grp, 1, block_s).astype(jnp.float32) * scale)
    else:
        s = s * scale
    valid = jnp.broadcast_to(
        seg != 0, (block_b, hkv, block_s)
    ).reshape(n_grp, 1, block_s)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...].reshape(n_grp, g, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(n_grp, g, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    if vs is not None:
        # fold the v scales into the softmax weights: p.(v*s) == (p*s).v
        p = p * vs.reshape(n_grp, 1, block_s).astype(jnp.float32)

    def pdot(p_part, v_part):
        return jax.lax.dot_general(
            p_part.astype(jnp.bfloat16), v_part,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )

    if isinstance(v_bf16, tuple):
        half = block_s // 2
        pv = pdot(p[:, :, :half], v_bf16[0]) + pdot(p[:, :, half:], v_bf16[1])
    else:
        pv = pdot(p, v_bf16)  # (n_grp, g, d)
    if kv_bias:
        pv = pv - kv_bias * jnp.sum(p, axis=2, keepdims=True)
    acc = acc_scr[...].reshape(n_grp, g, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(m_new, (n_grp, g, 128)).reshape(n_grp * g, 128)
    l_scr[...] = jnp.broadcast_to(l_new, (n_grp, g, 128)).reshape(n_grp * g, 128)
    acc_scr[...] = acc.reshape(n_grp * g, d)


def _decode_kernel(
    idx_ref,      # scalar prefetch: (1,) layer index (consumed by index maps)
    seg_ref,      # (block_b, 1, block_s) int32
    q_ref,        # (block_b, Hq_pad, D)
    k_ref,        # (block_b, Hkv, block_s, D) int8 | bf16
    v_ref,        # (block_b, Hkv, block_s, D)
    *rest,        # [ks_ref, vs_ref] if quantized, then o_ref + scratches
    scale: float,
    hkv: int,
    g: int,       # padded group size (multiple of 8)
    block_b: int,
    quantized: bool,
):
    """Several batch rows ride in one program (block_b): decode attention is
    pure HBM streaming (the per-row dots are tiny), so per-program DMA size —
    not compute — sets the throughput; 1-row programs measured ~4x off the
    bandwidth floor from launch/DMA overhead."""
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    si = pl.program_id(1)
    n_grp = block_b * hkv  # one (row, kv-head) group per batched-dot slice
    d = q_ref.shape[-1]
    block_s = k_ref.shape[-2]

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # batched over all (row, kv-head) groups at once: sequential per-group
    # iterations serialize tiny dots behind scratch read-modify-writes and
    # leave the VPU mostly idle — batching turns the softmax bookkeeping into
    # full-width vector ops and lets Mosaic pipeline the MXU slices.
    q = q_ref[...].reshape(n_grp, g, d)  # bf16 operands, f32 accumulation
    k = k_ref[...].reshape(n_grp, block_s, d).astype(jnp.bfloat16)  # int8 -> exact
    v = v_ref[...].reshape(n_grp, block_s, d)
    _block_update(
        q, k, v, seg_ref[...],
        ks_ref[...] if quantized else None,
        vs_ref[...] if quantized else None,
        m_scr, l_scr, acc_scr,
        scale=scale, hkv=hkv, g=g, block_b=block_b, block_s=block_s,
    )

    @pl.when(si == pl.num_programs(1) - 1)
    def _flush():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)


def _decode_kernel_int4(
    idx_ref,      # scalar prefetch: (1,) layer index (consumed by index maps)
    seg_lo_ref,   # (block_b, 1, block_sh) int32 — tokens [si*bsh, ...)
    seg_hi_ref,   # (block_b, 1, block_sh) int32 — tokens [half + si*bsh, ...)
    q_ref,        # (block_b, Hq_pad, D)
    kp_ref,       # (block_b, Hkv, block_sh, D) uint8 — packed nibble rows
    vp_ref,
    ks_lo_ref, ks_hi_ref, vs_lo_ref, vs_hi_ref,   # per-token scales
    o_ref, m_scr, l_scr, acc_scr,
    *,
    scale: float,
    hkv: int,
    g: int,
    block_b: int,
):
    """int4 split-half cache: one packed byte block covers TWO token ranges
    (low nibbles = tokens [si*bsh, ...), high = the same rows offset by
    Smax/2). Each range gets its own online-softmax update — order across
    grid steps and nibble halves is irrelevant to the running max/sum."""
    si = pl.program_id(1)
    n_grp = block_b * hkv
    d = q_ref.shape[-1]
    block_sh = kp_ref.shape[-2]

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[...].reshape(n_grp, g, d)
    kp = kp_ref[...].reshape(n_grp, block_sh, d)  # packed uint8
    vp = vp_ref[...].reshape(n_grp, block_sh, d)
    from ..models.qwen2_5_vl.text import KV4_BIAS
    from .int4_mlp import nibble_u4

    # ONE fused update over both nibble halves (2*block_sh tokens): running
    # two per-nibble updates doubled the softmax bookkeeping per token vs
    # the int8 kernel — measured as int4 decode LOSING to int8 at equal
    # batch despite half the bytes. The unpack stays UNSIGNED (biased
    # storage, 2 lane ops/element); _block_update's kv_bias epilogues
    # recover the true dots. The two halves run as separate MXU dots whose
    # SCORES concatenate (g x block_s, 16x smaller than the k/v blocks) —
    # concatenating the unpacked bf16 blocks themselves re-copies the whole
    # cache through the VPU. Sign-extended per-nibble updates measured
    # 249 GB/s-effective; biased single-update, 319; this form drops two
    # full-block copies per block on top.
    u4 = lambda p, which: nibble_u4(p, which).astype(jnp.bfloat16)
    seg = jnp.concatenate([seg_lo_ref[...], seg_hi_ref[...]], axis=2)
    ks = jnp.concatenate([ks_lo_ref[...], ks_hi_ref[...]], axis=2)
    vs = jnp.concatenate([vs_lo_ref[...], vs_hi_ref[...]], axis=2)
    _block_update(
        q, (u4(kp, 0), u4(kp, 1)), (u4(vp, 0), u4(vp, 1)),
        seg, ks, vs, m_scr, l_scr, acc_scr,
        scale=scale, hkv=hkv, g=g, block_b=block_b, block_s=2 * block_sh,
        kv_bias=float(KV4_BIAS),
    )

    @pl.when(si == pl.num_programs(1) - 1)
    def _flush():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)


def _decode_kernel_int4_i8(
    idx_ref,      # scalar prefetch: (1,) layer index (consumed by index maps)
    seg_lo_ref, seg_hi_ref,
    q_ref,        # (block_b, Hq_pad, D)
    kp_ref,       # (block_b, Hkv, block_sh, D) uint8 — packed nibble rows
    vp_ref,
    ks_lo_ref, ks_hi_ref, vs_lo_ref, vs_hi_ref,
    o_ref, m_scr, l_scr, acc_scr,
    *,
    scale: float,
    hkv: int,
    g: int,
    block_b: int,
):
    """int4 split-half decode block with int8 MXU dots (opt-in via
    rollout.int4_i8dot — see the decode_attention docstring). Same
    grid/specs/scratches as _decode_kernel_int4."""
    si = pl.program_id(1)
    n_grp = block_b * hkv
    d = q_ref.shape[-1]
    block_sh = kp_ref.shape[-2]
    block_s = 2 * block_sh

    @pl.when(si == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    from ..models.qwen2_5_vl.text import KV4_BIAS

    # q int8, one scale per (row, head) — error ~0.4% of the row max, folded
    # back exactly via qscale in the score epilogue
    qf = q_ref[...].reshape(n_grp, g, d).astype(jnp.float32)
    qa = jnp.max(jnp.abs(qf), axis=2, keepdims=True)
    qscale = jnp.maximum(qa, 1e-8) * (1.0 / 127.0)
    q_i8 = jnp.round(qf / qscale).astype(jnp.int8)
    sumq = jnp.sum(q_i8.astype(jnp.float32), axis=2, keepdims=True)

    # ONE widen per packed byte, reused by both nibble extracts; the only
    # per-element converts are the narrow i32->i8 ones feeding the MXU
    kp = kp_ref[...].reshape(n_grp, block_sh, d).astype(jnp.int32)
    vp = vp_ref[...].reshape(n_grp, block_sh, d).astype(jnp.int32)
    lo = lambda x: (x & 15).astype(jnp.int8)
    hi = lambda x: (x >> 4).astype(jnp.int8)

    def qk(k_i8):
        return jax.lax.dot_general(
            q_i8, k_i8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    s = jnp.concatenate([qk(lo(kp)), qk(hi(kp))], axis=2).astype(jnp.float32)
    ks = jnp.concatenate([ks_lo_ref[...], ks_hi_ref[...]], axis=2)
    vs = jnp.concatenate([vs_lo_ref[...], vs_hi_ref[...]], axis=2)
    seg = jnp.concatenate([seg_lo_ref[...], seg_hi_ref[...]], axis=2)
    # debias the +8 nibble storage, restore q magnitude, fold k scales
    s = (s - KV4_BIAS * sumq) * qscale
    s = s * (ks.reshape(n_grp, 1, block_s).astype(jnp.float32) * scale)
    valid = jnp.broadcast_to(
        seg != 0, (block_b, hkv, block_s)
    ).reshape(n_grp, 1, block_s)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[...].reshape(n_grp, g, 128)[:, :, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[...].reshape(n_grp, g, 128)[:, :, 0:1] * corr + jnp.sum(
        p, axis=2, keepdims=True
    )
    p = p * vs.reshape(n_grp, 1, block_s).astype(jnp.float32)
    # softmax weights int8, one scale per row (p >= 0 so amax == max); the
    # epilogue restores pscale exactly — error ~0.4% of the row's max weight
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
        pv_dot(p_i8[:, :, :block_sh], lo(vp))
        + pv_dot(p_i8[:, :, block_sh:], hi(vp))
    ).astype(jnp.float32)
    pv = (pv - KV4_BIAS * sump) * pscale
    acc = acc_scr[...].reshape(n_grp, g, d) * corr + pv
    m_scr[...] = jnp.broadcast_to(m_new, (n_grp, g, 128)).reshape(n_grp * g, 128)
    l_scr[...] = jnp.broadcast_to(l_new, (n_grp, g, 128)).reshape(n_grp * g, 128)
    acc_scr[...] = acc.reshape(n_grp * g, d)

    @pl.when(si == pl.num_programs(1) - 1)
    def _flush():
        l = l_scr[:, 0:1]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows emit zeros
        o_ref[...] = (acc_scr[...] / safe_l).reshape(o_ref.shape).astype(o_ref.dtype)


def _pick_block_b(b: int, quantized: bool) -> int:
    # int8 halves the KV block bytes, so twice the rows fit in VMEM; more rows
    # per program = bigger DMAs = less launch overhead per byte
    for cand in ((16, 8, 4, 2) if quantized else (8, 4, 2)):
        if b % cand == 0:
            return cand
    return 1


def _pallas_decode(
    q, k_cache, v_cache, kv_seg, layer_idx, k_scale, v_scale, scale, block_s,
    int4_i8dot=False,
):
    b, hq, d = q.shape
    n_layers, _, hkv, s_rows, _ = k_cache.shape  # packed rows for int4
    int4 = k_cache.dtype == jnp.uint8
    g = hq // hkv
    gp = ((g + 7) // 8) * 8
    if gp != g:  # pad each GQA group's query rows to a Mosaic-tileable height
        qr = q.reshape(b, hkv, g, d)
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
        q = qr.reshape(b, hkv * gp, d)
    hq_p = hkv * gp
    quantized = k_scale is not None
    block_b = _pick_block_b(b, quantized)
    if int4:
        # the kernel materializes the packed block + both unpacked bf16
        # halves in vector registers, where every u8 element occupies a
        # 32-bit lane: at block_b=16 a 384-row block is 18.78M of kernel
        # stack (> the 16M scoped-VMEM limit) at ctx 2304. 128 packed rows =
        # 256 tokens per fused update (the int8 kernel's block) keeps the
        # stack ~10M; int4 cache widths are 256-multiples so 128 always
        # divides s_rows. 256-row blocks measured 7% faster when they divide
        # (width 2048: 14.29 vs 15.30 ms at b=256) and fit VMEM in the
        # two-dot form — widths that are 512-token multiples (e.g. the 8192
        # flagship cache) take them; others fall back to 128 (any int4 width
        # is a 256-token multiple). Module constant so the diag can sweep.
        cap = INT4_BLOCK_S_CAP if s_rows % INT4_BLOCK_S_CAP == 0 else 128
        block_s = min(block_s, cap)
    grid = (b // block_b, s_rows // block_s)
    s_max = 2 * s_rows if int4 else s_rows  # token width

    if int4:
        n_blk = s_rows // block_s  # high-nibble token blocks sit n_blk later
        seg3 = kv_seg.reshape(b, 1, s_max)
        seg_spec_lo = pl.BlockSpec((block_b, 1, block_s), lambda bi, si, idx: (bi, 0, si))
        seg_spec_hi = pl.BlockSpec(
            (block_b, 1, block_s), lambda bi, si, idx, n=n_blk: (bi, 0, si + n)
        )
        kv_spec = pl.BlockSpec(
            (None, block_b, hkv, block_s, d), lambda bi, si, idx: (idx[0], bi, 0, si, 0)
        )
        sc_lo = pl.BlockSpec(
            (None, block_b, hkv, block_s), lambda bi, si, idx: (idx[0], bi, 0, si)
        )
        sc_hi = pl.BlockSpec(
            (None, block_b, hkv, block_s),
            lambda bi, si, idx, n=n_blk: (idx[0], bi, 0, si + n),
        )
        kernel = functools.partial(
            _decode_kernel_int4_i8 if int4_i8dot else _decode_kernel_int4,
            scale=scale, hkv=hkv, g=gp, block_b=block_b,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                seg_spec_lo, seg_spec_hi,
                pl.BlockSpec((block_b, hq_p, d), lambda bi, si, idx: (bi, 0, 0)),
                kv_spec, kv_spec,
                sc_lo, sc_hi, sc_lo, sc_hi,
            ],
            out_specs=pl.BlockSpec((block_b, hq_p, d), lambda bi, si, idx: (bi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_b * hq_p, 128), jnp.float32),
                pltpu.VMEM((block_b * hq_p, 128), jnp.float32),
                pltpu.VMEM((block_b * hq_p, d), jnp.float32),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, hq_p, d), q.dtype),
            interpret=_interpret(),
        )(
            jnp.asarray(layer_idx, jnp.int32).reshape(1),
            seg3, seg3, q, k_cache, v_cache, k_scale, k_scale, v_scale, v_scale,
        )
        if gp != g:
            out = out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, hq, d)
        return out

    kernel = functools.partial(
        _decode_kernel, scale=scale, hkv=hkv, g=gp, block_b=block_b,
        quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((block_b, 1, block_s), lambda bi, si, idx: (bi, 0, si)),
        pl.BlockSpec((block_b, hq_p, d), lambda bi, si, idx: (bi, 0, 0)),
        pl.BlockSpec(
            (None, block_b, hkv, block_s, d), lambda bi, si, idx: (idx[0], bi, 0, si, 0)
        ),
        pl.BlockSpec(
            (None, block_b, hkv, block_s, d), lambda bi, si, idx: (idx[0], bi, 0, si, 0)
        ),
    ]
    args = [kv_seg.reshape(b, 1, s_max), q, k_cache, v_cache]
    if quantized:
        scale_spec = pl.BlockSpec(
            (None, block_b, hkv, block_s), lambda bi, si, idx: (idx[0], bi, 0, si)
        )
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, hq_p, d), lambda bi, si, idx: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_b * hq_p, 128), jnp.float32),
            pltpu.VMEM((block_b * hq_p, 128), jnp.float32),
            pltpu.VMEM((block_b * hq_p, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq_p, d), q.dtype),
        interpret=_interpret(),
    )(jnp.asarray(layer_idx, jnp.int32).reshape(1), *args)
    if gp != g:
        out = out.reshape(b, hkv, gp, d)[:, :, :g].reshape(b, hq, d)
    return out


# ---------------------------------------------------------------------------
# dispatch + XLA fallback
# ---------------------------------------------------------------------------


def _xla_decode(q, k_cache, v_cache, kv_seg, layer_idx, k_scale, v_scale, scale):
    """Reference path (CPU tests / ineligible shapes): slice the layer,
    dequantize, masked SDPA."""
    from ..models.qwen2_5_vl.text import _dequantize_kv, _unpack_kv4
    from .attention import xla_attention

    k_l = jax.lax.dynamic_index_in_dim(k_cache, layer_idx, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(v_cache, layer_idx, 0, keepdims=False)
    if k_cache.dtype == jnp.uint8:  # int4 split-half packed rows
        k_l = _unpack_kv4(k_l, seq_axis=2)
        v_l = _unpack_kv4(v_l, seq_axis=2)
    if k_scale is not None:
        ks = jax.lax.dynamic_index_in_dim(k_scale, layer_idx, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(v_scale, layer_idx, 0, keepdims=False)
        k_l = _dequantize_kv(k_l, ks, q.dtype)
        v_l = _dequantize_kv(v_l, vs, q.dtype)
    k_l = k_l.transpose(0, 2, 1, 3)  # (B, Hkv, S, D) -> (B, S, Hkv, D)
    v_l = v_l.transpose(0, 2, 1, 3)
    mask = (kv_seg != 0)[:, None, None, :]  # newest token sees every valid cell
    out = xla_attention(q[:, None].astype(k_l.dtype), k_l, v_l, mask=mask, scale=scale)
    return out[:, 0]


def _pick_block(s_max: int) -> Optional[int]:
    """Largest block dividing the cache length (cache buckets are multiples of
    128; e.g. 2304 -> 256). None = ineligible."""
    for b in (512, 384, 256, 128):
        if s_max % b == 0:
            return b
    return None


def _eligible(q, k_cache, block_s: Optional[int]) -> bool:
    if block_s is None:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, hq, d = q.shape
    _, _, hkv, s_max, _ = k_cache.shape
    return d == 128 and hq % hkv == 0


def decode_attention(
    q: jnp.ndarray,        # (B, Hq, D) — one new token per sequence
    k_cache: jnp.ndarray,  # (L, B, Hkv, S, D) int8 | bf16 (full layer stack)
    v_cache: jnp.ndarray,
    kv_seg: jnp.ndarray,   # (B, S) int32 — 1 = valid cache cell
    layer_idx,             # () int32 — which layer of the stack to attend
    k_scale: Optional[jnp.ndarray] = None,  # (L, B, Hkv, S) — int8 mode
    v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    backend: str = "auto",
    int4_i8dot: bool = False,
) -> jnp.ndarray:
    """Attention for one decode token against layer ``layer_idx`` of the
    stacked cache. Returns (B, Hq, D).

    ``int4_i8dot`` (int4 caches only, threaded from rollout.int4_i8dot):
    run both attention dots on the int8 MXU. The default int4 kernel is
    VPU-bound on its nibble->bf16 convert chain (4-5 lane ops/element —
    Mosaic has no direct u8->bf16 convert); this variant unpacks nibbles to
    INT8 lanes instead (widen + mask/shift + one narrow convert) and
    quantizes q and the softmax weights per row in-register, recovering
    exact magnitudes in the f32 score/output epilogues. Costs ~0.8% extra
    rounding on the behavior policy's logits (q and p int8 rounding; KV
    itself is already int4) — guarded by rollout/probs_diff_* like every
    rollout approximation."""
    d = q.shape[-1]
    scale = scale if scale is not None else d**-0.5
    block_s = _pick_block(k_cache.shape[3])
    if backend in ("auto", "pallas") and _eligible(q, k_cache, block_s):
        try:
            return _pallas_decode(
                q, k_cache, v_cache, kv_seg, layer_idx, k_scale, v_scale, scale, block_s,
                int4_i8dot=int4_i8dot and k_cache.dtype == jnp.uint8,
            )
        except Exception:
            if backend == "pallas":
                raise
    return _xla_decode(q, k_cache, v_cache, kv_seg, layer_idx, k_scale, v_scale, scale)
