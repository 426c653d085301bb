"""W4A8 decode-MLP Pallas kernels: int4 group-quantized weights streamed from
HBM, int8 per-token activations, silu junction fused.

Why: a decode step is an HBM read of weights + KV. With int8 weights the 3B
decoder stack is ~3.1GB/step, of which the MLP (gate_up + down) is ~79%.
Group-quantized int4 (AWQ/GPTQ-style: symmetric per (128-row group, output
column) scales) halves the MLP's weight bytes; at the long-context bench
shape that is ~20% off the decode step's bandwidth floor. Prefill stays on
the int8 XLA path (prefill is MXU-bound; int4 would add unpack work where
compute, not bytes, is the limit) — the int4 copy is DECODE-ONLY and lives
alongside the int8 tree (ops/quant.py quantize_params(wq="w4a8")).

Kernel shapes (m = decode lanes, small):
- ``w4_gateup_silu``: x (m, E) -> h (m, I) bf16. Grid over I-panels; each
  program streams the gate and up int4 panels for its columns, runs the
  16 per-group int8 MXU dots each, and writes silu(g)*u directly — the
  (m, 2I) gate/up intermediate never exists.
- ``w4_matmul`` (down): h (m, I) -> out (m, E). Grid over E-panels with the
  per-token int8 quantization of h computed once and persisted in VMEM.

int4 packing is split-half along the contraction axis: byte row r holds row
r's value in the LOW nibble and row r + K/2's in the HIGH nibble, so unpack
is two arithmetic shifts + a sublane concat (no interleave). K/2 must be a
multiple of the group size (128) — true for E=2048... and I=11008 shapes.

Reference role: vLLM serves AWQ/GPTQ int4 checkpoints through the same
rollout.quantization surface (/root/reference/verl/workers/rollout/
vllm_rollout_spmd.py builds the engine from rollout config); here the int4
weights are derived on-device from the live bf16 params each rollout phase —
no calibration file, same symmetric-group scheme.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
GROUP = 128
BIAS = 8  # stored nibble = value + 8 (see pack_int4_grouped)
_VMEM_BUDGET = 14 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# packing (host/jit side, once per rollout phase)
# ---------------------------------------------------------------------------


def pack_int4_grouped(w: jnp.ndarray, contract_axis: int, group: int = GROUP):
    """Symmetric int4 with per-(group rows, output column) scales.

    w (..., K at contract_axis, ...) -> {"q4": uint8 (..., K/2, ...),
    "gscale": f32 (..., K/group, ...)}. Split-half packing: byte row r =
    (row r | row r + K/2 << 4). K must be a multiple of 2*group.
    """
    k = w.shape[contract_axis]
    assert k % (2 * group) == 0, (k, group)
    wf = w.astype(jnp.float32)
    # group amax: reshape K -> (K/group, group) at the contract axis
    shape = list(w.shape)
    shape[contract_axis:contract_axis + 1] = [k // group, group]
    amax = jnp.max(jnp.abs(wf.reshape(shape)), axis=contract_axis + 1)
    gscale = jnp.maximum(amax, _EPS) / 7.0
    q = jnp.clip(
        jnp.round(wf / jnp.repeat(gscale, group, axis=contract_axis)), -7, 7
    ).astype(jnp.int8)
    low = jax.lax.slice_in_dim(q, 0, k // 2, axis=contract_axis)
    high = jax.lax.slice_in_dim(q, k // 2, k, axis=contract_axis)
    as_u8 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint8)
    # BIASED storage (value + 8, unsigned [1, 15]): the kernels unpack with
    # just & 15 / >> 4 and recover the -8 in the dot epilogue — same trick
    # as the KV cache (models/qwen2_5_vl/text._pack_nibbles)
    bias = jnp.int8(BIAS)
    packed = (as_u8(low + bias) & jnp.uint8(0xF)) | (as_u8(high + bias) << 4)
    return {"q4": packed, "gscale": gscale}


def nibble_i32(p_u8: jnp.ndarray, which: int) -> jnp.ndarray:
    """Sign-extended int4 nibble (``which``: 0 = low, 1 = high) of a packed
    uint8 array, as int32. ALL in-kernel nibble math runs in i32: Mosaic
    cannot legalize sub-32-bit vector shifts (arith.shli on vector<...xi8>
    fails to lower on v5e), so the classic ``(i8 << 4) >> 4`` sign-extend is
    interpret-mode-only. i32 lane ops are the native width."""
    x = p_u8.astype(jnp.int32)
    n = (x & 15) if which == 0 else (x >> 4)
    return n - ((n & 8) << 1)


def nibble_u4(p_u8: jnp.ndarray, which: int) -> jnp.ndarray:
    """UNSIGNED int4 nibble as i32 — for BIASED storage (value + 8, see
    models/qwen2_5_vl/text._pack_nibbles). Two lane ops per element instead
    of the five of a sign-extend; the consumer folds the -8 into its dot
    epilogue (q.(u-8) = q.u - 8*sum(q))."""
    x = p_u8.astype(jnp.int32)
    return (x & 15) if which == 0 else (x >> 4)


def _group_dots(xq, p_ref, gscale_f32, n_groups: int, group: int):
    """sum_g dot_int8(xq[:, g], w[g]) * gscale[g] -> (m, bn) f32.

    ``p_ref`` is the PACKED (K/2, bn) uint8 block REF; each group's rows load
    and unpack on the fly, so only a (group, bn) temp lives at once. Loading
    (or unpacking) the whole panel first overflows the 16M scoped VMEM at
    K=11008 (the 3B down-proj: measured 17.06M — u8 elements expand to 32-bit
    vector lanes once materialized in registers). Split-half packing puts
    group g < n_groups/2 in the LOW nibbles of packed rows [g*group, ...)
    and the rest in the HIGH nibbles of the same row range."""
    acc = jnp.zeros((xq.shape[0], p_ref.shape[1]), jnp.float32)
    half_groups = n_groups // 2
    for gi in range(half_groups):
        rows = slice(gi * group, (gi + 1) * group)
        p = p_ref[rows]
        # both nibbles of this row range back to back: interleaving them 43
        # iterations apart keeps every low-half load live until its high-half
        # twin — the whole packed block pinned in 32-bit vregs at once
        for which, g in ((0, gi), (1, gi + half_groups)):
            xg = xq[:, g * group:(g + 1) * group]
            # UNSIGNED unpack of the biased weights; the -BIAS is recovered
            # from the dot: x.(w-b) = x.w - b*sum(x) (per-group row sums)
            w = nibble_u4(p, which).astype(jnp.int8)
            d = jax.lax.dot_general(
                xg, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
            acc = acc + (d - BIAS * xsum).astype(jnp.float32) * gscale_f32[g]
    return acc


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _quantize_rows(xf):
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.maximum(amax, _EPS) / 127.0
    return jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8), xs


def _gateup_kernel(x_ref, gq_ref, gs_ref, uq_ref, us_ref, h_ref,
                   xq_scr, xs_scr, *, k, group):
    @pl.when(pl.program_id(0) == 0)
    def _qx():
        xq, xs = _quantize_rows(x_ref[...].astype(jnp.float32))
        xq_scr[...] = xq
        xs_scr[...] = jnp.broadcast_to(xs, xs_scr.shape)

    n_groups = k // group
    xq = xq_scr[...]
    xs = xs_scr[:, 0:1]
    g_acc = _group_dots(xq, gq_ref, gs_ref[...].astype(jnp.float32), n_groups, group)
    u_acc = _group_dots(xq, uq_ref, us_ref[...].astype(jnp.float32), n_groups, group)
    g = g_acc * xs
    u = u_acc * xs
    h_ref[...] = ((g * jax.lax.logistic(g)) * u).astype(h_ref.dtype)


def _matmul_kernel(x_ref, wq_ref, ws_ref, o_ref, xq_scr, xs_scr, *, k, group):
    @pl.when(pl.program_id(0) == 0)
    def _qx():
        xq, xs = _quantize_rows(x_ref[...].astype(jnp.float32))
        xq_scr[...] = xq
        xs_scr[...] = jnp.broadcast_to(xs, xs_scr.shape)

    acc = _group_dots(
        xq_scr[...], wq_ref, ws_ref[...].astype(jnp.float32),
        k // group, group,
    )
    o_ref[...] = (acc * xs_scr[:, 0:1]).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def _eligible_m(m: int, k: int) -> bool:
    # persistent x scratch (int8 + f32 copy during quantize) must fit VMEM;
    # m blocks are always dim-equal (full m), so Mosaic's second-minor rule
    # only needs the same %2 the decode-attention kernel's batch contract has
    return 0 < m <= 512 and (m % 2 == 0) and m * k <= 8 * 1024 * 1024


def _pick_bn(m: int, k: int, n: int, streams: int) -> Optional[int]:
    """Largest 128-multiple panel width whose blocks fit VMEM: `streams`
    double-buffered int4 panels + scales, the unpacked int8 copy, the f32
    accumulator, and the persistent x scratch."""
    for bn in (1024, 512, 256, 128):
        if n % bn:
            continue
        used = (
            m * k + m * 128 * 4              # xq scratch + scales
            + m * k * 4                      # f32 x during quantize
            + streams * (2 * (k // 2) * bn)  # packed panels (double-buffered)
            + streams * (2 * (k // GROUP) * bn * 4)   # gscale blocks
            # per-group on-the-fly unpack temps (i32 + i8 per live group; a
            # few live at once under Mosaic's scheduler): see _group_dots
            + streams * (4 * GROUP * bn * 5)
            + streams * (m * bn * 4)         # f32 accumulators
            + 2 * (m * bn * 2)               # out block
        )
        if used <= _VMEM_BUDGET:
            return bn
    return None


def w4_gateup_silu(x: jnp.ndarray, gu4: dict) -> Optional[jnp.ndarray]:
    """x (m, E) @ int4 gate_up (2D rollout layout: columns [gate | up], each
    I wide) -> silu(gate)*up (m, I) bf16. None if ineligible."""
    m, k = x.shape
    q4, gs = gu4["q4"], gu4["gscale"]        # (E/2, 2I), (E/group, 2I)
    i = q4.shape[1] // 2
    group = k // gs.shape[0]
    if not _eligible_m(m, k) or k % (2 * group) or i % 128 or group % 8:
        return None
    bn = _pick_bn(m, k, i, streams=2)
    if bn is None:
        return None
    kernel = functools.partial(_gateup_kernel, k=k, group=group)
    return pl.pallas_call(
        kernel,
        grid=(i // bn,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0)),
            pl.BlockSpec((k // 2, bn), lambda j: (0, j)),             # gate q4
            pl.BlockSpec((k // group, bn), lambda j: (0, j)),         # gate scale
            pl.BlockSpec((k // 2, bn), lambda j, i_=i // bn: (0, j + i_)),   # up q4
            pl.BlockSpec((k // group, bn), lambda j, i_=i // bn: (0, j + i_)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, i), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((m, k), jnp.int8),
            pltpu.VMEM((m, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, q4, gs, q4, gs)


def w4_matmul(x: jnp.ndarray, w4: dict, out_dtype=jnp.bfloat16) -> Optional[jnp.ndarray]:
    """x (m, K) @ int4 w (K, N) with per-token int8 activation quantize in
    VMEM. None if ineligible."""
    m, k = x.shape
    q4, gs = w4["q4"], w4["gscale"]          # (K/2, N), (K/group, N)
    n = q4.shape[1]
    group = k // gs.shape[0]
    if not _eligible_m(m, k) or k % (2 * group) or n % 128 or group % 8:
        return None
    bn = _pick_bn(m, k, n, streams=1)
    if bn is None:
        return None
    kernel = functools.partial(_matmul_kernel, k=k, group=group)
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0)),
            pl.BlockSpec((k // 2, bn), lambda j: (0, j)),
            pl.BlockSpec((k // group, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((m, k), jnp.int8),
            pltpu.VMEM((m, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, q4, gs)


def w4_reference(x: jnp.ndarray, w4: dict, out_dtype=jnp.float32) -> jnp.ndarray:
    """XLA fallback with identical numerics contract (per-token int8
    activations x per-group int4 weights): used off-TPU and in tests."""
    k = x.shape[-1]
    group = k // w4["gscale"].shape[0]
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, _EPS) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    p = w4["q4"].astype(jnp.int32)  # biased storage: unbias after extract
    w_int8 = jnp.concatenate(
        [(p & 15) - BIAS, (p >> 4) - BIAS], axis=0
    ).astype(jnp.int8)
    acc = jnp.zeros((*x.shape[:-1], w4["q4"].shape[1]), jnp.float32)
    for g in range(k // group):
        sl = slice(g * group, (g + 1) * group)
        d = jax.lax.dot_general(
            xq[..., sl], w_int8[sl],
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + d.astype(jnp.float32) * w4["gscale"][g].astype(jnp.float32)
    return (acc * xs).astype(out_dtype)
