"""Fused W8A8 matmul Pallas kernel: quantize -> int8 MXU dot -> dequant in one
pass over VMEM.

The production W8A8 path (ops/quant.py quantized_dot) is three XLA stages:
a per-token activation quantize (read bf16 x, write int8 + scales), the int8
dot (write int32), and a dequant epilogue (read int32, scale, write bf16).
Whatever XLA fuses, the int32 product tile and the quantized activation both
round-trip materialization points; on a chip measured at ~650 GB/s / ~180
effective int8 TOPS (see scripts/diag_int8_matmul.py) those passes are a
meaningful slice of prefill. This kernel keeps all three stages in VMEM:

- grid (M/bm, N/bn), N fastest: the x block (bm, K) bf16 loads once per m
  row-sweep; its int8 quantization + per-row scales are computed at n==0 and
  PERSIST in VMEM scratch across the n sweep (bm x K int8 + bm scales).
- weights stream as (K, bn) int8 blocks — HBM never sees bf16 weights.
- the dot runs int8 x int8 -> int32 on the MXU; the per-row activation scale
  and per-column weight scale fold into the f32 result in-register, and only
  the bf16 output tile is written.

Role in the reference stack: vLLM's CUDA w8a8 GEMM epilogue fusion
(/root/reference/verl/workers/rollout/vllm_rollout_spmd.py engages it via the
quantization knob); here it is the TPU-native equivalent for the rollout
prefill's decoder matmuls.

K must fit in VMEM alongside the blocks (K <= ~8192 at the default block
sizes) — true for every decoder matmul of the supported models (K = E or I).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel_resident_w(x_ref, w_ref, ws_ref, o_ref, *, bm, k, n):
    """Narrow-N variant: the whole int8 weight panel stays resident in VMEM
    and only x streams — grid (M/bm,). Measured per-shape on-chip: XLA's W8A8
    pipeline reaches ~276 eff TOPS on the wide gate_up matmul but only
    ~92-126 on the narrow qkv/o panels; with the panel resident the kernel is
    pure compute + one x-block DMA per step."""
    xf = x_ref[...].astype(jnp.float32)  # (bm, K)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.maximum(amax, _EPS) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bm, N) int32
    o_ref[...] = (
        acc.astype(jnp.float32) * xs * ws_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _kernel(x_ref, w_ref, ws_ref, o_ref, xq_scr, xs_scr, *, bm, bn, k):
    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _quantize_x():
        xf = x_ref[...].astype(jnp.float32)  # (bm, K)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        xs = jnp.maximum(amax, _EPS) / 127.0
        xq_scr[...] = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
        xs_scr[...] = jnp.broadcast_to(xs, (bm, 128))

    acc = jax.lax.dot_general(
        xq_scr[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bm, bn) int32
    scale = xs_scr[:, 0:1] * ws_ref[...].astype(jnp.float32)  # (bm,1)*(1,bn)
    o_ref[...] = (acc.astype(jnp.float32) * scale).astype(o_ref.dtype)


_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16M scoped limit


def _resident_bm(m: int, n: int, k: int):
    """Largest bm for the resident-W layout. The budget counts everything
    Mosaic puts in scoped VMEM: the panel, double-buffered x and out blocks,
    AND the kernel's live intermediates (f32 x copy, int8 quantized x, int32
    accumulator) — the compile-time scoped-vmem OOM counts those too."""
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m % bm:
            continue
        used = (
            k * n                    # resident int8 panel
            + 2 * (bm * k * 2)       # x block, double-buffered bf16
            + bm * k * 4 + bm * k    # f32 x intermediate + int8 quantized x
            + bm * n * 4             # int32 accumulator
            + 2 * (bm * n * 2)       # out block, double-buffered bf16
            + n * 4
        )
        if used <= _VMEM_BUDGET:
            return bm
    return None


def _pick_blocks(m: int, n: int, k: int):
    """Largest (bm, bn) for the streaming-W layout that divide (m, n) AND fit
    VMEM: double-buffered bf16 x block + its persistent int8 quantization +
    double-buffered weight and out blocks."""
    for bm in (512, 256, 128, 64, 32, 16, 8):
        if m % bm:
            continue
        for bn in (512, 256, 128):
            if n % bn:
                continue
            used = (
                2 * (bm * k * 2) + bm * k + bm * k * 4  # x blocks + quantize
                + 2 * (k * bn)                          # w blocks
                + bm * bn * 4 + 2 * (bm * bn * 2)       # acc + out blocks
            )
            if used <= _VMEM_BUDGET:
                return bm, bn
    return None, None


def _silu_quant_kernel(gu_ref, q_ref, s_ref, *, i):
    g = gu_ref[:, :i].astype(jnp.float32)
    u = gu_ref[:, i:].astype(jnp.float32)
    h = (g * jax.lax.logistic(g)) * u  # silu(g) * u, f32 (matches jax.nn.silu)
    amax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
    s = jnp.maximum(amax, _EPS) / 127.0
    q_ref[...] = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    s_ref[...] = jnp.broadcast_to(s, s_ref.shape)


def fused_silu_quantize(gu: jnp.ndarray):
    """SwiGLU junction fusion: (M, 2I) gate/up bf16 (gate columns first — the
    rollout tree's 2D gate_up layout, ops/quant.quantize_params) -> per-row
    int8 + f32 scales for the down matmul, in ONE pass over HBM.

    The XLA pipeline here is three+ passes (silu-mul write, amax read,
    scale-cast read+write — the per-token amax reduction forces the silu-mul
    product to materialize before the quantize can re-read it): ~0.9s of
    elementwise HBM traffic across a 2048-prompt batch-128 prefill at 3B
    shapes. Keeping the (bm, I) product in VMEM cuts the junction to the
    unavoidable gate/up read + the int8 write.

    The input MUST be natively 2D. A reshaped (M, 2, I) tensor hits a Mosaic
    relayout (sublane dim 2 of 8 -> ~4x read amplification) — measured 0.58x
    the XLA pipeline before the layout change.

    Returns (q (M, I) int8, scale (M, 1) f32) or None if the shape is
    ineligible (caller falls back to the XLA pipeline).
    """
    m, two_i = gu.shape
    i = two_i // 2
    if two_i % 256:  # both halves 128-aligned
        return None
    bm = None
    for cand in (128, 64, 32, 16, 8):
        if m % cand:
            continue
        used = (
            2 * (cand * two_i * 2)   # gu block, double-buffered bf16
            + 3 * (cand * i * 4)     # live f32 intermediates (g/u/h)
            + 2 * (cand * i)         # int8 out, double-buffered
            + 2 * (cand * 128 * 4)   # scale out
        )
        if used <= _VMEM_BUDGET:
            bm = cand
            break
    if bm is None:
        return None
    q, s = pl.pallas_call(
        functools.partial(_silu_quant_kernel, i=i),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, two_i), lambda mi: (mi, 0))],
        out_specs=[
            pl.BlockSpec((bm, i), lambda mi: (mi, 0)),
            pl.BlockSpec((bm, 128), lambda mi: (mi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, i), jnp.int8),
            jax.ShapeDtypeStruct((m, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(gu)
    return q, s[:, :1]


def fused_w8a8_matmul(
    x: jnp.ndarray,        # (M, K) bf16/f32
    qweight: jnp.ndarray,  # (K, N) int8
    wscale: jnp.ndarray,   # (N,) f32 per-output-column scales
    out_dtype=jnp.bfloat16,
) -> Optional[jnp.ndarray]:
    """Returns the (M, N) product, or None when the shape is ineligible for
    the kernel (caller falls back to the XLA pipeline)."""
    m, k = x.shape
    k2, n = qweight.shape
    assert k == k2, (x.shape, qweight.shape)
    if k % 128 != 0 or n % 128 != 0:
        return None

    bm = _resident_bm(m, n, k)
    if bm is not None:
        kernel = functools.partial(_kernel_resident_w, bm=bm, k=k, n=n)
        return pl.pallas_call(
            kernel,
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, k), lambda mi: (mi, 0)),
                pl.BlockSpec((k, n), lambda mi: (0, 0)),
                pl.BlockSpec((1, n), lambda mi: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bm, n), lambda mi: (mi, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
            interpret=_interpret(),
        )(x, qweight, wscale.reshape(1, n))

    bm, bn = _pick_blocks(m, n, k)
    if bm is None:
        return None
    kernel = functools.partial(_kernel, bm=bm, bn=bn, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((k, bn), lambda mi, ni: (0, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, qweight, wscale.reshape(1, n))
    return out
