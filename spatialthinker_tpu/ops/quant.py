"""W8A8 int8 quantization for the rollout path (vLLM quantization parity,
TPU-native).

The reference serves rollouts through vLLM, whose quantization knob trades
decode/prefill precision for throughput (/root/reference/verl/workers/rollout
/vllm_rollout_spmd.py builds the engine from rollout config). On TPU the same
trade rides the int8 MXU path: a v5e does 394 int8 TOPS vs 197 bf16 TFLOPS,
and int8 weights halve the per-decode-step HBM weight read — the two terms
that dominate prefill and decode respectively.

Scheme (SmoothQuant-style dynamic W8A8, no calibration):
- weights: symmetric per-output-channel int8, quantized once per rollout
  phase (the optimizer just rewrote the params);
- activations: symmetric per-token dynamic int8, computed inside the matmul
  (amax over the contraction dim);
- the dot runs int8 x int8 -> int32 on the MXU (``preferred_element_type``),
  then folds both scales into the fp32 result. No dequantized weight copy
  ever exists: HBM sees int8 reads only.

The decoder-stack matmuls (qkv/o/gate_up/down) quantize W8A8, and the
embedding/logit head quantizes per-vocab-row int8 (gathers dequantize rows;
the tied head runs the same int8 MXU dot) — at 3B the bf16 head alone was a
620MB HBM read every decode step, ~7% of the step's bandwidth floor. Norms
and the vision tower stay bf16 (negligible bytes, precision-sensitive).

Training numerics are untouched: old/ref log-probs are recomputed by the
bf16 training graph (grpo_trainer.compute_log_probs_batched), so the int8
engine only plays the behavior policy — the same contract as serving fp8
rollouts from vLLM while training in bf16.

A quantized weight is represented as the pytree node
``{"qvalue": int8 (..., K at axis, ...), "scale": f32 (w.shape minus K)}``;
the consuming matmul helpers in models/qwen2_5_vl/text.py dispatch on it.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_EPS = 1e-8


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "qvalue" in w


def quantize_weight(w: jnp.ndarray, contract_axis: int) -> Dict[str, jnp.ndarray]:
    """Symmetric per-output-channel int8: one scale per slice of the
    contraction axis. ``scale`` keeps the weight's non-contracted dims in
    order — exactly the broadcast the int32 dot result needs."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=contract_axis)
    scale = jnp.maximum(a, _EPS) / 127.0
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / jnp.expand_dims(scale, contract_axis)),
        -127, 127,
    ).astype(jnp.int8)
    return {"qvalue": q, "scale": scale}


def quantize_activation(x: jnp.ndarray):
    """Symmetric per-token (last-dim) dynamic int8. Returns (q, scale (..., 1))."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(a, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _prefill_dequant_min_m() -> int:
    """m threshold above which a quantized matmul dequantizes its weight and
    runs the bf16 MXU path instead of W8A8 (0 = disabled, the DEFAULT).

    Measured OFF (2026-08, v5e, 3B flagship rows-group b=8 x p=6144, int4 KV,
    scripts/diag_prefill_dtype.py): the W8A8 prefill forward runs 1850 ms
    (147 matmul-eff-TOPS, 75% of bf16 peak) vs 2443 ms for this dequant path
    (112) and 2533 ms for a plain bf16 tree (108) — at prefill shapes the int8
    MXU path is ~32% FASTER than bf16 dots, so dequantizing can only lose.
    Kept as an opt-in escape hatch for future hardware where the bf16/int8
    ratio flips: above the threshold numerics get slightly more accurate
    (weight-rounding error only, no activation quantization), i.e.
    rollout/probs_diff_* drift shrinks."""
    import os

    return int(os.environ.get("SPATIALTHINKER_PREFILL_DEQUANT_M", "0"))


def dequantize_weight(qw: Dict[str, jnp.ndarray], contract_axis: int,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    return qw["qvalue"].astype(dtype) * jnp.expand_dims(
        qw["scale"], contract_axis
    ).astype(dtype)


def quantized_dot(x: jnp.ndarray, qw: Dict[str, jnp.ndarray], contract_axis: int,
                  out_dtype=None) -> jnp.ndarray:
    """x (..., K) @ qw (K at ``contract_axis``) with both operands int8 on the
    MXU. Output shape = x's lead dims + qw's non-contracted dims in order
    (matches einsum "...k,<pre>k<post>-><pre><post>").

    Prefill-scale m (see _prefill_dequant_min_m) dequantizes the weight and
    runs the bf16 dot instead — same output contract, higher eff-TOPS."""
    import math

    out_dtype = out_dtype if out_dtype is not None else x.dtype
    min_m = _prefill_dequant_min_m()
    if min_m and math.prod(x.shape[:-1]) >= min_m:
        w = dequantize_weight(qw, contract_axis, jnp.bfloat16)
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w,
            (((x.ndim - 1,), (contract_axis,)), ((), ())),
        )
        return acc.astype(out_dtype)
    xq, xs = quantize_activation(x)
    acc = jax.lax.dot_general(
        xq, qw["qvalue"],
        (((x.ndim - 1,), (contract_axis,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    n_free = qw["qvalue"].ndim - 1
    xs = xs.reshape(*xs.shape[:-1], *([1] * n_free))
    return (acc.astype(jnp.float32) * xs * qw["scale"]).astype(out_dtype)


def prequantized_dot(xq: jnp.ndarray, xs: jnp.ndarray, qw: Dict[str, jnp.ndarray],
                     contract_axis: int, out_dtype) -> jnp.ndarray:
    """quantized_dot for an activation that is ALREADY int8 (+ per-row scale
    (..., 1)): just the MXU dot and the scale-folding epilogue."""
    acc = jax.lax.dot_general(
        xq, qw["qvalue"],
        (((xq.ndim - 1,), (contract_axis,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    n_free = qw["qvalue"].ndim - 1
    xs = xs.reshape(*xs.shape[:-1], *([1] * n_free))
    return (acc.astype(jnp.float32) * xs * qw["scale"]).astype(out_dtype)


def fused_silu_quant_dot(gu: jnp.ndarray, qdown: Dict[str, jnp.ndarray],
                         out_dtype) -> jnp.ndarray | None:
    """SwiGLU tail for the quantized rollout tree: fuse silu(gate)*up with the
    down-proj's per-token activation quantize in one Pallas pass
    (ops/int8_matmul.fused_silu_quantize), then run the int8 down dot on the
    pre-quantized rows. ``gu`` is (..., 2I), gate columns first — the rollout
    tree's 2D gate_up layout. Returns None when ineligible (XLA fallback).
    SPATIALTHINKER_FUSED_SILU=0 disables; =force enables off-TPU (interpret
    mode, for tests)."""
    import math
    import os

    mode = os.environ.get("SPATIALTHINKER_FUSED_SILU", "1")
    if mode == "0":
        return None
    if mode != "force" and jax.default_backend() != "tpu":
        return None
    lead = gu.shape[:-1]
    m = math.prod(lead)
    # decode steps (m = lanes) are HBM-floor-bound on weights, not the
    # junction — keep the XLA path there
    if m < 1024 or m % 8:
        return None
    min_m = _prefill_dequant_min_m()
    if min_m and m >= min_m:
        # prefill-dequant mode: the down dot runs bf16 (quantized_dot's
        # large-m dispatch), so the int8 junction would only re-quantize —
        # fall through to silu + linear, which XLA fuses around the bf16 dot
        return None
    from .int8_matmul import fused_silu_quantize

    out = fused_silu_quantize(gu.reshape(m, gu.shape[-1]))
    if out is None:
        return None
    xq, xs = out
    res = prequantized_dot(xq, xs, qdown, 0, out_dtype)
    return res.reshape(*lead, *res.shape[1:])


def w4_swiglu(p: Params, x: jnp.ndarray, out_dtype) -> jnp.ndarray | None:
    """Decode-path SwiGLU on the int4 MLP copies (ops/int4_mlp.py): int4
    gate_up + silu junction in one kernel, int4 down with in-kernel per-token
    quantize. Returns None when ineligible (prefill-scale m, odd shapes, or
    off-TPU) — caller falls back to the int8 path. SPATIALTHINKER_W4=0
    disables; =force enables off-TPU (interpret mode, for tests)."""
    import math
    import os

    mode = os.environ.get("SPATIALTHINKER_W4", "1")
    if mode == "0":
        return None
    if mode != "force" and jax.default_backend() != "tpu":
        return None
    lead = x.shape[:-1]
    m = math.prod(lead)
    from .int4_mlp import w4_gateup_silu, w4_matmul

    h = w4_gateup_silu(x.reshape(m, x.shape[-1]), p["gate_up_w4"])
    if h is None:
        return None
    out = w4_matmul(h, p["down_w4"], out_dtype=out_dtype)
    if out is None:
        return None
    return out.reshape(*lead, out.shape[-1])


def embed_rows(w, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Embedding-table row gather, quantized or plain transparently. For an
    int8 table the gathered rows dequantize in registers (rows x E multiplies
    — negligible next to the HBM the int8 table saves). ``dtype`` is the
    model's compute dtype (callers pass e.g. norm-param dtype so fp32 test
    models stay fp32); plain tables keep their own dtype."""
    if is_quantized(w):
        rows = jnp.take(w["qvalue"], ids, axis=0).astype(dtype)
        return rows * jnp.take(w["scale"], ids, axis=0)[..., None].astype(dtype)
    return jnp.take(w, ids, axis=0)


def linear(x: jnp.ndarray, w, contract_axis: int = 0, out_dtype=None) -> jnp.ndarray:
    """The decoder stack's one matmul entry point: x (..., K) contracted with
    w's ``contract_axis`` — quantized or bf16 transparently."""
    if is_quantized(w):
        return quantized_dot(x, w, contract_axis, out_dtype=out_dtype)
    ndim = getattr(w, "ndim", None)
    if contract_axis == 0 and ndim == 2:
        return jnp.dot(x, w)
    # general case: same dimension-number layout as the quantized path
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (contract_axis,)), ((), ()))
    )


# ---------------------------------------------------------------------------
# param-tree quantization
# ---------------------------------------------------------------------------

def _pick_w4_group(k: int) -> int | None:
    for g in (128, 64, 32, 16, 8):
        if k % (2 * g) == 0:
            return g
    return None


def quantize_params(params: Params, mode: str = "int8") -> Params:
    """bf16 param pytree -> rollout pytree with the text decoder-stack matmul
    weights as int8 {"qvalue", "scale"} nodes (everything else untouched,
    shared by reference — no copy). Jit this: the whole pass is one read of
    the stacks, negligible next to a single prefill.

    ``mode="w4a8"`` additionally derives int4 group-quantized DECODE copies of
    the MLP weights (``gate_up_w4``/``down_w4``, ops/int4_mlp.py): decode
    steps stream half the MLP weight bytes while prefill keeps the int8 MXU
    path. Costs one extra ~I*E*1.5 bytes/layer of HBM (~1.2GB at 3B) — the
    classic memory-for-bandwidth trade vLLM makes with AWQ/GPTQ checkpoints."""
    out = {k: v for k, v in params.items()}
    text = dict(params["text"])
    layers = {k: (dict(v) if isinstance(v, dict) else v) for k, v in text["layers"].items()}
    # gate_up re-lays out 2D (L, E, 2I), gate columns first: the rollout
    # forward consumes it as ONE wide (E, 2I) matmul whose (m, 2I) output
    # feeds the Pallas silu->quantize junction kernel directly — the training
    # tree's (L, 2, E, I) batched form would hand the kernel a (m, 2, I)
    # intermediate whose Mosaic relayout (sublane dim 2 of 8) costs ~4x the
    # junction's read traffic. One transposed copy per rollout phase.
    #
    # The whole decoder-stack quantize runs PER-LAYER under lax.map (scan):
    # quantizing the stacked (L, ...) leaves whole materializes fp32 temps of
    # the full stacks — three ~6GB gate_up copies at 3B/w4a8 — which OOMs a
    # 16GB chip before any rollout work starts. Per-layer, the temps are
    # L times smaller and the pass is still one read of the stacks.
    gu_stack = layers["mlp"]["gate_up_proj"]  # (L, 2, E, I)
    _, _, e, i = gu_stack.shape
    g_e, g_i = _pick_w4_group(e), _pick_w4_group(i)
    want_w4 = mode == "w4a8" and g_e is not None and g_i is not None

    def _one_layer(leaves):
        qkv, o, down, gu = leaves  # per-layer: leading L stripped -> axes -1
        q = {
            "qkv_proj": quantize_weight(qkv, 1),   # (Hkv, E, G) contract E
            "o_proj": quantize_weight(o, 0),       # (H*D, E)    contract H*D
            "down_proj": quantize_weight(down, 0), # (I, E)      contract I
        }
        gu2 = jnp.transpose(gu, (1, 0, 2)).reshape(e, 2 * i)
        q["gate_up_proj"] = quantize_weight(gu2, 0)
        if want_w4:
            from .int4_mlp import pack_int4_grouped

            q["gate_up_w4"] = pack_int4_grouped(gu2, 0, group=g_e)
            q["down_w4"] = pack_int4_grouped(down, 0, group=g_i)
        return q

    stacked = jax.lax.map(_one_layer, (
        layers["self_attn"]["qkv_proj"], layers["self_attn"]["o_proj"],
        layers["mlp"]["down_proj"], gu_stack,
    ))
    layers["self_attn"] = dict(layers["self_attn"])
    layers["self_attn"]["qkv_proj"] = stacked["qkv_proj"]
    layers["self_attn"]["o_proj"] = stacked["o_proj"]
    mlp = dict(layers["mlp"])
    mlp["down_proj"] = stacked["down_proj"]
    mlp["gate_up_proj"] = stacked["gate_up_proj"]
    if want_w4:
        mlp["gate_up_w4"] = stacked["gate_up_w4"]
        mlp["down_w4"] = stacked["down_w4"]
    layers["mlp"] = mlp
    text["layers"] = layers
    # embedding/head: per-vocab-row scales serve both the row gather (dequant
    # rows) and the tied logit head (contract E = axis 1 -> scale (V,) per
    # output column); an untied lm_head (E, V) contracts axis 0 likewise
    text["embed_tokens"] = quantize_weight(text["embed_tokens"], 1)
    if "lm_head" in text:
        text["lm_head"] = quantize_weight(text["lm_head"], 0)
    out["text"] = text
    return out
