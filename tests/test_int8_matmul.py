"""Fused W8A8 matmul kernel (ops/int8_matmul.py): interpret-mode numerics vs
the production XLA pipeline, block eligibility, and shape handling."""

import numpy as np

import jax
import jax.numpy as jnp

from spatialthinker_tpu.ops.int8_matmul import _pick_blocks, fused_w8a8_matmul
from spatialthinker_tpu.ops.quant import quantize_weight, quantized_dot


def _case(m, k, n, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.05, jnp.bfloat16)
    return x, quantize_weight(w, 0)


def test_matches_xla_pipeline():
    x, qw = _case(64, 256, 384)
    ref = np.asarray(quantized_dot(x, qw, 0), np.float32)
    got = fused_w8a8_matmul(x, qw["qvalue"], qw["scale"])
    assert got.dtype == jnp.bfloat16
    err = np.linalg.norm(np.asarray(got, np.float32) - ref) / np.linalg.norm(ref)
    # identical int8 math; only the epilogue rounding differs
    assert err < 2e-3, err


def test_multi_block_grid(monkeypatch):
    """m, n spanning several blocks: the persistent x-quantization scratch
    must refresh at each new m row-sweep (n == 0)."""
    # pin the reference to the int8 XLA pipeline — at m=1024 quantized_dot's
    # default large-m dispatch would dequantize instead (different rounding)
    monkeypatch.setenv("SPATIALTHINKER_PREFILL_DEQUANT_M", "0")
    x, qw = _case(1024, 128, 1024, seed=1)
    ref = np.asarray(quantized_dot(x, qw, 0), np.float32)
    got = np.asarray(fused_w8a8_matmul(x, qw["qvalue"], qw["scale"]), np.float32)
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 2e-3, err


def test_ineligible_shapes_return_none():
    x, qw = _case(60, 256, 384)  # m not divisible by any block
    assert fused_w8a8_matmul(x, qw["qvalue"], qw["scale"]) is None
    x, qw = _case(64, 200, 384)  # k not a multiple of 128
    assert fused_w8a8_matmul(x, qw["qvalue"], qw["scale"]) is None


def test_fused_silu_quantize_matches_reference():
    """Junction kernel (interpret mode): silu(gate)*up quantized per row ==
    the f32 reference computation."""
    from spatialthinker_tpu.ops.int8_matmul import fused_silu_quantize

    rng = np.random.default_rng(2)
    m, i = 64, 256
    gu = jnp.asarray(rng.normal(size=(m, 2 * i)).astype(np.float32), jnp.bfloat16)
    q, s = fused_silu_quantize(gu)
    assert q.shape == (m, i) and s.shape == (m, 1)
    g = np.asarray(gu[:, :i], np.float32)
    u = np.asarray(gu[:, i:], np.float32)
    h = (g / (1 + np.exp(-g))) * u
    s_ref = np.maximum(np.abs(h).max(axis=1, keepdims=True), 1e-8) / 127.0
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-5)
    q_ref = np.clip(np.round(h / s_ref), -127, 127)
    # f32 silu inside the kernel vs numpy: at most one quantization step apart
    assert np.abs(np.asarray(q, np.int32) - q_ref).max() <= 1


def test_fused_silu_quantize_ineligible():
    from spatialthinker_tpu.ops.int8_matmul import fused_silu_quantize

    gu = jnp.zeros((64, 2 * 192), jnp.bfloat16)  # halves not 128-aligned
    assert fused_silu_quantize(gu) is None


def test_pick_blocks_respects_vmem():
    bm, bn = _pick_blocks(65536, 2560, 2048)
    assert bm is not None and (bm * 2048 * 3) + 2 * 2048 * bn <= 12 * 1024 * 1024
    # down-proj K=11008 forces smaller blocks but stays eligible
    bm, bn = _pick_blocks(65536, 2048, 11008)
    assert bm is not None and (bm * 11008 * 3) + 2 * 11008 * bn <= 12 * 1024 * 1024
