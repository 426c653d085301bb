"""Decode-attention kernel tests: Pallas (interpret mode on CPU) vs the XLA
fallback, bf16 and int8-with-scales, GQA group padding, masked rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatialthinker_tpu.models.qwen2_5_vl.text import _quantize_kv
from spatialthinker_tpu.ops.decode_attention import _pallas_decode, _xla_decode, decode_attention


def _make_case(b, hq, hkv, s, d, quantized, seed=0, holes=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, hq, d)).astype(np.float32), jnp.bfloat16)
    L = 3
    k = jnp.asarray(rng.normal(size=(L, b, hkv, s, d)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L, b, hkv, s, d)).astype(np.float32), jnp.bfloat16)
    # valid prefix per row (left-pad hole in row 0 to exercise masking)
    seg = np.ones((b, s), np.int32)
    seg[:, s - s // 4 :] = 0  # unwritten decode tail
    if holes:
        seg[0, : s // 4] = 0  # left padding
    seg = jnp.asarray(seg)
    scales = (None, None)
    if quantized:
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        k, v, scales = kq, vq, (ks, vs)
    return q, k, v, seg, scales


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("hq,hkv", [(16, 2), (14, 2)])  # G=8 exact, G=7 padded
def test_pallas_decode_matches_xla(quantized, hq, hkv):
    b, s, d = 3, 256, 128
    q, k, v, seg, scales = _make_case(b, hq, hkv, s, d, quantized)
    for layer_idx in (0, 2):
        ref = _xla_decode(q, k, v, seg, jnp.int32(layer_idx), *scales, scale=d**-0.5)
        got = _pallas_decode(
            q, k, v, seg, jnp.int32(layer_idx), *scales, scale=d**-0.5, block_s=128
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
        )


def test_fully_masked_row_emits_zeros():
    b, hq, hkv, s, d = 2, 16, 2, 256, 128
    q, k, v, seg, scales = _make_case(b, hq, hkv, s, d, False, holes=False)
    seg = seg.at[1].set(0)  # slot with no valid cells (e.g. trash slot)
    out = _pallas_decode(q, k, v, seg, jnp.int32(0), None, None, d**-0.5, 128)
    assert np.all(np.asarray(out[1], np.float32) == 0.0)


def test_dispatch_uses_xla_on_cpu():
    """decode_attention must be correct on CPU (fallback) — smoke the entry."""
    b, hq, hkv, s, d = 2, 4, 2, 64, 32
    q, k, v, seg, scales = _make_case(b, hq, hkv, s, d, False)
    out = decode_attention(q, k, v, seg, jnp.int32(1))
    assert out.shape == (b, hq, d)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_int8_close_to_bf16_through_kernel():
    b, hq, hkv, s, d = 2, 16, 2, 256, 128
    q, kb, vb, seg, _ = _make_case(b, hq, hkv, s, d, False, seed=3)
    _, ki, vi, _, scales = _make_case(b, hq, hkv, s, d, True, seed=3)
    ref = _pallas_decode(q, kb, vb, seg, jnp.int32(1), None, None, d**-0.5, 128)
    got = _pallas_decode(q, ki, vi, seg, jnp.int32(1), *scales, scale=d**-0.5, block_s=128)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=6e-2, rtol=6e-2
    )


def test_pick_block_divides_cache_len():
    from spatialthinker_tpu.ops.decode_attention import _pick_block

    assert _pick_block(2304) == 384  # prompt 2048 + gen 256 (2304 = 6 * 384)
    assert _pick_block(8192) == 512  # flagship 6144 + 2048
    assert _pick_block(384) == 384
    assert _pick_block(100) is None


def test_pallas_covers_non_512_multiple_cache():
    """Regression: cache lengths not divisible by 512 must still be covered
    exactly (an earlier floor-division grid silently dropped the tail)."""
    b, hq, hkv, s, d = 2, 16, 2, 640, 128  # 640 = 5 * 128
    q, k, v, seg, scales = _make_case(b, hq, hkv, s, d, False, holes=False)
    seg = jnp.ones((b, s), jnp.int32)  # tail cells are LIVE
    ref = _xla_decode(q, k, v, seg, jnp.int32(1), None, None, d**-0.5)
    got = _pallas_decode(q, k, v, seg, jnp.int32(1), None, None, d**-0.5, 128)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )
