"""int4 packed KV cache (dense engine): split-half nibble layout write/read
round-trips, decode-attention numerics, engine-level generation, config
validation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.models.qwen2_5_vl import get_config
from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
from spatialthinker_tpu.models.qwen2_5_vl.text import (
    KVCache,
    _pack_nibbles,
    _quantize_kv4,
    _unpack_kv4,
    _update_kv4,
)
from spatialthinker_tpu.ops.decode_attention import decode_attention


def test_update_unpack_round_trip_static():
    """Static writes (chunked prefill): tokens spanning the half boundary
    land in the right nibbles and unpack back exactly."""
    L, B, H, S, D = 2, 2, 2, 16, 8
    half = S // 2
    arr = jnp.zeros((L, B, H, half, D), jnp.uint8)
    rng = np.random.default_rng(0)
    full = jnp.asarray(rng.integers(-7, 8, size=(B, H, S, D)), jnp.int8)
    # write in two chunks: [0, 6) and [6, 16) — the second straddles half=8
    arr = _update_kv4(arr, full[:, :, :6], 1, 0)
    arr = _update_kv4(arr, full[:, :, 6:], 1, 6)
    got = _unpack_kv4(arr[1], seq_axis=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(full))
    # layer 0 untouched
    assert (np.asarray(arr[0]) == 0).all()


def test_update_traced_single_token():
    """Traced single-token decode writes hit low and high nibbles correctly
    and leave the paired token's nibble intact."""
    L, B, H, S, D = 1, 1, 1, 8, 8
    half = S // 2
    rng = np.random.default_rng(1)
    tok = jnp.asarray(rng.integers(-7, 8, size=(B, H, 1, D)), jnp.int8)
    tok2 = jnp.asarray(rng.integers(-7, 8, size=(B, H, 1, D)), jnp.int8)

    @jax.jit
    def write(arr, q4, pos):
        return _update_kv4(arr, q4, jnp.asarray(0), pos)

    arr = jnp.zeros((L, B, H, half, D), jnp.uint8)
    arr = write(arr, tok, jnp.asarray(1))       # low nibble, row 1
    arr = write(arr, tok2, jnp.asarray(half + 1))  # high nibble, SAME row
    toks = np.asarray(_unpack_kv4(arr[0], seq_axis=2))
    np.testing.assert_array_equal(toks[:, :, 1], np.asarray(tok)[:, :, 0])
    np.testing.assert_array_equal(toks[:, :, half + 1], np.asarray(tok2)[:, :, 0])
    # untouched cells hold byte 0 = biased -8 (never read unmasked: engines
    # gate on segment ids/length and their scales are 0)
    assert (toks[:, :, 0] == -8).all() and (toks[:, :, 2] == -8).all()


def test_decode_attention_int4_matches_dequant():
    """int4 decode attention (XLA fallback path on CPU) == attention over the
    explicitly dequantized cache."""
    from spatialthinker_tpu.ops.attention import xla_attention

    L, B, Hkv, S, D = 2, 4, 2, 256, 128
    hq = 4
    rng = np.random.default_rng(2)
    kv = rng.normal(size=(2, L, B, Hkv, S, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(B, hq, D)).astype(np.float32), jnp.bfloat16)
    seg = (rng.random((B, S)) < 0.7).astype(np.int32)
    seg[:, :4] = 1

    kq, ks = _quantize_kv4(jnp.asarray(kv[0]))
    vq, vs = _quantize_kv4(jnp.asarray(kv[1]))
    half = S // 2
    kp = _pack_nibbles(kq[:, :, :, :half], kq[:, :, :, half:])
    vp = _pack_nibbles(vq[:, :, :, :half], vq[:, :, :, half:])

    out = decode_attention(
        q, kp, vp, jnp.asarray(seg), jnp.asarray(1), ks, vs
    )
    # reference: dequantized int4 cache through plain masked attention
    k_ref = (kq[1].astype(np.float32) * np.asarray(ks[1], np.float32)[..., None])
    v_ref = (vq[1].astype(np.float32) * np.asarray(vs[1], np.float32)[..., None])
    mask = (seg != 0)[:, None, None, :]
    ref = xla_attention(
        q[:, None].astype(jnp.float32),
        jnp.asarray(k_ref).transpose(0, 2, 1, 3),
        jnp.asarray(v_ref).transpose(0, 2, 1, 3),
        mask=jnp.asarray(mask),
    )[:, 0]
    err = np.linalg.norm(np.asarray(out, np.float32) - np.asarray(ref)) / (
        np.linalg.norm(np.asarray(ref)) + 1e-9
    )
    assert err < 2e-2, err


def test_pallas_int4_kernel_interpret_matches_xla():
    """The int4 Pallas kernel (interpret mode) == the XLA fallback: two
    online-softmax updates per packed block reproduce token-order softmax."""
    from spatialthinker_tpu.ops.decode_attention import _pallas_decode, _xla_decode

    L, B, Hkv, S, D = 2, 4, 2, 512, 128
    hq = 4
    rng = np.random.default_rng(6)
    kv = rng.normal(size=(2, L, B, Hkv, S, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(B, hq, D)).astype(np.float32), jnp.bfloat16)
    seg = (rng.random((B, S)) < 0.6).astype(np.int32)
    seg[:, :4] = 1

    kq, ks = _quantize_kv4(jnp.asarray(kv[0]))
    vq, vs = _quantize_kv4(jnp.asarray(kv[1]))
    half = S // 2
    kp = _pack_nibbles(kq[:, :, :, :half], kq[:, :, :, half:])
    vp = _pack_nibbles(vq[:, :, :, :half], vq[:, :, :, half:])
    scale = D**-0.5

    got = _pallas_decode(
        q, kp, vp, jnp.asarray(seg), jnp.asarray(1), ks, vs, scale, block_s=128
    )
    ref = _xla_decode(q, kp, vp, jnp.asarray(seg), jnp.asarray(1), ks, vs, scale)
    err = np.linalg.norm(np.asarray(got, np.float32) - np.asarray(ref, np.float32)) / (
        np.linalg.norm(np.asarray(ref, np.float32)) + 1e-9
    )
    assert err < 2e-2, err


def test_pallas_int4_i8dot_variant_matches_xla():
    """The int8-MXU int4 kernel variant (q + softmax weights quantized
    in-register, nibbles unpacked to int8 lanes) stays within its expected
    rounding envelope of the exact XLA fallback."""
    from spatialthinker_tpu.ops.decode_attention import _pallas_decode, _xla_decode

    L, B, Hkv, S, D = 2, 4, 2, 512, 128
    hq = 4
    rng = np.random.default_rng(7)
    kv = rng.normal(size=(2, L, B, Hkv, S, D)).astype(np.float32)
    q = jnp.asarray(rng.normal(size=(B, hq, D)).astype(np.float32), jnp.bfloat16)
    seg = (rng.random((B, S)) < 0.6).astype(np.int32)
    seg[:, :4] = 1

    kq, ks = _quantize_kv4(jnp.asarray(kv[0]))
    vq, vs = _quantize_kv4(jnp.asarray(kv[1]))
    half = S // 2
    kp = _pack_nibbles(kq[:, :, :, :half], kq[:, :, :, half:])
    vp = _pack_nibbles(vq[:, :, :, :half], vq[:, :, :, half:])
    scale = D**-0.5

    got = _pallas_decode(
        q, kp, vp, jnp.asarray(seg), jnp.asarray(1), ks, vs, scale, block_s=128,
        int4_i8dot=True,
    )
    ref = _xla_decode(q, kp, vp, jnp.asarray(seg), jnp.asarray(1), ks, vs, scale)
    err = np.linalg.norm(np.asarray(got, np.float32) - np.asarray(ref, np.float32)) / (
        np.linalg.norm(np.asarray(ref, np.float32)) + 1e-9
    )
    # int4 KV rounding (shared with the default kernel) + q/p int8 rounding
    assert err < 3e-2, err


@pytest.mark.parametrize("chunk,n", [(0, 1), (8, 1), (0, 2)])
def test_generate_int4_kv(chunk, n):
    """Tiny-model dense-engine rollout with the packed int4 cache: output
    contract holds for unchunked, chunked (straddling the half boundary), and
    grouped (prompt-KV repack + fanout) paths."""
    from spatialthinker_tpu.rollout.engine import generate
    from spatialthinker_tpu.rollout.sampling import SamplingParams

    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    b, p = 2, 16
    ids = jnp.asarray(rng.integers(1, 900, size=(b, p), dtype=np.int32))
    seg = jnp.ones((b, p), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None, None], (3, b, p))
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)

    out = generate(
        params, cfg, ids, seg, pos, jnp.full((b,), p, jnp.int32),
        max_new_tokens=8, sampling=sampling, key=jax.random.key(4),
        kv_cache_dtype=jnp.uint8, prefill_chunk=chunk, n=n,
    )
    assert out.responses.shape == (b * n, 8)
    resp = np.asarray(out.responses)
    mask = np.asarray(out.response_mask)
    assert ((resp == cfg.pad_token_id) | (mask == 1)).all()

    # int4 KV responses track the bf16-cache greedy rollout closely on the
    # first tokens (same prompt KV up to 4-bit quantization)
    greedy = SamplingParams(temperature=0.0, top_p=1.0, top_k=-1)
    out4 = generate(
        params, cfg, ids, seg, pos, jnp.full((b,), p, jnp.int32),
        max_new_tokens=4, sampling=greedy, key=jax.random.key(5),
        kv_cache_dtype=jnp.uint8, prefill_chunk=chunk, n=1,
    )
    outf = generate(
        params, cfg, ids, seg, pos, jnp.full((b,), p, jnp.int32),
        max_new_tokens=4, sampling=greedy, key=jax.random.key(5),
        prefill_chunk=chunk, n=1,
    )
    agree = (np.asarray(out4.responses[:, 0]) == np.asarray(outf.responses[:, 0])).mean()
    assert agree >= 0.5, agree  # 4-bit drift allowed, not garbage


def test_int4_config_validation():
    from spatialthinker_tpu.core.config import PPOConfig, _merge_into

    cfg = PPOConfig()
    _merge_into(cfg, {"worker": {"rollout": {"kv_cache_dtype": "int4"}}})
    cfg.post_init()  # dense engine: accepted
    ok = PPOConfig()
    _merge_into(ok, {"worker": {"rollout": {"kv_cache_dtype": "int4",
                                            "name": "continuous",
                                            "page_size": 0}}})
    ok.post_init()  # continuous engine (dense slots): accepted
    bad = PPOConfig()
    _merge_into(bad, {"worker": {"rollout": {"kv_cache_dtype": "int4",
                                             "name": "continuous",
                                             "page_size": 128}}})
    with pytest.raises(ValueError, match="paged"):
        bad.post_init()


def test_continuous_engine_int4_kv():
    """Continuous-engine rollout with the packed int4 slot cache: per-slot
    nibble writes at heterogeneous lengths + grouped prompt-KV fanout."""
    from spatialthinker_tpu.rollout.continuous import generate_continuous

    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    rng = np.random.default_rng(8)
    b, p = 4, 16
    lens = [16, 12, 10, 16]
    ids = np.zeros((b, p), np.int32)
    seg = np.zeros((b, p), np.int32)
    for i, ln in enumerate(lens):  # left-padded ragged prompts
        ids[i, p - ln:] = rng.integers(1, 900, size=ln)
        seg[i, p - ln:] = 1
    pos = np.broadcast_to(np.arange(p, dtype=np.int32)[None, None], (3, b, p))
    from spatialthinker_tpu.rollout.sampling import SamplingParams

    out = generate_continuous(
        params, cfg, ids, seg, pos, np.asarray(lens, np.int32),
        max_new_tokens=6,
        sampling=SamplingParams(temperature=1.0, top_p=1.0, top_k=-1),
        key=jax.random.key(9), slots=4, decode_chunk_size=2,
        kv_cache_dtype=jnp.uint8, group_n=2,
    )
    assert out.responses.shape == (b * 2, 6)
    resp = np.asarray(out.responses)
    mask = np.asarray(out.response_mask)
    assert ((resp == cfg.pad_token_id) | (mask == 1)).all()


def test_kvcache_init_int4_shapes():
    c = KVCache.init(2, 3, 64, 2, 16, dtype=jnp.uint8)
    assert c.k.shape == (2, 3, 2, 32, 16) and c.k.dtype == jnp.uint8
    assert c.k_scale.shape == (2, 3, 2, 64)
    assert len(c.arrays()) == 4


def test_int4_grouped_fanout_matches_duplicated_prompts():
    """The width-repack + lane-fanout path is numerically inert: grouped
    greedy decode (n=2) == n=1 over the same prompts duplicated by hand —
    responses AND per-step log-probs."""
    from spatialthinker_tpu.rollout.engine import generate
    from spatialthinker_tpu.rollout.sampling import SamplingParams

    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    rng = np.random.default_rng(11)
    b, p, r = 2, 16, 6
    ids = rng.integers(1, 900, size=(b, p), dtype=np.int32)
    seg = np.ones((b, p), np.int32)
    pos = np.broadcast_to(np.arange(p, dtype=np.int32)[None, None], (3, b, p))
    greedy = SamplingParams(temperature=0.0, top_p=1.0, top_k=-1)

    grouped = generate(
        params, cfg, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), max_new_tokens=r, sampling=greedy,
        key=jax.random.key(7), kv_cache_dtype=jnp.uint8, n=2,
    )
    dup = np.repeat(ids, 2, axis=0)
    flat = generate(
        params, cfg, jnp.asarray(dup), jnp.asarray(np.repeat(seg, 2, axis=0)),
        jnp.asarray(np.repeat(pos, 2, axis=1)),
        jnp.full((2 * b,), p, jnp.int32), max_new_tokens=r, sampling=greedy,
        key=jax.random.key(7), kv_cache_dtype=jnp.uint8, n=1,
    )
    np.testing.assert_array_equal(np.asarray(grouped.responses), np.asarray(flat.responses))
    mask = np.asarray(grouped.response_mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(grouped.rollout_log_probs)[mask],
        np.asarray(flat.rollout_log_probs)[mask],
        rtol=2e-3, atol=2e-3,
    )
