"""W8A8 rollout quantization (ops/quant.py): numerics of the quantized dot,
param-tree structure, engine parity on the tiny model, and config wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.models.qwen2_5_vl import get_config
from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
from spatialthinker_tpu.ops.quant import (
    is_quantized,
    linear,
    quantize_params,
    quantize_weight,
    quantized_dot,
)


def test_quantized_dot_close_to_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 96, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.05)
    exact = np.asarray(jnp.dot(x, w))
    q = np.asarray(quantized_dot(x, quantize_weight(w, 0), 0, out_dtype=jnp.float32))
    # symmetric 8-bit weight+activation: ~1% relative error on gaussian data
    err = np.linalg.norm(q - exact) / np.linalg.norm(exact)
    assert err < 0.02, err


def test_quantized_dot_middle_contract_axis():
    """The fused-QKV layout: w (Hkv, E, G) contracted on E (axis 1)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 32, 16)).astype(np.float32) * 0.05)
    exact = np.asarray(jnp.einsum("bse,gef->bsgf", x, w))
    q = np.asarray(quantized_dot(x, quantize_weight(w, 1), 1, out_dtype=jnp.float32))
    assert q.shape == exact.shape
    err = np.linalg.norm(q - exact) / np.linalg.norm(exact)
    assert err < 0.02, err
    # bf16 path of the same entry point matches einsum exactly
    lin = np.asarray(linear(x, w, contract_axis=1))
    np.testing.assert_allclose(lin, exact, rtol=1e-5, atol=1e-5)


def test_quantize_params_structure():
    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    qparams = quantize_params(params)
    jax.jit(quantize_params)(params)  # jittable (the trainer jits it)

    layers = qparams["text"]["layers"]
    for group, name in (
        ("self_attn", "qkv_proj"), ("self_attn", "o_proj"),
        ("mlp", "gate_up_proj"), ("mlp", "down_proj"),
    ):
        node = layers[group][name]
        assert is_quantized(node)
        assert node["qvalue"].dtype == jnp.int8
        orig = params["text"]["layers"][group][name]
        if (group, name) == ("mlp", "gate_up_proj"):
            # rollout tree re-lays gate_up out 2D (L, E, 2I), gate cols first
            ell, _, e, i = orig.shape
            assert node["qvalue"].shape == (ell, e, 2 * i)
            assert node["scale"].shape == (ell, 2 * i)
        else:
            assert node["qvalue"].shape == orig.shape
    # embedding/head quantizes per-vocab-row (serves gather AND tied head)
    emb = qparams["text"]["embed_tokens"]
    assert is_quantized(emb) and emb["qvalue"].dtype == jnp.int8
    assert emb["qvalue"].shape == params["text"]["embed_tokens"].shape
    assert emb["scale"].shape == (cfg.text.vocab_size,)
    if "lm_head" in params["text"]:
        assert is_quantized(qparams["text"]["lm_head"])
    # everything else untouched (same arrays, not copies)
    assert qparams["vision"] is params["vision"]
    assert layers["self_attn"]["qkv_bias"] is params["text"]["layers"]["self_attn"]["qkv_bias"]
    # original tree is untouched (no in-place mutation)
    assert not is_quantized(params["text"]["layers"]["self_attn"]["qkv_proj"])


def test_quantized_generate_close_and_contract():
    """Tiny-model rollout with the int8 tree: same output contract, logits of
    the prefill step highly correlated with bf16 (the behavior-policy drift
    the importance ratio absorbs is small)."""
    from spatialthinker_tpu.models.qwen2_5_vl.model import forward
    from spatialthinker_tpu.models.qwen2_5_vl.text import logits_from_hidden
    from spatialthinker_tpu.rollout.engine import generate
    from spatialthinker_tpu.rollout.sampling import SamplingParams

    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    qparams = quantize_params(params)

    rng = np.random.default_rng(2)
    b, p = 2, 16
    ids = jnp.asarray(rng.integers(1, 900, size=(b, p), dtype=np.int32))
    seg = jnp.ones((b, p), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None, None], (3, b, p))

    hid_bf, _ = forward(params, cfg, ids, pos, segment_ids=seg)
    hid_q, _ = forward(qparams, cfg, ids, pos, segment_ids=seg)
    log_bf = np.asarray(logits_from_hidden(params["text"], hid_bf[:, -1:], cfg.text)).ravel()
    log_q = np.asarray(logits_from_hidden(qparams["text"], hid_q[:, -1:], cfg.text)).ravel()
    corr = np.corrcoef(log_bf, log_q)[0, 1]
    assert corr > 0.98, corr

    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)
    out = generate(
        qparams, cfg, ids, seg, pos, jnp.full((b,), p, jnp.int32),
        max_new_tokens=8, sampling=sampling, key=jax.random.key(3),
    )
    assert out.responses.shape == (b, 8)
    assert out.response_mask.shape == (b, 8)
    # pad after EOS contract holds
    resp = np.asarray(out.responses)
    mask = np.asarray(out.response_mask)
    assert ((resp == cfg.pad_token_id) | (mask == 1)).all()


def test_quantized_swiglu_2d_layout_matches_3d():
    """The rollout tree's 2D (E, 2I) gate_up layout == quantizing the training
    (2, E, I) form: same per-column grid, same math, columns just re-ordered."""
    from spatialthinker_tpu.models.qwen2_5_vl.text import swiglu_mlp

    rng = np.random.default_rng(4)
    e, i = 64, 128
    gu3 = jnp.asarray(rng.normal(size=(2, e, i)).astype(np.float32) * 0.05)
    down = jnp.asarray(rng.normal(size=(i, e)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(3, 8, e)).astype(np.float32))

    p3 = {"gate_up_proj": quantize_weight(gu3, 1), "down_proj": quantize_weight(down, 0)}
    gu2 = jnp.transpose(gu3, (1, 0, 2)).reshape(e, 2 * i)
    p2 = {"gate_up_proj": quantize_weight(gu2, 0), "down_proj": quantize_weight(down, 0)}
    out3 = np.asarray(swiglu_mlp(p3, x))
    out2 = np.asarray(swiglu_mlp(p2, x))
    np.testing.assert_allclose(out2, out3, rtol=2e-5, atol=2e-5)


def test_fused_silu_quant_dot_matches_fallback(monkeypatch):
    """Forced fused junction (interpret mode) == the XLA fallback of the same
    2D layout, up to the f32-vs-compute-dtype silu difference."""
    from spatialthinker_tpu.models.qwen2_5_vl.text import swiglu_mlp

    rng = np.random.default_rng(5)
    e, i = 64, 128
    m = 1024  # >= the fused path's m gate
    gu2 = jnp.asarray(rng.normal(size=(e, 2 * i)).astype(np.float32) * 0.05)
    down = jnp.asarray(rng.normal(size=(i, e)).astype(np.float32) * 0.05)
    p = {"gate_up_proj": quantize_weight(gu2, 0), "down_proj": quantize_weight(down, 0)}
    x = jnp.asarray(rng.normal(size=(m, e)).astype(np.float32), jnp.bfloat16)

    # disable the large-m dequant dispatch: this test pins the int8 junction
    # kernel against the int8 XLA fallback at prefill-scale m
    monkeypatch.setenv("SPATIALTHINKER_PREFILL_DEQUANT_M", "0")
    monkeypatch.setenv("SPATIALTHINKER_FUSED_SILU", "0")
    ref = np.asarray(swiglu_mlp(p, x), np.float32)
    monkeypatch.setenv("SPATIALTHINKER_FUSED_SILU", "force")
    got = np.asarray(swiglu_mlp(p, x), np.float32)
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # the kernel computes silu in f32 where the fallback rounds h to the
    # compute dtype before quantizing: one int8 grid step apart -> ~1%
    assert err < 2e-2, err


def test_prefill_dequant_dispatch(monkeypatch):
    """Above the m threshold quantized_dot runs the dequantized bf16 path:
    closer to the exact product than W8A8 (weight rounding only, no activation
    quantization), same output contract on both contract-axis layouts."""
    from spatialthinker_tpu.ops.quant import fused_silu_quant_dot

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2048, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.05)
    qw = quantize_weight(w, 0)
    exact = np.asarray(jnp.dot(x, w), np.float32)

    monkeypatch.setenv("SPATIALTHINKER_PREFILL_DEQUANT_M", "1024")
    deq = np.asarray(quantized_dot(x, qw, 0, out_dtype=jnp.float32))
    monkeypatch.setenv("SPATIALTHINKER_PREFILL_DEQUANT_M", "0")
    w8a8 = np.asarray(quantized_dot(x, qw, 0, out_dtype=jnp.float32))

    err_deq = np.linalg.norm(deq - exact) / np.linalg.norm(exact)
    err_w8a8 = np.linalg.norm(w8a8 - exact) / np.linalg.norm(exact)
    assert err_deq < 0.01, err_deq
    assert err_deq < err_w8a8  # weight-only error < weight+activation error

    # middle contract axis (fused-QKV layout) takes the same dispatch
    monkeypatch.setenv("SPATIALTHINKER_PREFILL_DEQUANT_M", "1024")
    x3 = jnp.asarray(rng.normal(size=(32, 64, 32)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(3, 32, 16)).astype(np.float32) * 0.05)
    got = np.asarray(quantized_dot(x3, quantize_weight(w3, 1), 1, out_dtype=jnp.float32))
    exact3 = np.asarray(jnp.einsum("bse,gef->bsgf", x3, w3), np.float32)
    err3 = np.linalg.norm(got - exact3) / np.linalg.norm(exact3)
    assert got.shape == exact3.shape and err3 < 0.01, err3

    # the int8 silu junction steps aside in dequant mode (the down dot runs
    # bf16, so the junction's int8 re-quantize would only add error)
    monkeypatch.setenv("SPATIALTHINKER_FUSED_SILU", "force")
    gu = jnp.asarray(rng.normal(size=(2048, 256)).astype(np.float32), jnp.bfloat16)
    qdown = quantize_weight(jnp.asarray(rng.normal(size=(128, 64)), jnp.float32), 0)
    assert fused_silu_quant_dot(gu, qdown, jnp.bfloat16) is None
    monkeypatch.setenv("SPATIALTHINKER_PREFILL_DEQUANT_M", "0")
    assert fused_silu_quant_dot(gu, qdown, jnp.bfloat16) is not None


def test_rollout_quantization_config_wiring():
    from spatialthinker_tpu.core.config import PPOConfig, _merge_into

    cfg = PPOConfig()
    _merge_into(cfg, {"worker": {"rollout": {"quantization": "int8"}}})
    cfg.post_init()  # accepts int8
    bad = PPOConfig()
    _merge_into(bad, {"worker": {"rollout": {"quantization": "fp8"}}})
    with pytest.raises(ValueError, match="quantization"):
        bad.post_init()
