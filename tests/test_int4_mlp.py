"""W4A8 decode-MLP kernels (ops/int4_mlp.py): packing round-trip, kernel
numerics vs the XLA reference contract (interpret mode), eligibility."""

import numpy as np

import jax
import jax.numpy as jnp

from spatialthinker_tpu.ops.int4_mlp import (
    GROUP,
    pack_int4_grouped,
    w4_gateup_silu,
    w4_matmul,
    w4_reference,
)


def _w(shape, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


def test_pack_round_trip():
    """pack -> unpack reproduces the clipped/rounded int4 grid exactly."""
    k, n = 2 * GROUP * 2, 128
    w = _w((k, n))
    p = pack_int4_grouped(w, 0)
    assert p["q4"].shape == (k // 2, n) and p["q4"].dtype == jnp.uint8
    assert p["gscale"].shape == (k // GROUP, n)
    pu = np.asarray(p["q4"]).astype(np.int32)  # biased storage (value + 8)
    low = (pu & 15) - 8
    high = (pu >> 4) - 8
    q = np.concatenate([low, high], axis=0)
    assert q.min() >= -7 and q.max() <= 7
    gs = np.repeat(np.asarray(p["gscale"]), GROUP, axis=0)
    err = np.abs(q * gs - np.asarray(w))
    # quantization error bounded by half a step per element
    assert (err <= gs / 2 + 1e-6).all()


def test_pack_stacked_axis():
    """Stacked (L, K, N) weights pack along axis 1 (the per-layer contract)."""
    w = _w((3, 2 * GROUP, 96), seed=1)
    p = pack_int4_grouped(w, 1)
    assert p["q4"].shape == (3, GROUP, 96)
    assert p["gscale"].shape == (3, 2, 96)
    # per-layer slice == packing that layer alone
    p0 = pack_int4_grouped(w[1], 0)
    np.testing.assert_array_equal(np.asarray(p["q4"][1]), np.asarray(p0["q4"]))


def test_w4_matmul_matches_reference():
    m, k, n = 16, 2 * GROUP, 256
    x = _w((m, k), seed=2, scale=1.0).astype(jnp.bfloat16)
    w4 = pack_int4_grouped(_w((k, n), seed=3), 0)
    got = w4_matmul(x, w4)
    assert got is not None and got.shape == (m, n)
    ref = w4_reference(x, w4)
    err = np.linalg.norm(np.asarray(got, np.float32) - np.asarray(ref)) / (
        np.linalg.norm(np.asarray(ref)) + 1e-9
    )
    assert err < 2e-3, err  # identical int math; bf16 output rounding only


def test_w4_matmul_close_to_exact():
    """int4 g128 quantization error on gaussian weights stays small."""
    m, k, n = 16, 4 * GROUP, 128
    x = _w((m, k), seed=4, scale=1.0)
    w = _w((k, n), seed=5)
    w4 = pack_int4_grouped(w, 0)
    exact = np.asarray(jnp.dot(x, w))
    got = np.asarray(w4_reference(x, w4))
    err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    # int4 g128 on gaussian data: ~11% per-weight RMS (step = amax/7 with
    # amax ~ 2.7 sigma over a 128 group) — the dot preserves the ratio. Real
    # checkpoints fare better (outlier-light channels); this pins the scheme,
    # not model quality.
    assert err < 0.15, err


def test_w4_gateup_silu_matches_reference():
    m, e, i = 16, 2 * GROUP, 256
    x = _w((m, e), seed=6, scale=1.0).astype(jnp.bfloat16)
    gu = _w((e, 2 * i), seed=7)
    gu4 = pack_int4_grouped(gu, 0)
    got = w4_gateup_silu(x, gu4)
    assert got is not None and got.shape == (m, i)
    full = np.asarray(w4_reference(x, gu4), np.float32)
    g, u = full[:, :i], full[:, i:]
    ref = (g / (1 + np.exp(-g))) * u
    err = np.linalg.norm(np.asarray(got, np.float32) - ref) / np.linalg.norm(ref)
    assert err < 5e-3, err


def test_ineligible_returns_none():
    w4 = pack_int4_grouped(_w((2 * GROUP, 128)), 0)
    assert w4_matmul(_w((1024, 2 * GROUP)).astype(jnp.bfloat16), w4) is None  # m too big
    assert w4_matmul(_w((11, 2 * GROUP)).astype(jnp.bfloat16), w4) is None   # m odd


def test_w4a8_param_tree_and_generate():
    """quantize_params(mode='w4a8') adds the int4 MLP decode copies; a tiny
    forced-W4 rollout keeps the output contract and stays correlated with the
    int8 engine's logits."""
    import jax

    from spatialthinker_tpu.models.qwen2_5_vl import get_config
    from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
    from spatialthinker_tpu.ops.quant import quantize_params
    from spatialthinker_tpu.rollout.engine import generate
    from spatialthinker_tpu.rollout.sampling import SamplingParams

    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    qp = quantize_params(params, mode="w4a8")
    mlp = qp["text"]["layers"]["mlp"]
    ell = params["text"]["layers"]["mlp"]["gate_up_proj"].shape[0]
    e = cfg.text.hidden_size
    i = cfg.text.intermediate_size
    assert mlp["gate_up_w4"]["q4"].shape == (ell, e // 2, 2 * i)
    assert mlp["gate_up_w4"]["q4"].dtype == jnp.uint8
    assert mlp["down_w4"]["q4"].shape == (ell, i // 2, e)

    rng = np.random.default_rng(7)
    b, p = 2, 16
    ids = jnp.asarray(rng.integers(1, 900, size=(b, p), dtype=np.int32))
    seg = jnp.ones((b, p), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None, None], (3, b, p))
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)
    import os

    os.environ["SPATIALTHINKER_W4"] = "force"
    try:
        out = generate(
            qp, cfg, ids, seg, pos, jnp.full((b,), p, jnp.int32),
            max_new_tokens=4, sampling=sampling, key=jax.random.key(3),
        )
    finally:
        os.environ.pop("SPATIALTHINKER_W4", None)
    assert out.responses.shape == (b, 4)
    resp = np.asarray(out.responses)
    mask = np.asarray(out.response_mask)
    assert ((resp == cfg.pad_token_id) | (mask == 1)).all()
