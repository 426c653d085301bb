"""Paged rollout engine: page-table attention kernel semantics, greedy parity
with the dense engine, prompt-page sharing under grouped sampling, budgeted
admission with preempt-and-requeue, and int8 page pools."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.models.qwen2_5_vl.params import params_from_hf_state_dict
from spatialthinker_tpu.rollout.engine import generate
from spatialthinker_tpu.rollout.paged import generate_paged
from spatialthinker_tpu.rollout.sampling import SamplingParams

torch = pytest.importorskip("torch")
from tests.test_model_golden import make_hf_model, CFG as GOLD_CFG


@pytest.fixture(scope="module")
def jax_params():
    hf = make_hf_model()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    return params_from_hf_state_dict(state, GOLD_CFG, dtype=jnp.float32)


def _prompts(rng, b, p):
    input_ids = rng.integers(5, 900, size=(b, p), dtype=np.int32)
    seg = np.ones((b, p), dtype=np.int32)
    pos = np.tile(np.arange(p, dtype=np.int32)[None, None], (3, b, 1))
    gen_start = np.full((b,), p, dtype=np.int32)
    return input_ids, seg, pos, gen_start


# ---------------------------------------------------------------------------
# kernel semantics (interpret mode) vs the XLA gather fallback
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_kernel_matches_fallback(quantized):
    from spatialthinker_tpu.ops.paged_attention import _pallas_paged, _xla_paged

    rng = np.random.default_rng(0)
    L, N, hkv, page, d = 2, 9, 2, 128, 128
    s_slots, hq = 4, 4
    if quantized:
        k_pool = jnp.asarray(rng.integers(-127, 127, size=(L, N, hkv, page, d), dtype=np.int32), jnp.int8)
        v_pool = jnp.asarray(rng.integers(-127, 127, size=(L, N, hkv, page, d), dtype=np.int32), jnp.int8)
        k_scale = jnp.asarray(rng.uniform(0.001, 0.02, size=(L, N, hkv, page)).astype(np.float32), jnp.bfloat16)
        v_scale = jnp.asarray(rng.uniform(0.001, 0.02, size=(L, N, hkv, page)).astype(np.float32), jnp.bfloat16)
    else:
        k_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)).astype(np.float32))
        v_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)).astype(np.float32))
        k_scale = v_scale = None
    q = jnp.asarray(rng.normal(size=(s_slots, hq, d)).astype(np.float32))
    # each slot points at 2 distinct pages; dummy page 0 beyond length
    table = np.zeros((s_slots, 3), dtype=np.int32)
    table[:, 0] = [1, 3, 5, 7]
    table[:, 1] = [2, 4, 6, 8]
    lengths = jnp.asarray([200, 128, 37, 256], jnp.int32)
    layer_idx = jnp.asarray(1, jnp.int32)

    out_k, m_k, l_k = _pallas_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                    layer_idx, k_scale, v_scale, d**-0.5)
    out_x, m_x, l_x = _xla_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                 layer_idx, k_scale, v_scale, d**-0.5)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), rtol=3e-3, atol=3e-3)
    # partial-softmax stats (staging-ring merge contract); l sums bf16-dot
    # exps so its tolerance is a notch looser than the normalized output's
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x), rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_x), rtol=6e-3, atol=3e-3)


def test_paged_kernel_slot_blocking_pads_ragged_slot_count(monkeypatch):
    """block_s slots per program: a slot count that doesn't divide block_s
    pads with zero-length dummy slots (page-table 0) that are fetched, fully
    masked, and dropped from the output."""
    from spatialthinker_tpu.ops.paged_attention import _pallas_paged, _xla_paged

    monkeypatch.setenv("SPATIALTHINKER_PAGED_BS", "4")
    rng = np.random.default_rng(7)
    L, N, hkv, page, d = 2, 14, 2, 128, 128
    s_slots, hq = 6, 4  # 6 % 4 != 0 -> padded to 8
    k_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)).astype(np.float32))
    v_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(s_slots, hq, d)).astype(np.float32))
    table = np.zeros((s_slots, 2), dtype=np.int32)
    table[:, 0] = [1, 3, 5, 7, 9, 11]
    table[:, 1] = [2, 4, 6, 8, 10, 12]
    lengths = jnp.asarray([200, 128, 37, 256, 1, 190], jnp.int32)
    layer_idx = jnp.asarray(1, jnp.int32)
    out_k, m_k, l_k = _pallas_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                    layer_idx, None, None, d**-0.5)
    out_x, m_x, l_x = _xla_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                 layer_idx, None, None, d**-0.5)
    assert out_k.shape == (s_slots, hq, d)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x), rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_x), rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), rtol=3e-3, atol=3e-3)


def test_paged_kernel_zero_length_slot_emits_zeros():
    from spatialthinker_tpu.ops.paged_attention import _pallas_paged

    rng = np.random.default_rng(1)
    L, N, hkv, page, d = 1, 3, 1, 128, 128
    q = jnp.asarray(rng.normal(size=(2, 2, d)).astype(np.float32))
    k_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)).astype(np.float32))
    v_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)).astype(np.float32))
    table = jnp.asarray([[1, 2], [0, 0]], jnp.int32)
    lengths = jnp.asarray([150, 0], jnp.int32)
    out, _, l_stat = _pallas_paged(q, k_pool, v_pool, table, lengths, jnp.asarray(0), None, None, d**-0.5)
    np.testing.assert_allclose(np.asarray(l_stat)[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[1], 0.0, atol=1e-6)
    assert np.abs(np.asarray(out)[0]).max() > 0


# ---------------------------------------------------------------------------
# engine parity + admission behavior
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fuse_staged", [False, True])
def test_paged_matches_dense_greedy(jax_params, fuse_staged):
    rng = np.random.default_rng(0)
    b, p, r = 6, 8, 6
    ids, seg, pos, gs = _prompts(rng, b, p)

    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    paged = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=2, decode_chunk_size=2, page_size=4,
        fuse_staged=fuse_staged,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), paged.responses)
    np.testing.assert_array_equal(np.asarray(dense.response_mask), paged.response_mask)
    mask = paged.response_mask.astype(bool)
    np.testing.assert_allclose(
        paged.rollout_log_probs[mask], np.asarray(dense.rollout_log_probs)[mask],
        rtol=2e-3, atol=2e-3,
    )


def test_paged_left_padded_prompts_compact(jax_params):
    """Left padding never reaches the pages: compaction gathers only valid
    cells, so outputs equal the dense engine on ragged prompts."""
    rng = np.random.default_rng(12)
    b, p, r = 4, 8, 5
    ids, seg, pos, gs = _prompts(rng, b, p)
    for i, pad in ((0, 3), (2, 5), (3, 1)):
        ids[i, pad:] = ids[i, : p - pad]
        ids[i, :pad] = 0
        seg[i, :pad] = 0
        pos[:, i, pad:] = pos[:, i, : p - pad]
        gs[i] = p - pad

    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(5),
    )
    paged = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(5), slots=2, decode_chunk_size=3, page_size=4,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), paged.responses)
    # log-probs depend on every cached token: catches KV placement bugs the
    # near-degenerate tiny model's constant responses cannot (see int4 test)
    mask = np.asarray(dense.response_mask).astype(bool)
    np.testing.assert_allclose(
        paged.rollout_log_probs[mask], np.asarray(dense.rollout_log_probs)[mask],
        rtol=2e-3, atol=2e-3,
    )


def test_paged_grouped_shares_prompt_pages(jax_params):
    """group_n>1 refcounts the prompt's full pages across lanes: outputs match
    the dense grouped engine, and peak page use is well under n full copies."""
    rng = np.random.default_rng(23)
    b, p, r, n = 4, 8, 6, 2
    ids, seg, pos, gs = _prompts(rng, b, p)

    paged = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=4, decode_chunk_size=2, page_size=4, group_n=n,
    )
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), n=n,
    )
    assert paged.responses.shape == (b * n, r)
    np.testing.assert_array_equal(paged.responses, np.asarray(dense.responses))
    mask = np.asarray(dense.response_mask).astype(bool)
    np.testing.assert_allclose(
        paged.rollout_log_probs[mask], np.asarray(dense.rollout_log_probs)[mask],
        rtol=2e-3, atol=2e-3,
    )
    # 2 groups resident at once; prompt 8 = 2 full pages SHARED by 2 lanes +
    # per-lane tails/growth. Unshared would need >= 2 groups * 2 lanes * 2
    # prompt pages = 8 prompt pages alone.
    assert paged.stats["peak_pages"] < 2 * n * (p // 4) + 2 * n * 2


def test_paged_preemption_requeues_and_completes(jax_params):
    """A pool too small for every admitted sequence's growth preempts the
    youngest group (recompute) and still completes every prompt correctly."""
    rng = np.random.default_rng(7)
    b, p, r = 6, 8, 6
    ids, seg, pos, gs = _prompts(rng, b, p)

    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    # page 4: each sequence needs up to ceil((8+6)/4)=4 pages; 3 slots would
    # want 12 + headroom — give 9 so growth collides and preempts
    paged = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=3, decode_chunk_size=2, page_size=4,
        total_pages=10,  # incl. dummy page 0 -> 9 usable
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), paged.responses)
    assert paged.stats["preemptions"] >= 1


def test_paged_pool_too_small_raises(jax_params):
    rng = np.random.default_rng(8)
    ids, seg, pos, gs = _prompts(rng, 2, 8)
    with pytest.raises(RuntimeError, match="page pool|pool too small"):
        generate_paged(
            jax_params, GOLD_CFG, ids, seg, pos, gs,
            max_new_tokens=8, sampling=SamplingParams(temperature=0.0),
            key=jax.random.key(0), slots=2, decode_chunk_size=8, page_size=4,
            total_pages=3,  # 2 usable pages < 4 needed by one sequence
        )


def test_paged_int8_pools_match_bf16_tokens(jax_params):
    rng = np.random.default_rng(11)
    b, p, r = 4, 8, 6
    ids, seg, pos, gs = _prompts(rng, b, p)
    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        slots=2, decode_chunk_size=3, page_size=4,
    )
    full = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs, key=jax.random.key(4), **kwargs
    )
    quant = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs, key=jax.random.key(4),
        kv_cache_dtype=jnp.int8, **kwargs,
    )
    np.testing.assert_array_equal(full.responses, quant.responses)
    mask = full.response_mask.astype(bool)
    np.testing.assert_allclose(
        quant.rollout_log_probs[mask], full.rollout_log_probs[mask],
        rtol=0.1, atol=0.05,
    )


def test_paged_multimodal_matches_dense(jax_params):
    from spatialthinker_tpu.data.packing import pack_vision_batch
    from spatialthinker_tpu.models.qwen2_5_vl import get_mrope_position_ids

    rng = np.random.default_rng(3)
    b, r = 4, 5
    din = 3 * GOLD_CFG.vision.temporal_patch_size * GOLD_CFG.vision.patch_size**2
    grid = np.asarray([[1, 4, 4]])
    patches_list, grids_list, prompts = [], [], []
    for i in range(b):
        patches_list.append(rng.normal(size=(16, din)).astype(np.float32))
        grids_list.append(grid)
        prompts.append(
            [5 + i, GOLD_CFG.vision_start_token_id]
            + [GOLD_CFG.image_token_id] * 4
            + [GOLD_CFG.vision_end_token_id, 9, 10 + i]
        )
    p = len(prompts[0])
    input_ids = np.asarray(prompts, dtype=np.int32)
    seg = np.ones((b, p), dtype=np.int32)
    pos = np.zeros((3, b, p), dtype=np.int64)
    gen_start = np.zeros(b, dtype=np.int32)
    for i in range(b):
        pi, _ = get_mrope_position_ids(
            input_ids[i], grid,
            spatial_merge_size=GOLD_CFG.vision.spatial_merge_size,
            image_token_id=GOLD_CFG.image_token_id,
            video_token_id=GOLD_CFG.video_token_id,
            vision_start_token_id=GOLD_CFG.vision_start_token_id,
        )
        pos[:, i] = pi
        gen_start[i] = pi.max() + 1

    vision = pack_vision_batch(patches_list, grids_list, GOLD_CFG.vision, granularity=16)
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(input_ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gen_start),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
        vision=jax.tree.map(jnp.asarray, vision),
    )
    paged = generate_paged(
        jax_params, GOLD_CFG, input_ids, seg, pos, gen_start,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), slots=2, decode_chunk_size=3, page_size=4,
        patches_list=patches_list, grids_list=grids_list,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), paged.responses)


def test_paged_kernel_int4_matches_fallback():
    """int4 page pools (interpret mode): per-page dual-nibble online-softmax
    updates == the XLA unpack-gather fallback."""
    from spatialthinker_tpu.ops.paged_attention import _pallas_paged, _xla_paged

    rng = np.random.default_rng(31)
    L, N, hkv, page, d = 2, 9, 2, 256, 128  # token page 256 -> 128 packed rows
    s_slots, hq = 4, 4
    vals_k = rng.integers(-7, 8, size=(L, N, hkv, page, d)).astype(np.int8)
    vals_v = rng.integers(-7, 8, size=(L, N, hkv, page, d)).astype(np.int8)
    half = page // 2

    def pack(vals):  # biased storage: nibble = value + 8 (text.KV4_BIAS)
        low = (vals[:, :, :, :half] + 8).astype(np.uint8) & 0xF
        high = (vals[:, :, :, half:] + 8).astype(np.uint8) << 4
        return jnp.asarray(low | high)

    k_pool, v_pool = pack(vals_k), pack(vals_v)
    k_scale = jnp.asarray(
        rng.uniform(0.01, 0.1, size=(L, N, hkv, page)).astype(np.float32), jnp.bfloat16
    )
    v_scale = jnp.asarray(
        rng.uniform(0.01, 0.1, size=(L, N, hkv, page)).astype(np.float32), jnp.bfloat16
    )
    q = jnp.asarray(rng.normal(size=(s_slots, hq, d)).astype(np.float32), jnp.bfloat16)
    table = np.zeros((s_slots, 2), dtype=np.int32)
    table[:, 0] = [1, 3, 5, 7]
    table[:, 1] = [2, 4, 6, 8]
    lengths = jnp.asarray([300, 256, 37, 512], jnp.int32)
    layer_idx = jnp.asarray(1, jnp.int32)

    out_k, m_k, l_k = _pallas_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                    layer_idx, k_scale, v_scale, d**-0.5)
    out_x, m_x, l_x = _xla_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                 layer_idx, k_scale, v_scale, d**-0.5)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x), rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_x), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_paged_kernel_int4_i8dot_matches_fallback():
    """int4 page pools with both dots on the int8 MXU (rollout.int4_i8dot):
    q/p in-register quantization stays within its rounding envelope of the
    exact XLA unpack-gather fallback. Interpret mode; mirrors
    test_pallas_int4_i8dot_variant_matches_xla for the dense kernel."""
    from spatialthinker_tpu.ops.paged_attention import _pallas_paged, _xla_paged

    rng = np.random.default_rng(31)
    L, N, hkv, page, d = 2, 9, 2, 256, 128
    s_slots, hq = 4, 4
    vals_k = rng.integers(-7, 8, size=(L, N, hkv, page, d)).astype(np.int8)
    vals_v = rng.integers(-7, 8, size=(L, N, hkv, page, d)).astype(np.int8)
    half = page // 2

    def pack(vals):  # biased storage: nibble = value + 8 (text.KV4_BIAS)
        low = (vals[:, :, :, :half] + 8).astype(np.uint8) & 0xF
        high = (vals[:, :, :, half:] + 8).astype(np.uint8) << 4
        return jnp.asarray(low | high)

    k_pool, v_pool = pack(vals_k), pack(vals_v)
    k_scale = jnp.asarray(
        rng.uniform(0.01, 0.1, size=(L, N, hkv, page)).astype(np.float32), jnp.bfloat16
    )
    v_scale = jnp.asarray(
        rng.uniform(0.01, 0.1, size=(L, N, hkv, page)).astype(np.float32), jnp.bfloat16
    )
    q = jnp.asarray(rng.normal(size=(s_slots, hq, d)).astype(np.float32), jnp.bfloat16)
    table = np.zeros((s_slots, 2), dtype=np.int32)
    table[:, 0] = [1, 3, 5, 7]
    table[:, 1] = [2, 4, 6, 8]
    lengths = jnp.asarray([300, 256, 37, 512], jnp.int32)
    layer_idx = jnp.asarray(1, jnp.int32)

    out_k, m_k, l_k = _pallas_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                    layer_idx, k_scale, v_scale, d**-0.5,
                                    int4_i8dot=True)
    out_x, m_x, l_x = _xla_paged(q, k_pool, v_pool, jnp.asarray(table), lengths,
                                 layer_idx, k_scale, v_scale, d**-0.5)
    # q int8 rounding perturbs the scores (and so m/l) by ~0.4% of the row
    # max; the output-space error adds p int8 rounding on top of int4 KV
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_x), rtol=5e-2, atol=5e-2)
    err = np.linalg.norm(
        np.asarray(out_k, np.float32) - np.asarray(out_x, np.float32)
    ) / (np.linalg.norm(np.asarray(out_x, np.float32)) + 1e-9)
    assert err < 3e-2, err


@pytest.mark.parametrize("pool_kind", ["bf16", "int8", "int4", "int4_i8"])
def test_paged_kernel_staged_fusion_matches_fallback(pool_kind):
    """The kernel's fused staging-ring update (one extra online-softmax
    block on the last grid step) == the XLA fallback's single softmax over
    pool+staged cells, for every pool dtype/kernel variant. Interpret mode."""
    from spatialthinker_tpu.ops.paged_attention import _pallas_paged, _xla_paged

    rng = np.random.default_rng(7)
    L, N, hkv, page, d = 2, 9, 2, 256, 128
    s_slots, hq, C = 4, 4, 16
    quantized = pool_kind != "bf16"
    int4 = pool_kind.startswith("int4")

    if int4:
        vals_k = rng.integers(-7, 8, size=(L, N, hkv, page, d)).astype(np.int8)
        vals_v = rng.integers(-7, 8, size=(L, N, hkv, page, d)).astype(np.int8)
        half = page // 2

        def pack(vals):
            low = (vals[:, :, :, :half] + 8).astype(np.uint8) & 0xF
            high = (vals[:, :, :, half:] + 8).astype(np.uint8) << 4
            return jnp.asarray(low | high)

        k_pool, v_pool = pack(vals_k), pack(vals_v)
    elif pool_kind == "int8":
        k_pool = jnp.asarray(rng.integers(-127, 128, size=(L, N, hkv, page, d)), jnp.int8)
        v_pool = jnp.asarray(rng.integers(-127, 128, size=(L, N, hkv, page, d)), jnp.int8)
    else:
        k_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)), jnp.bfloat16)
        v_pool = jnp.asarray(rng.normal(size=(L, N, hkv, page, d)), jnp.bfloat16)
    k_scale = v_scale = None
    if quantized:
        k_scale = jnp.asarray(
            rng.uniform(0.01, 0.1, size=(L, N, hkv, page)), jnp.bfloat16
        )
        v_scale = jnp.asarray(
            rng.uniform(0.01, 0.1, size=(L, N, hkv, page)), jnp.bfloat16
        )

    q = jnp.asarray(rng.normal(size=(s_slots, hq, d)), jnp.bfloat16)
    table = np.zeros((s_slots, 2), dtype=np.int32)
    table[:, 0] = [1, 3, 5, 7]
    table[:, 1] = [2, 4, 6, 8]
    lengths = jnp.asarray([300, 256, 37, 512], jnp.int32)
    layer_idx = jnp.asarray(1, jnp.int32)

    # staging ring: unpacked int8 + bf16 scales under quantized pools
    if quantized:
        st_k = jnp.asarray(rng.integers(-7, 8, size=(L, s_slots, hkv, C, d)), jnp.int8)
        st_v = jnp.asarray(rng.integers(-7, 8, size=(L, s_slots, hkv, C, d)), jnp.int8)
        st_ks = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, s_slots, hkv, C)), jnp.bfloat16)
        st_vs = jnp.asarray(rng.uniform(0.01, 0.1, size=(L, s_slots, hkv, C)), jnp.bfloat16)
    else:
        st_k = jnp.asarray(rng.normal(size=(L, s_slots, hkv, C, d)), jnp.bfloat16)
        st_v = jnp.asarray(rng.normal(size=(L, s_slots, hkv, C, d)), jnp.bfloat16)
        st_ks = st_vs = None
    st_seg = jnp.asarray((rng.random((s_slots, C)) < 0.5).astype(np.int32))
    staged = (st_k, st_v, st_ks, st_vs, st_seg)

    out_k, m_k, l_k = _pallas_paged(
        q, k_pool, v_pool, jnp.asarray(table), lengths, layer_idx,
        k_scale, v_scale, d**-0.5,
        int4_i8dot=pool_kind == "int4_i8", staged=staged,
    )
    out_x, m_x, l_x = _xla_paged(
        q, k_pool, v_pool, jnp.asarray(table), lengths, layer_idx,
        k_scale, v_scale, d**-0.5, staged=staged,
    )
    err = np.linalg.norm(
        np.asarray(out_k, np.float32) - np.asarray(out_x, np.float32)
    ) / (np.linalg.norm(np.asarray(out_x, np.float32)) + 1e-9)
    tol = 3e-2 if pool_kind == "int4_i8" else 1.5e-2
    assert err < tol, (pool_kind, err)
    if pool_kind != "int4_i8":  # q/p rounding perturbs the stats there
        np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_x),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_x),
                                   rtol=3e-2, atol=3e-2)


def test_paged_int4_matches_dense_int4(jax_params):
    """End-to-end paged engine with int4 pools == the dense engine with the
    int4 cache (same quantization grid at write time), greedy decoding."""
    rng = np.random.default_rng(33)
    b, p, r = 4, 8, 6
    ids, seg, pos, gs = _prompts(rng, b, p)

    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(6), kv_cache_dtype=jnp.uint8,
    )
    paged = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(6), slots=2, decode_chunk_size=3, page_size=4,
        kv_cache_dtype=jnp.uint8,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), paged.responses)
    # responses alone are weak evidence on the near-degenerate tiny model —
    # per-step LOG-PROBS depend on every cached token's KV, so a misplaced
    # decode write (wrong page/nibble/cell) shifts them even when the argmax
    # token survives
    mask = np.asarray(dense.response_mask).astype(bool)
    np.testing.assert_allclose(
        paged.rollout_log_probs[mask], np.asarray(dense.rollout_log_probs)[mask],
        rtol=2e-3, atol=2e-3,
    )


def test_paged_rows_prefill_matches_dense(jax_params):
    """Rows-mode refill prefill through the paged engine: the scratch cache
    fills in row groups at full sequence length, then scatters to pages."""
    rng = np.random.default_rng(33)
    b, p, r = 8, 8, 5
    ids, seg, pos, gs = _prompts(rng, b, p)
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    paged = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), slots=4, page_size=4, decode_chunk_size=2,
        prefill_rows=2,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), paged.responses)


def test_paged_refill_batch_cap_matches_dense(jax_params):
    """refill_batch bounds the scratch-prefill transient: the pool fills over
    several small refills, greedy output and page sharing unchanged."""
    rng = np.random.default_rng(41)
    b, p, r, n = 4, 8, 5, 2
    ids, seg, pos, gs = _prompts(rng, b, p)
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), n=n,
    )
    paged = generate_paged(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=8, decode_chunk_size=2, page_size=4,
        group_n=n, refill_batch=1,
    )
    np.testing.assert_array_equal(paged.responses, np.asarray(dense.responses))


def test_prefill_transient_bytes_reserve():
    """Pool sizing must reserve the refill-prefill transients: the estimate
    covers the measured flagship overrun (1.21GB at util 0.9, 2026-08) and
    scales with the rows actually in flight."""
    from spatialthinker_tpu.models.qwen2_5_vl import get_config
    from spatialthinker_tpu.rollout.paged import prefill_transient_bytes

    cfg = get_config("3b")
    cell = int(2 * 36 * 2 * 128 * 0.5) + 2 * 36 * 2 * 2  # int4 + scales
    t = prefill_transient_bytes(cfg, 6144, 16, 8, cell)
    assert t > int(1.21e9)  # covers the measured compile-time overrun
    # rows-in-flight bound: inert prefill_rows (>= u_batch) costs more
    t_full = prefill_transient_bytes(cfg, 6144, 16, 0, cell)
    assert t_full > t
    # monotone in the refill batch (scratch prompt KV term)
    assert prefill_transient_bytes(cfg, 6144, 8, 8, cell) < t
