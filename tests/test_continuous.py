"""Continuous-batching engine tests: greedy parity with the dense engine, slot
refill bookkeeping across a queue larger than the slot count, and EOS/length
edge cases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.models.qwen2_5_vl import qwen25_vl_tiny
from spatialthinker_tpu.models.qwen2_5_vl.params import params_from_hf_state_dict
from spatialthinker_tpu.rollout.continuous import generate_continuous
from spatialthinker_tpu.rollout.engine import generate
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


def test_continuous_matches_dense_greedy(jax_params):
    rng = np.random.default_rng(0)
    b, p, r = 6, 8, 6
    ids, seg, pos, gs = _prompts(rng, b, p)

    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    cont = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=2, decode_chunk_size=2,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), cont.responses)
    np.testing.assert_array_equal(np.asarray(dense.response_mask), cont.response_mask)


def test_continuous_refill_more_prompts_than_slots(jax_params):
    rng = np.random.default_rng(1)
    b, p, r = 10, 8, 5
    ids, seg, pos, gs = _prompts(rng, b, p)
    cont = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), slots=3, decode_chunk_size=4,
    )
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), cont.responses)


def test_continuous_logprobs_match_dense(jax_params):
    rng = np.random.default_rng(2)
    b, p, r = 4, 8, 5
    ids, seg, pos, gs = _prompts(rng, b, p)
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    cont = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(3), slots=2, decode_chunk_size=3,
    )
    mask = cont.response_mask.astype(bool)
    np.testing.assert_allclose(
        cont.rollout_log_probs[mask], np.asarray(dense.rollout_log_probs)[mask],
        rtol=2e-3, atol=2e-3,
    )


def test_effective_prefill_chunk_budget():
    from spatialthinker_tpu.rollout.continuous import effective_prefill_chunk

    # 6144-token prompt, 32 slots, 8192-token budget -> 256-token chunks
    assert effective_prefill_chunk(6144, 32, 0, 8192) == 256
    # budget bigger than rows*prompt -> unchunked
    assert effective_prefill_chunk(512, 4, 0, 8192) == 0
    # explicit chunk size caps regardless of budget
    assert effective_prefill_chunk(6144, 4, 2048, 0) == 2048
    # sub-128 prompts chunk without 128-alignment (test-scale shapes)
    assert effective_prefill_chunk(64, 64, 0, 128) == 2
    assert effective_prefill_chunk(64, 1, 0, 8192) == 0


def test_continuous_chunked_prefill_matches_dense(jax_params):
    """Sequence-chunked prefill (budget-bound) produces the same greedy
    rollout as the unchunked path, including left-padded prompts."""
    rng = np.random.default_rng(12)
    b, p, r = 4, 8, 5
    ids, seg, pos, gs = _prompts(rng, b, p)
    # left-pad two rows: tokens shift right, segment ids mark the pad
    for i, pad in ((0, 3), (2, 1)):
        ids[i, pad:] = ids[i, : p - pad]
        ids[i, :pad] = 0
        seg[i, :pad] = 0
        pos[:, i, pad:] = pos[:, i, : p - pad]

    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        slots=2, decode_chunk_size=3, key=jax.random.key(5),
    )
    plain = generate_continuous(jax_params, GOLD_CFG, ids, seg, pos, gs, **kwargs)
    chunked = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs, prefill_chunk_size=3, **kwargs
    )
    np.testing.assert_array_equal(plain.responses, chunked.responses)
    mask = plain.response_mask.astype(bool)
    np.testing.assert_allclose(
        chunked.rollout_log_probs[mask], plain.rollout_log_probs[mask],
        rtol=2e-3, atol=2e-3,
    )


def test_continuous_int8_kv_matches_bf16(jax_params):
    """int8 slot cache (per-token-head scales carried in SlotState): same
    greedy tokens as the full-precision continuous path, logprobs within
    quantization tolerance — parity with the dense engine's int8 mode."""
    rng = np.random.default_rng(11)
    b, p, r = 6, 8, 6
    ids, seg, pos, gs = _prompts(rng, b, p)

    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        slots=2, decode_chunk_size=3,
    )
    full = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs, key=jax.random.key(4), **kwargs
    )
    quant = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs, key=jax.random.key(4),
        kv_cache_dtype=jnp.int8, **kwargs,
    )
    np.testing.assert_array_equal(full.responses, quant.responses)
    mask = full.response_mask.astype(bool)
    np.testing.assert_allclose(
        quant.rollout_log_probs[mask], full.rollout_log_probs[mask],
        rtol=0.1, atol=0.05,
    )


def test_continuous_multimodal_matches_dense(jax_params):
    """Multimodal prompts through the continuous engine == dense engine."""
    from spatialthinker_tpu.models.qwen2_5_vl import (
        VisionInputs, pad_vision_inputs, prepare_vision_aux,
    )
    from spatialthinker_tpu.data.packing import pack_vision_batch

    rng = np.random.default_rng(3)
    b, r = 4, 5
    din = 3 * GOLD_CFG.vision.temporal_patch_size * GOLD_CFG.vision.patch_size**2
    grid = np.asarray([[1, 4, 4]])
    n_img_tokens = 4

    patches_list, grids_list, prompts = [], [], []
    for i in range(b):
        patches_list.append(rng.normal(size=(16, din)).astype(np.float32))
        grids_list.append(grid)
        ids = (
            [5 + i, GOLD_CFG.vision_start_token_id]
            + [GOLD_CFG.image_token_id] * n_img_tokens
            + [GOLD_CFG.vision_end_token_id, 9, 10 + i]
        )
        prompts.append(ids)
    p = len(prompts[0])
    input_ids = np.asarray(prompts, dtype=np.int32)
    seg = np.ones((b, p), dtype=np.int32)

    from spatialthinker_tpu.models.qwen2_5_vl import get_mrope_position_ids

    pos = np.zeros((3, b, p), dtype=np.int64)
    gen_start = np.zeros(b, dtype=np.int32)
    for i in range(b):
        pi, delta = get_mrope_position_ids(
            input_ids[i], grid,
            spatial_merge_size=GOLD_CFG.vision.spatial_merge_size,
            image_token_id=GOLD_CFG.image_token_id,
            video_token_id=GOLD_CFG.video_token_id,
            vision_start_token_id=GOLD_CFG.vision_start_token_id,
        )
        pos[:, i] = pi
        gen_start[i] = pi.max() + 1

    # dense path with one batch-level pack
    vision = pack_vision_batch(patches_list, grids_list, GOLD_CFG.vision, granularity=16)
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(input_ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gen_start),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
        vision=jax.tree.map(jnp.asarray, vision),
    )
    cont = generate_continuous(
        jax_params, GOLD_CFG, input_ids, seg, pos, gen_start,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), slots=2, decode_chunk_size=3,
        patches_list=patches_list, grids_list=grids_list,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), cont.responses)


def test_continuous_fewer_prompts_than_slots(jax_params):
    rng = np.random.default_rng(4)
    b, p, r = 2, 8, 4
    ids, seg, pos, gs = _prompts(rng, b, p)
    cont = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=8, decode_chunk_size=2,
    )
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), cont.responses)


def test_continuous_single_token_budget(jax_params):
    rng = np.random.default_rng(5)
    b, p = 3, 8
    ids, seg, pos, gs = _prompts(rng, b, p)
    cont = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=1, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=2, decode_chunk_size=4,
    )
    assert cont.responses.shape == (3, 1)
    assert cont.response_mask.sum() >= 3  # every prompt got its one token


def test_continuous_grouped_matches_ungrouped(jax_params):
    """group_n>1: each unique prompt prefilled once, installed into n slots —
    greedy output must equal running the repeated prompts ungrouped, in
    repeat-interleave row order."""
    rng = np.random.default_rng(23)
    b, p, r, n = 4, 8, 6, 2
    ids, seg, pos, gs = _prompts(rng, b, p)

    grouped = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=4, decode_chunk_size=2, group_n=n,
    )
    rep = lambda x, axis=0: np.repeat(x, n, axis=axis)
    ungrouped = generate_continuous(
        jax_params, GOLD_CFG, rep(ids), rep(seg), rep(pos, axis=1), rep(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=4, decode_chunk_size=2,
    )
    assert grouped.responses.shape == (b * n, r)
    np.testing.assert_array_equal(grouped.responses, ungrouped.responses)
    np.testing.assert_array_equal(grouped.response_mask, ungrouped.response_mask)


def test_continuous_grouped_slot_rounding(jax_params):
    """slots not divisible by group_n round down to whole groups and still
    drain the full queue."""
    rng = np.random.default_rng(29)
    b, p, r, n = 5, 8, 4, 3
    ids, seg, pos, gs = _prompts(rng, b, p)
    grouped = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), slots=7, decode_chunk_size=2, group_n=n,
    )
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), n=n,
    )
    np.testing.assert_array_equal(grouped.responses, np.asarray(dense.responses))


def test_effective_prefill_chunk_respects_budget():
    """128-alignment must round DOWN: inflating a budget-derived chunk to 128
    silently exceeded max_num_batched_tokens (the activation-memory bound)."""
    from spatialthinker_tpu.rollout.continuous import effective_prefill_chunk

    # budget 8192 over 128 rows -> 64 tokens per row, NOT 128
    chunk = effective_prefill_chunk(2048, 128, 0, 8192)
    assert 0 < chunk <= 8192 // 128
    # aligned case unchanged
    assert effective_prefill_chunk(2048, 16, 0, 8192) == 512
    # no budget, chunk cap only
    assert effective_prefill_chunk(2048, 4, 300, 0) == 256
    # chunk >= prompt -> unchunked
    assert effective_prefill_chunk(512, 4, 0, 8192) == 0


def test_continuous_rows_prefill_matches_dense(jax_params):
    """Batch-chunked (rows-mode) refill prefill must match dense greedy: the
    refill's unique-prompt batch runs in row groups at full sequence length
    instead of sequence chunks."""
    rng = np.random.default_rng(31)
    b, p, r = 8, 8, 5
    ids, seg, pos, gs = _prompts(rng, b, p)
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    cont = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), slots=4, decode_chunk_size=2,
        prefill_rows=2,  # 2-row groups inside each 4-prompt refill
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), cont.responses)
    # rows >= the refill batch is inert (falls back to the seq-chunk bound)
    cont2 = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(1), slots=4, decode_chunk_size=2,
        prefill_rows=64,
    )
    np.testing.assert_array_equal(np.asarray(dense.responses), cont2.responses)


def test_continuous_refill_batch_cap_matches_dense(jax_params):
    """refill_batch caps unique prompts per prefill: slots fill over several
    small refills (bounded scratch-cache transient) with identical greedy
    output, including grouped fan-out."""
    rng = np.random.default_rng(37)
    b, p, r, n = 6, 8, 5, 2
    ids, seg, pos, gs = _prompts(rng, b, p)
    dense = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(gs),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), n=n,
    )
    cont = generate_continuous(
        jax_params, GOLD_CFG, ids, seg, pos, gs,
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), slots=8, decode_chunk_size=2, group_n=n,
        refill_batch=1,  # 4-group slot bank fills one unique prompt at a time
    )
    np.testing.assert_array_equal(cont.responses, np.asarray(dense.responses))
    np.testing.assert_array_equal(cont.response_mask, np.asarray(dense.response_mask))
