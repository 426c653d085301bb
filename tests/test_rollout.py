"""Rollout engine tests: sampling ops, KV-cache consistency (decode == teacher
forcing), and greedy-generation parity with HF transformers on shared tiny
weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.rollout.sampling import (
    SamplingParams,
    apply_top_k,
    apply_top_p,
    get_response_mask,
    sample_tokens,
)


def test_top_k_masks_tail():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0
    assert out[0, 0] < -1e29 and out[0, 3] < -1e29


def test_top_p_keeps_argmax_and_nucleus():
    # probs ~ [0.64, 0.24, 0.09, 0.03]
    logits = jnp.log(jnp.asarray([[0.64, 0.24, 0.09, 0.03]]))
    out = np.asarray(apply_top_p(logits, 0.7))
    assert out[0, 0] > -1e29
    assert out[0, 1] > -1e29  # cumulative-exclusive 0.64 < 0.7 keeps second
    assert out[0, 2] < -1e29 and out[0, 3] < -1e29
    # p=1 is a no-op
    np.testing.assert_array_equal(np.asarray(apply_top_p(logits, 1.0)), np.asarray(logits))


def test_greedy_sampling():
    logits = jnp.asarray([[0.0, 9.0, 1.0], [4.0, 0.0, 0.1]])
    toks = sample_tokens(logits, jax.random.key(0), SamplingParams(temperature=0.0))
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])


def test_temperature_sampling_distribution():
    logits = jnp.asarray([[2.0, 0.0]])
    keys = jax.random.split(jax.random.key(0), 300)
    samples = np.asarray(
        jax.vmap(lambda k: sample_tokens(logits, k, SamplingParams(temperature=1.0)))(keys)
    ).ravel()
    frac0 = (samples == 0).mean()
    expected = np.exp(2) / (np.exp(2) + 1)
    assert abs(frac0 - expected) < 0.1


def test_response_mask_first_eos():
    eos = 99
    responses = jnp.asarray([[5, 99, 7, 99], [1, 2, 3, 4]])
    mask = np.asarray(get_response_mask(responses, eos))
    np.testing.assert_array_equal(mask, [[1, 1, 0, 0], [1, 1, 1, 1]])


# ---------------------------------------------------------------- engine

torch = pytest.importorskip("torch")

from spatialthinker_tpu.models.qwen2_5_vl import qwen25_vl_tiny
from spatialthinker_tpu.models.qwen2_5_vl.params import params_from_hf_state_dict
from spatialthinker_tpu.rollout.engine import generate
from tests.test_model_golden import make_hf_model, CFG as GOLD_CFG


@pytest.fixture(scope="module")
def hf_model():
    return make_hf_model()


@pytest.fixture(scope="module")
def jax_params(hf_model):
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return params_from_hf_state_dict(state, GOLD_CFG, dtype=jnp.float32)


def test_greedy_generate_matches_hf(hf_model, jax_params):
    rng = np.random.default_rng(0)
    b, p, r = 2, 8, 6
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.tensor(prompts),
            attention_mask=torch.ones((b, p), dtype=torch.long),
            max_new_tokens=r,
            do_sample=False,
            use_cache=True,
        )
    hf_resp = hf_out[:, p:].numpy()

    pos = np.tile(np.arange(p)[None, None], (3, b, 1))
    result = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(prompts), jnp.ones((b, p), jnp.int32), jnp.asarray(pos),
        gen_pos_start=jnp.full((b,), p, jnp.int32),
        max_new_tokens=r,
        sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0),
    )
    ours = np.asarray(result.responses)
    # compare up to EOS cut (HF keeps generating garbage for finished rows too
    # unless it hits its own criteria; mask-align both)
    mask = np.asarray(result.response_mask).astype(bool)
    np.testing.assert_array_equal(ours[mask], hf_resp[mask])


def test_generate_with_left_padding_matches_unpadded(jax_params):
    """A left-padded prompt must decode the same tokens as the unpadded one."""
    rng = np.random.default_rng(1)
    p_short, pad, r = 6, 4, 5
    prompt = rng.integers(5, 900, size=(1, p_short), dtype=np.int64)

    pos_short = np.tile(np.arange(p_short)[None, None], (3, 1, 1))
    res_unpadded = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(prompt), jnp.ones((1, p_short), jnp.int32), jnp.asarray(pos_short),
        gen_pos_start=jnp.full((1,), p_short, jnp.int32),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )

    padded = np.concatenate([np.zeros((1, pad), dtype=np.int64), prompt], axis=1)
    seg = np.concatenate([np.zeros((1, pad), np.int32), np.ones((1, p_short), np.int32)], axis=1)
    # padded positions: HF convention pads get position 1; valid tokens 0..p_short-1
    pos_padded = np.concatenate(
        [np.ones((3, 1, pad), dtype=np.int64), pos_short], axis=2
    )
    res_padded = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(padded), jnp.asarray(seg), jnp.asarray(pos_padded),
        gen_pos_start=jnp.full((1,), p_short, jnp.int32),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    np.testing.assert_array_equal(
        np.asarray(res_unpadded.responses), np.asarray(res_padded.responses)
    )


def test_decode_logprobs_match_teacher_forcing(jax_params):
    """Stepwise decode log-probs == teacher-forced forward on the same tokens."""
    from spatialthinker_tpu.models.qwen2_5_vl import forward_logits

    rng = np.random.default_rng(2)
    b, p, r = 1, 6, 5
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)
    pos = np.tile(np.arange(p)[None, None], (3, b, 1))

    result = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(prompts), jnp.ones((b, p), jnp.int32), jnp.asarray(pos),
        gen_pos_start=jnp.full((b,), p, jnp.int32),
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    responses = np.asarray(result.responses)

    full_ids = np.concatenate([prompts, responses], axis=1)
    full_pos = np.tile(np.arange(p + r)[None, None], (3, b, 1))
    logits, _ = forward_logits(
        jax_params, GOLD_CFG, jnp.asarray(full_ids), jnp.asarray(full_pos),
        segment_ids=jnp.ones((b, p + r), jnp.int32),
    )
    logp_tf = np.asarray(jax.nn.log_softmax(logits[:, p - 1 : p + r - 1, :], axis=-1))
    expected = np.take_along_axis(logp_tf, responses[..., None], axis=-1)[..., 0]
    mask = np.asarray(result.response_mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(result.rollout_log_probs)[mask], expected[mask], rtol=1e-3, atol=1e-3
    )


def test_int8_kv_cache_close_to_bf16(jax_params):
    """int8-quantized KV decode: same greedy tokens as full precision on the
    tiny model, logprobs within quantization tolerance."""
    rng = np.random.default_rng(7)
    b, p, r = 2, 8, 6
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)
    pos = np.tile(np.arange(p)[None, None], (3, b, 1))

    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    full = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(prompts), jnp.ones((b, p), jnp.int32), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), kv_cache_dtype=jnp.float32, **kwargs,
    )
    quant = generate(
        jax_params, GOLD_CFG,
        jnp.asarray(prompts), jnp.ones((b, p), jnp.int32), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), kv_cache_dtype=jnp.int8, **kwargs,
    )
    # greedy tokens should match on a well-separated tiny model
    np.testing.assert_array_equal(np.asarray(full.responses), np.asarray(quant.responses))
    mask = np.asarray(full.response_mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(quant.rollout_log_probs)[mask],
        np.asarray(full.rollout_log_probs)[mask],
        rtol=0.1, atol=0.05,
    )


def test_quantize_roundtrip():
    from spatialthinker_tpu.models.qwen2_5_vl.text import _dequantize_kv, _quantize_kv

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(scale=3.0, size=(2, 5, 2, 16)).astype(np.float32))
    q, s = _quantize_kv(x)
    back = _dequantize_kv(q, s, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(x))
    assert err.max() <= np.abs(np.asarray(x)).max() / 127 * 1.1


def test_dense_engine_chunked_prefill_matches(jax_params):
    """Sequence-chunked prefill (vLLM enable_chunked_prefill equivalent in the
    dense engine) must produce the same greedy generation as one-shot prefill,
    including left-padded prompts."""
    rng = np.random.default_rng(11)
    b, p, r = 2, 12, 5
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)
    seg = np.ones((b, p), np.int32)
    seg[0, :3] = 0  # left padding
    prompts[0, :3] = 0
    pos = np.tile(np.arange(p)[None, None], (3, b, 1))

    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    full = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.asarray(seg), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), **kwargs,
    )
    chunked = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.asarray(seg), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), prefill_chunk=5, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(full.responses), np.asarray(chunked.responses))
    mask = np.asarray(full.response_mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(chunked.rollout_log_probs)[mask],
        np.asarray(full.rollout_log_probs)[mask], rtol=2e-3, atol=2e-3,
    )


def test_grouped_generation_matches_repeat(jax_params):
    """n>1 grouped sampling (prefill once per prompt, prompt-KV fanout) must
    equal generating each repeated row independently under greedy decoding."""
    rng = np.random.default_rng(13)
    b, p, r, n = 2, 10, 6, 3
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)
    seg = np.ones((b, p), np.int32)
    seg[0, :2] = 0
    prompts[0, :2] = 0
    pos = np.tile(np.arange(p)[None, None], (3, b, 1))
    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )

    grouped = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.asarray(seg), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), n=n, **kwargs,
    )
    single = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.asarray(seg), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), **kwargs,
    )
    assert grouped.responses.shape == (b * n, r)
    rep = np.repeat(np.asarray(single.responses), n, axis=0)
    np.testing.assert_array_equal(np.asarray(grouped.responses), rep)
    mask = np.repeat(np.asarray(single.response_mask), n, axis=0).astype(bool)
    np.testing.assert_allclose(
        np.asarray(grouped.rollout_log_probs)[mask],
        np.repeat(np.asarray(single.rollout_log_probs), n, axis=0)[mask],
        rtol=2e-3, atol=2e-3,
    )


def test_grouped_generation_int8_chunked(jax_params):
    """Grouped sampling composes with int8 KV and chunked prefill."""
    rng = np.random.default_rng(17)
    b, p, r, n = 2, 12, 5, 2
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)
    pos = np.tile(np.arange(p)[None, None], (3, b, 1))
    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    grouped = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.ones((b, p), jnp.int32),
        jnp.asarray(pos), jnp.full((b,), p, jnp.int32), n=n,
        kv_cache_dtype=jnp.int8, prefill_chunk=4, **kwargs,
    )
    plain = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.ones((b, p), jnp.int32),
        jnp.asarray(pos), jnp.full((b,), p, jnp.int32),
        kv_cache_dtype=jnp.int8, **kwargs,
    )
    np.testing.assert_array_equal(
        np.asarray(grouped.responses), np.repeat(np.asarray(plain.responses), n, axis=0)
    )


@pytest.mark.parametrize("kv_dtype", [jnp.bfloat16, jnp.int8, jnp.uint8])
def test_dense_engine_batch_chunked_prefill_matches(jax_params, kv_dtype):
    """Batch-chunked prefill (prefill_rows: row groups at full sequence
    length) must produce the same greedy generation as one-shot prefill for
    every KV dtype, including a partial final row group and left padding."""
    rng = np.random.default_rng(23)
    b, p, r = 5, 12, 5
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)
    seg = np.ones((b, p), np.int32)
    seg[0, :3] = 0  # left padding
    prompts[0, :3] = 0
    pos = np.tile(np.arange(p)[None, None], (3, b, 1))
    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), kv_cache_dtype=kv_dtype,
    )
    full = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.asarray(seg), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), **kwargs,
    )
    rows = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.asarray(seg), jnp.asarray(pos),
        jnp.full((b,), p, jnp.int32), prefill_rows=2, **kwargs,  # groups 2/2/1
    )
    np.testing.assert_array_equal(np.asarray(full.responses), np.asarray(rows.responses))
    mask = np.asarray(full.response_mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(rows.rollout_log_probs)[mask],
        np.asarray(full.rollout_log_probs)[mask], rtol=2e-3, atol=2e-3,
    )


def test_batch_chunked_prefill_composes_with_seq_chunk_and_groups(jax_params):
    """prefill_rows composes with sequence chunking inside each row group and
    with grouped sampling (n>1 prompt-KV fanout)."""
    rng = np.random.default_rng(29)
    b, p, r, n = 4, 12, 5, 2
    prompts = rng.integers(5, 900, size=(b, p), dtype=np.int64)
    pos = np.tile(np.arange(p)[None, None], (3, b, 1))
    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0), key=jax.random.key(0),
    )
    plain = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.ones((b, p), jnp.int32),
        jnp.asarray(pos), jnp.full((b,), p, jnp.int32), n=n, **kwargs,
    )
    rows = generate(
        jax_params, GOLD_CFG, jnp.asarray(prompts), jnp.ones((b, p), jnp.int32),
        jnp.asarray(pos), jnp.full((b,), p, jnp.int32), n=n,
        prefill_rows=2, prefill_chunk=4, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(plain.responses), np.asarray(rows.responses))


def test_vision_rows_prefill_composes_with_seq_chunk(jax_params):
    """Rows-mode prefill with IMAGE prompts must honor prefill_chunk inside
    each row group (the activation bound stays rows*chunk for vision prompts
    too) and still match the one-shot forward."""
    from spatialthinker_tpu.data.packing import pack_vision_batch
    from spatialthinker_tpu.models.qwen2_5_vl import get_mrope_position_ids
    from spatialthinker_tpu.rollout.engine import generate
    from tests.test_model_golden import CFG as G

    rng = np.random.default_rng(37)
    b, r = 4, 4
    din = 3 * G.vision.temporal_patch_size * G.vision.patch_size**2
    grid = np.asarray([[1, 4, 4]])
    patches_list, grids_list, prompts = [], [], []
    for i in range(b):
        patches_list.append(rng.normal(size=(16, din)).astype(np.float32))
        grids_list.append(grid)
        prompts.append(
            [5 + i, G.vision_start_token_id] + [G.image_token_id] * 4
            + [G.vision_end_token_id, 9, 10 + i, 11, 12, 13 + i]
        )
    p = len(prompts[0])
    input_ids = np.asarray(prompts, dtype=np.int32)
    seg = np.ones((b, p), dtype=np.int32)
    pos = np.zeros((3, b, p), dtype=np.int64)
    gen_start = np.zeros(b, dtype=np.int32)
    for i in range(b):
        pi, _ = get_mrope_position_ids(
            input_ids[i], grid,
            spatial_merge_size=G.vision.spatial_merge_size,
            image_token_id=G.image_token_id,
            video_token_id=G.video_token_id,
            vision_start_token_id=G.vision_start_token_id,
        )
        pos[:, i] = pi
        gen_start[i] = pi.max() + 1
    vision = jax.tree.map(
        jnp.asarray, pack_vision_batch(patches_list, grids_list, G.vision, granularity=16)
    )
    kwargs = dict(
        max_new_tokens=r, sampling=SamplingParams(temperature=0.0),
        key=jax.random.key(0), vision=vision,
    )
    plain = generate(
        jax_params, G, jnp.asarray(input_ids), jnp.asarray(seg), jnp.asarray(pos),
        jnp.asarray(gen_start), **kwargs,
    )
    rows = generate(
        jax_params, G, jnp.asarray(input_ids), jnp.asarray(seg), jnp.asarray(pos),
        jnp.asarray(gen_start), prefill_rows=2, prefill_chunk=4, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(plain.responses), np.asarray(rows.responses))
