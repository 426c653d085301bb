"""Padding-free packing tests: slot bookkeeping, gather round-trip, and exact
loss equivalence between the packed and unpacked layouts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.data.text_packing import (
    gather_response_values,
    pack_train_rows,
    pad_rows_to_multiple,
)
from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
from spatialthinker_tpu.trainer.train_step import (
    PackedTrainBatch,
    TrainBatch,
    actor_loss_fn,
    packed_actor_loss_fn,
)

CFG = qwen25_vl_tiny(256)


def _varlen_batch(rng, b=4, p=16, r=12):
    prompt_lens = rng.integers(3, p, size=b)
    resp_lens = rng.integers(2, r, size=b)
    input_ids = np.zeros((b, p), dtype=np.int32)
    segment_ids = np.zeros((b, p), dtype=np.int32)
    position_ids = np.ones((b, 3, p), dtype=np.int32)
    responses = np.zeros((b, r), dtype=np.int32)
    response_mask = np.zeros((b, r), dtype=np.float32)
    for i in range(b):
        pl, rl = int(prompt_lens[i]), int(resp_lens[i])
        input_ids[i, p - pl :] = rng.integers(5, 200, size=pl)
        segment_ids[i, p - pl :] = 1
        position_ids[i, :, p - pl :] = np.arange(pl)[None]
        responses[i, :rl] = rng.integers(5, 200, size=rl)
        response_mask[i, :rl] = 1
    gen_pos_start = prompt_lens.astype(np.int32)
    old = rng.normal(size=(b, r)).astype(np.float32) - 3
    ref = old + rng.normal(size=(b, r)).astype(np.float32) * 0.05
    adv = rng.normal(size=(b, r)).astype(np.float32)
    # zero out the padding region so both layouts see the same values
    old *= response_mask
    ref *= response_mask
    adv *= response_mask
    return dict(
        input_ids=input_ids, segment_ids=segment_ids, position_ids=position_ids,
        responses=responses, response_mask=response_mask, gen_pos_start=gen_pos_start,
        old=old, ref=ref, adv=adv, prompt_lens=prompt_lens, resp_lens=resp_lens,
    )


def test_pack_and_gather_roundtrip():
    rng = np.random.default_rng(0)
    d = _varlen_batch(rng)
    packed, slot_map = pack_train_rows(
        d["input_ids"], d["segment_ids"], d["position_ids"], d["responses"],
        d["response_mask"], d["gen_pos_start"],
        per_token={"old_log_probs": d["old"], "ref_log_probs": d["ref"], "advantages": d["adv"]},
        row_len=64,
    )
    # every sample covered once
    assert packed.segment_ids.max() >= 1
    assert packed.loss_mask.sum() == d["response_mask"].sum()
    back = gather_response_values(packed.old_log_probs, slot_map, d["responses"].shape[1])
    np.testing.assert_allclose(back, d["old"], rtol=1e-6)
    back_adv = gather_response_values(packed.advantages, slot_map, d["responses"].shape[1])
    np.testing.assert_allclose(back_adv, d["adv"], rtol=1e-6)


def test_packing_labels_are_next_tokens():
    rng = np.random.default_rng(1)
    d = _varlen_batch(rng, b=2)
    packed, slot_map = pack_train_rows(
        d["input_ids"], d["segment_ids"], d["position_ids"], d["responses"],
        d["response_mask"], d["gen_pos_start"], row_len=64,
    )
    for i in range(2):
        ridx, slots = slot_map.response_slot_indices(i)
        rl = int(slot_map.resp_len[i])
        np.testing.assert_array_equal(
            packed.labels[ridx, slots], d["responses"][i, :rl]
        )


def test_packed_loss_matches_unpacked():
    rng = np.random.default_rng(2)
    d = _varlen_batch(rng)
    params = init_params(CFG, jax.random.key(0))
    kwargs = dict(
        clip_ratio_low=0.2, clip_ratio_high=0.3, clip_ratio_dual=3.0,
        use_kl_loss=True, kl_loss_coef=0.01, kl_penalty="low_var_kl",
        remat=False, chunk_size=8,
    )

    b, p = d["input_ids"].shape
    r = d["responses"].shape[1]
    full_ids = np.concatenate([d["input_ids"], d["responses"]], axis=1)
    full_seg = np.concatenate(
        [d["segment_ids"], d["response_mask"].astype(np.int32)], axis=1
    )
    pos_resp = d["gen_pos_start"][:, None] + np.arange(r)[None]
    full_pos = np.concatenate(
        [d["position_ids"].transpose(1, 0, 2), np.broadcast_to(pos_resp[None], (3, b, r))],
        axis=2,
    )
    tb = TrainBatch(
        input_ids=jnp.asarray(full_ids), segment_ids=jnp.asarray(full_seg),
        position_ids=jnp.asarray(full_pos), responses=jnp.asarray(d["responses"]),
        response_mask=jnp.asarray(d["response_mask"]),
        old_log_probs=jnp.asarray(d["old"]), ref_log_probs=jnp.asarray(d["ref"]),
        advantages=jnp.asarray(d["adv"]),
    )
    loss_unpacked, metrics_unpacked = actor_loss_fn(params, CFG, tb, None, **kwargs)

    packed, _ = pack_train_rows(
        d["input_ids"], d["segment_ids"], d["position_ids"], d["responses"],
        d["response_mask"], d["gen_pos_start"],
        per_token={"old_log_probs": d["old"], "ref_log_probs": d["ref"], "advantages": d["adv"]},
        row_len=64,
    )
    ptb = PackedTrainBatch(*[jnp.asarray(x) for x in packed])
    loss_packed, metrics_packed = packed_actor_loss_fn(params, CFG, ptb, **kwargs)

    np.testing.assert_allclose(float(loss_packed), float(loss_unpacked), rtol=2e-4, atol=2e-5)
    for key in metrics_unpacked:
        np.testing.assert_allclose(
            float(metrics_packed[key]), float(metrics_unpacked[key]), rtol=2e-3, atol=2e-4
        )


def test_pad_rows_to_multiple():
    rng = np.random.default_rng(3)
    d = _varlen_batch(rng)
    packed, _ = pack_train_rows(
        d["input_ids"], d["segment_ids"], d["position_ids"], d["responses"],
        d["response_mask"], d["gen_pos_start"], row_len=32,
    )
    padded = pad_rows_to_multiple(packed, 4)
    assert padded.input_ids.shape[0] % 4 == 0
    assert padded.position_ids.shape[1] == padded.input_ids.shape[0]


def test_packing_compresses():
    rng = np.random.default_rng(4)
    d = _varlen_batch(rng, b=8, p=64, r=48)  # heavy padding
    packed, _ = pack_train_rows(
        d["input_ids"], d["segment_ids"], d["position_ids"], d["responses"],
        d["response_mask"], d["gen_pos_start"], row_len=128,
    )
    packed_tokens = packed.input_ids.size
    padded_tokens = 8 * (64 + 48)
    assert packed_tokens < padded_tokens

def test_packed_multimodal_logprobs_match_unpacked():
    """Image batches through the packed path: per-response log-probs must match
    the standard (B, P+R) layout — proves the image-token gather alignment
    across packed rows."""
    from spatialthinker_tpu.data.packing import pack_vision_batch
    from spatialthinker_tpu.data.text_packing import gather_response_values
    from spatialthinker_tpu.trainer.train_step import (
        compute_log_probs, compute_packed_log_probs,
    )

    rng = np.random.default_rng(5)
    cfg = CFG
    din = 3 * cfg.vision.temporal_patch_size * cfg.vision.patch_size ** 2
    grid = np.asarray([[1, 4, 4]])
    b, r = 3, 6
    p = 16

    # variable prompt lengths, each with one 4-merged-token image
    input_ids = np.zeros((b, p), dtype=np.int32)
    segment_ids = np.zeros((b, p), dtype=np.int32)
    position_ids = np.ones((b, 3, p), dtype=np.int32)
    patches_list = []
    prompt_lens = [10, 8, 12]
    for i in range(b):
        pl = prompt_lens[i]
        body = (
            [5 + i, cfg.vision_start_token_id]
            + [cfg.image_token_id] * 4
            + [cfg.vision_end_token_id]
            + list(rng.integers(5, 200, size=pl - 7))
        )
        input_ids[i, p - pl:] = body
        segment_ids[i, p - pl:] = 1
        from spatialthinker_tpu.models.qwen2_5_vl import get_mrope_position_ids

        pos, _ = get_mrope_position_ids(
            np.asarray(body), grid,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=cfg.image_token_id,
            video_token_id=cfg.video_token_id,
            vision_start_token_id=cfg.vision_start_token_id,
        )
        position_ids[i, :, p - pl:] = pos
        patches_list.append(rng.normal(size=(16, din)).astype(np.float32))

    responses = rng.integers(5, 200, size=(b, r)).astype(np.int32)
    response_mask = np.ones((b, r), dtype=np.float32)
    response_mask[1, 4:] = 0
    gen_pos_start = np.asarray([int(position_ids[i].max()) + 1 for i in range(b)], np.int32)

    params = init_params(cfg, jax.random.key(3))

    # ---- unpacked reference
    full_ids = np.concatenate([input_ids, np.where(response_mask > 0, responses, 0)], axis=1)
    full_seg = np.concatenate([segment_ids, response_mask.astype(np.int32)], axis=1)
    pos_resp = gen_pos_start[:, None] + np.arange(r)[None]
    full_pos = np.concatenate(
        [position_ids.transpose(1, 0, 2), np.broadcast_to(pos_resp[None], (3, b, r))], axis=2
    )
    tb = TrainBatch(
        input_ids=jnp.asarray(full_ids), segment_ids=jnp.asarray(full_seg),
        position_ids=jnp.asarray(full_pos), responses=jnp.asarray(responses),
        response_mask=jnp.asarray(response_mask),
        old_log_probs=jnp.zeros((b, r)), ref_log_probs=jnp.zeros((b, r)),
        advantages=jnp.zeros((b, r)),
    )
    vision_all = pack_vision_batch(patches_list, [grid] * b, cfg.vision, granularity=16)
    logp_ref, _ = compute_log_probs(
        params, cfg, tb, jax.tree.map(jnp.asarray, vision_all), chunk_size=8
    )
    logp_ref = np.asarray(logp_ref) * response_mask

    # ---- packed path
    packed, slot_map = pack_train_rows(
        input_ids, segment_ids, position_ids,
        np.where(response_mask > 0, responses, 0).astype(np.int32),
        response_mask, gen_pos_start, row_len=64,
    )
    order = sorted(range(b), key=lambda i: (int(slot_map.row[i]), int(slot_map.dst_start[i])))
    vision_packed = pack_vision_batch(
        [patches_list[i] for i in order], [grid] * b, cfg.vision, granularity=16
    )
    from spatialthinker_tpu.trainer.train_step import PackedTrainBatch

    ptb = PackedTrainBatch(*[jnp.asarray(x) for x in packed])
    logp_rows = np.asarray(
        compute_packed_log_probs(
            params, cfg, ptb, jax.tree.map(jnp.asarray, vision_packed), chunk_size=8
        )[0]
    )
    logp_packed = gather_response_values(logp_rows, slot_map, r) * response_mask
    np.testing.assert_allclose(logp_packed, logp_ref, rtol=2e-4, atol=2e-5)
