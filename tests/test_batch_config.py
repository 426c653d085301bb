"""Tests for the RolloutBatch container and the config merge machinery."""

import numpy as np
import pytest

from spatialthinker_tpu.core.batch import RolloutBatch, pad_to_divisor, unpad
from spatialthinker_tpu.core.config import PPOConfig, build_config


def make_batch(n=6):
    return RolloutBatch.from_dict(
        tensors={"input_ids": np.arange(n * 4).reshape(n, 4), "mask": np.ones((n, 4))},
        non_tensors={"gt": [f"answer-{i}" for i in range(n)]},
        meta={"step": 1},
    )


def test_from_single_dict_dtype_split():
    obj = np.empty(3, dtype=object)
    obj[:] = ["a", "b", "c"]
    b = RolloutBatch.from_single_dict({"x": np.zeros((3, 2)), "s": obj})
    assert "x" in b.tensors and "s" in b.non_tensors
    assert len(b) == 3


def test_chunk_concat_roundtrip():
    b = make_batch(6)
    chunks = b.chunk(3)
    assert [len(c) for c in chunks] == [2, 2, 2]
    back = RolloutBatch.concat(chunks)
    np.testing.assert_array_equal(back.tensors["input_ids"], b.tensors["input_ids"])
    assert list(back.non_tensors["gt"]) == list(b.non_tensors["gt"])


def test_repeat_interleave():
    b = make_batch(2)
    r = b.repeat(3, interleave=True)
    assert len(r) == 6
    np.testing.assert_array_equal(r.tensors["input_ids"][0], r.tensors["input_ids"][1])
    assert r.non_tensors["gt"][0] == r.non_tensors["gt"][2] == "answer-0"
    assert r.non_tensors["gt"][3] == "answer-1"


def test_union_conflict_detection():
    b = make_batch(2)
    other = RolloutBatch.from_dict(tensors={"extra": np.zeros((2, 1))})
    b.union(other)
    assert "extra" in b.tensors
    conflicting = RolloutBatch.from_dict(tensors={"input_ids": np.zeros((2, 4), dtype=np.int64)})
    with pytest.raises(ValueError):
        b.union(conflicting)


def test_pop_select_reorder():
    b = make_batch(4)
    popped = b.pop(tensor_keys=["mask"])
    assert "mask" in popped.tensors and "mask" not in b.tensors
    idx = np.array([3, 2, 1, 0])
    b.reorder(idx)
    assert b.non_tensors["gt"][0] == "answer-3"


def test_pad_unpad_divisor():
    b = make_batch(5)
    padded, pad = pad_to_divisor(b, 4)
    assert len(padded) == 8 and pad == 3
    # cyclic repeat from the start
    assert padded.non_tensors["gt"][5] == "answer-0"
    restored = unpad(padded, pad)
    assert len(restored) == 5


def test_make_iterator_covers_batch():
    b = make_batch(6)
    seen = []
    for mb in b.make_iterator(mini_batch_size=2, epochs=2, seed=0):
        assert len(mb) == 2
        seen.append(mb.tensors["input_ids"][:, 0])
    assert len(seen) == 6  # 3 minibatches x 2 epochs


def test_config_defaults_and_post_init():
    cfg = build_config(["algorithm.use_kl_loss=true", "algorithm.kl_coef=0.05"])
    assert cfg.worker.actor.use_kl_loss is True
    assert cfg.worker.actor.kl_loss_coef == 0.05
    assert cfg.worker.rollout.prompt_length == cfg.data.max_prompt_length
    assert cfg.trainer.save_checkpoint_path.startswith("checkpoints/")


def test_config_yaml_and_dotlist(tmp_path):
    yaml_file = tmp_path / "c.yaml"
    yaml_file.write_text(
        "data:\n  rollout_batch_size: 64\nworker:\n  rollout:\n    n: 8\n    temperature: 0.9\n"
    )
    cfg = build_config([f"config={yaml_file}", "worker.rollout.n=4", "trainer.nnodes=2"])
    assert cfg.data.rollout_batch_size == 64
    assert cfg.worker.rollout.n == 4  # CLI beats YAML
    assert cfg.worker.rollout.temperature == 0.9
    assert cfg.trainer.nnodes == 2


def test_config_unknown_key_raises():
    with pytest.raises(KeyError):
        build_config(["data.nonexistent_key=1"])


def test_config_scalar_parsing():
    cfg = build_config(
        ["algorithm.kl_coef=1.0e-2", "data.shuffle=false", "trainer.logger=['console','wandb']"]
    )
    assert cfg.algorithm.kl_coef == 0.01
    assert cfg.data.shuffle is False
    assert cfg.trainer.logger == ["console", "wandb"]


def test_trim_prompt_padding():
    from spatialthinker_tpu.trainer.grpo_trainer import GRPOTrainer

    p = 64
    seg = np.zeros((2, p), dtype=np.int32)
    seg[0, -10:] = 1
    seg[1, -20:] = 1
    batch = RolloutBatch.from_dict(
        tensors={
            "input_ids": np.arange(2 * p).reshape(2, p),
            "segment_ids": seg,
            "position_ids": np.ones((2, 3, p), dtype=np.int32),
            "gen_pos_start": np.array([10, 20], dtype=np.int32),
        },
    )
    trimmed = GRPOTrainer.trim_prompt_padding(batch, bucket=16)
    # longest prompt 20 -> bucket 32
    assert trimmed.tensors["input_ids"].shape == (2, 32)
    assert trimmed.tensors["segment_ids"][1].sum() == 20
    assert trimmed.tensors["position_ids"].shape == (2, 3, 32)
    # tokens preserved (right-aligned)
    np.testing.assert_array_equal(
        trimmed.tensors["input_ids"][0], np.arange(2 * p).reshape(2, p)[0, -32:]
    )
    # no trim when bucket exceeds current length
    untouched = GRPOTrainer.trim_prompt_padding(batch, bucket=128)
    assert untouched.tensors["input_ids"].shape == (2, 64)


def test_trim_response_padding():
    from spatialthinker_tpu.trainer.grpo_trainer import GRPOTrainer

    b, p, r = 2, 8, 64
    mask = np.zeros((b, r), dtype=np.int32)
    mask[0, :5] = 1
    mask[1, :9] = 1
    batch = RolloutBatch.from_dict(
        tensors={
            "input_ids": np.ones((b, p), dtype=np.int32),
            "responses": np.arange(b * r).reshape(b, r),
            "response_mask": mask,
            "token_level_scores": np.random.rand(b, r).astype(np.float32),
            "full_input_ids": np.ones((b, p + r), dtype=np.int32),
            "full_segment_ids": np.ones((b, p + r), dtype=np.int32),
        },
    )
    out = GRPOTrainer.trim_response_padding(batch, bucket=8)
    assert out.tensors["responses"].shape == (b, 16)  # 9 -> bucket 16
    assert out.tensors["full_input_ids"].shape == (b, p + 16)
    assert out.tensors["response_mask"][1].sum() == 9
    # no trim when already small
    same = GRPOTrainer.trim_response_padding(batch, bucket=128)
    assert same.tensors["responses"].shape == (b, r)


def test_rollout_probs_diff_metric():
    """Behavior-policy drift metric: |engine - bf16-graph| log-probs on
    response tokens only."""
    import numpy as np

    from spatialthinker_tpu.trainer.metrics import compute_data_metrics

    b, r = 2, 4
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], np.int32)
    old = np.zeros((b, r), np.float32)
    roll = np.full((b, r), 0.5, np.float32)
    roll[0, 2:] = 99.0  # masked cells must not count
    m = compute_data_metrics(
        token_level_scores=np.zeros((b, r)), token_level_rewards=np.zeros((b, r)),
        advantages=np.zeros((b, r)), returns=np.zeros((b, r)),
        response_mask=mask, prompt_mask=mask,
        old_log_probs=old, rollout_log_probs=roll,
    )
    assert abs(m["rollout/probs_diff_mean"] - 0.5) < 1e-6
    assert abs(m["rollout/probs_diff_max"] - 0.5) < 1e-6
    m2 = compute_data_metrics(
        token_level_scores=np.zeros((b, r)), token_level_rewards=np.zeros((b, r)),
        advantages=np.zeros((b, r)), returns=np.zeros((b, r)),
        response_mask=mask, prompt_mask=mask,
    )
    assert "rollout/probs_diff_mean" not in m2
