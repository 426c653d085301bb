"""Unit tests for the reward stack: geometry, scene validation, matching, and
the four scorers. Golden expectations derive from the published reward spec
(format 0.1 / count 0.2 / accuracy 0.5 / spatial 0.2, spatial gated on
format & accuracy)."""

import json

import numpy as np
import pytest

from spatialthinker_tpu.rewards.geometry import box_l1, ciou, giou, iou, pairwise_ciou, pairwise_iou
from spatialthinker_tpu.rewards.grading import extract_boxed_content, grade_answer
from spatialthinker_tpu.rewards.matching import match_objects, match_triplets
from spatialthinker_tpu.rewards.math_reward import math_compute_score
from spatialthinker_tpu.rewards.r1v import r1v_compute_score
from spatialthinker_tpu.rewards.r1v_scene import r1v_scene_compute_score
from spatialthinker_tpu.rewards.scene import (
    extract_answer,
    extract_image_size,
    extract_scene,
    format_reward,
    is_valid_object,
    is_valid_relation,
)
from spatialthinker_tpu.rewards.spatial_sgg import (
    acc_reward,
    count_reward,
    relaxed_spatial_reward,
    spatial_sgg_compute_score,
)


# ---------------------------------------------------------------- geometry

def test_iou_identical_and_disjoint():
    a = [0, 0, 2, 2]
    assert iou(a, a) == pytest.approx(1.0)
    assert iou(a, [5, 5, 6, 6]) == 0.0
    # half overlap
    assert iou([0, 0, 2, 2], [1, 0, 3, 2]) == pytest.approx(1 / 3)


def test_ciou_properties():
    a = [0.1, 0.1, 0.5, 0.5]
    assert ciou(a, a) == pytest.approx(1.0, abs=1e-5)
    # disjoint but nearby boxes: CIoU in (0, 1), lower when further away
    near = ciou(a, [0.6, 0.1, 0.9, 0.5])
    far = ciou(a, [0.6, 0.6, 0.9, 0.9])
    assert 0.0 < far < near < 1.0
    # symmetric
    assert ciou(a, [0.6, 0.6, 0.9, 0.9]) == pytest.approx(ciou([0.6, 0.6, 0.9, 0.9], a))


def test_pairwise_matches_scalar():
    rng = np.random.default_rng(0)
    pts = rng.random((4, 2))
    boxes_a = np.concatenate([pts, pts + rng.random((4, 2))], axis=1)
    pts2 = rng.random((3, 2))
    boxes_b = np.concatenate([pts2, pts2 + rng.random((3, 2))], axis=1)
    M = pairwise_ciou(boxes_a, boxes_b)
    for i in range(4):
        for j in range(3):
            assert M[i, j] == pytest.approx(ciou(boxes_a[i], boxes_b[j]), abs=1e-9)
    I = pairwise_iou(boxes_a, boxes_b)
    for i in range(4):
        for j in range(3):
            assert I[i, j] == pytest.approx(iou(boxes_a[i], boxes_b[j]), abs=1e-9)


def test_giou_l1():
    assert giou([0, 0, 1, 1], [0, 0, 1, 1]) == pytest.approx(1.0)
    assert box_l1([0, 0, 1, 1], [1, 1, 2, 2]) == pytest.approx(4.0)


# ---------------------------------------------------------------- scene schema

def test_valid_object_schema():
    assert is_valid_object({"id": "chair.1", "bbox": [1, 2, 3, 4]})
    assert not is_valid_object({"id": "chair", "bbox": [1, 2, 3, 4]})  # missing .N
    assert not is_valid_object({"id": "chair.1", "bbox": [1, 2, 3]})  # len 3
    assert not is_valid_object({"id": "chair.1", "bbox": [1, 2, 3, "x"]})  # non-numeric
    assert not is_valid_object({"id": "chair.1", "bbox": [1, 2, 3, 4], "extra": 1})  # extra key
    assert not is_valid_object({"bbox": [1, 2, 3, 4]})


def test_valid_relation_schema():
    assert is_valid_relation({"subject": "cat.1", "predicate": "on", "object": "mat.2"})
    assert not is_valid_relation({"subject": "cat", "predicate": "on", "object": "mat.2"})
    assert not is_valid_relation({"subject": "cat.1", "object": "mat.2"})


GOOD_SCENE = {
    "objects": [
        {"id": "cat.1", "bbox": [10, 10, 50, 50]},
        {"id": "mat.2", "bbox": [0, 40, 100, 100]},
    ],
    "relationships": [{"subject": "cat.1", "predicate": "on", "object": "mat.2"}],
}


def make_trace(scene=GOOD_SCENE, answer="yes"):
    return (
        "<observe>I see a cat.</observe>"
        f"<scene>{json.dumps(scene)}</scene>"
        "<think>The cat sits on the mat.</think>"
        f"<answer>{answer}</answer>"
    )


def test_format_reward_good():
    assert format_reward(make_trace()) == 1.0


def test_format_reward_failures():
    assert format_reward("<think>x</think><answer>y</answer>") == 0.0  # missing tags
    assert format_reward(make_trace() + "<answer>dup</answer>") == 0.0  # duplicate tag
    bad_scene = {"objects": [{"id": "cat", "bbox": [1, 2, 3, 4]}], "relationships": []}
    assert format_reward(make_trace(scene=bad_scene)) == 0.0  # invalid id format
    dup_ids = {
        "objects": [
            {"id": "cat.1", "bbox": [1, 2, 3, 4]},
            {"id": "cat.1", "bbox": [5, 6, 7, 8]},
        ],
        "relationships": [],
    }
    assert format_reward(make_trace(scene=dup_ids)) == 0.0  # repeated ids
    assert format_reward(make_trace().replace("</scene>", "</scene") ) == 0.0


def test_extracts():
    t = make_trace(answer=" Yes ")
    assert extract_answer(t) == "Yes"
    assert extract_scene(t)["objects"][0]["id"] == "cat.1"
    assert extract_scene("<scene>not json</scene>") == {}
    assert extract_image_size("... Image size: (640 x 480) ...") == (640, 480)
    with pytest.raises(ValueError):
        extract_image_size("no size here")


# ---------------------------------------------------------------- counting

def test_count_reward_objects_only():
    gt = {"objects": [{}] * 4, "relationships": []}
    assert count_reward({"objects": [{}] * 4, "relationships": []}, gt) == 1.0
    assert count_reward({"objects": [{}] * 2, "relationships": []}, gt) == pytest.approx(0.5)
    assert count_reward({"objects": [{}] * 8, "relationships": []}, gt) == 0.0


def test_count_reward_blend_with_relations():
    gt = {"objects": [{}] * 4, "relationships": [{}] * 2}
    pred = {"objects": [{}] * 4, "relationships": [{}] * 1}
    # obj term 1.0 * 0.7 + rel term (1 - 1/2)=0.5 * 0.3
    assert count_reward(pred, gt) == pytest.approx(0.7 + 0.15)


def test_count_reward_invalid():
    assert count_reward("nope", {}) == 0.0
    assert count_reward({}, {"objects": []}) == 0.0  # pred objects missing -> not list


# ---------------------------------------------------------------- matching

def test_match_objects_prefers_overlap_and_label():
    gt = [
        {"id": "cat.1", "bbox": [0.0, 0.0, 0.4, 0.4]},
        {"id": "dog.2", "bbox": [0.5, 0.5, 0.9, 0.9]},
    ]
    pr = [
        {"id": "dog.1", "bbox": [0.5, 0.5, 0.9, 0.9]},
        {"id": "cat.7", "bbox": [0.0, 0.0, 0.4, 0.4]},
    ]
    mapping = match_objects(gt, pr)
    assert mapping == [1, 0]


def test_match_objects_fewer_preds_leaves_unmatched():
    gt = [
        {"id": "cat.1", "bbox": [0.0, 0.0, 0.4, 0.4]},
        {"id": "dog.2", "bbox": [0.5, 0.5, 0.9, 0.9]},
    ]
    pr = [{"id": "cat.1", "bbox": [0.0, 0.0, 0.4, 0.4]}]
    mapping = match_objects(gt, pr)
    assert mapping[0] == 0 and mapping[1] is None


def test_match_triplets():
    gt = [{"subject": "cat.1", "predicate": "on", "object": "mat.2"}]
    pr = [
        {"subject": "dog.1", "predicate": "under", "object": "table.2"},
        {"subject": "cat.1", "predicate": "on", "object": "mat.2"},
    ]
    matches = match_triplets(gt, pr)
    assert len(matches) == 1
    assert matches[0]["prediction"]["subject"] == "cat.1"
    assert matches[0]["similarity"] == pytest.approx(1.0)


# ---------------------------------------------------------------- spatial reward

def test_relaxed_spatial_perfect_prediction():
    score = relaxed_spatial_reward(GOOD_SCENE, GOOD_SCENE, 100, 100)
    assert score == pytest.approx(1.0, abs=1e-5)


def test_relaxed_spatial_invalid_pred():
    bad = {"objects": [{"id": "cat", "bbox": [1, 2, 3, 4]}], "relationships": []}
    assert relaxed_spatial_reward(bad, GOOD_SCENE, 100, 100) == 0.0
    assert relaxed_spatial_reward("x", GOOD_SCENE, 100, 100) == 0.0


def test_relaxed_spatial_empty_gt():
    empty = {"objects": [], "relationships": []}
    assert relaxed_spatial_reward(empty, empty, 100, 100) == 1.0
    assert relaxed_spatial_reward(GOOD_SCENE, empty, 100, 100) == 0.0


def test_spatial_sgg_full_score_perfect():
    problem = "Look. Image size: (100 x 100)"
    gt = make_trace(answer="yes")
    score = spatial_sgg_compute_score(make_trace(answer="yes"), gt, problem)
    assert score["format"] == 1.0
    assert score["accuracy"] == 1.0
    assert score["count"] == 1.0
    assert score["spatial_score"] == pytest.approx(1.0, abs=1e-5)
    assert score["overall"] == pytest.approx(1.0, abs=1e-5)


def test_spatial_sgg_format_gates_everything():
    problem = "Image size: (100 x 100)"
    gt = make_trace(answer="yes")
    score = spatial_sgg_compute_score("<answer>yes</answer>", gt, problem)
    assert score == {
        "overall": 0.0,
        "format": 0.0,
        "count": 0.0,
        "accuracy": 0.0,
        "spatial_score": 0.0,
    }


def test_spatial_sgg_wrong_answer_gates_spatial():
    problem = "Image size: (100 x 100)"
    gt = make_trace(answer="yes")
    score = spatial_sgg_compute_score(make_trace(answer="no"), gt, problem)
    assert score["format"] == 1.0
    assert score["accuracy"] == 0.0
    assert score["spatial_score"] == 0.0
    assert score["overall"] == pytest.approx(0.1 * 1.0 + 0.2 * 1.0)


def test_acc_reward_case_insensitive():
    assert acc_reward(" YES ", "yes") == 1.0
    assert acc_reward("no", "yes") == 0.0


# ---------------------------------------------------------------- sparse scorers

def test_r1v_scoring():
    good = "<think>hmm</think> <answer>42</answer>"
    s = r1v_compute_score(good, "42")
    assert s["overall"] == 1.0
    s = r1v_compute_score("<answer>42</answer>", "42")  # bad format
    assert s["format"] == 0.0 and s["accuracy"] == 1.0 and s["overall"] == 0.5
    s = r1v_compute_score(good, "<answer>42</answer>")  # gt wrapped in tags
    assert s["accuracy"] == 1.0


def test_r1v_scene_scoring():
    good = (
        "<observe>a</observe> <scene>{}</scene> <think>b</think> <answer>C</answer>"
    )
    s = r1v_scene_compute_score(good, "<answer>c</answer>")
    assert s["overall"] == 1.0
    s = r1v_scene_compute_score("<think>b</think><answer>c</answer>", "<answer>c</answer>")
    assert s == {"overall": 0.0, "format": 0.0, "accuracy": 0.0}


def test_math_scoring():
    good = "<think>steps</think> the answer is \\boxed{3/4}"
    s = math_compute_score(good, "0.75")
    assert s["accuracy"] == 1.0 and s["format"] == 1.0
    assert s["overall"] == pytest.approx(1.0)
    s = math_compute_score("answer \\boxed{5}", "5")
    assert s["format"] == 0.0 and s["accuracy"] == 1.0


def test_grading_fallback():
    assert grade_answer("1,234", "1234")
    assert grade_answer("\\frac{1}{2}", "0.5")
    assert grade_answer("(A)", "a")
    assert not grade_answer("7", "8")
    assert extract_boxed_content("x \\boxed{\\frac{1}{2}} y") == "\\frac{1}{2}"


def test_reward_manager_places_reward_on_last_token():
    from spatialthinker_tpu.core.batch import RolloutBatch
    from spatialthinker_tpu.rewards.manager import RewardManager

    class FakeTok:
        def batch_decode(self, seqs, skip_special_tokens=True):
            texts = {
                1: "<think>t</think> <answer>42</answer>",
                2: "wrong",
            }
            return [texts[int(s[0])] for s in seqs]

    responses = np.array([[1, 1, 0, 0], [2, 2, 2, 0]], dtype=np.int32)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], dtype=np.int32)
    batch = RolloutBatch.from_dict(
        tensors={"responses": responses, "response_mask": mask},
        non_tensors={"ground_truth": ["42", "42"], "problem": ["p", "p"]},
    )
    manager = RewardManager(FakeTok(), "r1v", num_workers=2)
    rewards, metrics = manager(batch)
    assert rewards[0, 1] == 1.0 and rewards[0, 0] == 0.0
    assert rewards[1, 2] == 0.0
    assert metrics["overall"] == [1.0, 0.0]
    assert "format" in metrics and "accuracy" in metrics


def test_table_backend_similarity(tmp_path):
    import numpy as np

    from spatialthinker_tpu.rewards.semantic import TableBackend

    words = np.array(["cat", "kitten", "car"], dtype=object)
    vectors = np.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]])
    path = str(tmp_path / "vecs.npz")
    np.savez(path, words=words, vectors=vectors)
    backend = TableBackend(path)
    assert backend.similarity("cat.1", "cat.2") == 1.0
    assert backend.similarity("cat", "kitten") > backend.similarity("cat", "car")
    # OOV falls back to the hash backend without crashing
    assert -1.0 <= backend.similarity("cat", "zeppelin") <= 1.0
