"""Data synthesis pipeline tests with a fake LLM (no network)."""

import json

import numpy as np
import pytest

from spatialthinker_tpu.data_gen import (
    build_hf_dataset,
    compute_data_stats,
    correct_count_answer,
    cross_validate,
    easy_hard_splits,
    expand_question_words,
    extract_json_from_output,
    generate_questions,
    map_objects,
    map_relationships,
    normalize_token,
    shuffle_options_deterministic,
)


def test_normalize_and_expand():
    assert normalize_token("Chairs") == "chair"
    assert normalize_token("children") == "child"
    assert normalize_token("boxes") == "box"
    words = expand_question_words("How many chairs are next to the table?")
    assert "chair" in words and "table" in words
    assert "how" not in words and "the" not in words


def test_map_objects_and_relationships():
    objs = [
        {"id": "chair.1", "bbox": [0, 0, 1, 1]},
        {"id": "chair.2", "bbox": [1, 1, 2, 2]},
        {"id": "lamp.3", "bbox": [2, 2, 3, 3]},
    ]
    rels = [
        {"subject": "chair.1", "predicate": "next to", "object": "table.9"},
        {"subject": "lamp.3", "predicate": "on", "object": "desk.4"},
    ]
    words = expand_question_words("How many chairs are near the table?")
    assert len(map_objects(objs, words)) == 2
    assert len(map_relationships(rels, words)) == 1


def test_extract_json():
    assert json.loads(extract_json_from_output('text {"a": 1} tail'))["a"] == 1
    fenced = "```json\n{\"q\": \"x\"}\n```"
    assert json.loads(extract_json_from_output(fenced))["q"] == "x"
    nested = 'pre {"a": {"b": 2}} post'
    assert json.loads(extract_json_from_output(nested))["a"]["b"] == 2


def test_compute_data_stats():
    stats, last = compute_data_stats([])
    assert stats["count"] == "0.0%"
    rows = [{"category": "count", "level": "easy"}, {"category": "relation", "level": "hard"}]
    stats, last = compute_data_stats(rows)
    assert stats["count"] == "50.0%" and stats["hard"] == "50.0%"
    assert "relation" in last


def test_correct_count_answer():
    words = expand_question_words("How many chairs are there?")
    objs = [{"id": "chair.1", "bbox": []}, {"id": "chair.2", "bbox": []}]
    # LLM claimed answer B='3' but true count is 2, present at option A
    options, letter, changed = correct_count_answer(words, objs, ["2", "3", "4", "5"], "B")
    assert changed and letter == "A"
    # true count absent -> overwrite claimed slot
    options, letter, changed = correct_count_answer(words, objs, ["7", "3", "4", "5"], "B")
    assert changed and letter == "B" and options[1] == "2"
    # already correct
    options, letter, changed = correct_count_answer(words, objs, ["2", "3"], "A")
    assert not changed


def test_shuffle_options_deterministic():
    options = ["red", "green", "blue", "yellow"]
    s1, l1 = shuffle_options_deterministic(options, "B", "some question")
    s2, l2 = shuffle_options_deterministic(options, "B", "some question")
    assert s1 == s2 and l1 == l2
    assert s1[ord(l1) - 65] == "green"


class _FakeImage:
    size = (640, 480)


def _fake_llm_factory():
    count = {"n": 0}

    def call(prompt):
        count["n"] += 1
        cat = ["count", "relation", "depth"][count["n"] % 3]
        return json.dumps(
            {
                "question": f"How many chairs are visible? v{count['n']}",
                "options": ["(A) 1", "(B) 2", "(C) 3", "(D) 4"],
                "answer": "B",
                "category": cat,
                "level": ["easy", "medium", "hard"][count["n"] % 3],
                "rating": 5 + count["n"] % 3,
            }
        )

    return call


def test_generate_questions_pipeline(tmp_path):
    dataset = [
        {
            "image_id": i,
            "image": _FakeImage(),
            "objects": json.dumps(
                [{"id": "chair.1", "bbox": [0, 0, 10, 10]}, {"id": "chair.2", "bbox": [5, 5, 15, 15]}]
            ),
            "relationships": json.dumps(
                [{"subject": "chair.1", "predicate": "next to", "object": "chair.2"}]
            ),
        }
        for i in range(3)
    ]
    rows = generate_questions(
        _fake_llm_factory(), dataset, out_csv=str(tmp_path / "out.csv"), save_every=2
    )
    assert len(rows) == 3
    assert all("<scene>" in r["answer"] and "<answer>" in r["answer"] for r in rows)
    assert "Image size: (640 x 480)" in rows[0]["problem"]
    # count question auto-corrected: true chair count is 2 -> letter B stays ('2')
    count_rows = [r for r in rows if r["category"] == "count"]
    for r in count_rows:
        assert "<answer>B</answer>" in r["answer"] or "<answer>A</answer>" in r["answer"]
    assert (tmp_path / "out.csv").exists()


def test_build_hf_and_splits():
    rows = []
    for i in range(20):
        cat = "relation" if i < 10 else ["count", "depth"][i % 2]
        rows.append(
            {
                "question_only": f"q{i}",
                "problem": f"prefix\nq{i}",
                "question_with_options": f"q{i}\n\nOptions:\n(A) 1",
                "options": ["1", "2", "3", "4"],
                "answer": "<scene>{}</scene>\n<answer>A</answer>",
                "category": cat,
                "level": ["easy", "hard"][i % 2],
                "rating": i,
                "images": _FakeImage(),
            }
        )
    out = build_hf_dataset(rows, target_size=8, relation_fraction=0.5)
    cats = [r["category"] for r in out]
    assert cats.count("relation") == 4
    assert all("answer_letter" in r and "answer_only" in r for r in out)

    easy, hard = easy_hard_splits(out)
    assert all(r["level"] in ("easy", "medium") for r in easy)
    assert all(r["level"] == "hard" for r in hard)


def test_cross_validate_pass_at_k():
    rows = [
        {"question_only": "q", "options": ["1", "2"], "images": _FakeImage(),
         "answer": "<answer>A</answer>", "answer_letter": "A"},
        {"question_only": "q2", "options": ["1", "2"], "images": _FakeImage(),
         "answer": "<answer>B</answer>", "answer_letter": "B"},
    ]

    def checker(question, options, image):
        return "A"  # always answers A

    kept = cross_validate(rows, checker, attempts=2, retry_attempts=0)
    assert len(kept) == 1 and kept[0]["answer_letter"] == "A"
