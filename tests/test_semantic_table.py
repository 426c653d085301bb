"""Curated VG vector table: the zero-egress default sem-sim backend, and the
measured hash-vs-table drift on realistic label pairs (VERDICT r3 task 8).

The reference scores label similarity with spaCy md vectors
(/root/reference/verl/utils/reward_score/spatial_sgg.py:12-39); with no spaCy
and no network on TPU hosts, the default is the curated feature table in
rewards/vg_table.py. These tests pin (a) the table is the default here,
(b) it fixes the hash backend's known failure mode (synonyms with disjoint
character n-grams score ~0), and (c) how much the full spatial reward moves
between the two backends on a realistic fixture — the documented drift.
"""

import json

import numpy as np
import pytest

from spatialthinker_tpu.rewards.semantic import (
    HashNgramBackend,
    TableBackend,
    get_backend,
    set_backend,
)
from spatialthinker_tpu.rewards.vg_table import WORD_FEATURES, build_table

# (prediction label, GT label) pairs a mid-training VLM actually emits:
# synonym/hypernym confusions with little character overlap.
SYNONYM_PAIRS = [
    ("man", "person"),
    ("woman", "lady"),
    ("kid", "child"),
    ("couch", "sofa"),
    ("tv", "television"),
    ("fridge", "refrigerator"),
    ("bike", "bicycle"),
    ("car", "truck"),
    ("cup", "mug"),
    ("road", "street"),
]
UNRELATED_PAIRS = [
    ("man", "pizza"),
    ("dog", "window"),
    ("car", "banana"),
    ("sky", "fork"),
    ("tree", "keyboard"),
]


@pytest.fixture
def table():
    words, vectors = build_table()
    return TableBackend(words=words, vectors=vectors)


def test_default_backend_is_table_on_this_host(monkeypatch):
    monkeypatch.delenv("SPATIALTHINKER_SEMSIM_TABLE", raising=False)
    set_backend(None)  # reset the cached singleton
    try:
        backend = get_backend()
        assert isinstance(backend, TableBackend)
    finally:
        set_backend(None)


def test_table_fixes_hash_synonym_blindness(table):
    """Synonyms with disjoint char n-grams: hash ~0, table well above."""
    hash_b = HashNgramBackend()
    for a, b in SYNONYM_PAIRS:
        t = table.similarity(a, b)
        h = hash_b.similarity(a, b)
        assert t > 0.3, (a, b, t)
        assert t > h - 1e-9, (a, b, t, h)
    # man/person is THE canonical case: zero shared ngrams
    assert hash_b.similarity("man", "person") < 0.2
    assert table.similarity("man", "person") > 0.5


def test_table_separates_unrelated(table):
    for a, b in UNRELATED_PAIRS:
        assert table.similarity(a, b) < 0.3, (a, b, table.similarity(a, b))
    # and ranks every synonym pair above every unrelated pair
    worst_syn = min(table.similarity(a, b) for a, b in SYNONYM_PAIRS)
    best_unrel = max(table.similarity(a, b) for a, b in UNRELATED_PAIRS)
    assert worst_syn > best_unrel


def test_table_basic_contract(table):
    assert table.similarity("chair.3", "chair.7") == 1.0  # id-stripped exact
    assert abs(table.similarity("man", "woman") - table.similarity("woman", "man")) < 1e-12
    # multi-word labels average word vectors (spaCy-doc style)
    assert table.similarity("fire hydrant", "hydrant") > 0.5
    # OOV phrases fall back to hashing without crashing
    assert -1.0 <= table.similarity("velociraptor", "man") <= 1.0


def _scene(objs):
    return {
        "objects": [
            {"id": f"{name}.{i + 1}", "bbox": list(map(float, box))}
            for i, (name, box) in enumerate(objs)
        ],
        "relationships": [],
    }


def _trace(scene, answer):
    return (
        f"<observe>scene</observe><scene>{json.dumps(scene)}</scene>"
        f"<think>t</think><answer>{answer}</answer>"
    )


def test_spatial_score_drift_hash_vs_table():
    """The documented drift: full spatial_sgg scores on a fixture where the
    prediction uses synonym labels for the GT objects. Under the hash backend
    the Hungarian cost treats synonyms as unrelated (2*(1-sim) ~ 2), degrading
    or flipping assignments; the table recovers them. Drift is reported as the
    per-sample |table - hash| on the spatial component."""
    from spatialthinker_tpu.rewards.spatial_sgg import spatial_sgg_compute_score

    problem = "Where is it? Image size: (640 x 480)"
    fixtures = []
    for (a, b), (c, d) in zip(SYNONYM_PAIRS[:5], SYNONYM_PAIRS[5:]):
        gt = _scene([(b, (10, 10, 100, 100)), (d, (200, 200, 320, 320))])
        pred = _scene([(a, (12, 11, 104, 98)), (c, (198, 205, 324, 318))])
        fixtures.append((_trace(pred, "A"), _trace(gt, "A")))

    words, vectors = build_table()
    drifts = []
    for pred_str, gt_str in fixtures:
        set_backend(HashNgramBackend())
        s_hash = spatial_sgg_compute_score(pred_str, gt_str, problem)
        set_backend(TableBackend(words=words, vectors=vectors))
        s_table = spatial_sgg_compute_score(pred_str, gt_str, problem)
        set_backend(None)
        # the boxes overlap well: with labels recovered the spatial component
        # must too (assignment still succeeds under hash because the CIoU term
        # dominates at 2 objects; the drift shows up when label confusion and
        # geometry trade off)
        drifts.append(abs(s_table["spatial_score"] - s_hash["spatial_score"]))
        assert s_table["spatial_score"] >= s_hash["spatial_score"] - 1e-9
        assert s_table["overall"] >= 0.6  # format+acc+count+good boxes
    # documented bound: on well-separated boxes the assignment agrees and the
    # drift is < 0.05; larger drift would mean the backend changes rewards
    # materially even when geometry is unambiguous
    assert max(drifts) < 0.05, drifts


def test_drift_when_geometry_is_ambiguous():
    """Two GT objects with overlapping boxes and synonym labels: hash cannot
    break the tie by semantics, the table can. This is the case where backend
    choice changes the assignment itself."""
    from spatialthinker_tpu.rewards.matching import match_objects

    gt = [
        {"id": "person", "bbox": [0.1, 0.1, 0.5, 0.5]},
        {"id": "dog", "bbox": [0.15, 0.12, 0.55, 0.52]},
    ]
    pred = [
        {"id": "puppy", "bbox": [0.14, 0.11, 0.54, 0.51]},
        {"id": "man", "bbox": [0.11, 0.1, 0.51, 0.5]},
    ]
    words, vectors = build_table()
    set_backend(TableBackend(words=words, vectors=vectors))
    try:
        assign = match_objects(gt, pred)
        # person -> man (idx 1), dog -> puppy? puppy is OOV -> hash fallback;
        # man/person carries the match, so person must NOT take puppy
        assert assign[0] == 1
    finally:
        set_backend(None)


def test_vocab_covers_common_vg_labels():
    """The curated vocabulary must keep covering the scorer's hot labels."""
    must_have = [
        "man", "woman", "person", "dog", "cat", "car", "table", "chair",
        "tree", "building", "on", "under", "holding", "wearing", "near",
        "left of", "right of", "behind", "in front of",
    ]
    for w in must_have:
        assert w in WORD_FEATURES, w
