"""Tests: C++ assignment solver vs scipy, seqlen balancing, FLOPs counter."""

import numpy as np
import pytest

from spatialthinker_tpu.csrc import lap
from spatialthinker_tpu.utils.flops_counter import FlopsCounter, device_peak_flops
from spatialthinker_tpu.utils.seqlen_balancing import (
    balance_order,
    get_seqlen_balanced_partitions,
    greedy_partition,
    karmarkar_karp,
)


def _total_cost(cost, rows, cols):
    return float(cost[rows, cols].sum())


@pytest.mark.parametrize("shape", [(3, 3), (5, 5), (7, 4), (10, 10), (4, 4)])
def test_lap_matches_scipy_optimal_cost(shape):
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(sum(shape))
    for trial in range(10):
        cost = rng.random(shape) * 10
        r1, c1 = lap.solve(cost)
        r2, c2 = linear_sum_assignment(cost)
        assert len(r1) == len(r2)
        assert len(set(c1)) == len(c1), "columns must be unique"
        np.testing.assert_allclose(_total_cost(cost, r1, c1), _total_cost(cost, r2, c2), rtol=1e-9)


def test_lap_with_dummy_high_cost_rows():
    """The reward matcher pads rows at 1e5; solver must avoid assigning real
    columns to dummies when possible."""
    from scipy.optimize import linear_sum_assignment

    cost = np.array([[1.0, 9.0], [1e5, 1e5], [8.0, 2.0]])
    r1, c1 = lap.solve(cost)
    r2, c2 = linear_sum_assignment(cost)
    np.testing.assert_allclose(_total_cost(cost, r1, c1), _total_cost(cost, r2, c2))


def test_lap_used_by_matching():
    # End-to-end through the reward matcher (exercises the ctypes path)
    from spatialthinker_tpu.rewards.matching import match_objects

    gt = [{"id": "cat.1", "bbox": [0.0, 0.0, 0.4, 0.4]},
          {"id": "dog.2", "bbox": [0.5, 0.5, 0.9, 0.9]}]
    pr = [{"id": "dog.9", "bbox": [0.5, 0.5, 0.9, 0.9]},
          {"id": "cat.3", "bbox": [0.0, 0.0, 0.4, 0.4]}]
    assert match_objects(gt, pr) == [1, 0]


def test_karmarkar_karp_equal_partitions():
    seqlens = [10, 9, 8, 7, 3, 2, 2, 1]
    groups = karmarkar_karp(seqlens, 4, equal_size=True)
    assert sorted(i for g in groups for i in g) == list(range(8))
    sums = [sum(seqlens[i] for i in g) for g in groups]
    assert max(sums) - min(sums) <= 3  # KK gets close to perfect (10.5 avg)


def test_balance_order_covers_all():
    rng = np.random.default_rng(0)
    seqlens = rng.integers(1, 1000, size=16).tolist()
    order = balance_order(seqlens, 4)
    assert sorted(order) == list(range(16))


def test_greedy_partition_respects_caps():
    groups = greedy_partition([5, 4, 3, 2, 1, 1], 3, equal_size=True)
    assert all(len(g) == 2 for g in groups)


def test_balanced_better_than_naive():
    rng = np.random.default_rng(1)
    seqlens = rng.integers(1, 1000, size=32).tolist()
    groups = get_seqlen_balanced_partitions(seqlens, 4)
    sums = [sum(seqlens[i] for i in g) for g in groups]
    naive = [sum(seqlens[i * 8 : (i + 1) * 8]) for i in range(4)]
    assert max(sums) - min(sums) <= max(naive) - min(naive)


def test_flops_counter_finite_and_scaled():
    from spatialthinker_tpu.models.qwen2_5_vl import qwen25_vl_tiny

    counter = FlopsCounter(qwen25_vl_tiny())
    achieved, promised = counter.estimate_flops([128, 256], delta_time=1.0)
    assert achieved > 0 and promised > 0
    achieved2, _ = counter.estimate_flops([128, 256], delta_time=0.5)
    np.testing.assert_allclose(achieved2, achieved * 2, rtol=1e-6)


def test_device_peak_table():
    assert device_peak_flops("TPU v5 lite") == 197e12
    assert device_peak_flops("TPU v5p chip") == 459e12
    assert device_peak_flops("unknown thing") == 197e12
