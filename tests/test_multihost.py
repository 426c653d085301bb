"""Multi-host integration: two CPU processes (4 virtual devices each) run one
GRPO train_step as a single 8-device SPMD program and must agree with each
other and with the same step run in a single process (same global batch,
same keys -> same numerics)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return env


def _run_workers(nprocs, port, tag, tmp_path, mode=""):
    outs = [str(tmp_path / f"{tag}_{r}.json") for r in range(nprocs)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(r), str(nprocs), str(port), outs[r]]
            + ([mode] if mode else []),
            env=_env(), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in range(nprocs)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{log[-4000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_train_step_matches_single(tmp_path):
    single = _run_workers(1, 0, "single", tmp_path)[0]
    duo = _run_workers(2, 29517, "duo", tmp_path)

    # both ranks report the same (globally reduced) update metrics
    for key in ("actor/loss", "actor/pg_loss", "actor/grad_norm"):
        assert np.isfinite(duo[0][key])
        np.testing.assert_allclose(duo[0][key], duo[1][key], rtol=1e-4, atol=1e-5)
        # and the 2-process run reproduces the single-process numerics
        np.testing.assert_allclose(duo[0][key], single[key], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(
        duo[0]["reward/overall"], single["reward/overall"], rtol=1e-6, atol=1e-8
    )


def test_two_process_ref_offload_matches_resident(tmp_path):
    """worker.ref.offload=true across 2 processes: each process keeps its
    ADDRESSABLE shards on host and the restored global ref params reproduce
    the resident-copy numerics (kl terms depend on the ref log-probs)."""
    resident = _run_workers(2, 29551, "ro_res", tmp_path)
    offloaded = _run_workers(2, 29553, "ro_off", tmp_path, mode="refoff")
    for key in ("actor/loss", "actor/kl_loss", "actor/pg_loss", "actor/grad_norm"):
        assert np.isfinite(offloaded[0][key])
        np.testing.assert_allclose(offloaded[0][key], resident[0][key], rtol=1e-4, atol=1e-6)


def test_two_process_continuous_rollout_matches_single(tmp_path):
    """Continuous-engine rollout across 2 processes: the engine allgathers the
    prompt queue, every process runs the identical lockstep refill/harvest
    schedule over lane-sharded slot state, and the full train step (rollout ->
    reward -> update) reproduces the single-process numerics."""
    single = _run_workers(1, 0, "cont_single", tmp_path, mode="cont")[0]
    duo = _run_workers(2, 29541, "cont_duo", tmp_path, mode="cont")

    for key in ("actor/loss", "actor/pg_loss", "actor/grad_norm"):
        assert np.isfinite(duo[0][key])
        np.testing.assert_allclose(duo[0][key], duo[1][key], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(duo[0][key], single[key], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(
        duo[0]["reward/overall"], single["reward/overall"], rtol=1e-6, atol=1e-8
    )


def test_two_process_continuous_int4_kv_matches_single(tmp_path):
    """Continuous engine + packed int4 KV across 2 processes: the uint8
    slot caches and their per-token scales shard over the lane axis and the
    lockstep schedule reproduces single-process numerics."""
    single = _run_workers(1, 0, "kv4_single", tmp_path, mode="cont,kv4")[0]
    duo = _run_workers(2, 29551, "kv4_duo", tmp_path, mode="cont,kv4")

    for key in ("actor/loss", "actor/pg_loss", "actor/grad_norm"):
        assert np.isfinite(duo[0][key])
        np.testing.assert_allclose(duo[0][key], duo[1][key], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(duo[0][key], single[key], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(
        duo[0]["reward/overall"], single["reward/overall"], rtol=1e-6, atol=1e-8
    )


def test_two_process_paged_rollout_matches_single(tmp_path):
    """Paged-engine rollout across 2 processes: lanes shard over the batch
    axes, the KV page POOL shards over its page axis, every process runs the
    identical lockstep admission/allocation schedule over the allgathered
    queue, and the full train step reproduces single-process numerics."""
    single = _run_workers(1, 0, "paged_single", tmp_path, mode="paged")[0]
    duo = _run_workers(2, 29561, "paged_duo", tmp_path, mode="paged")

    for key in ("actor/loss", "actor/pg_loss", "actor/grad_norm"):
        assert np.isfinite(duo[0][key])
        np.testing.assert_allclose(duo[0][key], duo[1][key], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(duo[0][key], single[key], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(
        duo[0]["reward/overall"], single["reward/overall"], rtol=1e-6, atol=1e-8
    )


def test_two_process_paged_preemption_matches_single(tmp_path):
    """Paged engine under POOL PRESSURE across 2 processes: a tiny fixed pool
    (rollout.kv_pages_override, vLLM num_gpu_blocks_override parity) forces
    youngest-group preemption; every process must preempt/requeue the SAME
    groups at the same steps, and the numerics must match a single process
    running the identical schedule."""
    single = _run_workers(1, 0, "pgp_single", tmp_path, mode="paged,pgsmall")[0]
    duo = _run_workers(2, 29571, "pgp_duo", tmp_path, mode="paged,pgsmall")

    assert single["rollout/kv_preemptions"] > 0  # pressure actually happened
    assert duo[0]["rollout/kv_preemptions"] == single["rollout/kv_preemptions"]
    for key in ("actor/loss", "actor/pg_loss", "actor/grad_norm"):
        assert np.isfinite(duo[0][key])
        np.testing.assert_allclose(duo[0][key], duo[1][key], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(duo[0][key], single[key], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(
        duo[0]["reward/overall"], single["reward/overall"], rtol=1e-6, atol=1e-8
    )


def test_two_process_multimodal_train_step(tmp_path):
    """Multimodal across processes: hosts hold different patch counts, the
    vision pack is globally negotiated (padded slices, per-host offsets, per-
    row merge starts) and the 2-process step reproduces single-process
    numerics."""
    single = _run_workers(1, 0, "mm_single", tmp_path, mode="mm")[0]
    duo = _run_workers(2, 29531, "mm_duo", tmp_path, mode="mm")

    for key in ("actor/loss", "actor/pg_loss", "actor/grad_norm"):
        assert np.isfinite(duo[0][key])
        np.testing.assert_allclose(duo[0][key], duo[1][key], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(duo[0][key], single[key], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(
        duo[0]["reward/overall"], single["reward/overall"], rtol=1e-6, atol=1e-8
    )
