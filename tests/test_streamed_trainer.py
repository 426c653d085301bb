"""Trainer integration of the host-streamed optimizer knob
(``worker.actor.optim.stream``): the single-chip 3B fit — Adam moments stay
host-resident and the update applies in layer-slice round trips
(trainer/streamed_opt.py; leaf math pinned bitwise-equal to the fused
optimizer by tests/test_streamed_opt.py).

The end-to-end run lives in a subprocess with ONE cpu device because the
suite's conftest forces an 8-virtual-device topology and streaming is
rejected on multi-device meshes (FSDP over >=2 chips fits 3B outright).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "streamed_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stream_rejected_on_multidevice_mesh(tmp_path):
    from tests.test_e2e_smoke import build_trainer

    with pytest.raises(ValueError, match="optim.stream"):
        build_trainer(
            tmp_path, extra_overrides=("worker.actor.optim.stream=true",)
        )


def test_streamed_trainer_end_to_end(tmp_path):
    out = str(tmp_path / "streamed.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, WORKER, out, str(tmp_path)],
        env=env, cwd=REPO, capture_output=True, timeout=1800,
    )
    log = proc.stdout.decode(errors="replace") + proc.stderr.decode(errors="replace")
    assert proc.returncode == 0, f"worker rc={proc.returncode}\n{log[-4000:]}"
    result = json.load(open(out))

    metrics = result["metrics"]
    for key in ("actor/pg_loss", "actor/grad_norm", "reward/overall"):
        assert key in metrics, key
        assert np.isfinite(metrics[key]), (key, metrics[key])
    assert result["param_delta"] > 0  # the streamed apply moved the params
    # one optimizer apply per step (1 mini-batch x 1 ppo epoch), 2 steps
    assert result["final_count"] >= 1
    # checkpoint round trip: streamed state (host numpy + count) via orbax
    assert result["resumed_step"] == 2
    assert result["resumed_count"] == result["final_count"]
    assert result["params_match"]
    assert result["mu_match"]
    # the restored state took a real step (in-place moment writes succeed on
    # orbax-restored leaves) and the count advanced
    assert result["post_restore_count"] == result["final_count"] + 1
    assert result["post_restore_moved"]
    # stream + use_kahan_summation=false checkpoints save and resume (the ()
    # compensation sentinels are orbax-saveable; (0,) sentinels were not)
    assert result["nokahan_ckpt_ok"]
