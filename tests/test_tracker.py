"""Tracker fan-out: jsonl round-trip, unavailable-backend skipping, and the
mlflow/swanlab backends against stub modules (parity surface:
/root/reference/verl/utils/logger/logger.py:122-154)."""

import json
import sys
import types

from spatialthinker_tpu.trainer.tracker import Tracker


def test_jsonl_backend_roundtrip(tmp_path):
    t = Tracker(["jsonl"], "proj", "exp", base_dir=str(tmp_path))
    t.log({"actor/loss": 0.5, "step_note": "x"}, step=1)
    t.log({"actor/loss": 0.25}, step=2)
    t.finish()
    lines = [json.loads(l) for l in open(tmp_path / "exp_metrics.jsonl")]
    assert lines[0]["actor/loss"] == 0.5 and lines[1]["step"] == 2


def test_unavailable_backends_skip_gracefully(tmp_path, capsys):
    t = Tracker(["mlflow", "swanlab", "wandb"], "proj", "exp", base_dir=str(tmp_path))
    out = capsys.readouterr().out
    assert t.backends == []
    assert "mlflow unavailable" in out and "swanlab unavailable" in out


def test_mlflow_backend_with_stub(tmp_path, monkeypatch):
    calls = {"metrics": [], "texts": [], "ended": 0}
    stub = types.SimpleNamespace(
        set_experiment=lambda p: calls.setdefault("exp", p),
        start_run=lambda run_name: types.SimpleNamespace(name=run_name),
        log_metrics=lambda m, step: calls["metrics"].append((m, step)),
        log_text=lambda text, path: calls["texts"].append(path),
        end_run=lambda: calls.__setitem__("ended", calls["ended"] + 1),
    )
    monkeypatch.setitem(sys.modules, "mlflow", stub)
    t = Tracker(["mlflow"], "proj", "exp")
    assert len(t.backends) == 1
    t.log({"actor/loss": 1.0, "note": "skip-me"}, step=3)
    t.log_generations([("q", "a", "gt", 0.5)], step=3)
    t.finish()
    assert calls["metrics"] == [({"actor.loss": 1.0}, 3)]
    assert calls["texts"] == ["generations/step_3.txt"] and calls["ended"] == 1


def test_swanlab_backend_with_stub(monkeypatch):
    calls = {"logged": [], "finished": 0}

    class _Text:
        def __init__(self, text, caption=None):
            self.text = text

    stub = types.SimpleNamespace(
        init=lambda project, experiment_name: None,
        log=lambda data, step: calls["logged"].append((data, step)),
        Text=_Text,
        finish=lambda: calls.__setitem__("finished", calls["finished"] + 1),
    )
    monkeypatch.setitem(sys.modules, "swanlab", stub)
    t = Tracker(["swanlab"], "proj", "exp")
    assert len(t.backends) == 1
    t.log({"reward/overall": 0.7}, step=1)
    t.log_generations([("q", "a", "gt", 0.9)], step=1)
    t.finish()
    assert calls["logged"][0] == ({"reward/overall": 0.7}, 1)
    assert calls["finished"] == 1
