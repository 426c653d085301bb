"""Checkpoint / resume via Orbax: sharded params + optimizer state + dataloader
iterator state + PRNG key.

Layout parity with the reference's FSDPCheckpointManager
(/root/reference/verl/utils/checkpoint/fsdp_checkpoint_manager.py:82-131):
{save_path}/global_step_{N}/{params,opt_state,extra}, a latest_global_step.txt
tracker file, and save_limit pruning of obsolete checkpoints. Sharded arrays
save/restore natively through Orbax (each host writes its shards — the TPU
replacement for per-rank .pt files)."""

from __future__ import annotations

import os
import pickle
import re
import shutil
from typing import Any, Dict, Optional

import numpy as np

TRACKER_FILE = "latest_global_step.txt"


class CheckpointManager:
    def __init__(self, save_path: Optional[str], save_limit: int = -1):
        self.save_path = save_path
        self.save_limit = save_limit

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.save_path, f"global_step_{step}")

    def save(self, step: int, *, params, opt_state, dataloader_state: Dict, rng_key) -> None:
        if not self.save_path:
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(self._step_dir(step))
        os.makedirs(path, exist_ok=True)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, "params"), params, force=True)
            ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
        extra = {"dataloader_state": dataloader_state, "rng_key": np.asarray(rng_key), "step": step}
        with open(os.path.join(path, "extra_state.pkl"), "wb") as f:
            pickle.dump(extra, f)
        with open(os.path.join(self.save_path, TRACKER_FILE), "w") as f:
            f.write(str(step))
        self._prune(step)

    def _prune(self, current_step: int) -> None:
        if self.save_limit <= 0:
            return
        pattern = re.compile(r"global_step_(\d+)$")
        steps = []
        for name in os.listdir(self.save_path):
            m = pattern.match(name)
            if m:
                steps.append(int(m.group(1)))
        for old in sorted(steps)[: max(0, len(steps) - self.save_limit)]:
            if old != current_step:
                shutil.rmtree(self._step_dir(old), ignore_errors=True)

    def latest_step(self, base_path: Optional[str] = None) -> Optional[int]:
        base = base_path or self.save_path
        tracker = os.path.join(base, TRACKER_FILE)
        if os.path.exists(tracker):
            with open(tracker) as f:
                return int(f.read().strip())
        return None

    def load(self, path: str, *, params_like, opt_state_like) -> Optional[Dict[str, Any]]:
        """`path` is either a global_step_* dir or a base dir with a tracker file."""
        import orbax.checkpoint as ocp

        if not os.path.basename(path).startswith("global_step_"):
            step = self.latest_step(path)
            if step is None:
                return None
            path = os.path.join(path, f"global_step_{step}")
        if not os.path.isdir(path):
            return None
        path = os.path.abspath(path)
        step = int(os.path.basename(path).split("_")[-1])
        with ocp.StandardCheckpointer() as ckptr:
            params = ckptr.restore(os.path.join(path, "params"), params_like)
            opt_state = ckptr.restore(os.path.join(path, "opt_state"), opt_state_like)
        extra_path = os.path.join(path, "extra_state.pkl")
        extra = {}
        if os.path.exists(extra_path):
            with open(extra_path, "rb") as f:
                extra = pickle.load(f)
        return {
            "params": params,
            "opt_state": opt_state,
            "step": extra.get("step", step),
            "dataloader_state": extra.get("dataloader_state"),
            "rng_key": extra.get("rng_key"),
        }
