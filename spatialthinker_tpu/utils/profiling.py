"""Profiling and memory observability.

Parity surface: the reference's GPU memory probes + codetiming sections
(/root/reference/verl/utils/model_utils.py:31-35, workers/fsdp_workers.py:440-451)
-> TPU equivalents: per-device HBM stats from PJRT memory_stats() and optional
jax.profiler xplane trace dumps around training steps."""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Optional

import jax

_GB = 1024**3


def device_memory_metrics(prefix: str = "perf") -> Dict[str, float]:
    """Max/in-use HBM across local devices (0s when the backend lacks stats)."""
    peak = in_use = limit = 0.0
    try:
        for dev in jax.local_devices():
            stats = dev.memory_stats() or {}
            peak = max(peak, stats.get("peak_bytes_in_use", 0) / _GB)
            in_use = max(in_use, stats.get("bytes_in_use", 0) / _GB)
            limit = max(limit, stats.get("bytes_limit", 0) / _GB)
    except Exception:
        pass
    return {
        f"{prefix}/max_memory_allocated_gb": peak,
        f"{prefix}/memory_in_use_gb": in_use,
        f"{prefix}/memory_limit_gb": limit,
    }


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str], step: int, enabled_steps=(1, 5)):
    """Dump a jax.profiler trace for selected steps when trace_dir is set."""
    if trace_dir and step in enabled_steps:
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
