"""Native (C++) components, built on demand with g++ and loaded via ctypes.

Currently: `lap` — Jonker-Volgenant linear assignment for the spatial-reward
Hungarian matching (scipy-compatible output contract)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()


def _build_and_load(name: str) -> Optional[ctypes.CDLL]:
    src = os.path.join(_HERE, f"{name}.cpp")
    so = os.path.join(_HERE, f"lib{name}.so")
    with _LOCK:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so]
            subprocess.run(cmd, check=True, capture_output=True)
        return ctypes.CDLL(so)


class _Lap:
    def __init__(self):
        self._lib = None
        self._failed = False

    def _ensure(self) -> bool:
        if self._lib is None and not self._failed:
            try:
                self._lib = _build_and_load("lap")
                self._lib.lap_solve.argtypes = [
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int),
                ]
                self._lib.lap_solve.restype = ctypes.c_int
            except Exception:
                self._failed = True
        return self._lib is not None

    def solve(self, cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Minimum-cost assignment; returns (row_ind, col_ind) like scipy's
        linear_sum_assignment (len = min(nr, nc), rows sorted)."""
        if not self._ensure():
            from scipy.optimize import linear_sum_assignment

            return linear_sum_assignment(cost)
        cost = np.ascontiguousarray(cost, dtype=np.float64)
        nr, nc = cost.shape
        out = np.full(nr, -1, dtype=np.int32)
        rc = self._lib.lap_solve(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nr,
            nc,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if rc != 0:
            from scipy.optimize import linear_sum_assignment

            return linear_sum_assignment(cost)
        rows = np.nonzero(out >= 0)[0]
        return rows.astype(np.int64), out[rows].astype(np.int64)


lap = _Lap()
