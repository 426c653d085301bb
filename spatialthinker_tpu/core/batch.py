"""RolloutBatch: the universal batch container (L0).

TPU-native replacement for the reference's ``DataProto``
(/root/reference/verl/protocol.py:165-598). Differences by design:

- arrays are plain numpy on the host; device placement happens declaratively at
  the jit boundary via shardings (there is no Ray object store, no TensorDict,
  no inter-process all_gather: one SPMD program sees the global batch).
- ``non_tensors`` holds ragged/python payloads (raw prompt ids, PIL images,
  ground-truth strings) as object ndarrays, exactly like the reference's
  ``non_tensor_batch``.
- the dispatch machinery of the reference's single-controller layer
  (decorator.py DP_COMPUTE_PROTO chunking) collapses into ``chunk``/``concat``
  used only by host-side pipelines; on-device the mesh does the splitting.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


Array = np.ndarray


def _is_object_array(value: np.ndarray) -> bool:
    return value.dtype == object


@dataclass
class RolloutBatch:
    tensors: Dict[str, Array] = field(default_factory=dict)
    non_tensors: Dict[str, Array] = field(default_factory=dict)
    meta: Dict[str, Any] = field(default_factory=dict)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dict(
        cls,
        tensors: Optional[Dict[str, Any]] = None,
        non_tensors: Optional[Dict[str, Any]] = None,
        meta: Optional[Dict[str, Any]] = None,
    ) -> "RolloutBatch":
        t: Dict[str, Array] = {}
        nt: Dict[str, Array] = {}
        for key, value in (tensors or {}).items():
            arr = np.asarray(value)
            if _is_object_array(arr):
                nt[key] = arr
            else:
                t[key] = arr
        for key, value in (non_tensors or {}).items():
            arr = np.empty(len(value), dtype=object)
            for i, v in enumerate(value):
                arr[i] = v
            nt[key] = arr
        batch = cls(tensors=t, non_tensors=nt, meta=dict(meta or {}))
        batch.check_consistency()
        return batch

    @classmethod
    def from_single_dict(cls, data: Dict[str, Any], meta: Optional[Dict[str, Any]] = None) -> "RolloutBatch":
        """Split a flat dict into tensor / non-tensor parts by dtype
        (parity: reference protocol.py:255-276)."""
        tensors, non_tensors = {}, {}
        for key, value in data.items():
            arr = value if isinstance(value, np.ndarray) else np.asarray(value)
            if _is_object_array(arr):
                non_tensors[key] = arr
            else:
                tensors[key] = arr
        return cls(tensors=tensors, non_tensors=non_tensors, meta=dict(meta or {}))

    # -- invariants ---------------------------------------------------------

    def __len__(self) -> int:
        for v in self.tensors.values():
            return int(v.shape[0])
        for v in self.non_tensors.values():
            return int(v.shape[0])
        return 0

    def check_consistency(self) -> None:
        n = len(self)
        for key, v in self.tensors.items():
            if v.shape[0] != n:
                raise ValueError(f"tensor {key!r} batch dim {v.shape[0]} != {n}")
        for key, v in self.non_tensors.items():
            if v.shape[0] != n:
                raise ValueError(f"non_tensor {key!r} batch dim {v.shape[0]} != {n}")

    # -- selection ----------------------------------------------------------

    def select(
        self,
        tensor_keys: Optional[Sequence[str]] = None,
        non_tensor_keys: Optional[Sequence[str]] = None,
        meta_keys: Optional[Sequence[str]] = None,
    ) -> "RolloutBatch":
        t = {k: self.tensors[k] for k in (tensor_keys if tensor_keys is not None else self.tensors)}
        nt = {k: self.non_tensors[k] for k in (non_tensor_keys if non_tensor_keys is not None else self.non_tensors)}
        m = {k: self.meta[k] for k in (meta_keys if meta_keys is not None else self.meta)}
        return RolloutBatch(tensors=t, non_tensors=nt, meta=m)

    def pop(
        self,
        tensor_keys: Sequence[str] = (),
        non_tensor_keys: Sequence[str] = (),
        meta_keys: Sequence[str] = (),
    ) -> "RolloutBatch":
        t = {k: self.tensors.pop(k) for k in tensor_keys}
        nt = {k: self.non_tensors.pop(k) for k in non_tensor_keys}
        m = {k: self.meta.pop(k) for k in meta_keys}
        return RolloutBatch(tensors=t, non_tensors=nt, meta=m)

    def rename(self, old_keys: Sequence[str], new_keys: Sequence[str]) -> "RolloutBatch":
        for old, new in zip(old_keys, new_keys):
            if old in self.tensors:
                self.tensors[new] = self.tensors.pop(old)
            elif old in self.non_tensors:
                self.non_tensors[new] = self.non_tensors.pop(old)
            else:
                raise KeyError(old)
        return self

    def union(self, other: "RolloutBatch") -> "RolloutBatch":
        """Merge another batch in; conflicting keys must be identical
        (parity: reference protocol.py union_two_dict semantics)."""
        for key, value in other.tensors.items():
            if key in self.tensors and not np.array_equal(self.tensors[key], value):
                raise ValueError(f"conflicting tensor key {key!r} in union")
            self.tensors[key] = value
        for key, value in other.non_tensors.items():
            self.non_tensors[key] = value
        for key, value in other.meta.items():
            if key in self.meta and self.meta[key] != value:
                raise ValueError(f"conflicting meta key {key!r} in union")
            self.meta[key] = value
        self.check_consistency()
        return self

    # -- reshaping ----------------------------------------------------------

    def chunk(self, chunks: int) -> List["RolloutBatch"]:
        n = len(self)
        if n % chunks != 0:
            raise ValueError(f"batch size {n} not divisible into {chunks} chunks")
        out = []
        step = n // chunks
        for i in range(chunks):
            sl = slice(i * step, (i + 1) * step)
            out.append(
                RolloutBatch(
                    tensors={k: v[sl] for k, v in self.tensors.items()},
                    non_tensors={k: v[sl] for k, v in self.non_tensors.items()},
                    meta=copy.copy(self.meta),
                )
            )
        return out

    def split(self, split_size: int) -> List["RolloutBatch"]:
        n = len(self)
        out = []
        for start in range(0, n, split_size):
            sl = slice(start, min(start + split_size, n))
            out.append(
                RolloutBatch(
                    tensors={k: v[sl] for k, v in self.tensors.items()},
                    non_tensors={k: v[sl] for k, v in self.non_tensors.items()},
                    meta=copy.copy(self.meta),
                )
            )
        return out

    @staticmethod
    def concat(batches: Sequence["RolloutBatch"]) -> "RolloutBatch":
        if not batches:
            return RolloutBatch()
        tensors = {
            k: np.concatenate([b.tensors[k] for b in batches], axis=0) for k in batches[0].tensors
        }
        non_tensors = {}
        for k in batches[0].non_tensors:
            total = sum(len(b.non_tensors[k]) for b in batches)
            arr = np.empty(total, dtype=object)
            i = 0
            for b in batches:
                for v in b.non_tensors[k]:
                    arr[i] = v
                    i += 1
            non_tensors[k] = arr
        return RolloutBatch(tensors=tensors, non_tensors=non_tensors, meta=copy.copy(batches[0].meta))

    def reorder(self, indices: np.ndarray) -> None:
        self.tensors = {k: v[indices] for k, v in self.tensors.items()}
        self.non_tensors = {k: v[indices] for k, v in self.non_tensors.items()}

    def repeat(self, repeat_times: int, interleave: bool = True) -> "RolloutBatch":
        """Repeat each row ``repeat_times`` times (parity: protocol.py repeat;
        interleave=True gives [a,a,b,b] — the GRPO n-samples layout)."""
        n = len(self)
        if interleave:
            idx = np.repeat(np.arange(n), repeat_times)
        else:
            idx = np.tile(np.arange(n), repeat_times)
        out = RolloutBatch(
            tensors={k: v[idx] for k, v in self.tensors.items()},
            non_tensors={k: v[idx] for k, v in self.non_tensors.items()},
            meta=copy.copy(self.meta),
        )
        return out

    def slice(self, start: int, end: int) -> "RolloutBatch":
        sl = slice(start, end)
        return RolloutBatch(
            tensors={k: v[sl] for k, v in self.tensors.items()},
            non_tensors={k: v[sl] for k, v in self.non_tensors.items()},
            meta=copy.copy(self.meta),
        )

    def make_iterator(
        self, mini_batch_size: int, epochs: int, seed: Optional[int] = None
    ) -> Iterator["RolloutBatch"]:
        n = len(self)
        rng = np.random.default_rng(seed) if seed is not None else None
        for _ in range(epochs):
            order = rng.permutation(n) if rng is not None else np.arange(n)
            for start in range(0, n, mini_batch_size):
                idx = order[start : start + mini_batch_size]
                yield RolloutBatch(
                    tensors={k: v[idx] for k, v in self.tensors.items()},
                    non_tensors={k: v[idx] for k, v in self.non_tensors.items()},
                    meta=copy.copy(self.meta),
                )


def pad_to_divisor(batch: RolloutBatch, divisor: int) -> Tuple[RolloutBatch, int]:
    """Cyclically self-repeat rows until len is divisible (parity: protocol.py:48-71)."""
    n = len(batch)
    if divisor <= 1 or n % divisor == 0:
        return batch, 0
    pad = divisor - (n % divisor)
    idx = np.concatenate([np.arange(n), np.arange(pad) % n])
    padded = RolloutBatch(
        tensors={k: v[idx] for k, v in batch.tensors.items()},
        non_tensors={k: v[idx] for k, v in batch.non_tensors.items()},
        meta=copy.copy(batch.meta),
    )
    return padded, pad


def unpad(batch: RolloutBatch, pad_size: int) -> RolloutBatch:
    if pad_size == 0:
        return batch
    return batch.slice(0, len(batch) - pad_size)


def trim_prompt_padding(batch: RolloutBatch, bucket: int = 512,
                        negotiated_max: Optional[int] = None) -> RolloutBatch:
    """Left-padded prompts are padded to the config max; trim to the batch's
    longest prompt rounded up to `bucket` (TPU padding-free equivalent:
    static shapes per bucket, far less wasted compute than always-max).
    Safe because position ids / segment ids travel with the tokens.
    ``negotiated_max`` carries the cross-process max (jit shapes agree)."""
    seg = batch.tensors["segment_ids"]
    max_len = negotiated_max if negotiated_max is not None else int(seg.sum(-1).max())
    p = seg.shape[1]
    keep = min(p, max(bucket, ((max_len + bucket - 1) // bucket) * bucket))
    if keep >= p:
        return batch
    out = RolloutBatch(
        tensors=dict(batch.tensors), non_tensors=batch.non_tensors, meta=batch.meta
    )
    out.tensors["input_ids"] = batch.tensors["input_ids"][:, p - keep:]
    out.tensors["segment_ids"] = seg[:, p - keep:]
    out.tensors["position_ids"] = batch.tensors["position_ids"][:, :, p - keep:]
    return out


def trim_response_padding(batch: RolloutBatch, bucket: int = 256,
                          negotiated_max: Optional[int] = None) -> RolloutBatch:
    """Right-trim the response buffer to the longest valid response rounded
    up to `bucket` (responses usually hit EOS well before max_new_tokens);
    ``negotiated_max`` carries the cross-process max (jit shapes agree)."""
    mask = batch.tensors["response_mask"]
    r = mask.shape[1]
    max_len = negotiated_max if negotiated_max is not None else int(mask.sum(-1).max())
    keep = min(r, max(bucket, ((max_len + bucket - 1) // bucket) * bucket))
    if keep >= r:
        return batch
    out = RolloutBatch(
        tensors=dict(batch.tensors), non_tensors=batch.non_tensors, meta=batch.meta
    )
    p = batch.tensors["input_ids"].shape[1]
    for key in ("responses", "response_mask", "token_level_scores", "rollout_log_probs"):
        if key in out.tensors:
            out.tensors[key] = out.tensors[key][:, :keep]
    for key in ("full_input_ids", "full_segment_ids"):
        out.tensors[key] = out.tensors[key][:, : p + keep]
    return out
