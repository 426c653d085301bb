"""Ring attention: context parallelism by rotating KV shards over the mesh.

The reference's only sequence-parallel mechanism is DeepSpeed-Ulysses
(SURVEY.md §5.7), which all-to-alls heads for sequence and therefore caps the
parallel degree at the HEAD count — a hard wall for GQA models (Qwen2.5-VL-3B
has 2 KV heads). Ring attention removes the cap: every device keeps its own
SEQUENCE chunk of q/k/v, KV chunks rotate around the ring via `ppermute`, and
each rotation's partial attention merges into a running (out, logsumexp) pair
— the online-softmax identity that makes flash attention tile over KV makes
it shard over devices identically.

Built directly on the Pallas flash kernels (ops/flash_attention.py):
- forward: per rotation, `lax.switch` picks {skip, causal, full} from the
  (query chunk, kv chunk) index relation — diagonal chunks run the causal
  kernel in local coordinates, earlier chunks run non-causal, later chunks
  contribute nothing — then the (out, lse) merge runs in fp32.
- backward (hand-written custom_vjp): a second rotation cycle calls
  `_flash_bwd` per rotation with the MERGED (out, lse) — the flash backward
  decomposes over KV blocks against the global logsumexp, so each rotation's
  (dk, dv) contribution is exact; the (dk, dv) accumulators travel WITH their
  kv chunk and arrive back at the owner after a full cycle.

Compute cost: rotations where kv chunk > query chunk are skipped via branch
selection, so causal work matches single-device flash up to the diagonal
imbalance (the classic ring-attention load skew; zig-zag layouts would fix it
and are not implemented).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .flash_attention import NEG_INF, _flash_bwd, _flash_fwd


def _pick_block(s: int, cap: int) -> int:
    for b in (cap, 512, 256, 128, 64, 32, 16, 8):
        if b <= cap and s % b == 0:
            return b
    return s


def _merge(o1, l1, o2, l2):
    """Online-softmax merge of two normalized partial attentions.
    o (B, S, H, D); l (B, H, S) logsumexp (NEG_INF where empty)."""
    m = jnp.maximum(l1, l2)
    w1 = jnp.where(l1 <= NEG_INF / 2, 0.0, jnp.exp(l1 - m))
    w2 = jnp.where(l2 <= NEG_INF / 2, 0.0, jnp.exp(l2 - m))
    denom = w1 + w2
    safe = jnp.where(denom == 0.0, 1.0, denom)
    wt1 = (w1 / safe).transpose(0, 2, 1)[..., None]  # (B, S, H, 1)
    wt2 = (w2 / safe).transpose(0, 2, 1)[..., None]
    o = o1.astype(jnp.float32) * wt1 + o2.astype(jnp.float32) * wt2
    l_new = jnp.where(denom == 0.0, NEG_INF, m + jnp.log(safe))
    return o, l_new


def _rot_perm(sp: int):
    # device s sends to s+1: after r steps device d holds kv chunk (d - r) % sp
    return [(s, (s + 1) % sp) for s in range(sp)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ring_core(q, k, v, q_seg, kv_seg, axis_name, sp, causal, scale):
    out, lse = _ring_fwd_loop(q, k, v, q_seg, kv_seg, axis_name, sp, causal, scale)
    return out.astype(q.dtype)


def _chunk_mode(idx, r, sp, causal):
    """0 = skip, 1 = causal (diagonal), 2 = full, for kv chunk (idx - r)."""
    if not causal:
        return jnp.int32(2)
    ki = (idx - r) % sp
    return jnp.where(ki == idx, 1, jnp.where(ki < idx, 2, 0)).astype(jnp.int32)


def _ring_fwd_loop(q, k, v, q_seg, kv_seg, axis_name, sp, causal, scale):
    b, s_l, hq, d = q.shape
    bq = _pick_block(s_l, 512)
    bk = _pick_block(s_l, 512)
    idx = jax.lax.axis_index(axis_name)

    def branch_skip(q, k_r, v_r, q_seg, seg_r):
        return (jnp.zeros((b, s_l, hq, d), jnp.float32),
                jnp.full((b, hq, s_l), NEG_INF, jnp.float32))

    def branch_causal(q, k_r, v_r, q_seg, seg_r):
        o, l = _flash_fwd(q, k_r, v_r, q_seg, seg_r, True, scale, bq, bk)
        return o.astype(jnp.float32), l

    def branch_full(q, k_r, v_r, q_seg, seg_r):
        o, l = _flash_fwd(q, k_r, v_r, q_seg, seg_r, False, scale, bq, bk)
        return o.astype(jnp.float32), l

    out = jnp.zeros((b, s_l, hq, d), jnp.float32)
    lse = jnp.full((b, hq, s_l), NEG_INF, jnp.float32)
    k_r, v_r, seg_r = k, v, kv_seg
    perm = _rot_perm(sp)
    for r in range(sp):
        mode = _chunk_mode(idx, r, sp, causal)
        o_r, l_r = jax.lax.switch(
            mode, (branch_skip, branch_causal, branch_full),
            q, k_r, v_r, q_seg, seg_r,
        )
        out, lse = _merge(out, lse, o_r, l_r)
        if r < sp - 1:
            k_r = jax.lax.ppermute(k_r, axis_name, perm)
            v_r = jax.lax.ppermute(v_r, axis_name, perm)
            seg_r = jax.lax.ppermute(seg_r, axis_name, perm)
    return out, lse


def _ring_core_fwd(q, k, v, q_seg, kv_seg, axis_name, sp, causal, scale):
    out, lse = _ring_fwd_loop(q, k, v, q_seg, kv_seg, axis_name, sp, causal, scale)
    out = out.astype(q.dtype)
    return out, (q, k, v, q_seg, kv_seg, out, lse)


def _ring_core_bwd(axis_name, sp, causal, scale, residuals, g):
    q, k, v, q_seg, kv_seg, out, lse = residuals
    b, s_l, hq, d = q.shape
    bq = _pick_block(s_l, 512)
    bk = _pick_block(s_l, 512)
    idx = jax.lax.axis_index(axis_name)

    def branch_skip(q, k_r, v_r, q_seg, seg_r):
        return (jnp.zeros_like(q), jnp.zeros_like(k_r), jnp.zeros_like(v_r))

    def branch_causal(q, k_r, v_r, q_seg, seg_r):
        return _flash_bwd(q, k_r, v_r, q_seg, seg_r, out, lse, g, True, scale, bq, bk)

    def branch_full(q, k_r, v_r, q_seg, seg_r):
        return _flash_bwd(q, k_r, v_r, q_seg, seg_r, out, lse, g, False, scale, bq, bk)

    dq = jnp.zeros(q.shape, jnp.float32)
    k_r, v_r, seg_r = k, v, kv_seg
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)
    perm = _rot_perm(sp)
    for r in range(sp):
        mode = _chunk_mode(idx, r, sp, causal)
        dq_r, dk_r, dv_r = jax.lax.switch(
            mode, (branch_skip, branch_causal, branch_full),
            q, k_r, v_r, q_seg, seg_r,
        )
        dq = dq + dq_r.astype(jnp.float32)
        dk_acc = dk_acc + dk_r.astype(jnp.float32)
        dv_acc = dv_acc + dv_r.astype(jnp.float32)
        # accumulators rotate on EVERY step (after sp rotations they complete
        # the cycle and sit back on their kv chunk's owner); the kv operands
        # themselves are not needed after the last compute
        if r < sp - 1:
            k_r = jax.lax.ppermute(k_r, axis_name, perm)
            v_r = jax.lax.ppermute(v_r, axis_name, perm)
            seg_r = jax.lax.ppermute(seg_r, axis_name, perm)
        dk_acc = jax.lax.ppermute(dk_acc, axis_name, perm)
        dv_acc = jax.lax.ppermute(dv_acc, axis_name, perm)
    return (dq.astype(q.dtype), dk_acc.astype(k.dtype), dv_acc.astype(v.dtype),
            None, None)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(
    q: jnp.ndarray,  # (B, S, Hq, D) — GLOBAL shapes; seq sharded on `sp_axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    sp_axis: str,
    *,
    segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    batch_axes: Tuple[str, ...] = (),
) -> jnp.ndarray:
    """Context-parallel attention over sequence-sharded q/k/v. Same calling
    convention as ops.ulysses.ulysses_attention, but the parallel degree is
    NOT limited by the head count — KV rotates instead of heads exchanging.

    Requires S % (sp * 128) == 0 (each local chunk must tile the flash
    kernel's minimum block)."""
    sp = mesh.shape[sp_axis]
    b, s, hq, d = q.shape
    if s % sp:
        raise ValueError(f"sequence {s} must divide sp={sp}")
    if jax.default_backend() == "tpu" and (s // sp) % 128:
        # interpret mode runs any chunk length; Mosaic needs the per-device
        # chunk to tile the flash kernel's 128-minimum blocks
        raise ValueError(
            f"ring attention on TPU needs (seq / sp) % 128 == 0 "
            f"(got seq={s}, sp={sp})"
        )
    scale = scale if scale is not None else d**-0.5

    b_spec = batch_axes if batch_axes else None
    seq_spec = P(b_spec, sp_axis, None, None)
    seg_spec = P(b_spec, sp_axis)
    seg = segment_ids if segment_ids is not None else jnp.ones((b, s), jnp.int32)

    def inner(q_l, k_l, v_l, seg_l):
        return _ring_core(q_l, k_l, v_l, seg_l, seg_l, sp_axis, sp, causal, scale)

    from jax import shard_map

    return shard_map(
        inner, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, seg_spec),
        out_specs=seq_spec,
        # pallas_call inside the region provides no varying-mesh-axes info
        check_vma=False,
    )(q, k, v, seg)
