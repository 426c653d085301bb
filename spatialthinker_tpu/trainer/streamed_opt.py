"""Host-streamed AnyPrecisionAdamW: fit 3B-class single-chip training.

The binding HBM term for single-chip training is the optimizer state: at 3B,
bf16 params (5.6 GB) + bf16 grad accumulators (5.6 GB) + bf16 Adam moments
(11.2 GB) = 22.4 GB before any activation — over a 16 GB chip even with full
remat. `host_offload_optimizer` (parallel/offload.py) frees the moments for
the rollout/logprob stages, but a fused update step still has to materialize
params+grads+moments simultaneously.

This module keeps the moments PERMANENTLY on the host and applies the update
in layer-slice round trips: for each (stacked) leaf, slices of the bf16
moments stream to the device, one jitted `adamw_leaf_core` call updates the
param slice IN PLACE (the param leaf is donated through the slice loop, so
no second param copy exists), and the new moment slices stream back. Device
residency during the update is params + grads + one slice's moments — the
3B case fits with ~1 GB of headroom. Traffic is one moment-tree round trip
per step (~11 GB each way at 3B without Kahan): PCIe-rate seconds on a real
TPU host, which the reference pays identically in its own
`host_offload_optimizer` (/root/reference/verl/workers/fsdp_workers.py:252-280,
torch `.to("cpu")` round trips).

Scope: single-process, single-device params (the single-chip fit problem).
Sharded multi-chip training keeps moments in HBM — FSDP over >= 2 chips fits
3B outright and doesn't need streaming.

The per-slice math is the EXACT `adamw_leaf_core` the fused in-HBM optimizer
runs (trainer/optim.py), so streamed and fused updates agree bitwise;
`tests/test_streamed_opt.py` pins that.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .optim import adamw_leaf_core

# leaves at least this big stream in layer slices; smaller leaves round-trip
# whole (one transfer each is cheaper than slice bookkeeping)
_STREAM_THRESHOLD = 1 << 24  # 16M elements = 32MB bf16


class StreamedAdamWState(NamedTuple):
    """Host-resident optimizer state: numpy moment trees + a python count."""

    count: int
    mu: Any            # tree of np.ndarray (momentum dtype)
    nu: Any            # tree of np.ndarray (variance dtype)
    compensation: Any  # tree of np.ndarray (param dtype) or () sentinels


class StreamedAdamW:
    """AnyPrecisionAdamW with host-resident moments, applied by streaming
    layer slices through the device (see module docstring)."""

    def __init__(self, learning_rate: optax.ScalarOrSchedule, *,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                 weight_decay: float = 1e-2,
                 momentum_dtype=jnp.bfloat16, variance_dtype=jnp.bfloat16,
                 use_kahan_summation: bool = False, layer_chunk: int = 4):
        self._schedule = learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self.momentum_dtype = jnp.dtype(momentum_dtype)
        self.variance_dtype = jnp.dtype(variance_dtype)
        self.use_kahan = use_kahan_summation
        self.layer_chunk = layer_chunk

        core = functools.partial(
            adamw_leaf_core, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            use_kahan_summation=use_kahan_summation,
            momentum_dtype=momentum_dtype, variance_dtype=variance_dtype,
            finite=None,
        )

        # One compiled program per (leaf shape, span): the param leaf is
        # DONATED and threads linearly through the slice loop (in-place
        # dynamic_update_slice — XLA aliases the buffer), the grad leaf is a
        # read-only capture across slices, and the moment slices are donated
        # fresh transfers. `l0` is a traced operand so every slice of a leaf
        # shares one program.
        @functools.partial(jax.jit, donate_argnums=(0, 2, 3, 4),
                           static_argnames=("span",))
        def _slice_step(p_full, g_full, mu, nu, comp, l0, lr, c1, c2, scale,
                        *, span: int):
            gsl = jax.lax.dynamic_slice_in_dim(g_full, l0, span, 0)
            psl = jax.lax.dynamic_slice_in_dim(p_full, l0, span, 0)
            t, mu_n, nu_n, comp_n = core(
                gsl, mu, nu, comp, psl, lr=lr, c1=c1, c2=c2, scale=scale,
            )
            p_out = jax.lax.dynamic_update_slice_in_dim(p_full, t, l0, 0)
            return p_out, mu_n, nu_n, comp_n

        self._slice_step = _slice_step

    # -- state ------------------------------------------------------------
    def init(self, params) -> StreamedAdamWState:
        def zeros(p, dtype):
            return np.zeros(p.shape, dtype=jnp.dtype(dtype))

        return StreamedAdamWState(
            count=0,
            mu=jax.tree.map(lambda p: zeros(p, self.momentum_dtype), params),
            nu=jax.tree.map(lambda p: zeros(p, self.variance_dtype), params),
            compensation=jax.tree.map(
                # kahan off: a () scalar sentinel, NOT shape (0,) — orbax
                # refuses zero-size arrays at checkpoint save ("Cannot save
                # arrays with zero size"), which killed stream+kahan=false
                # runs at their first save_freq step
                lambda p: zeros(p, p.dtype) if self.use_kahan
                else np.zeros((), jnp.dtype(p.dtype)),
                params,
            ),
        )

    # -- update -----------------------------------------------------------
    def apply(self, params, grads, state: StreamedAdamWState, *,
              finite, grad_scale, sample_slices: int = 0):
        """One optimizer step. ``finite``/``grad_scale`` are the scalars the
        grad program produced (device or host); a non-finite step is a no-op
        on params AND state (count included), matching the fused path's
        NaN-grad skip. Returns (new_params, new_state); the host moment
        buffers in ``state`` are REUSED (overwritten in place) — callers must
        not alias them.

        ``sample_slices`` is a BENCH-ONLY knob (the trainer never passes it):
        when > 0, only the first N slices actually round-trip through the
        device; the rest are skipped but their traffic is COUNTED, so the
        caller can extrapolate the full-stream wall time by bytes
        (``self.last_apply_stats``). Skipped slices leave their param rows
        un-updated — never use in real training."""
        if not bool(np.asarray(finite)):
            return params, state
        measured_slices = 0
        measured_bytes = 0
        total_bytes = 0
        scale = np.float32(np.asarray(grad_scale))
        count = state.count + 1
        lr = self._schedule(state.count) if callable(self._schedule) else self._schedule
        lr = np.float32(lr)
        c1 = np.float32(1.0 - self.b1 ** count)
        c2 = np.float32(1.0 - self.b2 ** count)

        leaves_p, treedef = jax.tree.flatten(params)
        leaves_g = treedef.flatten_up_to(grads)
        leaves_mu = treedef.flatten_up_to(state.mu)
        leaves_nu = treedef.flatten_up_to(state.nu)
        leaves_c = treedef.flatten_up_to(state.compensation)

        new_p = []
        for p, g, mu, nu, comp in zip(leaves_p, leaves_g, leaves_mu,
                                      leaves_nu, leaves_c):
            has_comp = comp.shape == p.shape
            dim0 = p.shape[0] if p.ndim else 1
            if p.ndim == 0 or p.size < _STREAM_THRESHOLD:
                spans = [(0, dim0)]
            else:
                # rows per slice: layer_chunk rows of a stacked (L, ...) leaf
                # whose rows are huge, but never slices smaller than
                # ~_STREAM_THRESHOLD elements — a (vocab, E) embedding leaf
                # would otherwise shatter into tens of thousands of transfers
                per_row = max(p.size // dim0, 1)
                span = max(self.layer_chunk, _STREAM_THRESHOLD // per_row, 1)
                span = min(span, dim0)
                spans = [
                    (l0, min(span, dim0 - l0)) for l0 in range(0, dim0, span)
                ]
            if p.ndim == 0:  # scalars can't slice; run the core directly
                t, mu_n, nu_n, comp_n = adamw_leaf_core(
                    g, jnp.asarray(mu), jnp.asarray(nu), jnp.asarray(comp), p,
                    lr=lr, c1=c1, c2=c2, b1=self.b1, b2=self.b2, eps=self.eps,
                    weight_decay=self.weight_decay,
                    use_kahan_summation=self.use_kahan and has_comp,
                    momentum_dtype=self.momentum_dtype,
                    variance_dtype=self.variance_dtype,
                    finite=None, scale=scale,
                )
                mu[...] = np.asarray(mu_n)
                nu[...] = np.asarray(nu_n)
                if has_comp:
                    comp[...] = np.asarray(comp_n)
                new_p.append(t)
                continue
            for l0, span in spans:
                l1 = l0 + span
                slice_bytes = (mu[l0:l1].nbytes + nu[l0:l1].nbytes
                               + (comp[l0:l1].nbytes if has_comp else 0))
                total_bytes += slice_bytes
                if sample_slices and measured_slices >= sample_slices:
                    continue  # counted, not streamed (bench sampling)
                measured_slices += 1
                measured_bytes += slice_bytes
                comp_in = comp[l0:l1] if has_comp else comp
                p, mu_n, nu_n, comp_n = self._slice_step(
                    p, g,
                    jax.device_put(mu[l0:l1]), jax.device_put(nu[l0:l1]),
                    jax.device_put(comp_in),
                    l0, lr, c1, c2, scale, span=span,
                )
                mu[l0:l1] = np.asarray(mu_n)
                nu[l0:l1] = np.asarray(nu_n)
                if has_comp:
                    comp[l0:l1] = np.asarray(comp_n)
            new_p.append(p)

        self.last_apply_stats = {
            "measured_slices": measured_slices,
            "measured_bytes": measured_bytes,
            "total_bytes": total_bytes,
        }
        return (
            jax.tree.unflatten(treedef, new_p),
            StreamedAdamWState(count, state.mu, state.nu, state.compensation),
        )
