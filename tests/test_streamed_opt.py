"""Streamed (host-resident-moments) AdamW vs the fused in-HBM optimizer.

The streamed path exists to fit 3B-class single-chip training (moments never
resident with params+grads); its math must be the fused `adamw_leaf_core`
exactly — these tests pin multi-step agreement, the slice loop against
whole-leaf application, and the NaN-skip no-op."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.trainer import streamed_opt
from spatialthinker_tpu.trainer.optim import any_precision_adamw
from spatialthinker_tpu.trainer.streamed_opt import StreamedAdamW


def _tree(key, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "stack": jax.random.normal(k1, (6, 4, 8), dtype),   # stacked (L, ...)
        "mat": jax.random.normal(k2, (16, 8), dtype),
        "vec": jax.random.normal(k3, (8,), dtype),
    }


@pytest.mark.parametrize("kahan", [False, True])
def test_streamed_matches_fused(monkeypatch, kahan):
    # force the slice loop on every leaf (layer_chunk smaller than dim 0)
    monkeypatch.setattr(streamed_opt, "_STREAM_THRESHOLD", 1)
    lr = 1e-2
    params_f = _tree(jax.random.key(0), jnp.float32)
    params_s = jax.tree.map(jnp.copy, params_f)

    fused = any_precision_adamw(lr, use_kahan_summation=kahan)
    state_f = fused.init(params_f)
    streamed = StreamedAdamW(lr, use_kahan_summation=kahan, layer_chunk=4)
    state_s = streamed.init(params_s)

    for step in range(3):
        grads = _tree(jax.random.key(10 + step), jnp.float32)
        scale = jnp.float32(0.5 + 0.1 * step)
        finite = jnp.asarray(True)
        params_f, state_f = fused.fused_apply(
            grads, state_f, params_f, finite=finite, grad_scale=scale
        )
        params_s, state_s = streamed.apply(
            params_s, grads, state_s, finite=finite, grad_scale=scale
        )
        assert state_s.count == step + 1
        for k in params_f:
            np.testing.assert_allclose(
                np.asarray(params_s[k]), np.asarray(params_f[k]),
                rtol=1e-5, atol=1e-6, err_msg=f"{k} step {step}",
            )
    # moments agree too (host state vs device state)
    for k in params_f:
        np.testing.assert_allclose(
            state_s.mu[k], np.asarray(state_f.mu[k], dtype=np.float32),
            rtol=1e-2, atol=1e-3,
        )


def test_streamed_nan_skip():
    lr = 1e-2
    params = _tree(jax.random.key(1), jnp.float32)
    streamed = StreamedAdamW(lr)
    state = streamed.init(params)
    grads = _tree(jax.random.key(2), jnp.float32)
    p_before = jax.tree.map(np.asarray, params)
    new_params, new_state = streamed.apply(
        params, grads, state, finite=jnp.asarray(False), grad_scale=jnp.float32(0.0)
    )
    assert new_state.count == 0
    for k in params:
        np.testing.assert_array_equal(np.asarray(new_params[k]), p_before[k])


def test_streamed_sampled_slices(monkeypatch):
    """Bench-only sampling: the first N slices round-trip and match the full
    apply exactly; the rest are skipped but counted in last_apply_stats so
    byte-extrapolation is possible (bench.py train_3b)."""
    monkeypatch.setattr(streamed_opt, "_STREAM_THRESHOLD", 1)
    lr = 1e-2
    params_full = _tree(jax.random.key(3), jnp.float32)
    params_samp = jax.tree.map(jnp.copy, params_full)
    grads = _tree(jax.random.key(4), jnp.float32)
    opt = StreamedAdamW(lr, layer_chunk=2)
    state_full = opt.init(params_full)
    opt_s = StreamedAdamW(lr, layer_chunk=2)
    state_samp = opt_s.init(params_samp)
    kw = dict(finite=jnp.asarray(True), grad_scale=jnp.float32(1.0))

    new_full, _ = opt.apply(params_full, grads, state_full, **kw)
    full_stats = opt.last_apply_stats
    assert full_stats["measured_bytes"] == full_stats["total_bytes"]
    assert full_stats["measured_slices"] > 2

    new_samp, _ = opt_s.apply(params_samp, grads, state_samp,
                              sample_slices=2, **kw)
    stats = opt_s.last_apply_stats
    assert stats["measured_slices"] == 2
    assert 0 < stats["measured_bytes"] < stats["total_bytes"]
    assert stats["total_bytes"] == full_stats["total_bytes"]
    # the measured slices' param rows agree with the full apply bitwise;
    # at least one skipped row stayed un-updated
    leaves_f = jax.tree.leaves(new_full)
    leaves_s = jax.tree.leaves(new_samp)
    leaves_0 = jax.tree.leaves(_tree(jax.random.key(3), jnp.float32))
    some_skipped = False
    some_measured = False
    for f, s, p0 in zip(leaves_f, leaves_s, leaves_0):
        eq_full = np.asarray(f) == np.asarray(s)
        eq_orig = np.asarray(s) == np.asarray(p0)
        some_measured |= bool(eq_full.all(axis=tuple(range(1, f.ndim))).any())
        some_skipped |= bool(eq_orig.all(axis=tuple(range(1, f.ndim))).any())
    assert some_measured and some_skipped


def test_streamed_bf16_params_kahan():
    """bf16 params + Kahan compensation: repeated tiny updates must not be
    swallowed by bf16 rounding (the whole point of the compensation)."""
    lr = 1e-4
    params = {"w": jnp.ones((4, 32), jnp.bfloat16)}
    streamed = StreamedAdamW(lr, use_kahan_summation=True, weight_decay=0.0)
    state = streamed.init(params)
    g = {"w": jnp.full((4, 32), 1e-3, jnp.bfloat16)}
    for _ in range(50):
        params, state = streamed.apply(
            params, g, state, finite=jnp.asarray(True), grad_scale=jnp.float32(1.0)
        )
    drift = float(jnp.mean(params["w"].astype(jnp.float32)))
    assert drift < 1.0 - 1e-3  # moved despite bf16 resolution at 1.0
