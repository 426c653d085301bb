"""Tests for the fused log-prob op, the GRPO update step, and mesh sharding
(8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
from spatialthinker_tpu.ops.logprobs import log_probs_from_hidden, log_probs_from_logits
from spatialthinker_tpu.parallel.mesh import batch_sharding, create_mesh
from spatialthinker_tpu.parallel.sharding import param_shardings, shard_params
from spatialthinker_tpu.trainer.train_step import (
    TrainBatch,
    compute_log_probs,
    make_optimizer,
    make_update_fn,
)

CFG = qwen25_vl_tiny(256)


def test_chunked_logprobs_match_direct():
    rng = np.random.default_rng(0)
    b, s, e, v = 2, 12, 16, 64
    hidden = rng.normal(size=(b, s, e)).astype(np.float32)
    head = rng.normal(size=(e, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, s))

    logits = hidden @ head
    direct = np.asarray(log_probs_from_logits(jnp.asarray(logits), jnp.asarray(labels)))
    chunked, entropy = log_probs_from_hidden(
        jnp.asarray(hidden), jnp.asarray(labels), jnp.asarray(head),
        chunk_size=4, compute_entropy=True,
    )
    np.testing.assert_allclose(np.asarray(chunked), direct, rtol=1e-5, atol=1e-5)
    # entropy positive, bounded by log V
    ent = np.asarray(entropy)
    assert (ent > 0).all() and (ent <= np.log(v) + 1e-3).all()


def test_chunked_logprobs_uneven_seq():
    rng = np.random.default_rng(1)
    hidden = rng.normal(size=(1, 10, 8)).astype(np.float32)
    head = rng.normal(size=(8, 32)).astype(np.float32)
    labels = rng.integers(0, 32, size=(1, 10))
    direct = np.asarray(
        log_probs_from_logits(jnp.asarray(hidden @ head), jnp.asarray(labels))
    )
    chunked, _ = log_probs_from_hidden(
        jnp.asarray(hidden), jnp.asarray(labels), jnp.asarray(head), chunk_size=4
    )
    np.testing.assert_allclose(np.asarray(chunked), direct, rtol=1e-5, atol=1e-5)


def _toy_batch(rng, bs=4, p=8, r=8):
    s = p + r
    input_ids = rng.integers(1, 200, size=(bs, s), dtype=np.int32)
    responses = input_ids[:, p:].copy()
    segment_ids = np.ones((bs, s), dtype=np.int32)
    position_ids = np.tile(np.arange(s)[None, None], (3, bs, 1))
    response_mask = np.ones((bs, r), dtype=np.float32)
    old_lp = rng.normal(size=(bs, r)).astype(np.float32) - 3
    ref_lp = old_lp + rng.normal(size=(bs, r)).astype(np.float32) * 0.01
    adv = rng.normal(size=(bs, r)).astype(np.float32)
    batch = TrainBatch(
        input_ids=jnp.asarray(input_ids),
        segment_ids=jnp.asarray(segment_ids),
        position_ids=jnp.asarray(position_ids),
        responses=jnp.asarray(responses),
        response_mask=jnp.asarray(response_mask),
        old_log_probs=jnp.asarray(old_lp),
        ref_log_probs=jnp.asarray(ref_lp),
        advantages=jnp.asarray(adv),
    )
    return batch


def _micro_batches(batch: TrainBatch, n_micro: int) -> TrainBatch:
    def split(x):
        if x.ndim >= 1 and x.shape[0] == 3:  # position_ids (3, B, S)
            b = x.shape[1]
            return x.reshape(3, n_micro, b // n_micro, *x.shape[2:]).transpose(1, 0, 2, 3)
        b = x.shape[0]
        return x.reshape(n_micro, b // n_micro, *x.shape[1:])

    return TrainBatch(*[split(x) for x in batch])


def test_compute_log_probs_shapes_and_masking():
    rng = np.random.default_rng(2)
    params = init_params(CFG, jax.random.key(0))
    batch = _toy_batch(rng)
    logp, entropy = compute_log_probs(params, CFG, batch, chunk_size=4)
    assert logp.shape == (4, 8)
    assert np.isfinite(np.asarray(logp)).all()
    # log-probs are valid (<= 0)
    assert (np.asarray(logp) <= 1e-5).all()


def test_update_step_changes_params_and_reports_metrics():
    rng = np.random.default_rng(3)
    params = init_params(CFG, jax.random.key(1))
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    update = make_update_fn(
        CFG, opt,
        clip_ratio_low=0.2, clip_ratio_high=0.3, clip_ratio_dual=3.0,
        use_kl_loss=True, kl_loss_coef=0.01, kl_penalty="low_var_kl",
        max_grad_norm=1.0, remat=True, chunk_size=4,
    )
    batch = _micro_batches(_toy_batch(rng), n_micro=2)
    new_params, new_opt_state, metrics = jax.jit(update)(params, opt_state, batch)

    for key in ("actor/loss", "actor/pg_loss", "actor/ppo_kl", "actor/kl_loss", "actor/grad_norm"):
        assert key in metrics and np.isfinite(float(metrics[key])), key
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, new_params)
    assert max(jax.tree.leaves(diff)) > 0.0


def test_update_step_sharded_2x2x2():
    """Full tp+fsdp+dp sharded update on the virtual 8-device mesh."""
    mesh = create_mesh(data_size=2, fsdp_size=2, model_size=2)
    params = init_params(CFG, jax.random.key(2))
    params = shard_params(mesh, params)
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    update = make_update_fn(
        CFG, opt,
        clip_ratio_low=0.2, clip_ratio_high=0.3, clip_ratio_dual=3.0,
        use_kl_loss=False, kl_loss_coef=0.0, kl_penalty="low_var_kl",
        max_grad_norm=1.0, remat=True, chunk_size=4,
    )
    rng = np.random.default_rng(4)
    batch = _micro_batches(_toy_batch(rng, bs=8), n_micro=2)
    bspec = NamedSharding(mesh, P(None, ("data", "fsdp")))

    def shard_batch(x):
        if x.ndim >= 2 and x.shape[0] == 2 and x.shape[1] == 3:  # (n_micro, 3, B, S)
            return jax.device_put(x, NamedSharding(mesh, P(None, None, ("data", "fsdp"))))
        return jax.device_put(x, bspec)

    batch = TrainBatch(*[shard_batch(x) for x in batch])
    new_params, _, metrics = jax.jit(update)(params, opt_state, batch)
    assert np.isfinite(float(metrics["actor/loss"]))
    # params keep their shardings (trailing Nones are insignificant)
    def norm(spec):
        t = tuple(spec)
        while t and t[-1] is None:
            t = t[:-1]
        return t

    leaf = new_params["text"]["layers"]["self_attn"]["qkv_proj"]
    assert norm(leaf.sharding.spec) == norm(
        params["text"]["layers"]["self_attn"]["qkv_proj"].sharding.spec
    )


def test_param_sharding_rules_cover_big_leaves():
    params = init_params(CFG, jax.random.key(3))
    mesh = create_mesh(data_size=1, fsdp_size=4, model_size=2)
    shardings = param_shardings(mesh, params)
    q = shardings["text"]["layers"]["self_attn"]["qkv_proj"]
    assert q.spec == P(None, "model", "fsdp", None)
    gu = shardings["text"]["layers"]["mlp"]["gate_up_proj"]
    assert gu.spec == P(None, None, "fsdp", "model")
    emb = shardings["text"]["embed_tokens"]
    assert emb.spec == P("model", "fsdp")
    norm = shardings["text"]["norm"]
    assert norm.spec == P()
    vqkv = shardings["vision"]["blocks"]["qkv"]
    assert vqkv.spec == P(None, "fsdp", "model")


def test_freeze_vision_tower_zeroes_vision_grads():
    rng = np.random.default_rng(9)
    params = init_params(CFG, jax.random.key(5))
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    update = make_update_fn(
        CFG, opt,
        clip_ratio_low=0.2, clip_ratio_high=0.3, clip_ratio_dual=3.0,
        use_kl_loss=False, kl_loss_coef=0.0, kl_penalty="low_var_kl",
        max_grad_norm=1.0, remat=False, chunk_size=4, freeze_vision_tower=True,
    )
    batch = _micro_batches(_toy_batch(rng), n_micro=2)
    new_params, _, _ = jax.jit(update)(params, opt_state, batch)
    # vision untouched, text changed
    vis_same = jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
        params["vision"], new_params["vision"],
    )
    assert all(jax.tree.leaves(vis_same))
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params["text"], new_params["text"],
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_any_precision_adamw_kahan_recovers_tiny_updates():
    """bf16 params + tiny LR: single-step deltas round to zero in bf16, but
    the Kahan compensation must accumulate them (reference AnyPrecisionAdamW,
    torch_functional.py:250-329). Both moments live in bf16."""
    import optax

    from spatialthinker_tpu.trainer.optim import any_precision_adamw

    lr = 1e-5
    p0 = jnp.full((128,), 1.0, jnp.bfloat16)  # ulp(1.0) in bf16 = 2^-8
    g = jnp.full((128,), 1.0, jnp.float32)

    opt = any_precision_adamw(lr, weight_decay=0.0)
    state = opt.init(p0)
    assert state.mu.dtype == jnp.bfloat16 and state.nu.dtype == jnp.bfloat16

    def run_opt(opt_, state_, p_, steps_):
        def body(carry, _):
            p_c, s_c = carry
            updates, s_c = opt_.update(g, s_c, p_c)
            return (optax.apply_updates(p_c, updates), s_c), None

        (p_out, _), _ = jax.lax.scan(body, (p_, state_), None, length=steps_)
        return p_out

    steps = 1000  # cumulative drift 0.01 ~ 2.5 ulp of bf16 at 1.0
    p = jax.jit(run_opt, static_argnums=(0, 3))(opt, state, p0, steps)

    # fp32 AdamW reference: with constant unit gradient the normalized step is
    # ~ -lr per iteration
    expected_drift = lr * steps
    drift = float(1.0 - np.asarray(p, np.float32).mean())
    assert drift > 0.5 * expected_drift, (drift, expected_drift)

    # naive bf16 accumulation (no compensation) loses everything
    opt_naive = any_precision_adamw(lr, weight_decay=0.0, use_kahan_summation=False)
    pn = jax.jit(run_opt, static_argnums=(0, 3))(opt_naive, opt_naive.init(p0), p0, steps)
    naive_drift = float(1.0 - np.asarray(pn, np.float32).mean())
    assert naive_drift < 0.25 * drift, (naive_drift, drift)


def test_fused_apply_nan_skip_and_matches_update_path():
    """The fused (new-params-direct) path must equal update+apply_updates
    exactly, and finite=False must leave params AND state untouched (the
    NaN-grad skip fuses into the leaf math — tree-wide where() would double
    the footprint)."""
    import optax

    from spatialthinker_tpu.trainer.optim import any_precision_adamw

    rng = np.random.default_rng(3)
    p = {"a": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    g = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)), p)
    opt = any_precision_adamw(1e-2, weight_decay=1e-2)
    state = opt.init(p)

    updates, s1 = opt.update(g, state, p)
    p1 = optax.apply_updates(p, updates)
    p1f, s1f = opt.fused_apply(g, state, p)
    for k in p:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p1f[k]))
    np.testing.assert_array_equal(np.asarray(s1.mu["a"]), np.asarray(s1f.mu["a"]))

    # finite=False: bit-identical no-op on params and every state leaf
    zeros = jax.tree.map(jnp.zeros_like, g)
    p2, s2 = opt.fused_apply(zeros, state, p, finite=jnp.asarray(False))
    for k in p:
        np.testing.assert_array_equal(np.asarray(p2[k]), np.asarray(p[k]))
    np.testing.assert_array_equal(np.asarray(s2.mu["a"]), np.asarray(state.mu["a"]))
    assert int(s2.count) == int(state.count)

    # grad_scale fuses the clip/accum rescale: equals pre-scaled grads exactly
    half = jax.tree.map(lambda x: x * 0.5, g)
    p3, s3 = opt.fused_apply(half, state, p)
    p4, s4 = opt.fused_apply(g, state, p, grad_scale=jnp.asarray(0.5))
    for k in p:
        np.testing.assert_array_equal(np.asarray(p3[k]), np.asarray(p4[k]))
    np.testing.assert_array_equal(np.asarray(s3.nu["a"]), np.asarray(s4.nu["a"]))


def test_any_precision_adamw_matches_fp32_adamw_coarsely():
    """On fp32 params the compensated optimizer tracks optax.adamw closely."""
    import optax

    from spatialthinker_tpu.trainer.optim import any_precision_adamw

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    ref_opt = optax.adamw(1e-2, weight_decay=1e-2)
    got_opt = any_precision_adamw(1e-2, weight_decay=1e-2)
    ref_state, got_state = ref_opt.init(p), got_opt.init(p)
    p_ref = p_got = p
    for i in range(20):
        g = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
        u_ref, ref_state = ref_opt.update(g, ref_state, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_got, got_state = got_opt.update(g, got_state, p_got)
        p_got = optax.apply_updates(p_got, u_got)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_ref), atol=5e-3, rtol=5e-3)
