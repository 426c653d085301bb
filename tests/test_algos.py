"""Unit tests for advantage estimators, losses, and KL — checked against
independently-computed references (numpy re-derivations of the published
algorithms, matching the semantics of verl's core_algos)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spatialthinker_tpu.algos import (
    compute_gae_advantage_return,
    compute_grpo_outcome_advantage,
    compute_kl,
    compute_policy_loss,
    compute_reinforce_plus_plus_outcome_advantage,
    compute_remax_outcome_advantage,
    compute_rloo_outcome_advantage,
    compute_value_loss,
    get_kl_controller,
    masked_mean,
    masked_whiten,
)


def test_grpo_group_whitening_hand_computed():
    # 2 groups of 2; rewards on last token only.
    rewards = np.zeros((4, 3), dtype=np.float32)
    rewards[:, 2] = [1.0, 0.0, 0.5, 0.7]
    mask = np.ones((4, 3), dtype=np.float32)
    gids = np.array([0, 0, 1, 1], dtype=np.int32)

    adv, ret = compute_grpo_outcome_advantage(jnp.array(rewards), jnp.array(mask), jnp.array(gids), 2)
    adv = np.asarray(adv)

    # group 0: scores [1, 0], mean .5, std (ddof=1) = 0.7071
    s0 = np.std([1.0, 0.0], ddof=1)
    expect0 = (1.0 - 0.5) / (s0 + 1e-6)
    np.testing.assert_allclose(adv[0], expect0, rtol=1e-4)
    np.testing.assert_allclose(adv[1], -expect0, rtol=1e-4)
    # group 1: scores [.5, .7]
    s1 = np.std([0.5, 0.7], ddof=1)
    expect2 = (0.5 - 0.6) / (s1 + 1e-6)
    np.testing.assert_allclose(adv[2], expect2, rtol=1e-3)
    np.testing.assert_allclose(ret, adv, rtol=1e-6)


def test_grpo_respects_mask():
    rewards = np.zeros((2, 4), dtype=np.float32)
    rewards[:, 3] = [2.0, 0.0]
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], dtype=np.float32)
    gids = np.zeros(2, dtype=np.int32)
    adv, _ = compute_grpo_outcome_advantage(jnp.array(rewards), jnp.array(mask), jnp.array(gids), 1)
    adv = np.asarray(adv)
    assert adv[0, 2] == 0.0 and adv[0, 3] == 0.0
    assert adv[1, 2] != 0.0 and adv[1, 3] == 0.0


def test_grpo_invariant_to_reordering():
    rng = np.random.default_rng(0)
    rewards = np.zeros((8, 5), dtype=np.float32)
    rewards[:, -1] = rng.normal(size=8)
    mask = np.ones((8, 5), dtype=np.float32)
    gids = np.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=np.int32)
    adv1, _ = compute_grpo_outcome_advantage(jnp.array(rewards), jnp.array(mask), jnp.array(gids), 2)
    perm = rng.permutation(8)
    adv2, _ = compute_grpo_outcome_advantage(
        jnp.array(rewards[perm]), jnp.array(mask[perm]), jnp.array(gids[perm]), 2
    )
    np.testing.assert_allclose(np.asarray(adv1)[perm], np.asarray(adv2), rtol=1e-5)


def test_rloo_leave_one_out():
    rewards = np.zeros((3, 2), dtype=np.float32)
    rewards[:, 1] = [3.0, 1.0, 2.0]
    mask = np.ones((3, 2), dtype=np.float32)
    gids = np.zeros(3, dtype=np.int32)
    adv, _ = compute_rloo_outcome_advantage(jnp.array(rewards), jnp.array(mask), jnp.array(gids), 1)
    adv = np.asarray(adv)
    np.testing.assert_allclose(adv[0, 0], 3.0 - (1.0 + 2.0) / 2.0, rtol=1e-6)
    np.testing.assert_allclose(adv[1, 0], 1.0 - (3.0 + 2.0) / 2.0, rtol=1e-6)


def _gae_numpy(rewards, values, gamma, lam):
    T = rewards.shape[1]
    adv = np.zeros_like(rewards)
    lastgaelam = np.zeros(rewards.shape[0])
    for t in reversed(range(T)):
        nextv = values[:, t + 1] if t < T - 1 else 0.0
        delta = rewards[:, t] + gamma * nextv - values[:, t]
        lastgaelam = delta + gamma * lam * lastgaelam
        adv[:, t] = lastgaelam
    return adv


def test_gae_matches_reference_recurrence():
    rng = np.random.default_rng(1)
    rewards = rng.normal(size=(4, 7)).astype(np.float32)
    values = rng.normal(size=(4, 7)).astype(np.float32)
    mask = np.ones((4, 7), dtype=np.float32)
    gamma, lam = 0.99, 0.95

    adv_ref = _gae_numpy(rewards, values, gamma, lam)
    ret_ref = adv_ref + values
    # reference whitens with Bessel-corrected variance
    m = adv_ref.mean()
    v = adv_ref.var(ddof=1)
    adv_ref_w = (adv_ref - m) / np.sqrt(v + 1e-8)

    adv, ret = compute_gae_advantage_return(
        jnp.array(rewards), jnp.array(values), jnp.array(mask), gamma, lam
    )
    np.testing.assert_allclose(np.asarray(ret), ret_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), adv_ref_w, rtol=1e-3, atol=1e-4)


def test_reinforce_plus_plus_reset_after_eos():
    rewards = np.array([[0.0, 1.0, 0.0, 2.0]], dtype=np.float32)
    mask = np.array([[1, 1, 1, 0]], dtype=np.float32)
    gamma = 0.9
    _, returns = compute_reinforce_plus_plus_outcome_advantage(
        jnp.array(rewards), jnp.array(mask), gamma
    )
    returns = np.asarray(returns)
    # t=3: 2.0, then reset (mask 0). t=2: 0. t=1: 1.0 + .9*0. t=0: .9*1.
    np.testing.assert_allclose(returns[0], [0.9, 1.0, 0.0, 2.0], rtol=1e-5)


def test_remax():
    rewards = np.zeros((2, 3), dtype=np.float32)
    rewards[:, -1] = [1.0, 0.5]
    baselines = np.array([0.25, 0.75], dtype=np.float32)
    mask = np.ones((2, 3), dtype=np.float32)
    adv, _ = compute_remax_outcome_advantage(jnp.array(rewards), jnp.array(baselines), jnp.array(mask))
    np.testing.assert_allclose(np.asarray(adv)[:, 0], [0.75, -0.25], rtol=1e-6)


def test_policy_loss_unclipped_region():
    # ratio == 1 -> loss = -mean(adv), no clipping.
    lp = np.log(np.full((2, 3), 0.5, dtype=np.float32))
    adv = np.full((2, 3), 2.0, dtype=np.float32)
    mask = np.ones((2, 3), dtype=np.float32)
    loss, hi, lo, kl = compute_policy_loss(
        jnp.array(lp), jnp.array(lp), jnp.array(adv), jnp.array(mask), 0.2, 0.3, 3.0
    )
    np.testing.assert_allclose(float(loss), -2.0, rtol=1e-6)
    assert float(hi) == 0.0 and float(lo) == 0.0
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-7)


def test_policy_loss_clip_high():
    # big positive ratio with positive adv -> clipped at 1 + clip_high
    old = np.zeros((1, 1), dtype=np.float32)
    new = np.full((1, 1), 1.0, dtype=np.float32)  # ratio = e
    adv = np.ones((1, 1), dtype=np.float32)
    mask = np.ones((1, 1), dtype=np.float32)
    loss, hi, lo, _ = compute_policy_loss(
        jnp.array(old), jnp.array(new), jnp.array(adv), jnp.array(mask), 0.2, 0.3, 3.0
    )
    np.testing.assert_allclose(float(loss), -1.3, rtol=1e-4)
    assert float(hi) == 1.0


def test_policy_loss_dual_clip_negative_adv():
    # very negative update with negative advantage triggers dual clip at ratio 3.
    old = np.zeros((1, 1), dtype=np.float32)
    new = np.full((1, 1), 5.0, dtype=np.float32)  # huge ratio
    adv = np.full((1, 1), -1.0, dtype=np.float32)
    mask = np.ones((1, 1), dtype=np.float32)
    loss, _, lo, _ = compute_policy_loss(
        jnp.array(old), jnp.array(new), jnp.array(adv), jnp.array(mask), 0.2, 0.3, 3.0
    )
    np.testing.assert_allclose(float(loss), 3.0, rtol=1e-6)
    assert float(lo) == 1.0


def test_value_loss_clipping():
    vpreds = np.array([[2.0]], dtype=np.float32)
    values = np.array([[0.0]], dtype=np.float32)
    returns = np.array([[1.0]], dtype=np.float32)
    mask = np.ones((1, 1), dtype=np.float32)
    vf, frac = compute_value_loss(
        jnp.array(vpreds), jnp.array(returns), jnp.array(values), jnp.array(mask), 0.5
    )
    # vpredclipped = 0.5; loss1 = (2-1)^2 = 1; loss2 = (0.5-1)^2 = .25; max = 1
    np.testing.assert_allclose(float(vf), 0.5, rtol=1e-6)
    assert float(frac) == 0.0


@pytest.mark.parametrize("penalty", ["kl", "abs", "mse", "low_var_kl", "chi2"])
def test_kl_penalties_basic(penalty):
    rng = np.random.default_rng(2)
    lp = rng.normal(size=(3, 5)).astype(np.float32) - 2
    ref = rng.normal(size=(3, 5)).astype(np.float32) - 2
    kl = np.asarray(compute_kl(jnp.array(lp), jnp.array(ref), penalty))
    d = lp - ref
    if penalty == "kl":
        np.testing.assert_allclose(kl, d, rtol=1e-5)
    elif penalty == "abs":
        np.testing.assert_allclose(kl, np.abs(d), rtol=1e-5)
    elif penalty == "mse":
        np.testing.assert_allclose(kl, 0.5 * d * d, rtol=1e-5)
    elif penalty == "low_var_kl":
        e = np.clip(np.exp(-d) + d - 1, -10, 10)
        np.testing.assert_allclose(kl, e, rtol=1e-4)
    elif penalty == "chi2":
        e = np.clip((np.exp(-d) - 1) ** 2, 0, 20)
        np.testing.assert_allclose(kl, e, rtol=1e-4)


def test_kl_controllers():
    fixed = get_kl_controller("fixed", 0.01)
    fixed.update(5.0, 10)
    assert fixed.kl_coef == 0.01
    adaptive = get_kl_controller("adaptive", 0.01, kl_target=1.0, kl_horizon=100)
    adaptive.update(2.0, 10)  # over target -> coef grows
    assert adaptive.kl_coef > 0.01


def test_masked_whiten_stats():
    rng = np.random.default_rng(3)
    x = rng.normal(3.0, 2.0, size=(16, 8)).astype(np.float32)
    mask = (rng.random((16, 8)) > 0.3).astype(np.float32)
    w = np.asarray(masked_whiten(jnp.array(x), jnp.array(mask)))
    sel = w[mask == 1]
    np.testing.assert_allclose(sel.mean(), 0.0, atol=1e-3)
    np.testing.assert_allclose(sel.std(ddof=1), 1.0, atol=2e-2)
