"""Policy / value losses and KL penalties.

Behavioral parity with /root/reference/verl/trainer/core_algos.py:291-436
(dual-clip PPO with asymmetric DAPO clip range, clipped value loss, six KL
penalty variants), written as pure jnp functions that fuse into the training
step under jit.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .masked import masked_mean


def compute_policy_loss(
    old_log_probs: jnp.ndarray,
    log_probs: jnp.ndarray,
    advantages: jnp.ndarray,
    response_mask: jnp.ndarray,
    clip_ratio_low: float,
    clip_ratio_high: float,
    clip_ratio_dual: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dual-clip PPO loss with asymmetric clipping.

    Returns (pg_loss, pg_clipfrac_higher, pg_clipfrac_lower, ppo_kl), all
    masked scalar means.
    """
    negative_approx_kl = log_probs - old_log_probs
    ratio = jnp.exp(negative_approx_kl)
    clipped_ratio = jnp.exp(
        jnp.clip(
            negative_approx_kl,
            jnp.log(1.0 - clip_ratio_low),
            jnp.log(1.0 + clip_ratio_high),
        )
    )

    pg_loss = -advantages * ratio
    pg_loss2 = -advantages * clipped_ratio
    pg_loss3 = -advantages * clip_ratio_dual

    clipped_pg_loss_higher = jnp.maximum(pg_loss, pg_loss2)
    pg_clipfrac_higher = (pg_loss < pg_loss2).astype(jnp.float32)
    clipped_pg_loss_lower = jnp.minimum(clipped_pg_loss_higher, pg_loss3)
    final_pg_loss = jnp.where(advantages < 0, clipped_pg_loss_lower, clipped_pg_loss_higher)
    pg_clipfrac_lower = (
        (clipped_pg_loss_higher > pg_loss3).astype(jnp.float32)
        * (advantages < 0).astype(jnp.float32)
    )

    return (
        masked_mean(final_pg_loss, response_mask),
        masked_mean(pg_clipfrac_higher, response_mask),
        masked_mean(pg_clipfrac_lower, response_mask),
        masked_mean(-negative_approx_kl, response_mask),
    )


def compute_value_loss(
    vpreds: jnp.ndarray,
    returns: jnp.ndarray,
    values: jnp.ndarray,
    action_mask: jnp.ndarray,
    cliprange_value: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clipped value loss (reference core_algos.py:356-391)."""
    vpredclipped = jnp.clip(vpreds, values - cliprange_value, values + cliprange_value)
    vf_loss1 = jnp.square(vpreds - returns)
    vf_loss2 = jnp.square(vpredclipped - returns)
    vf_loss = 0.5 * masked_mean(jnp.maximum(vf_loss1, vf_loss2), action_mask)
    vf_clipfrac = masked_mean((vf_loss1 < vf_loss2).astype(jnp.float32), action_mask)
    return vf_loss, vf_clipfrac


def compute_kl(log_probs: jnp.ndarray, ref_log_probs: jnp.ndarray, kl_penalty: str) -> jnp.ndarray:
    """Per-token KL penalty, six variants (reference core_algos.py:394-436)."""
    log_probs = log_probs.astype(jnp.float32)
    ref_log_probs = ref_log_probs.astype(jnp.float32)
    if kl_penalty == "kl":
        return log_probs - ref_log_probs
    if kl_penalty == "abs":
        return jnp.abs(log_probs - ref_log_probs)
    if kl_penalty == "mse":
        return 0.5 * jnp.square(log_probs - ref_log_probs)
    if kl_penalty == "low_var_kl":
        # J. Schulman, approximating KL: exp(d) - d - 1, d = ref - cur.
        kl = ref_log_probs - log_probs
        kld = jnp.exp(kl) - kl - 1.0
        return jnp.clip(kld, -10.0, 10.0)
    if kl_penalty == "full":
        # torch F.kl_div(ref, cur, log_target=True).sum(-1):
        # sum over last dim of exp(cur) * (cur - ref).
        return jnp.sum(jnp.exp(log_probs) * (log_probs - ref_log_probs), axis=-1)
    if kl_penalty == "chi2":
        r = jnp.exp(ref_log_probs - log_probs)
        return jnp.clip(jnp.square(r - 1.0), 0.0, 20.0)
    raise NotImplementedError(f"Unknown KL penalty: {kl_penalty}.")


def compute_rewards(
    token_level_scores: jnp.ndarray,
    log_probs: jnp.ndarray,
    ref_log_probs: jnp.ndarray,
    kl_ratio: float,
) -> jnp.ndarray:
    """Apply in-reward KL penalty (reference core_algos.py:281-288)."""
    kl = log_probs - ref_log_probs
    return token_level_scores - kl * kl_ratio


def entropy_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Per-token entropy from logits in fp32: logsumexp(z) - sum(p*z)."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    return lse - jnp.sum(probs * logits, axis=-1)
