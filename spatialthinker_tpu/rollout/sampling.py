"""Token sampling: temperature / top-k / top-p, pure jnp, PRNG-key driven.

Replaces vLLM's SamplingParams machinery
(/root/reference/verl/workers/rollout/vllm_rollout_spmd.py:90-113) with
deterministic, key-split sampling that is identical across model-parallel
shards by construction (no RNG-state swapping needed — contrast with the
reference's CUDA RNG surgery in fsdp_vllm.py:59-68).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    n: int = 1

    def override(self, **kwargs) -> "SamplingParams":
        clean = {k: v for k, v in kwargs.items() if v is not None}
        return replace(self, **clean)

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask all but the k largest logits. k <= 0 disables."""
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens with cumulative
    probability >= p (always keeps the argmax)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens whose prefix (exclusive) mass is < p
    keep_sorted = (cum - sorted_probs) < p
    # threshold = smallest kept logit
    kept_logits = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def sample_tokens(
    logits: jnp.ndarray,  # (B, V) fp32
    key: jax.Array,
    params: SamplingParams,
) -> jnp.ndarray:
    """Returns sampled token ids (B,)."""
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(params.temperature, 1e-6)
    logits = apply_top_k(logits, params.top_k)
    logits = apply_top_p(logits, params.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sampled_token_logp(
    logits: jnp.ndarray,   # (B, V) fp32 raw model logits
    tokens: jnp.ndarray,   # (B,) int32 sampled ids
    params: SamplingParams,
) -> jnp.ndarray:
    """Log-prob of the sampled tokens under the TEMPERED distribution
    (logits / T), the behavior policy the PPO ratio must be taken against.
    Matches the reference convention of dividing actor logits by the rollout
    temperature in every forward (reference dp_actor.py:126,149); top-k/top-p
    renormalization is not folded in (same convention). Greedy (T=0) uses
    T=1 so the reported log-prob stays finite."""
    t = params.temperature if params.temperature > 0 else 1.0
    scaled = logits / t
    lse = jax.scipy.special.logsumexp(scaled, axis=-1)
    return jnp.take_along_axis(scaled, tokens[:, None], axis=-1)[:, 0] - lse


def get_response_mask(
    responses: jnp.ndarray, eos_token_id: int, dtype=jnp.int32
) -> jnp.ndarray:
    """Mask = 1 up to and including the FIRST eos token, 0 after
    (parity: reference utils/torch_functional.py get_response_mask)."""
    is_eos = responses == eos_token_id
    seen_eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=-1) - is_eos.astype(jnp.int32)
    return (seen_eos_before == 0).astype(dtype)
