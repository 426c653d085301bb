"""Fused token log-probabilities (and entropy) from hidden states.

Replaces the reference's flash-attn CUDA cross-entropy fast path
(/root/reference/verl/utils/torch_functional.py:34-52): computing
log p(label) for a (B, S) batch would naively materialize (B, S, V) fp32
logits — at V=152k and S=8k that is tens of GB. Instead we scan over sequence
chunks: each chunk computes its (B, C, V) logits on the MXU, reduces to
log-prob + entropy, and is rematerialized in the backward pass (checkpointed
scan), so peak memory is O(B * C * V) while XLA keeps the matmul large enough
to saturate the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _chunk_logprob(hidden_chunk, labels_chunk, head, compute_entropy: bool,
                   inv_temperature: float = 1.0):
    """hidden (B, C, E) x head (E, V) -> (logp (B, C), entropy (B, C))."""
    logits = jnp.dot(hidden_chunk, head, preferred_element_type=jnp.float32)  # (B, C, V)
    if inv_temperature != 1.0:
        logits = logits * inv_temperature
    lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (B, C)
    label_logit = jnp.take_along_axis(logits, labels_chunk[..., None], axis=-1)[..., 0]
    logp = label_logit - lse
    if compute_entropy:
        probs = jax.nn.softmax(logits, axis=-1)
        entropy = lse - jnp.sum(probs * logits, axis=-1)
    else:
        entropy = jnp.zeros_like(logp)
    return logp, entropy


def log_probs_from_hidden(
    hidden: jnp.ndarray,   # (B, S, E)
    labels: jnp.ndarray,   # (B, S) int32
    head: jnp.ndarray,     # (E, V)
    *,
    chunk_size: int = 1024,
    compute_entropy: bool = False,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_probs (B, S) fp32, entropy (B, S) fp32). `temperature`
    divides the logits before the softmax — the PPO forward must evaluate the
    same tempered distribution the rollout sampled from (reference divides
    actor logits by the rollout temperature, dp_actor.py:126,149)."""
    b, s, e = hidden.shape
    if s % chunk_size != 0:
        chunk_size = _best_chunk(s, chunk_size)
    n_chunks = s // chunk_size
    inv_t = 1.0 / temperature if temperature > 0 else 1.0

    hidden_chunks = hidden.reshape(b, n_chunks, chunk_size, e).transpose(1, 0, 2, 3)
    label_chunks = labels.reshape(b, n_chunks, chunk_size).transpose(1, 0, 2)

    body = jax.checkpoint(
        lambda carry, xs: (carry, _chunk_logprob(xs[0], xs[1], head, compute_entropy, inv_t)),
        policy=jax.checkpoint_policies.nothing_saveable,
    )
    _, (logps, ents) = jax.lax.scan(body, (), (hidden_chunks, label_chunks))
    logp = logps.transpose(1, 0, 2).reshape(b, s)
    entropy = ents.transpose(1, 0, 2).reshape(b, s)
    return logp, entropy


def _best_chunk(s: int, target: int) -> int:
    """Largest divisor of s that is <= target (falls back to s)."""
    best = 1
    for c in range(1, min(target, s) + 1):
        if s % c == 0:
            best = c
    return best


def log_probs_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Direct (small-scale) variant for tests and decode-time: (B, S, V) -> (B, S)."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    label_logit = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return label_logit - lse
