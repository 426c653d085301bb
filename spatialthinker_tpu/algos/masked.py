"""Masked statistics helpers (parity: /root/reference/verl/utils/torch_functional.py
masked_mean/masked_var/masked_whiten)."""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1e-8)


def masked_var(values: jnp.ndarray, mask: jnp.ndarray, unbiased: bool = True) -> jnp.ndarray:
    mask = mask.astype(values.dtype)
    mean = masked_mean(values, mask)
    centered = (values - mean) * mask
    n = jnp.sum(mask)
    var = jnp.sum(centered * centered) / jnp.maximum(n, 1e-8)
    if unbiased:
        # Bessel correction matching torch masked_var semantics.
        var = var * n / jnp.maximum(n - 1.0, 1.0)
    return var


def masked_whiten(values: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mean = masked_mean(values, mask)
    var = masked_var(values, mask)
    return (values - mean) / jnp.sqrt(var + eps)
