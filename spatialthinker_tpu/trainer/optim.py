"""AnyPrecision AdamW: bf16 moments with Kahan-compensated parameter updates.

TPU-native counterpart of the reference's AnyPrecisionAdamW
(/root/reference/verl/utils/torch_functional.py:250-329): both Adam moments
live in bf16 (halving optimizer-state HBM — the binding constraint for
single-chip 1B+ training) and a per-parameter Kahan compensation buffer
recovers the precision bf16 parameter updates lose to rounding (tiny
lr*step terms vanish against O(1) weights in bf16; the compensation carries
the rounded-off remainder into the next step).

Shape: an optax GradientTransformation whose update() returns the EXACT
fp32 delta to the Kahan-rounded new parameter, so optax.apply_updates
(p + update, cast to p.dtype) lands exactly on the compensated target.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AnyPrecisionAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates        # bf16 first moment
    nu: optax.Updates        # bf16 second moment
    compensation: optax.Updates  # param-dtype Kahan remainder


def any_precision_adamw(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    momentum_dtype=jnp.bfloat16,
    variance_dtype=jnp.bfloat16,
    use_kahan_summation: bool = True,
) -> optax.GradientTransformation:
    def init_fn(params):
        return AnyPrecisionAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=momentum_dtype), params),
            nu=jax.tree.map(lambda p: jnp.zeros_like(p, dtype=variance_dtype), params),
            compensation=jax.tree.map(
                lambda p: jnp.zeros_like(p) if use_kahan_summation else jnp.zeros((0,), p.dtype),
                params,
            ),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("any_precision_adamw requires params")
        count = state.count + 1
        # schedule evaluated at the PRE-increment step (optax convention:
        # first update sees schedule(0), so warmup starts at 0 like adamw)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, mu, nu, comp, p):
            g32 = g.astype(jnp.float32)
            mu32 = mu.astype(jnp.float32) * b1 + (1.0 - b1) * g32
            nu32 = nu.astype(jnp.float32) * b2 + (1.0 - b2) * g32 * g32
            denom = jnp.sqrt(nu32 / c2) + eps
            step = -lr * (mu32 / c1 / denom + weight_decay * p.astype(jnp.float32))
            p32 = p.astype(jnp.float32)
            if use_kahan_summation:
                y = step - comp.astype(jnp.float32)
                t = (p32 + y).astype(p.dtype)  # the rounded new parameter
                new_comp = ((t.astype(jnp.float32) - p32) - y).astype(p.dtype)
                update = t.astype(jnp.float32) - p32  # exact fp32 delta to t
            else:
                new_comp = comp
                update = step
            return update, mu32.astype(momentum_dtype), nu32.astype(variance_dtype), new_comp

        out = jax.tree.map(leaf, grads, state.mu, state.nu, state.compensation, params)
        treedef = jax.tree.structure(grads)
        flat = jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, tuple))
        updates = jax.tree.unflatten(treedef, [o[0] for o in flat])
        mu = jax.tree.unflatten(treedef, [o[1] for o in flat])
        nu = jax.tree.unflatten(treedef, [o[2] for o in flat])
        comp = jax.tree.unflatten(treedef, [o[3] for o in flat])
        return updates, AnyPrecisionAdamWState(count, mu, nu, comp)

    return optax.GradientTransformation(init_fn, update_fn)
