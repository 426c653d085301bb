"""Critic: value model (backbone + scalar token head) and its clipped-loss
update — the GAE path.

Parity: the reference's DataParallelPPOCritic
(/root/reference/verl/workers/critic/dp_critic.py:45-225), which loads an
AutoModelForTokenClassification (num_labels=1) and trains a clipped value
loss; values are read at hidden positions P-1..P+R-2 (the prediction slots
for response tokens, reference's values[:, -len-1:-1] slice).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..algos.losses import compute_value_loss
from ..models.qwen2_5_vl import Qwen25VLConfig, forward, init_params
from ..models.qwen2_5_vl.model import VisionInputs
from .train_step import TrainBatch


def init_critic_params(cfg: Qwen25VLConfig, key: jax.Array, dtype=jnp.float32,
                       base_params: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Backbone + scalar value head. ``base_params`` initializes the backbone
    from loaded weights (critic.model.model_path, reference fsdp_workers
    builds the critic from its own model config) instead of random init."""
    k1, k2 = jax.random.split(key)
    params = base_params if base_params is not None else init_params(cfg, k1, dtype)
    e = cfg.text.hidden_size
    params["value_head"] = {
        "weight": (jax.random.normal(k2, (e, 1), jnp.float32) * 0.02).astype(dtype),
        "bias": jnp.zeros((1,), dtype),
    }
    return params


def compute_values(
    params, cfg: Qwen25VLConfig, batch: TrainBatch,
    vision: Optional[VisionInputs] = None, remat: bool = False,
) -> jnp.ndarray:
    """(B, R) value predictions for each response position."""
    hidden, _ = forward(
        params, cfg, batch.input_ids, batch.position_ids,
        segment_ids=batch.segment_ids, vision=vision, remat=remat,
    )
    r = batch.responses.shape[1]
    p = batch.input_ids.shape[1] - r
    hidden_resp = jax.lax.dynamic_slice_in_dim(hidden, p - 1, r, axis=1)
    vh = params["value_head"]
    values = (
        jnp.dot(hidden_resp, vh["weight"].astype(hidden_resp.dtype)) + vh["bias"]
    )[..., 0].astype(jnp.float32)
    return values * batch.response_mask.astype(jnp.float32)


class CriticBatch(NamedTuple):
    train: TrainBatch
    values: jnp.ndarray   # old values (B, R)
    returns: jnp.ndarray  # (B, R)


def make_critic_update_fn(
    cfg: Qwen25VLConfig,
    optimizer: optax.GradientTransformation,
    *,
    cliprange_value: float = 0.5,
    max_grad_norm: float = 1.0,
    remat: bool = True,
):
    def loss_fn(params, cb: CriticBatch, vision):
        vpreds = compute_values(params, cfg, cb.train, vision, remat=remat)
        mask = cb.train.response_mask.astype(jnp.float32)
        vf_loss, vf_clipfrac = compute_value_loss(
            vpreds, cb.returns, cb.values, mask, cliprange_value
        )
        return vf_loss, {"critic/vf_loss": vf_loss, "critic/vf_clipfrac": vf_clipfrac}

    def update(params, opt_state, micro_batches: CriticBatch, vision=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro_step(carry, xs):
            mb, vis = (xs, None) if vision is None else xs
            grad_acc, metric_acc = carry
            (loss, metrics), grads = grad_fn(params, mb, vis)
            grad_acc = jax.tree.map(jnp.add, grad_acc, grads)
            metric_acc = {k: metric_acc[k] + metrics[k] for k in metric_acc}
            return (grad_acc, metric_acc), None

        n_micro = micro_batches.train.input_ids.shape[0]
        zero = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params)
        init_metrics = {
            "critic/vf_loss": jnp.zeros((), jnp.float32),
            "critic/vf_clipfrac": jnp.zeros((), jnp.float32),
        }
        xs = micro_batches if vision is None else (micro_batches, vision)
        (grads, sums), _ = jax.lax.scan(micro_step, (zero, init_metrics), xs)
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        metrics = {k: v / n_micro for k, v in sums.items()}

        grad_norm = optax.global_norm(grads)
        metrics["critic/grad_norm"] = grad_norm
        scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-6))
        finite = jnp.isfinite(grad_norm)
        factor = jnp.where(finite, scale, 0.0)
        from .train_step import apply_optimizer_step

        new_params, new_opt_state = apply_optimizer_step(
            optimizer, grads, opt_state, params, finite=finite, grad_scale=factor
        )
        return new_params, new_opt_state, metrics

    return update
