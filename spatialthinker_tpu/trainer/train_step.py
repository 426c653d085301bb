"""Jitted training-step functions: actor log-prob forward and GRPO/PPO update.

TPU-native counterpart of the reference's DataParallelPPOActor
(/root/reference/verl/workers/actor/dp_actor.py:64-292): one SPMD program over
the (data, fsdp, model) mesh replaces the dispatch/worker machinery. Grad
accumulation over micro-batches is a lax.scan inside the jitted update (same
memory behavior as the reference's micro-batch loop, one compilation).

Sequence layout: [prompt (left-padded to P) | response (right-padded to R)].
hidden[:, P-1+i] predicts response token i, so the log-prob slice is
hidden[:, P-1 : P+R-1].
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..algos.losses import compute_kl, compute_policy_loss
from ..algos.masked import masked_mean
from ..models.qwen2_5_vl import Qwen25VLConfig, forward
from ..models.qwen2_5_vl.model import VisionInputs
from ..ops.logprobs import log_probs_from_hidden


class TrainBatch(NamedTuple):
    """Device-side micro/mini-batch for the actor. All (B, ...) arrays."""

    input_ids: jnp.ndarray       # (B, S) prompt+response, S = P + R
    segment_ids: jnp.ndarray     # (B, S) 1 where valid, 0 padding
    position_ids: jnp.ndarray    # (3, B, S) mRoPE
    responses: jnp.ndarray       # (B, R)
    response_mask: jnp.ndarray   # (B, R) float/int
    old_log_probs: jnp.ndarray   # (B, R)
    ref_log_probs: jnp.ndarray   # (B, R)
    advantages: jnp.ndarray      # (B, R)


def _response_hidden(params, cfg: Qwen25VLConfig, batch: TrainBatch,
                     vision: Optional[VisionInputs], remat: bool, sp=None):
    hidden, _ = forward(
        params, cfg, batch.input_ids, batch.position_ids,
        segment_ids=batch.segment_ids, vision=vision, remat=remat, sp=sp,
    )
    r = batch.responses.shape[1]
    p = batch.input_ids.shape[1] - r
    return jax.lax.dynamic_slice_in_dim(hidden, p - 1, r, axis=1)  # (B, R, E)


def _lm_head(params, cfg: Qwen25VLConfig):
    text = params["text"]
    return text["embed_tokens"].T if cfg.text.tie_word_embeddings else text["lm_head"]


def compute_log_probs(
    params, cfg: Qwen25VLConfig, batch: TrainBatch,
    vision: Optional[VisionInputs] = None,
    *, remat: bool = False, chunk_size: int = 1024, compute_entropy: bool = False,
    temperature: float = 1.0, sp=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, R) log-probs of the sampled responses under `params` (+ entropy),
    evaluated at the rollout temperature (behavior-policy distribution)."""
    hidden = _response_hidden(params, cfg, batch, vision, remat, sp=sp)
    head = _lm_head(params, cfg).astype(hidden.dtype)
    logp, entropy = log_probs_from_hidden(
        hidden, batch.responses, head, chunk_size=chunk_size,
        compute_entropy=compute_entropy, temperature=temperature,
    )
    return logp, entropy


def actor_loss_fn(
    params,
    cfg: Qwen25VLConfig,
    batch: TrainBatch,
    vision: Optional[VisionInputs],
    *,
    clip_ratio_low: float,
    clip_ratio_high: float,
    clip_ratio_dual: float,
    use_kl_loss: bool,
    kl_loss_coef: float,
    kl_penalty: str,
    entropy_coeff: float = 0.0,
    remat: bool = True,
    chunk_size: int = 1024,
    temperature: float = 1.0,
    sp=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    logp, entropy = compute_log_probs(
        params, cfg, batch, vision, remat=remat, chunk_size=chunk_size,
        compute_entropy=entropy_coeff != 0.0, temperature=temperature, sp=sp,
    )
    mask = batch.response_mask.astype(jnp.float32)
    pg_loss, clip_hi, clip_lo, ppo_kl = compute_policy_loss(
        batch.old_log_probs, logp, batch.advantages, mask,
        clip_ratio_low, clip_ratio_high, clip_ratio_dual,
    )
    loss = pg_loss
    metrics = {
        "actor/pg_loss": pg_loss,
        "actor/pg_clipfrac_higher": clip_hi,
        "actor/pg_clipfrac_lower": clip_lo,
        "actor/ppo_kl": ppo_kl,
    }
    if use_kl_loss:
        kld = compute_kl(logp, batch.ref_log_probs, kl_penalty)
        kl_loss = masked_mean(kld, mask)
        loss = loss + kl_loss * kl_loss_coef
        metrics["actor/kl_loss"] = kl_loss
    if entropy_coeff != 0.0:
        entropy_loss = masked_mean(entropy, mask)
        loss = loss - entropy_coeff * entropy_loss
        metrics["actor/entropy_loss"] = entropy_loss
    return loss, metrics


def make_update_fn(
    cfg: Qwen25VLConfig,
    optimizer: optax.GradientTransformation,
    *,
    clip_ratio_low: float,
    clip_ratio_high: float,
    clip_ratio_dual: float,
    use_kl_loss: bool,
    kl_loss_coef: float,
    kl_penalty: str,
    entropy_coeff: float = 0.0,
    max_grad_norm: float = 1.0,
    remat: bool = True,
    chunk_size: int = 1024,
    grad_accum_dtype=jnp.float32,
    freeze_vision_tower: bool = False,
    temperature: float = 1.0,
    sp=None,
):
    """Build the jittable mini-batch update: scan over micro-batches
    accumulating grads, one optimizer step, NaN-grad skip
    (parity: reference dp_actor.py:155-166 + micro-batch loop :212-292)."""

    grad_step = make_grad_fn(
        cfg,
        clip_ratio_low=clip_ratio_low,
        clip_ratio_high=clip_ratio_high,
        clip_ratio_dual=clip_ratio_dual,
        use_kl_loss=use_kl_loss,
        kl_loss_coef=kl_loss_coef,
        kl_penalty=kl_penalty,
        entropy_coeff=entropy_coeff,
        max_grad_norm=max_grad_norm,
        remat=remat,
        chunk_size=chunk_size,
        grad_accum_dtype=grad_accum_dtype,
        freeze_vision_tower=freeze_vision_tower,
        temperature=temperature,
        sp=sp,
    )

    def update(params, opt_state, micro_batches: TrainBatch, vision: Optional[VisionInputs] = None):
        """micro_batches: TrainBatch with a leading (n_micro,) dim on each array.
        `vision`, when present, is a VisionInputs stacked the same way (one
        pack per micro-batch, common bucket size)."""
        grads, metrics, finite, factor = grad_step(params, micro_batches, vision)
        new_params, new_opt_state = apply_optimizer_step(
            optimizer, grads, opt_state, params, finite=finite, grad_scale=factor,
            freeze_vision_tower=freeze_vision_tower,
        )
        return new_params, new_opt_state, metrics

    return update


def make_grad_fn(
    cfg: Qwen25VLConfig,
    *,
    clip_ratio_low: float,
    clip_ratio_high: float,
    clip_ratio_dual: float,
    use_kl_loss: bool,
    kl_loss_coef: float,
    kl_penalty: str,
    entropy_coeff: float = 0.0,
    max_grad_norm: float = 1.0,
    remat: bool = True,
    chunk_size: int = 1024,
    grad_accum_dtype=jnp.float32,
    freeze_vision_tower: bool = False,
    temperature: float = 1.0,
    sp=None,
):
    """The accumulation half of the update step: scan micro-batches, sum
    grads, fold the clip/accum rescale and the NaN-skip decision into two
    scalars. Returns ``grad_step(params, micro_batches, vision) -> (grads,
    metrics, finite, factor)``. make_update_fn composes it with the fused
    in-HBM optimizer; the host-streamed optimizer (trainer/streamed_opt.py)
    jits THIS alone and applies the moments in layer-slice round trips —
    grads must come back to the host loop, so the optimizer apply cannot
    live in the same program."""

    loss_kwargs = dict(
        sp=sp,
        clip_ratio_low=clip_ratio_low,
        clip_ratio_high=clip_ratio_high,
        clip_ratio_dual=clip_ratio_dual,
        use_kl_loss=use_kl_loss,
        kl_loss_coef=kl_loss_coef,
        kl_penalty=kl_penalty,
        entropy_coeff=entropy_coeff,
        remat=remat,
        chunk_size=chunk_size,
        temperature=temperature,
    )

    def grad_step(params, micro_batches: TrainBatch, vision: Optional[VisionInputs] = None):
        grad_fn = jax.value_and_grad(
            lambda p, mb, vis: actor_loss_fn(p, cfg, mb, vis, **loss_kwargs), has_aux=True
        )

        def micro_step(carry, xs):
            mb, vis = (xs, None) if vision is None else xs
            grad_acc, metric_acc = carry
            (loss, metrics), grads = grad_fn(params, mb, vis)
            metrics["actor/loss"] = loss
            grad_acc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), grad_acc, grads
            )
            metric_acc = {k: metric_acc[k] + metrics[k] for k in metric_acc}
            return (grad_acc, metric_acc), None

        n_micro = micro_batches.input_ids.shape[0]
        zero_grads = jax.tree.map(lambda x: jnp.zeros_like(x, dtype=grad_accum_dtype), params)
        # scan carries must have fixed structure: pre-declare every metric key
        metric_keys = [
            "actor/loss",
            "actor/pg_loss",
            "actor/pg_clipfrac_higher",
            "actor/pg_clipfrac_lower",
            "actor/ppo_kl",
        ]
        if use_kl_loss:
            metric_keys.append("actor/kl_loss")
        if entropy_coeff != 0.0:
            metric_keys.append("actor/entropy_loss")
        init_metrics = {k: jnp.zeros((), jnp.float32) for k in metric_keys}
        xs = micro_batches if vision is None else (micro_batches, vision)
        (grads, metric_sums), _ = jax.lax.scan(micro_step, (zero_grads, init_metrics), xs)
        if freeze_vision_tower and "vision" in grads:
            grads = {**grads, "vision": jax.tree.map(jnp.zeros_like, grads["vision"])}
        metrics = {k: v / n_micro for k, v in metric_sums.items()}

        # norm/clip/NaN-zero WITHOUT materializing fp32 grad trees: with bf16
        # accumulation a `.astype(f32)` tree is one param copy at 2x width
        # (5GB at 1B — a fits-or-OOMs term); the fp32 math fuses into the
        # reductions and the optimizer's per-chunk grad_scale instead
        grad_norm = _global_norm_f32(grads) / n_micro
        metrics["actor/grad_norm"] = grad_norm
        scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-6)) / n_micro
        finite = jnp.isfinite(grad_norm)
        factor = jnp.where(finite, scale, 0.0)
        return grads, metrics, finite, factor

    return grad_step


def _global_norm_f32(tree) -> jnp.ndarray:
    """Global L2 norm with fp32 accumulation fused into the reductions (no
    materialized fp32 copy of bf16 grad trees)."""
    sq = sum(
        jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(tree)
    )
    return jnp.sqrt(sq)


def apply_optimizer_step(optimizer, grads, opt_state, params, *, finite,
                         grad_scale=None, freeze_vision_tower: bool = False):
    """Optimizer apply with NaN-grad skip and optional vision freeze. Prefers
    the optimizer's FUSED path (trainer/optim.py fused_apply): new params come
    back in param dtype directly — no fp32 delta tree (one param copy at 2x
    width: 5GB at 1B) and the stacked-leaf fp32 math chunks per layer.

    ``grad_scale`` (scalar: clip rescale / accumulation divisor, pre-zeroed
    when ``finite`` is False) rides INTO the fused per-chunk math — a
    caller-side rescaled grad tree would be one param copy of HBM temps, the
    1B fit-or-OOM term. The non-fused optax fallback applies it as a tree map
    (test-scale only)."""
    fused = getattr(optimizer, "fused_apply", None)
    if fused is not None:
        # the NaN-grad skip rides INSIDE the fused per-chunk math: an outer
        # tree-wide where(new, old) would keep both param+state copies alive
        # and defeat buffer donation (doubled footprint — the 1B OOM term)
        new_params, new_opt_state = fused(
            grads, opt_state, params, finite=finite, grad_scale=grad_scale
        )
        if freeze_vision_tower and "vision" in new_params:
            # restore exactly: AdamW weight decay would otherwise still move
            # "frozen" params even under zero grads
            new_params = {**new_params, "vision": params["vision"]}
        return new_params, new_opt_state
    if grad_scale is not None:
        grads = jax.tree.map(
            lambda g: (g.astype(jnp.float32) * grad_scale).astype(g.dtype), grads
        )
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    if freeze_vision_tower and "vision" in updates:
        # zero the UPDATES too (same weight-decay reasoning)
        updates = {**updates, "vision": jax.tree.map(jnp.zeros_like, updates["vision"])}
    new_params = optax.apply_updates(params, updates)
    # NaN-grad skip: keep old params/opt state when the grad norm is not finite
    new_params = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old), new_params, params
    )
    new_opt_state = jax.tree.map(
        lambda new, old: jnp.where(finite, new, old), new_opt_state, opt_state
    )
    return new_params, new_opt_state


class PackedTrainBatch(NamedTuple):
    """Packed (padding-free) rows — see data/text_packing.py."""

    input_ids: jnp.ndarray      # (rows, L)
    segment_ids: jnp.ndarray    # (rows, L)
    position_ids: jnp.ndarray   # (3, rows, L)
    labels: jnp.ndarray         # (rows, L)
    loss_mask: jnp.ndarray      # (rows, L)
    old_log_probs: jnp.ndarray  # (rows, L)
    ref_log_probs: jnp.ndarray  # (rows, L)
    advantages: jnp.ndarray     # (rows, L)


def compute_packed_log_probs(
    params, cfg: Qwen25VLConfig, batch: PackedTrainBatch,
    vision: Optional[VisionInputs] = None,
    *, remat: bool = False, chunk_size: int = 1024, compute_entropy: bool = False,
    temperature: float = 1.0, sp=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rows, L) label log-probs on packed rows (masked positions -> 0).
    `vision` must be packed in the rows' image-token order (row-major)."""
    hidden, _ = forward(
        params, cfg, batch.input_ids, batch.position_ids,
        segment_ids=batch.segment_ids, vision=vision, remat=remat, sp=sp,
    )
    head = _lm_head(params, cfg).astype(hidden.dtype)
    logp, entropy = log_probs_from_hidden(
        hidden, batch.labels, head, chunk_size=chunk_size,
        compute_entropy=compute_entropy, temperature=temperature,
    )
    return logp * batch.loss_mask, entropy * batch.loss_mask


def packed_actor_loss_fn(
    params, cfg: Qwen25VLConfig, batch: PackedTrainBatch,
    vision: Optional[VisionInputs] = None,
    *,
    clip_ratio_low: float, clip_ratio_high: float, clip_ratio_dual: float,
    use_kl_loss: bool, kl_loss_coef: float, kl_penalty: str,
    entropy_coeff: float = 0.0, remat: bool = True, chunk_size: int = 1024,
    temperature: float = 1.0, sp=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Identical math to actor_loss_fn on packed rows: token-weighted masked
    means make the two layouts numerically equivalent."""
    logp, entropy = compute_packed_log_probs(
        params, cfg, batch, vision, remat=remat, chunk_size=chunk_size,
        compute_entropy=entropy_coeff != 0.0, temperature=temperature, sp=sp,
    )
    mask = batch.loss_mask
    pg_loss, clip_hi, clip_lo, ppo_kl = compute_policy_loss(
        batch.old_log_probs, logp, batch.advantages, mask,
        clip_ratio_low, clip_ratio_high, clip_ratio_dual,
    )
    loss = pg_loss
    metrics = {
        "actor/pg_loss": pg_loss,
        "actor/pg_clipfrac_higher": clip_hi,
        "actor/pg_clipfrac_lower": clip_lo,
        "actor/ppo_kl": ppo_kl,
    }
    if use_kl_loss:
        kld = compute_kl(logp, batch.ref_log_probs, kl_penalty)
        kl_loss = masked_mean(kld, mask)
        loss = loss + kl_loss * kl_loss_coef
        metrics["actor/kl_loss"] = kl_loss
    if entropy_coeff != 0.0:
        entropy_loss = masked_mean(entropy, mask)
        loss = loss - entropy_coeff * entropy_loss
        metrics["actor/entropy_loss"] = entropy_loss
    return loss, metrics


def make_packed_update_fn(
    cfg: Qwen25VLConfig,
    optimizer: optax.GradientTransformation,
    *,
    clip_ratio_low: float, clip_ratio_high: float, clip_ratio_dual: float,
    use_kl_loss: bool, kl_loss_coef: float, kl_penalty: str,
    entropy_coeff: float = 0.0, max_grad_norm: float = 1.0,
    remat: bool = True, chunk_size: int = 1024, temperature: float = 1.0,
    grad_accum_dtype=jnp.float32,
    sp=None,
):
    """Packed-row variant of make_update_fn: micro dim on every array."""

    grad_step = make_packed_grad_fn(
        cfg,
        clip_ratio_low=clip_ratio_low, clip_ratio_high=clip_ratio_high,
        clip_ratio_dual=clip_ratio_dual, use_kl_loss=use_kl_loss,
        kl_loss_coef=kl_loss_coef, kl_penalty=kl_penalty,
        entropy_coeff=entropy_coeff, max_grad_norm=max_grad_norm,
        remat=remat, chunk_size=chunk_size, temperature=temperature,
        grad_accum_dtype=grad_accum_dtype, sp=sp,
    )

    def update(params, opt_state, micro_batches: PackedTrainBatch, vision=None):
        grads, metrics, finite, factor = grad_step(params, micro_batches, vision)
        new_params, new_opt_state = apply_optimizer_step(
            optimizer, grads, opt_state, params, finite=finite, grad_scale=factor
        )
        return new_params, new_opt_state, metrics

    return update


def make_packed_grad_fn(
    cfg: Qwen25VLConfig,
    *,
    clip_ratio_low: float, clip_ratio_high: float, clip_ratio_dual: float,
    use_kl_loss: bool, kl_loss_coef: float, kl_penalty: str,
    entropy_coeff: float = 0.0, max_grad_norm: float = 1.0,
    remat: bool = True, chunk_size: int = 1024, temperature: float = 1.0,
    grad_accum_dtype=jnp.float32,
    sp=None,
):
    """Packed-row variant of make_grad_fn (the accumulation half alone) —
    the host-streamed optimizer (trainer/streamed_opt.py) composes it with
    layer-slice moment round trips, exactly like the unpacked split."""

    loss_kwargs = dict(
        clip_ratio_low=clip_ratio_low, clip_ratio_high=clip_ratio_high,
        clip_ratio_dual=clip_ratio_dual, use_kl_loss=use_kl_loss,
        kl_loss_coef=kl_loss_coef, kl_penalty=kl_penalty,
        entropy_coeff=entropy_coeff, remat=remat, chunk_size=chunk_size,
        temperature=temperature, sp=sp,
    )

    def grad_step(params, micro_batches: PackedTrainBatch, vision=None):
        grad_fn = jax.value_and_grad(
            lambda p, mb, vis: packed_actor_loss_fn(p, cfg, mb, vis, **loss_kwargs),
            has_aux=True,
        )

        def micro_step(carry, xs):
            mb, vis = (xs, None) if vision is None else xs
            grad_acc, metric_acc = carry
            (loss, metrics), grads = grad_fn(params, mb, vis)
            metrics["actor/loss"] = loss
            # the accumulator dtype is authoritative: param-dtype grads must
            # cast INTO it or the scan carry dtype changes (fp32 params with
            # grad_accum_dtype=bfloat16 — the optim.stream default)
            grad_acc = jax.tree.map(
                lambda a, g: a + g.astype(a.dtype), grad_acc, grads
            )
            metric_acc = {k: metric_acc[k] + metrics[k] for k in metric_acc}
            return (grad_acc, metric_acc), None

        n_micro = micro_batches.input_ids.shape[0]
        zero_grads = jax.tree.map(lambda x: jnp.zeros_like(x, dtype=grad_accum_dtype), params)
        metric_keys = [
            "actor/loss", "actor/pg_loss", "actor/pg_clipfrac_higher",
            "actor/pg_clipfrac_lower", "actor/ppo_kl",
        ]
        if use_kl_loss:
            metric_keys.append("actor/kl_loss")
        if entropy_coeff != 0.0:
            metric_keys.append("actor/entropy_loss")
        init_metrics = {k: jnp.zeros((), jnp.float32) for k in metric_keys}
        xs = micro_batches if vision is None else (micro_batches, vision)
        (grads, metric_sums), _ = jax.lax.scan(
            micro_step, (zero_grads, init_metrics), xs
        )
        metrics = {k: v / n_micro for k, v in metric_sums.items()}

        # see make_update_fn: fp32 math fuses into reductions + optimizer scale
        grad_norm = _global_norm_f32(grads) / n_micro
        metrics["actor/grad_norm"] = grad_norm
        scale = jnp.minimum(1.0, max_grad_norm / (grad_norm + 1e-6)) / n_micro
        finite = jnp.isfinite(grad_norm)
        factor = jnp.where(finite, scale, 0.0)
        return grads, metrics, finite, factor

    return grad_step


def make_optimizer(
    lr: float,
    *,
    weight_decay: float = 1e-2,
    betas: Tuple[float, float] = (0.9, 0.999),
    warmup_steps: int = 0,
    strategy: str = "adamw",
    use_kahan_summation: bool = True,
) -> optax.GradientTransformation:
    """AdamW with constant-after-warmup LR (reference torch_functional.py
    get_constant_schedule_with_warmup). Strategy ``adamw_bf16`` is the full
    AnyPrecisionAdamW: BOTH moments in bf16 + Kahan-compensated bf16 param
    updates (reference torch_functional.py:250-329) — see trainer/optim.py.
    ``use_kahan_summation=False`` (same knob as the reference's
    AnyPrecisionAdamW) drops the per-param compensation buffer — one full
    param copy of HBM, the marginal fit-or-OOM term at 1B+ single-chip."""
    if warmup_steps > 0:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), optax.constant_schedule(lr)],
            [warmup_steps],
        )
    else:
        schedule = optax.constant_schedule(lr)
    if strategy == "adamw_bf16":
        from .optim import any_precision_adamw

        return any_precision_adamw(
            schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay,
            use_kahan_summation=use_kahan_summation,
        )
    return optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
