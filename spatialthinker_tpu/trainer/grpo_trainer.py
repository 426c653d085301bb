"""The GRPO/PPO driver: one SPMD program runs rollout -> reward -> log-probs ->
advantages -> policy update on a single set of sharded weights.

Call-structure parity with the reference's RayPPOTrainer.fit
(/root/reference/verl/trainer/ray_trainer.py:543-721), with the entire
single-controller / Ray / sharding-manager stack deleted: every `*_wg.method`
dispatch boundary in the reference is a jitted function call here, and the
hybrid-engine weight sync (fsdp_vllm.py) does not exist because generation
reads the same param pytree the optimizer writes.
"""

from __future__ import annotations

import os
import time
import uuid
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..algos import (
    compute_gae_advantage_return,
    compute_grpo_outcome_advantage,
    compute_kl,
    compute_reinforce_plus_plus_outcome_advantage,
    compute_remax_outcome_advantage,
    compute_rloo_outcome_advantage,
    get_kl_controller,
)
from ..core.batch import (
    RolloutBatch,
    pad_to_divisor,
    trim_prompt_padding,
    trim_response_padding,
    unpad,
)
from ..core.config import PPOConfig
from ..data.packing import pack_vision_batch
from ..models.qwen2_5_vl import Qwen25VLConfig
from ..parallel.mesh import create_mesh
from ..parallel.sharding import shard_params
from ..rewards.manager import RewardManager
from ..rollout.continuous import effective_prefill_chunk
from ..rollout.engine import generate
from ..rollout.sampling import SamplingParams
from ..utils.flops_counter import FlopsCounter, compute_mfu
from ..utils.profiling import maybe_trace
from ..utils.seqlen_balancing import balance_order
from .checkpoint import CheckpointManager
from .metrics import (
    Timer,
    compute_data_metrics,
    compute_throughput_metrics,
    compute_timing_metrics,
    reduce_metrics,
)
from .tracker import Tracker
from .train_step import (
    TrainBatch, compute_log_probs, make_grad_fn, make_optimizer, make_update_fn,
)


class GRPOTrainer:
    def __init__(
        self,
        config: PPOConfig,
        tokenizer,
        model_cfg: Qwen25VLConfig,
        params,
        train_dataloader,
        val_dataloader=None,
        reward_fn: Optional[RewardManager] = None,
        val_reward_fn: Optional[RewardManager] = None,
        mesh=None,
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.model_cfg = model_cfg
        self.train_dataloader = train_dataloader
        self.val_dataloader = val_dataloader
        self.reward_fn = reward_fn
        self.val_reward_fn = val_reward_fn or reward_fn

        algo = config.algorithm
        self.adv_estimator = algo.adv_estimator
        if self.adv_estimator in ("grpo", "rloo") and config.worker.rollout.n < 2:
            # group-relative baselines degenerate to zero advantage at n=1:
            # training would silently produce zero gradients (reference
            # asserts the same in ray_trainer.__init__)
            raise ValueError(
                f"{self.adv_estimator} needs worker.rollout.n > 1 "
                f"(got {config.worker.rollout.n}); group whitening over a "
                "single sample yields identically zero advantages"
            )
        rollout_bs = config.data.rollout_batch_size * config.worker.rollout.n
        for role, gbs in (("actor", config.worker.actor.global_batch_size),
                          ("critic", config.worker.critic.global_batch_size)):
            if role == "critic" and algo.adv_estimator != "gae":
                continue
            if rollout_bs % min(gbs, rollout_bs) != 0:
                # _iter_minibatches yields full mini-batches only; a
                # non-dividing global_batch_size would silently drop the tail
                # samples every step (reference validates the same at
                # ray_trainer.py:238-263)
                raise ValueError(
                    f"rollout_batch_size * n = {rollout_bs} must be divisible by "
                    f"worker.{role}.global_batch_size = {gbs}"
                )
        self.use_kl_in_reward = not algo.disable_kl and not algo.use_kl_loss
        self.use_kl_loss = not algo.disable_kl and algo.use_kl_loss
        self.use_ref = not algo.disable_kl
        self.kl_ctrl = get_kl_controller(algo.kl_type, algo.kl_coef, algo.kl_target, algo.kl_horizon)

        sh = config.worker.actor.sharding
        hkv = model_cfg.text.num_key_value_heads
        _ring_sp = (
            config.worker.actor.sequence_parallel_backend == "ring"
            and config.worker.actor.ulysses_sequence_parallel_size == sh.model_size
        )
        if sh.model_size > 1 and hkv % sh.model_size and not _ring_sp:
            # with ring SP the model axis carries sequence shards; attention
            # params auto-replicate over it (sharding._degrade_spec) and the
            # head cap doesn't apply
            raise ValueError(
                f"sharding.model_size={sh.model_size} must divide the model's "
                f"num_key_value_heads={hkv}: the fused qkv_proj is tensor-parallel "
                "over KV-head groups (use fsdp_size for further sharding, or "
                "sequence_parallel_backend=ring to ride the model axis with "
                "sequence shards instead)"
            )
        self.mesh = mesh if mesh is not None else create_mesh(sh.data_size, sh.fsdp_size, sh.model_size)
        # multi-host: every process runs this same trainer on its row-slice of
        # each global batch; device arrays are assembled from process-local
        # data and host-side results sliced back (parallel/multihost.py). The
        # reference covers this role with Ray actors + NCCL rendezvous
        # (/root/reference/verl/single_controller/ray/base.py:211-405).
        self.n_proc = jax.process_count()
        if self.n_proc > 1:
            # continuous AND paged rollout are multi-host capable: both
            # engines allgather the prompt queue at entry and every process
            # runs the identical lockstep schedule (rollout/continuous.py,
            # rollout/paged.py, multihost mode); the paged pool budget is
            # additionally negotiated (allgather-min, _paged_pool_size).
            if config.data.rollout_batch_size % self.n_proc:
                raise ValueError(
                    f"data.rollout_batch_size={config.data.rollout_batch_size} must be "
                    f"divisible by the {self.n_proc} processes"
                )
        self.params = shard_params(self.mesh, params)

        # Ulysses sequence parallelism over the model axis: training forwards
        # hold sequence-sharded activations and all-to-all heads<->sequence
        # around attention (reference chain: fsdp_workers.py:113-125 ->
        # flash_attention_utils.py:98-148). Decode is untouched (cache path).
        sp_size = config.worker.actor.ulysses_sequence_parallel_size
        self.sp = None
        if sp_size > 1:
            from ..ops.ulysses import UlyssesSpec
            from ..parallel.mesh import BATCH_AXES, MODEL_AXIS

            if sp_size != sh.model_size:
                raise ValueError(
                    f"ulysses_sequence_parallel_size={sp_size} must equal "
                    f"sharding.model_size={sh.model_size} (sp rides the model axis)"
                )
            backend = config.worker.actor.sequence_parallel_backend
            hkv = model_cfg.text.num_key_value_heads
            if backend == "ulysses" and hkv % sp_size:
                raise ValueError(
                    f"kv heads ({hkv}) must be divisible by sp={sp_size} for "
                    "the ulysses backend — sequence_parallel_backend=ring "
                    "rotates KV instead and has no head cap"
                )
            seq = config.data.max_prompt_length + config.data.max_response_length
            if seq % sp_size:
                raise ValueError(f"sequence length {seq} must be divisible by sp={sp_size}")
            self.sp = UlyssesSpec(self.mesh, MODEL_AXIS, BATCH_AXES, backend=backend)
        # reference policy = frozen copy of the initial weights (a REAL copy:
        # actor params are donated/overwritten in-place by the update step).
        # ref.offload keeps that copy on the HOST (at 7B the permanent HBM
        # copy is the difference between fitting and OOM) and re-shards it
        # onto the mesh per ref-logprob stage.
        self.ref_offload = config.worker.ref.offload
        self.ref_params = None
        if self.use_ref:
            if self.ref_offload:
                from ..parallel.offload import offload_to_host

                # per-process addressable-shard copies: works multi-host,
                # where jax.device_get on the global array would raise
                self.ref_params = offload_to_host(self.params)
            else:
                self.ref_params = jax.tree.map(lambda x: jnp.copy(x), self.params)

        actor = config.worker.actor
        opt_cfg = actor.optim
        self.stream_opt = opt_cfg.stream
        update_kwargs = dict(
            clip_ratio_low=actor.clip_ratio_low,
            clip_ratio_high=actor.clip_ratio_high,
            clip_ratio_dual=actor.clip_ratio_dual,
            use_kl_loss=self.use_kl_loss,
            kl_loss_coef=actor.kl_loss_coef,
            kl_penalty=actor.kl_penalty,
            entropy_coeff=actor.entropy_coeff,
            max_grad_norm=actor.max_grad_norm,
            remat=actor.sharding.remat_policy if actor.sharding.remat else False,
            temperature=config.worker.rollout.temperature,
            sp=self.sp,
            # "" = auto: bf16 accumulation under optim.stream (fp32 grads are
            # ~11.2 GB at the 3B scale streaming exists for — over the chip
            # next to bf16 params), fp32 otherwise
            grad_accum_dtype=jnp.dtype(
                opt_cfg.grad_accum_dtype
                or ("bfloat16" if opt_cfg.stream else "float32")
            ),
        )
        if self.stream_opt:
            # host-streamed AnyPrecisionAdamW (trainer/streamed_opt.py): the
            # single-chip 3B fit — moments host-resident, applied in
            # layer-slice round trips. The grad program jits alone; the apply
            # runs in the host loop, so grads must come back anyway.
            if self.mesh.devices.size > 1 or self.n_proc > 1:
                raise ValueError(
                    "worker.actor.optim.stream is the SINGLE-DEVICE 3B fit "
                    "(host-resident moments, layer-slice round trips); this "
                    f"mesh has {self.mesh.devices.size} devices — FSDP over "
                    ">=2 chips fits 3B outright, drop optim.stream (or set "
                    "sharding sizes to 1x1x1 on one device)"
                )
            from .streamed_opt import StreamedAdamW

            if opt_cfg.strategy == "adamw":
                # the streamed optimizer IS AnyPrecisionAdamW with bf16
                # moments (host-resident fp32 moments would double the
                # round-trip traffic for no fit gain) — say so instead of
                # silently changing the numerics the strategy knob asked for
                import logging

                logging.getLogger(__name__).warning(
                    "optim.stream=true always uses bf16-moment "
                    "AnyPrecisionAdamW; optim.strategy='adamw' (fp32 "
                    "moments) is ignored — set strategy='adamw_bf16' to "
                    "silence this"
                )
            warmup = int(opt_cfg.lr_warmup_ratio * max(opt_cfg.training_steps, 0))
            if warmup > 0:
                import optax

                schedule = optax.join_schedules(
                    [optax.linear_schedule(0.0, opt_cfg.lr, warmup),
                     optax.constant_schedule(opt_cfg.lr)],
                    [warmup],
                )
            else:
                schedule = opt_cfg.lr
            self.optimizer = StreamedAdamW(
                schedule,
                b1=opt_cfg.betas[0], b2=opt_cfg.betas[1],
                weight_decay=opt_cfg.weight_decay,
                use_kahan_summation=opt_cfg.use_kahan_summation,
            )
            self._freeze_vision = (
                actor.model.freeze_vision_tower and "vision" in self.params
            )
            # frozen tower: no moments allocated, no decay applied — the
            # subtree never enters the streamed apply at all
            self.opt_state = self.optimizer.init(
                self._stream_trainable(self.params)
            )
            self.offload_opt = False  # state is host-resident by construction
            grad_jit = jax.jit(make_grad_fn(
                model_cfg,
                freeze_vision_tower=actor.model.freeze_vision_tower,
                **update_kwargs,
            ))

            def streamed_update(params, opt_state, micro_batches, vision=None):
                grads, metrics, finite, factor = grad_jit(
                    params, micro_batches, vision
                )
                new_train, opt_state = self.optimizer.apply(
                    self._stream_trainable(params),
                    self._stream_trainable(grads),
                    opt_state, finite=finite, grad_scale=factor,
                )
                if self._freeze_vision:
                    new_train = {**new_train, "vision": params["vision"]}
                return new_train, opt_state, metrics

            self.update_fn = streamed_update
        else:
            self.optimizer = make_optimizer(
                opt_cfg.lr,
                weight_decay=opt_cfg.weight_decay,
                betas=tuple(opt_cfg.betas),
                warmup_steps=int(opt_cfg.lr_warmup_ratio * max(opt_cfg.training_steps, 0)),
                strategy=opt_cfg.strategy,
                use_kahan_summation=opt_cfg.use_kahan_summation,
            )
            # jitted init: moment leaves propagate the params' mesh shardings
            # (eager init leaves everything uncommitted on one device, which
            # breaks after an offload round-trip pins them there)
            self.opt_state = jax.jit(self.optimizer.init)(self.params)
            self.opt_state = self._replicate_stragglers(self.opt_state)
            # optimizer-state host offload (reference host_offload_optimizer,
            # fsdp_workers.py:252-280): the state lives on the host except inside
            # the update stage, so rollout/logprob stages see its HBM freed —
            # trades two PCIe round-trips per step for a full optimizer footprint
            self.offload_opt = actor.sharding.host_offload_optimizer
            if self.offload_opt:
                from ..parallel.offload import offload_to_host

                self.opt_state = offload_to_host(self.opt_state)

            self.update_fn = jax.jit(
                make_update_fn(
                    model_cfg,
                    self.optimizer,
                    freeze_vision_tower=actor.model.freeze_vision_tower,
                    **update_kwargs,
                ),
                donate_argnums=(0, 1),  # in-place params/opt update
            )
        rollout_temp = config.worker.rollout.temperature
        self.logprob_fn = jax.jit(
            lambda p, b, v: compute_log_probs(
                p, model_cfg, b, v, remat=False, temperature=rollout_temp, sp=self.sp
            )[0],
        )

        # padding-free (packed) path — used for text-only batches when enabled
        self.padding_free = actor.padding_free
        if self.padding_free:
            from .train_step import (
                compute_packed_log_probs, make_packed_grad_fn, make_packed_update_fn,
            )

            if self.stream_opt:
                packed_grad_jit = jax.jit(
                    make_packed_grad_fn(model_cfg, **update_kwargs)
                )

                def packed_streamed_update(params, opt_state, mb, vision=None):
                    grads, metrics, finite, factor = packed_grad_jit(
                        params, mb, vision
                    )
                    new_train, opt_state = self.optimizer.apply(
                        self._stream_trainable(params),
                        self._stream_trainable(grads),
                        opt_state, finite=finite, grad_scale=factor,
                    )
                    if self._freeze_vision:
                        new_train = {**new_train, "vision": params["vision"]}
                    return new_train, opt_state, metrics

                self.packed_update_fn = packed_streamed_update
            else:
                self.packed_update_fn = jax.jit(
                    make_packed_update_fn(
                        model_cfg, self.optimizer, **update_kwargs
                    ),
                    donate_argnums=(0, 1),
                )
            self.packed_logprob_fn = jax.jit(
                lambda p, b, v: compute_packed_log_probs(
                    p, model_cfg, b, v, remat=False, temperature=rollout_temp, sp=self.sp
                )[0]
            )

        # ---- critic (GAE only) -------------------------------------------
        self.use_critic = self.adv_estimator == "gae"
        if self.use_critic:
            from .critic import compute_values, init_critic_params, make_critic_update_fn

            critic_cfg = config.worker.critic
            # critic.model selects the critic's OWN architecture/weights
            # (reference: the critic worker builds from critic.model config);
            # defaults to sharing the actor's model config
            self.critic_model_cfg = model_cfg
            critic_base = None
            cm = critic_cfg.model
            if cm.model_path and cm.model_path != config.worker.actor.model.model_path:
                from ..models.qwen2_5_vl import get_config as get_model_config
                from ..models.qwen2_5_vl import init_params as init_model_params

                cdtype = getattr(jnp, cm.param_dtype)
                if os.path.isdir(cm.model_path) and any(
                    f.endswith(".safetensors") for f in os.listdir(cm.model_path)
                ):
                    from ..models.qwen2_5_vl.params import load_params

                    self.critic_model_cfg, critic_base = load_params(cm.model_path, dtype=cdtype)
                else:
                    self.critic_model_cfg = get_model_config(cm.model_path)
                    critic_base = init_model_params(
                        self.critic_model_cfg, jax.random.key(config.trainer.seed + 1),
                        dtype=cdtype,
                    )
                if self.critic_model_cfg.vision != model_cfg.vision:
                    raise ValueError(
                        f"critic.model.model_path={cm.model_path!r} has a different "
                        "vision tower than the actor: vision packs are prepared once "
                        "per batch with the actor's layout — pick a critic from the "
                        "same vision family"
                    )
            self.critic_params = shard_params(
                self.mesh,
                init_critic_params(
                    self.critic_model_cfg, jax.random.key(config.trainer.seed + 1),
                    base_params=critic_base,
                ),
            )
            self.critic_optimizer = make_optimizer(
                critic_cfg.optim.lr,
                weight_decay=critic_cfg.optim.weight_decay,
                strategy=critic_cfg.optim.strategy,
            )
            self.critic_opt_state = self._replicate_stragglers(
                jax.jit(self.critic_optimizer.init)(self.critic_params)
            )
            cmc = self.critic_model_cfg
            self.critic_update_fn = jax.jit(
                make_critic_update_fn(
                    cmc, self.critic_optimizer,
                    cliprange_value=critic_cfg.cliprange_value,
                    max_grad_norm=critic_cfg.max_grad_norm,
                    remat=critic_cfg.sharding.remat_policy if critic_cfg.sharding.remat else False,
                ),
                donate_argnums=(0, 1),
            )
            self.values_fn = jax.jit(
                lambda p, b, v: compute_values(p, cmc, b, v, remat=False)
            )
        self.generate_fn = jax.jit(
            generate,
            static_argnames=(
                "cfg", "max_new_tokens", "sampling", "kv_cache_dtype",
                "prefill_chunk", "prefill_rows", "n", "int4_i8dot",
            ),
        )
        # rollout W8A8 quantization (vLLM `quantization` parity): re-quantize
        # the decoder-stack matmul weights each rollout phase (the optimizer
        # just rewrote them); one stack read, negligible next to a prefill
        self.quantize_fn = None
        if config.worker.rollout.quantization in ("int8", "w4a8"):
            import functools

            from ..ops.quant import quantize_params

            self.quantize_fn = jax.jit(functools.partial(
                quantize_params, mode=config.worker.rollout.quantization
            ))

        self.sampling = SamplingParams(
            temperature=config.worker.rollout.temperature,
            top_p=config.worker.rollout.top_p,
            top_k=config.worker.rollout.top_k,
            n=config.worker.rollout.n,
        )
        vo = config.worker.rollout.val_override_config
        self.val_sampling = self.sampling.override(
            temperature=vo.temperature, top_p=vo.top_p, top_k=vo.top_k, n=vo.n
        )

        self.tracker = Tracker(
            config.trainer.logger, config.trainer.project_name, config.trainer.experiment_name,
            base_dir=config.trainer.save_checkpoint_path or ".",
        )
        self.ckpt = CheckpointManager(
            config.trainer.save_checkpoint_path, save_limit=config.trainer.save_limit
        )
        self.global_step = 0
        self.rng_key = jax.random.key(config.trainer.seed)
        self.flops_counter = FlopsCounter(model_cfg)
        self._last_rollout_stats: Dict[str, float] = {}

    # ------------------------------------------------------------------ utils

    def _next_key(self):
        self.rng_key, sub = jax.random.split(self.rng_key)
        return sub

    def _paged_pool_size(self, page_size: int, kv_dtype) -> int:
        """KV page-pool size from the chip's free HBM x gpu_memory_utilization
        (vLLM sizes its cache the same way, vllm_rollout_spmd.py:69-85). When
        the backend exposes no memory stats (CPU tests), returns 0 — the
        engine falls back to worst-case sizing.

        Computed ONCE and cached: live memory_stats() drift a few MB step to
        step (optimizer state, trim buckets, async allocations), and a
        changed pool size changes the (L, N, ...) pool shapes — recompiling
        prefill + the decode scan every train step (minutes through the
        remote-compile relay). vLLM likewise profiles once at engine build."""
        override = self.config.worker.rollout.kv_pages_override
        if override > 0:  # vLLM num_gpu_blocks_override parity
            return override
        cached = getattr(self, "_paged_pool_cache", None)
        if cached is not None:
            return cached
        total = self._paged_pool_size_uncached(page_size, kv_dtype)
        if self.n_proc > 1:
            # every process must build the same pool shape: take the MIN of
            # the per-process free-HBM estimates (processes differ by resident
            # buffers, never by much)
            from ..parallel.multihost import allgather_pyobj

            total = min(allgather_pyobj(total))
        self._paged_pool_cache = total
        return total

    def _paged_pool_size_uncached(self, page_size: int, kv_dtype) -> int:
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            stats = {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use")
        estimated_derate = 1.0
        if not limit:
            if jax.default_backend() != "tpu":
                return 0  # CPU tests: worst-case sizing
            # some PJRT relays expose no memory_stats: estimate from the
            # known chip budget minus the trees this trainer keeps live
            # through the rollout stage (training params, the W8A8 rollout
            # copy, on-device optimizer/ref/critic state) plus allocator
            # slack — the worst-case fallback blocked long-context paged
            # rollouts without a manual kv_pages_override
            def tree_bytes(tree):
                return sum(
                    x.nbytes for x in jax.tree.leaves(tree)
                    if isinstance(x, jax.Array)
                )

            # per-device budget, like the stats path (the pool shards over
            # the mesh; a per-device estimate is conservative on pod slices
            # exactly as memory_stats() is)
            limit = int(os.environ.get(
                "SPATIALTHINKER_HBM_BYTES", str(int(15.75 * 2**30))
            ))
            live = tree_bytes(self.params)
            if self.quantize_fn is not None:
                # int8 stacks + scales of the decoder tree: ~55% of bf16
                live += int(0.55 * tree_bytes(self.params))
            if not self.offload_opt and not self.stream_opt:
                live += tree_bytes(self.opt_state)
            live += tree_bytes(getattr(self, "critic_params", None) or {})
            if self.ref_params is not None:
                live += tree_bytes(self.ref_params)  # 0 when host-offloaded
            in_use = live + (512 << 20)
            # XLA cannot alias every donated buffer: the compile-time peak
            # transiently holds part of the pool twice (a raw-budget pool
            # measured 19.06G of 15.75G on chip) — derate the ESTIMATED
            # budget so pool + its worst transient copy fits
            estimated_derate = 0.6
        t = self.model_cfg.text
        elem = {jnp.dtype(jnp.int8): 1.0, jnp.dtype(jnp.uint8): 0.5}.get(
            jnp.dtype(kv_dtype), 2.0
        )  # uint8 = packed int4 (half a byte per value)
        cell = int(2 * t.num_hidden_layers * t.num_key_value_heads * t.head_dim * elem)
        if elem < 2:  # bf16 scales per (k, v) token-head in both int modes
            cell += 2 * t.num_hidden_layers * t.num_key_value_heads * 2
        roll = self.config.worker.rollout
        # leave room for the refill-prefill program's transients (scratch
        # prompt KV + rows-in-flight activations): a pool sized to the raw
        # budget makes the prefill jit fail to COMPILE (rollout/paged.py
        # prefill_transient_bytes)
        from ..rollout.paged import prefill_transient_bytes

        slots = roll.decode_batch_size or 32
        u = max(slots // max(roll.n, 1), 1)
        if roll.refill_batch > 0:
            u = min(u, roll.refill_batch)
        transient = prefill_transient_bytes(
            self.model_cfg, self.config.data.max_prompt_length, u,
            roll.prefill_rows, cell,
        )
        free = (int(limit * roll.gpu_memory_utilization)
                - int(in_use or 0) - transient)
        free = int(free * estimated_derate)
        return max(free // (cell * page_size), 0)

    def _replicate_stragglers(self, tree):
        """Pin any leaf XLA left on a subset of the mesh (e.g. the optimizer
        `count` scalar) to a replicated mesh sharding: offload/restore commits
        shardings, and a committed single-device leaf can't meet the
        mesh-sharded params inside one jit."""
        full = set(self.mesh.devices.flat)

        def fix(x):
            if isinstance(x, jax.Array) and set(x.sharding.device_set) != full:
                spec = P(*([None] * x.ndim))
                return jax.device_put(x, jax.sharding.NamedSharding(self.mesh, spec))
            return x

        return jax.tree.map(fix, tree)

    def _rollout_key(self, tag: int, index: int = 0):
        """Deterministic rollout sampling stream (vLLM SamplingParams.seed
        parity, reference rollout/config.py seed): keyed by
        (rollout.seed, global_step, stage tag, batch index) — stateless, so
        resume reproduces the same rollouts without checkpointing a second
        PRNG stream. Tags: 0 train rollout, 1 remax baseline, 2 validation."""
        base = jax.random.key(self.config.worker.rollout.seed)
        k = jax.random.fold_in(base, self.global_step)
        k = jax.random.fold_in(k, tag)
        return jax.random.fold_in(k, index)

    def _dev(self, x, batch_axis: int = 0):
        """Host-local numpy -> device array; multi-host: a GLOBAL array whose
        rows on axis ``batch_axis`` are this process's slice."""
        if self.n_proc == 1:
            return jnp.asarray(x)
        from ..parallel.mesh import BATCH_AXES
        from ..parallel.multihost import global_batch_array

        spec = P(*([None] * batch_axis + [BATCH_AXES]))
        return global_batch_array(np.asarray(x), self.mesh, spec)

    def _host(self, arr, batch_axis: int = 0) -> np.ndarray:
        """Device array -> this process's numpy row-slice (single-host: all).
        Host numpy (e.g. the continuous engine's already-local rows) passes
        through unchanged."""
        if self.n_proc == 1 or not isinstance(arr, jax.Array):
            return np.asarray(arr)
        from ..parallel.mesh import BATCH_AXES
        from ..parallel.multihost import host_local_rows

        spec = P(*([None] * batch_axis + [BATCH_AXES]))
        return host_local_rows(arr, self.mesh, spec)

    def _dev_micro(self, tb: TrainBatch) -> TrainBatch:
        """Micro-shaped TrainBatch to device (batch axis 1; position_ids 2)."""
        if self.n_proc == 1:
            return jax.tree.map(jnp.asarray, tb)
        return TrainBatch(**{
            name: self._dev(x, batch_axis=2 if name == "position_ids" else 1)
            for name, x in tb._asdict().items()
        })

    def _gather_rows(self, v) -> np.ndarray:
        """Per-host scalar rows -> global rows (logging means match the
        reference's global reductions); single-host: identity."""
        v = np.asarray(v, dtype=np.float64)
        if self.n_proc == 1:
            return v
        from ..parallel.multihost import allgather_host_data

        return allgather_host_data(v)

    def _local_row_divisor(self) -> int:
        """Per-process row counts must make the GLOBAL row count divide the
        batch-sharded device axes."""
        sh = self.config.worker.actor.sharding
        return max(1, sh.data_size * sh.fsdp_size // self.n_proc)

    def _negotiated_max(self, local_max: int) -> int:
        """Agree on a max length across processes (jit shapes must match)."""
        if self.n_proc == 1:
            return local_max
        from ..parallel.multihost import allgather_host_data

        return int(allgather_host_data(np.asarray([local_max], np.int64)).max())

    # shared with the eval harness (core/batch.py) — kept as staticmethods for
    # the established call sites
    trim_prompt_padding = staticmethod(trim_prompt_padding)
    trim_response_padding = staticmethod(trim_response_padding)

    def _pack_vision(self, batch: RolloutBatch):
        vision = pack_vision_batch(
            list(batch.non_tensors["patches"]),
            list(batch.non_tensors["image_grid_thw"]),
            self.model_cfg.vision,
        )
        if self.n_proc == 1:
            return vision
        pad_to = self._vision_pad_to([0 if vision is None else vision.patches.shape[0]])
        if pad_to is None:
            return None  # consistent: no host has images
        if vision is not None and vision.patches.shape[0] != pad_to:
            vision = pack_vision_batch(
                list(batch.non_tensors["patches"]),
                list(batch.non_tensors["image_grid_thw"]),
                self.model_cfg.vision, pad_to=pad_to,
            )
        adjusted = self._globalize_vision_np(vision, batch.tensors["input_ids"], pad_to)
        return type(adjusted)(**{
            name: None if x is None else self._dev(x)
            for name, x in adjusted._asdict().items()
        })

    def _vision_pad_to(self, local_sizes) -> Optional[int]:
        """Negotiate the per-process vision-pack width: whole windows,
        divisible for device sharding, identical on every process."""
        import math

        from ..models.qwen2_5_vl.vision import window_patch_len
        from ..parallel.multihost import allgather_host_data

        vcfg = self.model_cfg.vision
        local_max = max(local_sizes) if local_sizes else 0
        sizes = allgather_host_data(np.asarray([local_max], np.int64))
        if sizes.max() == 0:
            return None
        align = math.lcm(
            window_patch_len(vcfg), vcfg.spatial_merge_unit * self._local_row_divisor()
        )
        return int(-(-sizes.max() // align) * align)

    def _globalize_vision_np(self, vision, input_ids: np.ndarray, pad_to: int):
        """Adjust a per-host vision pack (numpy, already ``pad_to`` wide or
        None) to its slice of one GLOBAL pack of per-process width ``pad_to``:
        segment ids and layout indices offset into the host's slice, plus each
        row's start into the global merged embeds (per-host padding breaks the
        batch-wide running count the single-host merge uses). ``input_ids``
        are the rows the forward will see — per-sample OR packed layout (the
        image-token order of the pack must match the rows' row-major order)."""
        from ..data.packing import empty_vision_pack, patch_dim
        from ..models.qwen2_5_vl.model import VisionInputs

        vcfg = self.model_cfg.vision
        unit = vcfg.spatial_merge_unit
        if vision is None:
            vision = empty_vision_pack(vcfg, pad_to, patch_dim(vcfg))
        assert vision.patches.shape[0] == pad_to, (vision.patches.shape, pad_to)
        h = jax.process_index()
        seg_off = h * (pad_to + 1)  # ids unique across host slices; 0 stays 0
        merged_base = h * (pad_to // unit)
        counts = (np.asarray(input_ids) == self.model_cfg.image_token_id).sum(1)
        row_start = merged_base + np.concatenate(
            [[0], np.cumsum(counts)[:-1]]
        ).astype(np.int32)
        return VisionInputs(
            patches=vision.patches,
            pos_ids=vision.pos_ids,
            seg_full=np.where(vision.seg_full > 0, vision.seg_full + seg_off, 0).astype(np.int32),
            seg_window=np.where(vision.seg_window > 0, vision.seg_window + seg_off, 0).astype(np.int32),
            reverse_index=(vision.reverse_index + merged_base).astype(np.int32),
            index_offset=row_start,
        )

    # ------------------------------------------------------------- generation

    def generate_sequences(self, batch: RolloutBatch, sampling: SamplingParams,
                           key=None) -> RolloutBatch:
        """Decode n samples per prompt, attach responses + masks + full seqs.
        The dense engine prefills each UNIQUE prompt once and fans the prompt
        KV out to n decode lanes (engine.generate n>1); host-side tensors are
        repeated to match the [prompt0 x n, ...] row order."""
        n = sampling.n
        key = key if key is not None else self._rollout_key(0)
        self._last_rollout_stats = {}  # per-rollout telemetry, never stale
        gen_params = self.params
        if self.quantize_fn is not None:
            gen_params = self.quantize_fn(self.params)
        base = self.trim_prompt_padding(
            batch,
            negotiated_max=self._negotiated_max(
                int(batch.tensors["segment_ids"].sum(-1).max())
            ),
        )
        repeated = base.repeat(n, interleave=True) if n > 1 else base

        input_ids = repeated.tensors["input_ids"]
        segment_ids = repeated.tensors["segment_ids"]
        position_ids = np.transpose(repeated.tensors["position_ids"], (1, 0, 2))  # (3,B,P)
        gen_pos_start = repeated.tensors["gen_pos_start"]

        rollout_cfg = self.config.worker.rollout
        kv_dtype = {"int8": jnp.int8, "int4": jnp.uint8}.get(
            rollout_cfg.kv_cache_dtype, jnp.bfloat16
        )  # uint8 = the packed-int4 marker dtype (models/.../text.KVCache)
        if rollout_cfg.name == "continuous":
            slots = rollout_cfg.decode_batch_size
            args = (
                gen_params, self.model_cfg,
                base.tensors["input_ids"], base.tensors["segment_ids"],
                np.transpose(base.tensors["position_ids"], (1, 0, 2)),
                base.tensors["gen_pos_start"],
            )
            common = dict(
                max_new_tokens=rollout_cfg.response_length,
                sampling=sampling.override(n=1),
                key=key,
                # slot count is GLOBAL (the engine schedules the global queue)
                slots=slots if slots > 0 else min(len(repeated) * self.n_proc, 32),
                patches_list=list(base.non_tensors["patches"]),
                grids_list=list(base.non_tensors["image_grid_thw"]),
                kv_cache_dtype=kv_dtype,
                prefill_chunk_size=rollout_cfg.prefill_chunk_size,
                max_num_batched_tokens=rollout_cfg.max_num_batched_tokens,
                prefill_rows=rollout_cfg.prefill_rows,
                refill_batch=rollout_cfg.refill_batch,
                group_n=n,
                int4_i8dot=rollout_cfg.int4_i8dot,
            )
            if rollout_cfg.page_size > 0:
                # paged KV: pool sized from free HBM x gpu_memory_utilization
                # (vLLM parity); slots only OCCUPY the pages they fill, so
                # long-context admission follows actual memory use and the
                # youngest group preempts (recompute) on pool pressure
                from ..rollout.paged import generate_paged

                result = generate_paged(
                    *args, **common,
                    page_size=rollout_cfg.page_size,
                    total_pages=self._paged_pool_size(rollout_cfg.page_size, kv_dtype),
                    mesh=self.mesh,
                )
                self._last_rollout_stats = {
                    f"rollout/kv_{k}": float(v) for k, v in result.stats.items()
                }
            else:
                from ..rollout.continuous import generate_continuous

                result = generate_continuous(*args, **common, mesh=self.mesh)
            if self.n_proc > 1:
                # both multihost engines return the FULL global output on
                # every process; keep this process's rows (rank-major
                # global order matches the loader's row ownership)
                from ..parallel.multihost import process_local_slice

                s, e = process_local_slice(len(result.responses))
                result = result._replace(
                    responses=result.responses[s:e],
                    response_mask=result.response_mask[s:e],
                    rollout_log_probs=result.rollout_log_probs[s:e],
                )
        else:
            # grouped sampling needs the UNIQUE-prompt batch to divide the
            # batch-sharded device count; fall back to per-sample prefill when
            # it doesn't (tiny batches / large meshes)
            sh = self.config.worker.actor.sharding
            batch_devs = max(1, sh.data_size * sh.fsdp_size)
            grouped = n > 1 and (len(base) * self.n_proc) % batch_devs == 0
            if n > 1 and not grouped:
                # per-sample prefill pays n x the prompt forward the grouped
                # path exists to avoid — surface it so a misconfigured run
                # (unique-prompt batch not dividing the batch devices) is
                # visible in the step metrics, not silent
                import logging

                logging.getLogger(__name__).warning(
                    "grouped prefill fell back to per-sample prefill: "
                    "unique prompts (%d) %% batch devices (%d) != 0 — paying "
                    "%dx prompt FLOPs", len(base) * self.n_proc, batch_devs, n,
                )
                self._last_rollout_stats["rollout/grouped_fallback"] = 1.0
            eng = base if grouped else repeated
            eng_b = len(eng) * self.n_proc
            rows = rollout_cfg.prefill_rows
            if not (0 < rows < eng_b):
                rows = 0  # inert (rows >= batch): keep the sequence-chunk bound
            vision = self._pack_vision(eng)  # multi-host: globalized pack
            eng_pos = np.transpose(eng.tensors["position_ids"], (1, 0, 2))
            result = self.generate_fn(
                gen_params,
                self.model_cfg,
                self._dev(eng.tensors["input_ids"]),
                self._dev(eng.tensors["segment_ids"]),
                self._dev(eng_pos, batch_axis=1),
                self._dev(eng.tensors["gen_pos_start"]),
                max_new_tokens=rollout_cfg.response_length,
                sampling=sampling.override(n=1),
                key=key,
                vision=vision,
                kv_cache_dtype=kv_dtype,
                # rows mode composes with sequence chunking (the token budget
                # binds WITHIN a row group), so the chunk is computed against
                # the rows actually in flight — rows that already satisfy the
                # budget get 0 (full-length, unchunked MFU), and an inert
                # prefill_rows >= batch falls back to the whole-batch bound
                prefill_chunk=effective_prefill_chunk(
                    input_ids.shape[1], rows if rows else eng_b,
                    rollout_cfg.prefill_chunk_size, rollout_cfg.max_num_batched_tokens,
                ),
                prefill_rows=rows,
                n=n if grouped else 1,
                int4_i8dot=rollout_cfg.int4_i8dot,
            )
        responses = self._host(result.responses)
        response_mask = self._host(result.response_mask)

        out = RolloutBatch(
            tensors={
                **{k: v for k, v in repeated.tensors.items()},
                "responses": responses,
                "response_mask": response_mask,
                "rollout_log_probs": self._host(result.rollout_log_probs),
                "full_input_ids": np.concatenate([input_ids, responses], axis=1),
                "full_segment_ids": np.concatenate([segment_ids, response_mask], axis=1),
            },
            non_tensors=repeated.non_tensors,
            meta=repeated.meta,
        )
        return out

    # -------------------------------------------------------------- log probs

    def _train_batch_views_np(self, batch: RolloutBatch) -> TrainBatch:
        """Assemble the host-side TrainBatch (full positions incl. generated)."""
        b, p = batch.tensors["input_ids"].shape
        r = batch.tensors["responses"].shape[1]
        pos_prompt = np.transpose(batch.tensors["position_ids"], (1, 0, 2))  # (3, B, P)
        steps = np.arange(r, dtype=np.int64)[None, :]
        gen_pos = batch.tensors["gen_pos_start"][:, None] + steps  # (B, R)
        pos_resp = np.broadcast_to(gen_pos[None], (3, b, r))
        full_pos = np.concatenate([pos_prompt, pos_resp], axis=2)

        zeros = np.zeros_like(batch.tensors["responses"], dtype=np.float32)
        return TrainBatch(
            input_ids=batch.tensors["full_input_ids"],
            segment_ids=batch.tensors["full_segment_ids"],
            position_ids=full_pos,
            responses=batch.tensors["responses"],
            response_mask=batch.tensors["response_mask"].astype(np.float32),
            old_log_probs=batch.tensors.get("old_log_probs", zeros),
            ref_log_probs=batch.tensors.get("ref_log_probs", zeros),
            advantages=batch.tensors.get("advantages", zeros),
        )

    def _train_batch_views(self, batch: RolloutBatch) -> TrainBatch:
        """Device TrainBatch (multi-host: global arrays from local rows)."""
        tb = self._train_batch_views_np(batch)
        return TrainBatch(**{
            name: self._dev(x, batch_axis=1 if name == "position_ids" else 0)
            for name, x in tb._asdict().items()
        })

    def _vision_for_packed(self, batch: RolloutBatch, slot_map, row_lo=None, row_hi=None,
                           pad_to=None):
        """Vision pack whose image order matches the packed rows' row-major
        image-token order (sample order sorted by (row, offset))."""
        order = sorted(
            range(len(batch)),
            key=lambda i: (int(slot_map.row[i]), int(slot_map.dst_start[i])),
        )
        if row_lo is not None:
            order = [i for i in order if row_lo <= int(slot_map.row[i]) < row_hi]
        patches = [batch.non_tensors["patches"][i] for i in order]
        grids = [batch.non_tensors["image_grid_thw"][i] for i in order]
        return pack_vision_batch(patches, grids, self.model_cfg.vision, pad_to=pad_to)

    def _pack_rows(self, batch: RolloutBatch, per_token=None):
        from ..data.text_packing import pack_train_rows

        seg = batch.tensors["segment_ids"]
        mask = batch.tensors["response_mask"]
        totals = seg.sum(-1) + mask.sum(-1)
        max_total = int(totals.max())
        mean_total = float(totals.mean())
        # rows must fit the longest sample; make them big enough to hold ~2
        # average samples so FFD can actually pack (row == max gives 1/row)
        target = max(max_total, int(2 * mean_total))
        # jit shapes must agree across processes
        row_len = self._negotiated_max(max(256, ((target + 255) // 256) * 256))
        return pack_train_rows(
            batch.tensors["input_ids"], seg,
            batch.tensors["position_ids"],
            batch.tensors["responses"], mask,
            batch.tensors["gen_pos_start"],
            per_token=per_token, row_len=row_len,
        )

    def compute_log_probs_batched(self, batch: RolloutBatch, params) -> np.ndarray:
        """Micro-batched old/ref log-prob recompute (no grad). Text-only
        batches take the packed (padding-free) path. Both paths split the
        rollout batch into experience-sized chunks first — the per-chunk
        logit buffers (rows x chunk x vocab fp32 inside the logprob scan) are
        what bound HBM, so packing the whole rollout into one forward would
        OOM at flagship shapes."""
        from .train_step import PackedTrainBatch

        micro = self.config.worker.actor.micro_batch_size_per_device_for_experience
        n_dev = self.mesh.devices.size
        chunk = max(micro * max(n_dev // self.config.worker.actor.sharding.model_size, 1), 1)
        chunk = max(chunk // self.n_proc, 1)  # global token budget -> local rows

        if self._use_packed(batch):
            from ..data.text_packing import gather_response_values, pad_rows_to_count

            r = batch.tensors["responses"].shape[1]
            outs = []
            for piece in batch.split(chunk):
                packed, slot_map = self._pack_rows(piece)
                # multi-host: common row count across processes (jit shapes),
                # rounded so the global rows divide the batch-sharded devices
                div = self._local_row_divisor()
                target = self._negotiated_max(packed.input_ids.shape[0])
                packed = pad_rows_to_count(packed, target + (-target) % div)
                vision = self._vision_for_packed(piece, slot_map)
                if self.n_proc > 1:
                    # slot-ordered pack, globally negotiated width + offsets
                    # computed from the PACKED rows' image-token order
                    pad_to = self._vision_pad_to(
                        [0 if vision is None else vision.patches.shape[0]]
                    )
                    if pad_to is None:
                        vision = None
                    else:
                        if vision is None or vision.patches.shape[0] != pad_to:
                            vision = self._vision_for_packed(piece, slot_map, pad_to=pad_to)
                        vision = self._globalize_vision_np(
                            vision, packed.input_ids, pad_to
                        )
                        vision = type(vision)(**{
                            name: None if x is None else self._dev(x)
                            for name, x in vision._asdict().items()
                        })
                elif vision is not None:
                    vision = jax.tree.map(jnp.asarray, vision)
                ptb = PackedTrainBatch(*[
                    self._dev(x, batch_axis=1 if np.asarray(x).ndim == 3 else 0)
                    for x in packed
                ])
                logp_rows = self._host(self.packed_logprob_fn(params, ptb, vision))
                outs.append(gather_response_values(logp_rows, slot_map, r))
            return np.concatenate(outs, axis=0)

        outs = []
        for piece in batch.split(chunk):
            tb = self._train_batch_views(piece)
            vision = self._pack_vision(piece)
            outs.append(self._host(self.logprob_fn(params, tb, vision)))
        return np.concatenate(outs, axis=0)

    # ------------------------------------------------------------- advantages

    def compute_advantages(self, batch: RolloutBatch) -> Tuple[np.ndarray, np.ndarray]:
        rewards = jnp.asarray(batch.tensors["token_level_rewards"])
        mask = jnp.asarray(batch.tensors["response_mask"].astype(np.float32))
        algo = self.config.algorithm
        if self.adv_estimator == "grpo":
            uids = batch.non_tensors["uid"]
            _, gid = np.unique(uids, return_inverse=True)
            adv, ret = compute_grpo_outcome_advantage(
                rewards, mask, jnp.asarray(gid.astype(np.int32)), int(gid.max()) + 1
            )
        elif self.adv_estimator == "rloo":
            uids = batch.non_tensors["uid"]
            _, gid = np.unique(uids, return_inverse=True)
            adv, ret = compute_rloo_outcome_advantage(
                rewards, mask, jnp.asarray(gid.astype(np.int32)), int(gid.max()) + 1
            )
        elif self.adv_estimator == "reinforce_plus_plus":
            adv, ret = compute_reinforce_plus_plus_outcome_advantage(rewards, mask, algo.gamma)
        elif self.adv_estimator == "remax":
            baselines = jnp.asarray(batch.tensors["reward_baselines"])
            adv, ret = compute_remax_outcome_advantage(rewards, baselines, mask)
        elif self.adv_estimator == "gae":
            values = jnp.asarray(batch.tensors["values"])
            adv, ret = compute_gae_advantage_return(rewards, values, mask, algo.gamma, algo.lam)
        else:
            raise NotImplementedError(f"unknown adv estimator {self.adv_estimator}")
        return np.asarray(adv), np.asarray(ret)

    # ----------------------------------------------------------------- update

    def _iter_minibatches(self, batch: RolloutBatch, mini_bs: int, ppo_epochs: int,
                          seed_mult: int):
        """Shuffled full mini-batches for ppo_epochs passes (shared by the
        actor/packed/critic update loops)."""
        bs = len(batch)
        for epoch in range(ppo_epochs):
            order = np.random.default_rng(self.global_step * seed_mult + epoch).permutation(bs)
            for start in range(0, bs - mini_bs + 1, mini_bs):
                idx = order[start : start + mini_bs]
                yield RolloutBatch(
                    tensors={k: v[idx] for k, v in batch.tensors.items()},
                    non_tensors={k: v[idx] for k, v in batch.non_tensors.items()},
                    meta=dict(batch.meta),
                )

    @staticmethod
    def _fit_n_micro(mini_bs: int, micro_global: int) -> int:
        n_micro = max(mini_bs // micro_global, 1)
        while mini_bs % n_micro:  # micro dim must divide the mini-batch
            n_micro -= 1
        return n_micro

    @staticmethod
    def _reshape_micro(x, n_micro: int):
        """Add the leading micro dim ((3,B,S) position ids keep 3 second)."""
        x = np.asarray(x)
        if x.ndim >= 2 and x.shape[0] == 3:
            return (
                x.reshape(3, n_micro, x.shape[1] // n_micro, *x.shape[2:])
                .transpose(1, 0, 2, 3)
            )
        return x.reshape(n_micro, x.shape[0] // n_micro, *x.shape[1:])

    def _micro_vision_packs(self, mini: RolloutBatch, n_micro: int):
        """One vision pack per micro-batch, common bucket, stacked for scan.
        Multi-process: every micro's pack is globalized to one negotiated
        width (the update forward must see the same global pack layout the
        log-prob forwards do)."""
        from ..data.packing import stack_vision_packs

        pieces = mini.split(len(mini) // n_micro)
        packs = [
            pack_vision_batch(
                list(p.non_tensors["patches"]),
                list(p.non_tensors["image_grid_thw"]),
                self.model_cfg.vision,
            )
            for p in pieces
        ]
        if self.n_proc > 1:
            pad_to = self._vision_pad_to(
                [0 if v is None else v.patches.shape[0] for v in packs]
            )
            if pad_to is None:
                return None
            packs = [
                pack_vision_batch(
                    list(piece.non_tensors["patches"]),
                    list(piece.non_tensors["image_grid_thw"]),
                    self.model_cfg.vision, pad_to=pad_to,
                )
                for piece in pieces
            ]
            adjusted = [
                self._globalize_vision_np(v, piece.tensors["input_ids"], pad_to)
                for v, piece in zip(packs, pieces)
            ]
            vision = stack_vision_packs(adjusted, self.model_cfg.vision)
            return type(vision)(**{
                name: None if x is None else self._dev(x, batch_axis=1)
                for name, x in vision._asdict().items()
            })
        vision = stack_vision_packs(packs, self.model_cfg.vision)
        return jax.tree.map(jnp.asarray, vision) if vision is not None else None

    def _update_actor_packed(self, batch: RolloutBatch) -> Dict[str, float]:
        """Padding-free policy update: mini-batches are bin-packed into rows."""
        from ..data.text_packing import pad_rows_to_count
        from .train_step import PackedTrainBatch

        actor_cfg = self.config.worker.actor
        metrics_acc: Dict[str, List[float]] = defaultdict(list)
        bs = len(batch)
        mini_bs = min(actor_cfg.global_batch_size, bs)
        micro_rows = max(actor_cfg.micro_batch_size_per_device_for_update, 1)

        from ..data.packing import stack_vision_packs

        for mini in self._iter_minibatches(batch, mini_bs, actor_cfg.ppo_epochs, 131):
            zeros = np.zeros_like(mini.tensors["old_log_probs"])
            packed, slot_map = self._pack_rows(
                mini,
                per_token={
                    "old_log_probs": mini.tensors["old_log_probs"],
                    "ref_log_probs": mini.tensors.get("ref_log_probs", zeros),
                    "advantages": mini.tensors["advantages"],
                },
            )
            # multi-host: FFD rows are data-dependent per process — negotiate
            # a common row count (padding rows are fully masked) so the global
            # device batch has uniform local shapes; per-micro rows round up
            # so each micro step's global rows divide the batch-sharded devices
            rows_target = self._negotiated_max(packed.input_ids.shape[0])
            n_micro = max((rows_target + micro_rows - 1) // micro_rows, 1)
            div = self._local_row_divisor()
            per = -(-rows_target // n_micro)   # rows per micro step (ceil)
            per = -(-per // div) * div         # ... rounded to the device divisor
            packed = pad_rows_to_count(packed, per * n_micro)
            rows = packed.input_ids.shape[0]

            def micro_shape(x):
                x = np.asarray(x)
                if x.ndim == 3:  # (3, rows, L)
                    return x.reshape(3, n_micro, per, x.shape[-1]).transpose(1, 0, 2, 3)
                return x.reshape(n_micro, per, *x.shape[1:])

            ptb = PackedTrainBatch(*[
                self._dev(micro_shape(x), batch_axis=2 if np.asarray(x).ndim == 3 else 1)
                for x in packed
            ])
            packs = [
                self._vision_for_packed(mini, slot_map, row_lo=g * per, row_hi=(g + 1) * per)
                for g in range(n_micro)
            ]
            if self.n_proc > 1:
                # per-micro slot-ordered packs at one negotiated width, each
                # globalized against its micro's PACKED rows (this was the
                # missing piece that forced multimodal multi-host onto the
                # per-sample layout in rounds 1-2)
                pad_to = self._vision_pad_to(
                    [0 if v is None else v.patches.shape[0] for v in packs]
                )
                if pad_to is None:
                    vision = None
                else:
                    packs = [
                        self._vision_for_packed(
                            mini, slot_map, row_lo=g * per, row_hi=(g + 1) * per,
                            pad_to=pad_to,
                        )
                        for g in range(n_micro)
                    ]
                    adjusted = [
                        self._globalize_vision_np(
                            v, packed.input_ids[g * per:(g + 1) * per], pad_to
                        )
                        for g, v in enumerate(packs)
                    ]
                    vision = stack_vision_packs(adjusted, self.model_cfg.vision)
                    vision = type(vision)(**{
                        name: None if x is None else self._dev(x, batch_axis=1)
                        for name, x in vision._asdict().items()
                    })
            else:
                vision = stack_vision_packs(packs, self.model_cfg.vision)
                if vision is not None:
                    vision = jax.tree.map(jnp.asarray, vision)
            self.params, self.opt_state, metrics = self.packed_update_fn(
                self.params, self.opt_state, ptb, vision
            )
            for k, v in metrics.items():
                metrics_acc[k].append(float(v))
        return reduce_metrics(metrics_acc)

    def _use_packed(self, batch: RolloutBatch) -> bool:
        """Padding-free (packed) layout for every batch when enabled — the
        reference's rmpad path is unconditional (dp_actor.py:85-139).
        Multimodal multi-host packs negotiate their vision width and compute
        merge offsets from the PACKED rows (see _update_actor_packed)."""
        return self.padding_free

    def _stream_trainable(self, tree):
        """The subtree the streamed optimizer owns: everything except a
        frozen vision tower (no host moments allocated, no weight decay
        applied — the frozen subtree never enters the apply at all)."""
        if getattr(self, "_freeze_vision", False):
            return {k: v for k, v in tree.items() if k != "vision"}
        return tree

    def update_actor(self, batch: RolloutBatch) -> Dict[str, float]:
        if self.offload_opt:
            from ..parallel.offload import offload_to_host, restore_from_host

            self.opt_state = restore_from_host(self.opt_state)
            try:
                return self._update_actor_inner(batch)
            finally:
                self.opt_state = offload_to_host(self.opt_state)
        return self._update_actor_inner(batch)

    def _update_actor_inner(self, batch: RolloutBatch) -> Dict[str, float]:
        if self._use_packed(batch):
            return self._update_actor_packed(batch)
        actor_cfg = self.config.worker.actor
        metrics_acc: Dict[str, List[float]] = defaultdict(list)
        bs = len(batch)  # local rows (global / n_proc)
        mini_bs = min(max(actor_cfg.global_batch_size // self.n_proc, 1), bs)
        micro = actor_cfg.micro_batch_size_per_device_for_update
        n_dev = self.mesh.devices.size
        micro_global = max(
            micro * max(n_dev // actor_cfg.sharding.model_size, 1), 1
        )

        n_micro = self._fit_n_micro(mini_bs, max(micro_global // self.n_proc, 1))
        for mini in self._iter_minibatches(batch, mini_bs, actor_cfg.ppo_epochs, 131):
            tb = self._train_batch_views_np(mini)
            micro_batches = TrainBatch(*[self._reshape_micro(x, n_micro) for x in tb])
            micro_batches = self._dev_micro(micro_batches)
            vision = self._micro_vision_packs(mini, n_micro)
            self.params, self.opt_state, metrics = self.update_fn(
                self.params, self.opt_state, micro_batches, vision
            )
            for k, v in metrics.items():
                metrics_acc[k].append(float(v))
        return reduce_metrics(metrics_acc)

    def update_critic(self, batch: RolloutBatch) -> Dict[str, float]:
        from .critic import CriticBatch

        critic_cfg = self.config.worker.critic
        metrics_acc: Dict[str, List[float]] = defaultdict(list)
        bs = len(batch)  # local rows (global / n_proc)
        mini_bs = min(max(critic_cfg.global_batch_size // self.n_proc, 1), bs)
        micro = critic_cfg.micro_batch_size_per_device_for_update
        n_dev = self.mesh.devices.size
        micro_global = max(micro * max(n_dev // critic_cfg.sharding.model_size, 1), 1)

        n_micro = self._fit_n_micro(mini_bs, max(micro_global // self.n_proc, 1))
        for mini in self._iter_minibatches(batch, mini_bs, critic_cfg.ppo_epochs, 173):
            tb = self._train_batch_views_np(mini)
            micro_tb = TrainBatch(*[self._reshape_micro(x, n_micro) for x in tb])
            cb = CriticBatch(
                train=self._dev_micro(micro_tb),
                values=self._dev(self._reshape_micro(mini.tensors["values"], n_micro), 1),
                returns=self._dev(self._reshape_micro(mini.tensors["returns"], n_micro), 1),
            )
            vision = self._micro_vision_packs(mini, n_micro)
            self.critic_params, self.critic_opt_state, metrics = self.critic_update_fn(
                self.critic_params, self.critic_opt_state, cb, vision
            )
            for k, v in metrics.items():
                metrics_acc[k].append(float(v))
        return reduce_metrics(metrics_acc)

    # ------------------------------------------------------------------- fit

    def fit(self):
        cfg = self.config
        total_steps = cfg.trainer.max_steps if cfg.trainer.max_steps > 0 else (
            len(self.train_dataloader) * cfg.trainer.total_episodes
        )
        self.load_checkpoint()

        if cfg.trainer.val_before_train and self.val_dataloader is not None:
            val_metrics = self._validate()
            self.tracker.log(val_metrics, self.global_step)
            if cfg.trainer.val_only:
                return

        for episode in range(cfg.trainer.total_episodes):
            for batch in self.train_dataloader:
                if self.global_step >= total_steps:
                    break
                self.global_step += 1
                with maybe_trace(cfg.trainer.profile_dir, self.global_step,
                                 tuple(cfg.trainer.profile_steps)):
                    metrics = self.train_step(batch)
                self.tracker.log(metrics, self.global_step)

                if cfg.trainer.val_freq > 0 and self.global_step % cfg.trainer.val_freq == 0 \
                        and self.val_dataloader is not None:
                    self.tracker.log(self._validate(), self.global_step)
                if cfg.trainer.save_freq > 0 and self.global_step % cfg.trainer.save_freq == 0:
                    self.save_checkpoint()
            if self.global_step >= total_steps:
                break

        # final validation + save (parity with reference end-of-training block)
        if cfg.trainer.val_freq > 0 and self.val_dataloader is not None:
            self.tracker.log(self._validate(), self.global_step)
        if cfg.trainer.save_freq > 0:
            self.save_checkpoint()
        self.tracker.finish()

    # ------------------------------------------------------------- train step

    def train_step(self, batch: RolloutBatch) -> Dict[str, float]:
        timer = Timer()
        with timer("step"):
            # uid per prompt BEFORE repeat: grouping survives any reordering
            batch.non_tensors["uid"] = _obj([str(uuid.uuid4()) for _ in range(len(batch))])

            with timer("gen"):
                rolled = self.generate_sequences(batch, self.sampling)

            if self.adv_estimator == "remax":
                with timer("gen_baseline"):
                    greedy = self.generate_sequences(
                        batch, self.sampling.override(temperature=0.0, n=1),
                        key=self._rollout_key(1),
                    )
                    base_rewards, _ = self.reward_fn(greedy)
                    baselines = base_rewards.sum(-1)
                    rolled.tensors["reward_baselines"] = np.repeat(baselines, self.sampling.n, axis=0)

            with timer("reward"):
                reward_tensor, reward_metrics = self.reward_fn(rolled)
                rolled.tensors["token_level_scores"] = reward_tensor

            # trim the response buffer to the batch's longest response (bucketed):
            # most rollouts hit EOS early, so the logprob/update forwards see
            # far fewer padded positions (static shapes per bucket)
            rolled = self.trim_response_padding(
                rolled,
                negotiated_max=self._negotiated_max(
                    int(rolled.tensors["response_mask"].sum(-1).max())
                ),
            )

            with timer("balance"):
                # Karmarkar-Karp token-load balance across micro-batch slots
                # (grouping correctness survives reorder via uid keys)
                seqlens = (
                    rolled.tensors["full_segment_ids"].sum(-1).astype(np.int64).tolist()
                )
                micro = self.config.worker.actor.micro_batch_size_per_device_for_update
                n_slots = max(len(rolled) // max(micro, 1), 1)
                if n_slots > 1 and len(rolled) % n_slots == 0:
                    order = np.asarray(balance_order(seqlens, n_slots))
                    rolled.reorder(order)

            with timer("old"):
                if self.config.worker.rollout.use_rollout_log_probs:
                    rolled.tensors["old_log_probs"] = rolled.tensors["rollout_log_probs"]
                else:
                    rolled.tensors["old_log_probs"] = self.compute_log_probs_batched(
                        rolled, self.params
                    )

            if self.use_ref:
                with timer("ref"):
                    ref_params = self.ref_params
                    if self.ref_offload:  # re-shard the host copy for this stage
                        from ..parallel.offload import restore_from_host

                        ref_params = restore_from_host(self.ref_params)
                    rolled.tensors["ref_log_probs"] = self.compute_log_probs_batched(
                        rolled, ref_params
                    )
                    del ref_params  # device copy freed until the next step

            if self.use_critic:
                with timer("values"):
                    vals = []
                    micro = self.config.worker.critic.micro_batch_size_per_device_for_experience
                    for piece in rolled.split(max(micro, 1)):
                        tb = self._train_batch_views(piece)
                        vals.append(self._host(self.values_fn(self.critic_params, tb, self._pack_vision(piece))))
                    rolled.tensors["values"] = np.concatenate(vals, axis=0)

            with timer("adv"):
                if self.use_kl_in_reward and self.use_ref:
                    kld = np.asarray(
                        compute_kl(
                            jnp.asarray(rolled.tensors["old_log_probs"]),
                            jnp.asarray(rolled.tensors["ref_log_probs"]),
                            self.config.algorithm.kl_penalty,
                        )
                    ) * rolled.tensors["response_mask"]
                    rolled.tensors["token_level_rewards"] = (
                        rolled.tensors["token_level_scores"] - self.kl_ctrl.kl_coef * kld
                    )
                    mean_kl = float(
                        (kld.sum(-1) / np.maximum(rolled.tensors["response_mask"].sum(-1), 1)).mean()
                    )
                    self.kl_ctrl.update(mean_kl, len(rolled))
                else:
                    rolled.tensors["token_level_rewards"] = rolled.tensors["token_level_scores"]
                adv, ret = self.compute_advantages(rolled)
                rolled.tensors["advantages"] = adv
                rolled.tensors["returns"] = ret

            critic_metrics = {}
            if self.use_critic:
                with timer("update_critic"):
                    critic_metrics = self.update_critic(rolled)

            critic_warmup = self.config.trainer.critic_warmup
            if self.use_critic and critic_warmup > 0 and self.global_step <= critic_warmup:
                actor_metrics = {}  # critic warmup: skip policy updates
                timer.timing["update_actor"] = 1e-9
            else:
                with timer("update_actor"):
                    actor_metrics = self.update_actor(rolled)

        # metrics are GLOBAL in multi-process runs: gather row-level inputs
        # before reducing (each rank logging its local slice would show
        # rank-dependent values for metrics the reference reduces globally)
        g = self._gather_rows
        num_tokens = int(
            g(rolled.tensors["response_mask"]).sum()
            + g(rolled.tensors["segment_ids"]).sum()
        )
        seqlens_all = g(rolled.tensors["full_segment_ids"].sum(-1)).astype(np.int64).tolist()
        vision_patches = float(g(np.asarray([sum(
            0 if p is None else len(p) for p in rolled.non_tensors.get("patches", [])
        )])).sum())
        mfu = compute_mfu(
            self.flops_counter, seqlens_all, timer.timing["update_actor"],
            self.mesh.devices.size, self.config.worker.actor.ppo_epochs,
            vision_patches=vision_patches,
        )
        from ..utils.profiling import device_memory_metrics

        metrics = {
            "perf/mfu_actor": mfu,
            **self._last_rollout_stats,  # paged-KV telemetry (peak pages, preemptions)
            **device_memory_metrics(),
            **{f"reward/{k}": float(np.mean(g(v))) for k, v in reward_metrics.items()},
            **compute_data_metrics(
                token_level_scores=g(rolled.tensors["token_level_scores"]),
                token_level_rewards=g(rolled.tensors["token_level_rewards"]),
                advantages=g(rolled.tensors["advantages"]),
                returns=g(rolled.tensors["returns"]),
                response_mask=g(rolled.tensors["response_mask"]),
                prompt_mask=g(rolled.tensors["segment_ids"]),
                max_response_length=self.config.data.max_response_length,
                max_prompt_length=self.config.data.max_prompt_length,
                values=g(rolled.tensors["values"]) if "values" in rolled.tensors else None,
                old_log_probs=(
                    g(rolled.tensors["old_log_probs"])
                    if not self.config.worker.rollout.use_rollout_log_probs
                    and "rollout_log_probs" in rolled.tensors else None
                ),
                rollout_log_probs=(
                    g(rolled.tensors["rollout_log_probs"])
                    if not self.config.worker.rollout.use_rollout_log_probs
                    and "rollout_log_probs" in rolled.tensors else None
                ),
            ),
            **actor_metrics,
            **critic_metrics,
            **compute_timing_metrics(timer.timing, num_tokens),
            **compute_throughput_metrics(
                num_tokens, timer.timing["step"], self.mesh.devices.size
            ),
        }
        return metrics

    # ------------------------------------------------------------- validation

    def _validate(self) -> Dict[str, float]:
        all_scores: Dict[str, List[float]] = defaultdict(list)
        candidates = []
        # off-size final val batches break sharding divisibility at larger
        # meshes: cyclically pad to the batch-sharded device count and unpad
        # after decode (reference pads via pad_dataproto_to_divisor in
        # ray_trainer._validate)
        sh = self.config.worker.actor.sharding
        divisor = max(1, sh.data_size * sh.fsdp_size // self.n_proc)
        for batch_idx, batch in enumerate(self.val_dataloader):
            batch, pad_size = pad_to_divisor(batch, divisor)
            rolled = self.generate_sequences(
                batch, self.val_sampling, key=self._rollout_key(2, batch_idx)
            )
            rolled = unpad(rolled, pad_size * self.val_sampling.n)
            reward_tensor, metrics = self.val_reward_fn(rolled)
            for k, v in metrics.items():
                all_scores[k].extend(self._gather_rows(v).tolist())
            lengths = rolled.tensors["response_mask"].sum(-1)
            for i in range(len(rolled)):
                candidates.append(
                    (str(rolled.non_tensors["problem"][i]),
                     rolled.tensors["responses"][i, : lengths[i]],
                     str(rolled.non_tensors["ground_truth"][i]),
                     float(reward_tensor[i].sum()))
                )
        # deterministic subsample of the WHOLE validation set (reference
        # gen_logger.py:31-103: sort by input, fixed-seed shuffle, take N) —
        # logging the first rows of the first batches biases the table toward
        # whatever the loader yields first. Decode only the selected rows.
        cap = self.config.trainer.val_generations_to_log
        candidates.sort(key=lambda s: s[0])
        order = np.random.RandomState(42).permutation(len(candidates))[:cap]
        texts = self.tokenizer.batch_decode(
            [candidates[j][1] for j in order], skip_special_tokens=True
        )
        samples = [
            (candidates[j][0], text, candidates[j][2], candidates[j][3])
            for j, text in zip(order, texts)
        ]
        self.tracker.log_generations(samples, self.global_step)
        out = {f"val/{k}_reward" if k != "overall" else "val/reward_score": float(np.mean(v))
               for k, v in all_scores.items()}
        return out

    # ------------------------------------------------------------ checkpoints

    def save_checkpoint(self):
        params = self.params
        opt_state = self.opt_state
        if self.offload_opt:  # orbax serializes the on-device tree structure
            from ..parallel.offload import restore_from_host

            opt_state = restore_from_host(self.opt_state)
        if self.use_critic:
            params = {"actor": self.params, "critic": self.critic_params}
            opt_state = {"actor": opt_state, "critic": self.critic_opt_state}
        self.ckpt.save(
            self.global_step,
            params=params,
            opt_state=opt_state,
            dataloader_state=getattr(self.train_dataloader, "state_dict", lambda: {})(),
            rng_key=np.asarray(jax.random.key_data(self.rng_key)),
        )

    def load_checkpoint(self):
        path = self.config.trainer.load_checkpoint_path
        if not path:
            return
        opt_state = self.opt_state
        if self.offload_opt:  # the checkpoint template needs the device tree
            from ..parallel.offload import restore_from_host

            opt_state = restore_from_host(self.opt_state)
        params_like = self.params
        opt_like = opt_state
        if self.use_critic:
            params_like = {"actor": self.params, "critic": self.critic_params}
            opt_like = {"actor": opt_state, "critic": self.critic_opt_state}
        state = self.ckpt.load(path, params_like=params_like, opt_state_like=opt_like)
        if state is None:
            if self.offload_opt:
                del opt_state
            return
        if self.use_critic:
            self.params = state["params"]["actor"]
            self.critic_params = state["params"]["critic"]
            self.opt_state = state["opt_state"]["actor"]
            self.critic_opt_state = state["opt_state"]["critic"]
        else:
            self.params = state["params"]
            self.opt_state = state["opt_state"]
        if self.offload_opt:
            from ..parallel.offload import offload_to_host

            self.opt_state = offload_to_host(self.opt_state)
        self.global_step = state["step"]
        if state.get("dataloader_state") and hasattr(self.train_dataloader, "load_state_dict"):
            self.train_dataloader.load_state_dict(state["dataloader_state"])
        if state.get("rng_key") is not None:
            self.rng_key = jax.random.wrap_key_data(jnp.asarray(state["rng_key"]))


def _obj(values):
    arr = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        arr[i] = v
    return arr
