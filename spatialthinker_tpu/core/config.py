"""Typed configuration tree: structured dataclass defaults <- YAML file <- CLI dotlist.

Public surface parity with the reference trainer config
(/root/reference/verl/trainer/config.py:34-111, /root/reference/scripts/config.yaml),
so the same `config=path.yaml key.sub=value` CLI grammar works, while the
contents are TPU-native (mesh axes replace FSDP/offload knobs; the rollout
engine is on-device so vLLM-only fields become engine fields).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Tuple


# ---------------------------------------------------------------------------
# Leaf configs
# ---------------------------------------------------------------------------


@dataclass
class DataConfig:
    train_files: str = ""
    val_files: str = ""
    prompt_key: str = "problem"
    answer_key: str = "answer"
    image_key: str = "image"
    mixed_data: bool = False
    text_only: bool = False
    max_prompt_length: int = 2048
    max_response_length: int = 2048
    rollout_batch_size: int = 512
    val_batch_size: int = -1
    format_prompt: str = ""
    shuffle: bool = True
    seed: int = 1
    max_pixels: int = 4_194_304
    min_pixels: int = 262_144
    # host-side loader threads (reference: 8-worker StatefulDataLoader,
    # ray_trainer.py:241-265); 0 = synchronous
    num_workers: int = 8
    prefetch_batches: int = 2


@dataclass
class ModelConfig:
    model_path: str = "Qwen/Qwen2.5-VL-3B-Instruct"
    tokenizer_path: Optional[str] = None
    enable_gradient_checkpointing: bool = True
    trust_remote_code: bool = False
    freeze_vision_tower: bool = False
    # TPU-native: model parameter dtype and compute dtype.
    param_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"

    def post_init(self):
        if self.tokenizer_path is None:
            self.tokenizer_path = self.model_path


@dataclass
class OptimConfig:
    lr: float = 1.0e-6
    weight_decay: float = 1.0e-2
    betas: Tuple[float, float] = (0.9, 0.999)
    # {adamw, adamw_bf16}; adamw_bf16 = bf16 optimizer state (AnyPrecisionAdamW parity,
    # reference utils/torch_functional.py:232-329) via optax dtype control.
    strategy: str = "adamw"
    # AnyPrecisionAdamW knob (reference torch_functional.py:258): False drops
    # the Kahan compensation buffer — one param copy of HBM
    use_kahan_summation: bool = True
    lr_warmup_ratio: float = 0.0
    training_steps: int = -1
    # host-streamed AnyPrecisionAdamW (trainer/streamed_opt.py): Adam moments
    # stay host-resident and the update round-trips one layer slice at a
    # time — the single-chip 3B training fit (fused needs params+grads+
    # moments = 22.4 GB at 3B). Single-device meshes only: FSDP over >=2
    # chips fits 3B outright and keeps moments in HBM. Implies bf16-moment
    # AnyPrecisionAdamW regardless of `strategy` (the trainer warns if
    # strategy=adamw asked for fp32 moments) and defaults grad_accum_dtype
    # to bfloat16 (fp32 grads alone are ~11.2 GB at 3B — over the chip).
    stream: bool = False
    # micro-batch gradient accumulator dtype: "" = auto (float32 normally;
    # bfloat16 when stream=true, where the fp32 accumulator cannot fit next
    # to the params at the 3B scale streaming exists for)
    grad_accum_dtype: str = ""

    def post_init(self):
        if self.grad_accum_dtype not in ("", "float32", "bfloat16"):
            raise ValueError(
                "worker.*.optim.grad_accum_dtype must be '' (auto), "
                f"'float32', or 'bfloat16'; got {self.grad_accum_dtype!r}"
            )


@dataclass
class ShardingConfig:
    """TPU-native replacement for the reference FSDP/offload config
    (reference workers/actor/config.py:50-65): declarative mesh axis sizes.

    -1 means "infer": fsdp_size=-1 takes every device not consumed by the
    other axes (full shard, ZeRO-3 parity); data axis is the replica axis
    (HSDP parity when both >1).
    """

    data_size: int = 1          # replica/ddp axis
    fsdp_size: int = -1         # parameter-shard axis
    model_size: int = 1         # tensor-parallel axis (megatron-style TP)
    remat: bool = True          # jax.checkpoint on decoder layers
    # "dots" saves matmul outputs (less recompute); "full" saves only layer
    # inputs — the saved gate_up stack alone is L*B*S*2I bf16, so "full" is
    # the fits-or-OOMs knob for single-chip 1B+ training
    remat_policy: str = "dots"  # {dots, full}
    host_offload_params: bool = False
    host_offload_optimizer: bool = False


@dataclass
class ActorConfig:
    global_batch_size: int = 128
    micro_batch_size_per_device_for_update: int = 4
    micro_batch_size_per_device_for_experience: int = 16
    max_grad_norm: float = 1.0
    clip_ratio_low: float = 0.2
    clip_ratio_high: float = 0.3
    clip_ratio_dual: float = 3.0
    ppo_epochs: int = 1
    padding_free: bool = True
    ulysses_sequence_parallel_size: int = 1
    # "ulysses" (head exchange; degree capped by kv-head count) or "ring"
    # (KV rotation, ops/ring.py; no head cap — GQA long-context scaling)
    sequence_parallel_backend: str = "ulysses"
    entropy_coeff: float = 0.0
    use_kl_loss: bool = False       # plumbed from algorithm config
    kl_loss_coef: float = 0.0
    kl_penalty: str = "low_var_kl"
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)

    # derived (plumbed by PPOConfig.post_init)
    disable_kl: bool = False


@dataclass
class RefConfig:
    """Reference policy: frozen second param set sharing the actor's graph."""

    micro_batch_size_per_device_for_experience: int = 16
    sharding: ShardingConfig = field(default_factory=ShardingConfig)
    # keep the frozen copy in HOST memory and re-shard it onto the mesh only
    # for the ref log-prob stage (reference ref.offload parity,
    # /root/reference/scripts/config.yaml ref.offload) — trades one
    # host->device transfer per step for a full param copy of HBM
    offload: bool = False


@dataclass
class CriticConfig:
    global_batch_size: int = 128
    micro_batch_size_per_device_for_update: int = 4
    micro_batch_size_per_device_for_experience: int = 16
    max_grad_norm: float = 1.0
    cliprange_value: float = 0.5
    ppo_epochs: int = 1
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)


@dataclass
class SamplingOverride:
    """Per-validation overrides (reference rollout/config.py val_override_config)."""

    temperature: Optional[float] = None
    top_p: Optional[float] = None
    top_k: Optional[int] = None
    n: Optional[int] = None


@dataclass
class RolloutConfig:
    name: str = "jax"               # on-device engine (replaces vLLM)
    n: int = 5                      # samples per prompt
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    seed: int = 1
    limit_images: int = 0
    # decode engine capacity knobs. The continuous engine sizes its KV page
    # pool from the chip's free HBM x gpu_memory_utilization (vLLM parity);
    # page_size=0 falls back to dense worst-case slot reservation.
    max_num_batched_tokens: int = 8192
    gpu_memory_utilization: float = 0.9
    kv_cache_dtype: str = "bfloat16"
    # rollout weight/activation quantization (vLLM `quantization` parity):
    # "int8" runs the decoder-stack matmuls W8A8 on the int8 MXU (2x bf16
    # FLOPs, half the decode weight HBM read); old/ref log-probs are still
    # recomputed by the bf16 training graph (ops/quant.py)
    quantization: str = "none"      # {none, int8, w4a8}
    page_size: int = 128            # tokens per KV page (paged attention granularity)
    # fixed page-pool size, bypassing the free-HBM measurement (vLLM
    # num_gpu_blocks_override parity): cache-size experiments, forcing
    # preemption in tests, and pinning the pool on hosts whose free-HBM
    # estimates would drift. 0 = measure.
    kv_pages_override: int = 0
    # int4-KV decode attention with both dots on the int8 MXU: the nibble
    # unpack stays in int8 lanes (one widen per packed byte) and q + the
    # softmax weights are quantized per row in-register with exact scale
    # recovery in the f32 epilogues. Measured on v5e: 11.37 vs 14.68 ms/pass
    # at the flagship decode shape (b=64, width 8192) and 15.17 vs 16.8 at
    # b=256/2304 — takes the flagship rollout 0.93x -> 1.06x anchor. Adds
    # ~0.3% rounding on the behavior policy's logits on top of the int4 KV
    # error (guarded by rollout/probs_diff_* like every rollout
    # approximation). Inert unless kv_cache_dtype=int4; threaded as a real
    # kernel argument through every engine (ops/decode_attention.py,
    # ops/paged_attention.py).
    int4_i8dot: bool = False
    decode_batch_size: int = -1     # -1: infer from batch
    # > 0: cap UNIQUE prompts per continuous/paged refill prefill. The refill
    # runs through a u x P scratch KV cache before installing into slots or
    # pages; at long prompts that transient rivals the slot cache / page pool
    # itself, so slots fill over several small refills instead (vLLM
    # schedules prefills under a separate budget from running sequences)
    refill_batch: int = 0
    prefill_chunk_size: int = 2048
    # > 0: prefill in row groups at FULL sequence length instead of sequence
    # chunks — same rows*P activation bound as B*prefill_chunk but no
    # per-chunk pass over the live cache prefix and one weight read per group
    # (higher measured prefill MFU at uniform prompt lengths). Applies to all
    # engines (dense, continuous, paged); COMPOSES with the token budget —
    # when rows*P still exceeds max_num_batched_tokens the groups are
    # additionally sequence-chunked. Row groups slice the batch axis inside
    # the jitted program: on a batch-sharded multi-host mesh keep prefill_rows
    # a multiple of the per-shard batch (rows below that leave batch devices
    # idle per group forward); the single-chip bench shapes are unaffected.
    prefill_rows: int = 0
    tensor_parallel_size: int = 1   # decode-time model-axis sharding
    # reuse the decode-time sampled-token log-probs as old_log_probs instead of
    # recomputing with the training graph (skips one full forward per step;
    # train and decode share weights here so the gap is only layout/precision)
    use_rollout_log_probs: bool = False
    val_override_config: SamplingOverride = field(default_factory=SamplingOverride)

    # derived from data config by post_init
    prompt_length: int = 2048
    response_length: int = 2048


@dataclass
class RewardConfig:
    reward_type: str = "function"
    score_function: str = "r1v"     # {math, r1v, r1v_scene, spatial_sgg}
    skip_special_tokens: bool = True
    num_workers: int = 8            # host-side scorer parallelism


@dataclass
class WorkerConfig:
    actor: ActorConfig = field(default_factory=ActorConfig)
    critic: CriticConfig = field(default_factory=CriticConfig)
    ref: RefConfig = field(default_factory=RefConfig)
    rollout: RolloutConfig = field(default_factory=RolloutConfig)
    reward: RewardConfig = field(default_factory=RewardConfig)


@dataclass
class AlgorithmConfig:
    adv_estimator: str = "grpo"     # {grpo, gae, rloo, reinforce_plus_plus, remax}
    disable_kl: bool = False
    use_kl_loss: bool = True
    kl_penalty: str = "low_var_kl"  # {kl, abs, mse, low_var_kl, full, chi2}
    kl_coef: float = 1.0e-2
    kl_type: str = "fixed"          # {fixed, adaptive}
    kl_target: float = 0.0
    kl_horizon: float = 0.0
    gamma: float = 1.0
    lam: float = 1.0


@dataclass
class TrainerConfig:
    total_episodes: int = 15
    max_steps: int = -1
    logger: List[str] = field(default_factory=lambda: ["console"])
    project_name: str = "spatialthinker_tpu"
    experiment_name: str = "default"
    n_chips: int = 1                # devices per host (parity: n_gpus_per_node)
    nnodes: int = 1
    critic_warmup: int = 0
    val_freq: int = -1
    val_before_train: bool = False
    val_only: bool = False
    val_generations_to_log: int = 3
    save_freq: int = -1
    save_limit: int = -1
    save_checkpoint_path: Optional[str] = None
    load_checkpoint_path: Optional[str] = None
    seed: int = 1
    # jax.profiler xplane traces around the selected train steps (parity role:
    # reference codetiming/nsight sections) — written under profile_dir
    profile_dir: Optional[str] = None
    profile_steps: List[int] = field(default_factory=lambda: [1, 5])


@dataclass
class PPOConfig:
    data: DataConfig = field(default_factory=DataConfig)
    worker: WorkerConfig = field(default_factory=WorkerConfig)
    algorithm: AlgorithmConfig = field(default_factory=AlgorithmConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)

    def post_init(self):
        """Plumb derived values downward (parity: reference trainer/config.py:99-108)."""
        self.worker.rollout.prompt_length = self.data.max_prompt_length
        self.worker.rollout.response_length = self.data.max_response_length
        if self.algorithm.disable_kl:
            self.worker.actor.disable_kl = True
            self.worker.actor.use_kl_loss = False
        else:
            self.worker.actor.use_kl_loss = self.algorithm.use_kl_loss
            self.worker.actor.kl_loss_coef = self.algorithm.kl_coef
            self.worker.actor.kl_penalty = self.algorithm.kl_penalty
        if self.trainer.save_checkpoint_path is None:
            self.trainer.save_checkpoint_path = (
                f"checkpoints/{self.trainer.project_name}/{self.trainer.experiment_name}"
            )
        # one SPMD mesh serves train AND decode: the vLLM-style decode TP knob
        # (reference rollout.tensor_parallel_size) must agree with the mesh's
        # model axis — reject silently-divergent values instead of ignoring them
        if self.worker.actor.sequence_parallel_backend not in ("ulysses", "ring"):
            raise ValueError(
                f"actor.sequence_parallel_backend="
                f"{self.worker.actor.sequence_parallel_backend!r}: supported "
                "values are 'ulysses' (head exchange) and 'ring' (KV rotation)"
            )
        for role, sh in (("actor", self.worker.actor.sharding),
                         ("critic", self.worker.critic.sharding),
                         ("ref", self.worker.ref.sharding)):
            if sh.remat_policy not in ("dots", "full"):
                raise ValueError(
                    f"worker.{role}.sharding.remat_policy={sh.remat_policy!r}: "
                    "supported values are 'dots' (save matmul outputs) and "
                    "'full' (save layer inputs only)"
                )
            if sh.host_offload_params:
                # the reference offloads FSDP params between stages
                # (fsdp_workers.py:252-280) because its actor is idle while
                # vLLM generates; here ONE param pytree serves rollout AND
                # training — there is no idle window to offload into. The
                # frozen reference copy IS offloadable: worker.ref.offload.
                raise ValueError(
                    f"worker.{role}.sharding.host_offload_params is not supported: "
                    "train and decode share one param pytree (no idle stage to "
                    "offload across); use worker.ref.offload=true for the frozen "
                    "reference copy and sharding.host_offload_optimizer for the "
                    "optimizer state"
                )
        if self.worker.rollout.quantization not in ("none", "int8", "w4a8"):
            raise ValueError(
                f"rollout.quantization={self.worker.rollout.quantization!r}: "
                "supported values are 'none', 'int8' (W8A8 on the int8 MXU) "
                "and 'w4a8' (int8 + int4 group-quantized MLP decode copies)"
            )
        if self.worker.rollout.kv_cache_dtype not in ("bfloat16", "int8", "int4"):
            raise ValueError(
                f"rollout.kv_cache_dtype={self.worker.rollout.kv_cache_dtype!r}: "
                "supported values are 'bfloat16', 'int8' and 'int4' (packed "
                "nibbles, dense engine only)"
            )
        if (self.worker.rollout.kv_cache_dtype == "int4"
                and self.worker.rollout.name == "continuous"
                and self.worker.rollout.page_size > 0
                and self.worker.rollout.page_size % 256 != 0):
            raise ValueError(
                f"rollout.kv_cache_dtype=int4 with the paged engine needs "
                f"page_size % 256 == 0 (got {self.worker.rollout.page_size}): "
                "pages pack two token cells per byte and the attention "
                "kernel's per-half scale slices need 128-aligned lanes"
            )
        tp = self.worker.rollout.tensor_parallel_size
        if tp != 1 and tp != self.worker.actor.sharding.model_size:
            raise ValueError(
                f"rollout.tensor_parallel_size={tp} conflicts with "
                f"actor.sharding.model_size={self.worker.actor.sharding.model_size}: "
                "decode shares the training mesh; set actor.sharding.model_size "
                "(and leave tensor_parallel_size at 1 or equal to it)"
            )


# ---------------------------------------------------------------------------
# Merge machinery: dataclass defaults <- YAML dict <- dotlist overrides
# ---------------------------------------------------------------------------


def _coerce(value: Any, target_type: Any) -> Any:
    """Best-effort coercion of a parsed value into the annotated field type."""
    if value is None:
        return None
    origin = getattr(target_type, "__origin__", None)
    if target_type in (int,) and isinstance(value, (str, float)):
        return int(float(value))
    if target_type in (float,) and isinstance(value, (str, int)):
        return float(value)
    if target_type in (bool,) and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    if origin in (list, List) and isinstance(value, str):
        return json.loads(value.replace("'", '"'))
    if origin in (tuple, Tuple) and isinstance(value, (list, str)):
        if isinstance(value, str):
            value = json.loads(value.replace("'", '"'))
        return tuple(value)
    return value


def _merge_into(obj: Any, data: Dict[str, Any], path: str = "") -> None:
    if not is_dataclass(obj):
        raise TypeError(f"cannot merge into non-dataclass at {path!r}")
    field_map = {f.name: f for f in fields(obj)}
    for key, value in data.items():
        if key not in field_map:
            raise KeyError(f"unknown config key: {path + key!r}")
        f = field_map[key]
        current = getattr(obj, key)
        if is_dataclass(current) and isinstance(value, dict):
            _merge_into(current, value, path + key + ".")
        elif is_dataclass(current) and value is None:
            pass
        else:
            setattr(obj, key, _coerce(value, f.type if isinstance(f.type, type) else _resolve_type(f)))


def _resolve_type(f) -> Any:
    """Resolve a (possibly string) field annotation to a runtime type."""
    t = f.type
    if isinstance(t, str):
        simple = {"int": int, "float": float, "bool": bool, "str": str}
        t = simple.get(t.replace("Optional[", "").replace("]", ""), t)
    return t


def _parse_scalar(text: str) -> Any:
    low = text.lower()
    if low in ("null", "none", "~"):
        return None
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    if text.startswith("[") or text.startswith("{"):
        try:
            return json.loads(text.replace("'", '"'))
        except json.JSONDecodeError:
            pass
    return text


def _set_dotted(tree: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def parse_cli(argv: List[str]) -> Tuple[Optional[str], Dict[str, Any]]:
    """Parse ``config=path.yaml a.b.c=value ...`` (reference main.py:88-98 grammar)."""
    config_path: Optional[str] = None
    overrides: Dict[str, Any] = {}
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"expected key=value, got {arg!r}")
        key, _, raw = arg.partition("=")
        if key == "config":
            config_path = raw
        else:
            _set_dotted(overrides, key, _parse_scalar(raw))
    return config_path, overrides


def build_config(argv: List[str]) -> PPOConfig:
    config_path, overrides = parse_cli(argv)
    cfg = PPOConfig()
    if config_path:
        _merge_into(cfg, load_yaml(config_path))
    if overrides:
        _merge_into(cfg, overrides)
    _deep_post_init(cfg)
    return cfg


def _deep_post_init(obj: Any) -> None:
    """Run post_init hooks depth-first (parity: reference trainer/config.py:25-31)."""
    if not is_dataclass(obj):
        return
    for f in fields(obj):
        _deep_post_init(getattr(obj, f.name))
    hook = getattr(obj, "post_init", None)
    if callable(hook):
        hook()


def to_dict(obj: Any) -> Any:
    if is_dataclass(obj):
        return {f.name: to_dict(getattr(obj, f.name)) for f in fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [to_dict(v) for v in obj]
    return obj


def config_summary(cfg: PPOConfig) -> str:
    return json.dumps(to_dict(cfg), indent=2, default=str)
