"""CLI entry point: ``python -m spatialthinker_tpu.trainer.main config=cfg.yaml
key.sub=value ...`` — same public grammar as the reference
(/root/reference/verl/trainer/main.py:88-105, scripts/*.sh)."""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import PPOConfig, build_config, config_summary
from ..data.dataset import DataLoader, RLHFDataset
from ..models.qwen2_5_vl import get_config, init_params
from ..models.qwen2_5_vl.params import load_params
from ..rewards.manager import RewardManager
from .grpo_trainer import GRPOTrainer


def load_tokenizer(path: str):
    if path == "synthetic":
        from ..utils.synthetic_tokenizer import SyntheticTokenizer

        return SyntheticTokenizer()
    from ..utils.tokenizer import get_tokenizer

    return get_tokenizer(path, trust_remote_code=True)


def build_model(config: PPOConfig):
    """Returns (model_cfg, params). Loads HF safetensors when the model path is
    a local checkpoint dir; otherwise random-init from a preset (smoke runs)."""
    model_path = config.worker.actor.model.model_path
    dtype = getattr(jnp, config.worker.actor.model.param_dtype)
    if os.path.isdir(model_path) and any(
        f.endswith(".safetensors") for f in os.listdir(model_path)
    ):
        return load_params(model_path, dtype=dtype)
    model_cfg = get_config(model_path)
    params = init_params(model_cfg, jax.random.key(config.trainer.seed), dtype=dtype)
    return model_cfg, params


def run(config: PPOConfig) -> None:
    # operational escape hatch: hosts whose sitecustomize pins a remote TPU
    # backend can force a platform (e.g. SPATIALTHINKER_PLATFORM=cpu smoke runs)
    platform = os.environ.get("SPATIALTHINKER_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    print(config_summary(config))
    if config.trainer.nnodes > 1:
        jax.distributed.initialize()

    tokenizer = load_tokenizer(config.worker.actor.model.tokenizer_path)
    model_cfg, params = build_model(config)

    train_ds = RLHFDataset(
        config.data.train_files, tokenizer, config.data, model_cfg,
        limit_images=config.worker.rollout.limit_images,
    )
    # multi-process: every host walks the same global batch order and takes
    # its row-slice of each batch (one SPMD program over all hosts)
    shard = (jax.process_index(), jax.process_count()) if jax.process_count() > 1 else None
    train_loader = DataLoader(
        train_ds, config.data.rollout_batch_size, shuffle=config.data.shuffle,
        seed=config.data.seed, num_workers=config.data.num_workers,
        prefetch_batches=config.data.prefetch_batches, process_shard=shard,
    )
    val_loader = None
    if config.data.val_files:
        val_ds = RLHFDataset(
            config.data.val_files, tokenizer, config.data, model_cfg,
            limit_images=config.worker.rollout.limit_images,
        )
        val_bs = config.data.val_batch_size if config.data.val_batch_size > 0 else len(val_ds)
        val_loader = DataLoader(val_ds, val_bs, shuffle=False, process_shard=shard)

    reward_cfg = config.worker.reward
    reward_fn = RewardManager(
        tokenizer, reward_cfg.score_function,
        skip_special_tokens=reward_cfg.skip_special_tokens, num_workers=reward_cfg.num_workers,
    )

    trainer = GRPOTrainer(
        config=config,
        tokenizer=tokenizer,
        model_cfg=model_cfg,
        params=params,
        train_dataloader=train_loader,
        val_dataloader=val_loader,
        reward_fn=reward_fn,
    )
    trainer.fit()


def main(argv: Optional[list] = None) -> None:
    config = build_config(argv if argv is not None else sys.argv[1:])
    run(config)


if __name__ == "__main__":
    main()
