#!/bin/bash
# SpatialThinker-7B GRPO (dense spatial reward), FSDP-sharded over the mesh.
set -x

MODEL_PATH=${MODEL_PATH:-Qwen/Qwen2.5-VL-7B-Instruct}

python3 -m spatialthinker_tpu.trainer.main \
    config=scripts/config.yaml \
    data.train_files=hunarbatra/STVQA-7K@train \
    data.val_files=hunarbatra/STVQA-7K@val \
    worker.actor.model.model_path=${MODEL_PATH} \
    worker.reward.score_function=spatial_sgg \
    worker.rollout.n=8 \
    worker.actor.sharding.fsdp_size=-1 \
    worker.actor.sharding.model_size=1 \
    algorithm.use_kl_loss=true \
    algorithm.kl_penalty=low_var_kl \
    algorithm.kl_coef=1.0e-2 \
    trainer.total_episodes=75 \
    trainer.experiment_name=spatialthinker_7b_grpo \
    data.max_prompt_length=6144 \
    data.max_response_length=2048 \
    worker.rollout.kv_cache_dtype=int4 \
    worker.rollout.quantization=int8 \
    worker.rollout.prefill_rows=8 \
    worker.rollout.int4_i8dot=true \
    worker.rollout.name=continuous \
    worker.rollout.page_size=1024 \
    worker.rollout.decode_batch_size=128 \
    worker.rollout.refill_batch=16 \
    "$@"

# Same bench-proven rollout perf path as the 3B script (int4 KV + W8A8 +
# rows-mode prefill + int8-MXU int4 dots + the PAGED engine: compacted
# 1024-token pages, prompt pages refcount-shared across the n=8 lanes —
# measured 1.30x the H100-vLLM anchor at the 3B flagship shape);
# guardrail metric: rollout/probs_diff_*. int4 + name=continuous REQUIRES
# an explicit page_size % 256 (the 128 default fails config validation).
# Revert with kv_cache_dtype=bfloat16 quantization=none
# worker.rollout.name=jax.
#
# 7B HBM plan (README "The 7B plan" + tests/test_7b_plan.py): single-chip 7B
# does not fit at all — fsdp>=4 with host moments is the floor, fsdp=8 fits
# the fused optimizer. fsdp_size=-1 takes every chip; int4 KV at width 8192
# is 28 MB/lane (28L x 4kv x 128d), so decode_batch_size=128 slots spread
# over fsdp=8 costs ~0.45 GB/chip of KV.
