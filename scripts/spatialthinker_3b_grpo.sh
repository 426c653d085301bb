#!/bin/bash
# SpatialThinker-3B GRPO with the dense multi-objective spatial reward.
# Public-surface parity with the reference's scripts/spatialthinker_3b_grpo.sh.
set -x

MODEL_PATH=${MODEL_PATH:-Qwen/Qwen2.5-VL-3B-Instruct}

python3 -m spatialthinker_tpu.trainer.main \
    config=scripts/config.yaml \
    data.train_files=hunarbatra/STVQA-7K@train \
    data.val_files=hunarbatra/STVQA-7K@val \
    data.rollout_batch_size=512 \
    worker.actor.model.model_path=${MODEL_PATH} \
    worker.reward.score_function=spatial_sgg \
    worker.rollout.n=8 \
    worker.actor.global_batch_size=128 \
    worker.actor.micro_batch_size_per_device_for_update=4 \
    worker.actor.micro_batch_size_per_device_for_experience=16 \
    algorithm.use_kl_loss=true \
    algorithm.kl_penalty=low_var_kl \
    algorithm.kl_coef=1.0e-2 \
    trainer.total_episodes=75 \
    trainer.experiment_name=spatialthinker_3b_grpo \
    trainer.n_chips=4 \
    data.max_prompt_length=6144 \
    data.max_response_length=2048 \
    worker.rollout.max_num_batched_tokens=8192 \
    worker.rollout.kv_cache_dtype=int4 \
    worker.rollout.quantization=int8 \
    worker.rollout.prefill_rows=8 \
    worker.rollout.int4_i8dot=true \
    worker.rollout.name=continuous \
    worker.rollout.page_size=1024 \
    worker.rollout.decode_batch_size=128 \
    worker.rollout.refill_batch=8 \
    "$@"

# The int4/int8/rows/i8dot rollout knobs are the bench-proven perf path
# (BENCH_r03+: int4 KV admits ~2x the decode lanes per HBM byte and the
# biased-nibble kernel reads it at int8 wall time; W8A8 weights halve the
# decode weight stream; rows-mode prefill recovers unchunked MFU at this
# 6144-token prompt; int4_i8dot runs the int4 decode dots on the int8 MXU —
# measured 2,970 vs 2,602 tok/s/chip at exactly this shape).
#
# Engine selection: this run's rollout is 512 prompts x n=8 = 4,096 lanes at
# width 6144+2048 — far past the dense engine's measured 64-lane/chip HBM
# ceiling at that width (the dense path decodes ONE wave with no turnover).
# rollout.name=continuous + page_size=1024 routes the PAGED engine: KV in
# compacted 1024-token pages from a global pool (free HBM x
# gpu_memory_utilization), prompt pages refcount-SHARED across each
# prompt's n=8 lanes, youngest-group preemption on pool pressure. Paging is
# what backs 128 decode slots at this width on a 16 GB chip: a
# width-allocated slot cache caps at 48 slots (64 x 8192 int4 cells =
# 9 GiB packed + 2.8 GiB scales next to the 4.1 GiB int8 tree OOMs), while
# compaction + prompt sharing held the same workload at a peak 350 x 1024
# tokens of pool — 128 slots amortize the per-step weight stream and
# measured 3,647 tok/s/chip (1.30x anchor) vs 3,065 (1.09x) for the
# 48-slot width-allocated engine (bench flagship_sched, 2026-08).
# Guardrail: rollout/probs_diff_mean|max in the step metrics reports the
# engine-vs-bf16-graph sampling drift every step (CPU smoke: mean ~2e-3).
# Revert to exact-parity rollout with:
#   worker.rollout.kv_cache_dtype=bfloat16 worker.rollout.quantization=none
#   worker.rollout.name=jax
