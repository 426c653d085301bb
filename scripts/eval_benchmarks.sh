#!/bin/bash
# Evaluate a (trained) checkpoint across the spatial benchmark suite.
# Usage: MODEL=/path/to/hf_ckpt bash scripts/eval_benchmarks.sh [dataset ...]
set -e

MODEL=${MODEL:-Qwen/Qwen2.5-VL-3B-Instruct}
DATASETS=${@:-cv-bench blink-spatial blink-depth blink-counting spatialbench 3dsrbench realworld_qa}

for ds in $DATASETS; do
    python -m spatialthinker_tpu.eval \
        --dataset "$ds" \
        --model "$MODEL" \
        --provider jax \
        --template spatial_thinker \
        --output "eval_results/${ds}.json"
done
