"""Prefill matmul dtype A/B at the flagship row-group shape.

Times the dense engine at gen=8 (prefill + 8 decode steps, the steps are
~constant contamination across variants) for three weight paths:
  w8a8    - int8 weights, W8A8 XLA dots everywhere (round-3 default)
  dequant - int8 weights, large-m dots dequantize per layer in-scan and ride
            the bf16 MXU path (SPATIALTHINKER_PREFILL_DEQUANT_M)
  bf16    - unquantized bf16 tree (upper bound for the dequant path)

Each variant gets a FRESH jit (the dispatch env is read at trace time).
Shape: PF_BATCH (8) x PF_PROMPT (6144) = one flagship rows-group, int4 KV.
Env: PF_BATCH, PF_PROMPT, PF_ITERS (3), PF_VARIANTS (csv).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.models.qwen2_5_vl import get_config
from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
from spatialthinker_tpu.rollout.engine import generate
from spatialthinker_tpu.rollout.sampling import SamplingParams


def main():
    b = int(os.environ.get("PF_BATCH", "8"))
    p = int(os.environ.get("PF_PROMPT", "6144"))
    iters = int(os.environ.get("PF_ITERS", "3"))
    variants = os.environ.get("PF_VARIANTS", "w8a8,dequant,bf16").split(",")
    cfg = get_config(os.environ.get("PF_PRESET", "3b"))

    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
    jax.block_until_ready(params)
    from spatialthinker_tpu.ops.quant import quantize_params

    qparams = jax.jit(quantize_params)(params)

    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(rng.integers(1, 1000, size=(b, p), dtype=np.int32))
    segment_ids = jnp.ones((b, p), jnp.int32)
    position_ids = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.int32)[None, None], (3, b, p)
    )
    gen_pos_start = jnp.full((b,), p, jnp.int32)
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)

    # matmul FLOPs per prompt token (text decoder stack; attention excluded
    # so the eff-TOPS number is the matmul pipeline's, comparable across
    # variants which share the identical flash attention time)
    t = cfg.text
    g = (t.num_attention_heads // t.num_key_value_heads + 2) * t.head_dim
    per_tok = 2 * t.num_hidden_layers * (
        t.hidden_size * g * t.num_key_value_heads          # qkv
        + t.num_attention_heads * t.head_dim * t.hidden_size  # o
        + 3 * t.hidden_size * t.intermediate_size          # gate_up + down
    )

    for variant in variants:
        if variant == "bf16":
            os.environ["SPATIALTHINKER_PREFILL_DEQUANT_M"] = "0"
            tree = params
        elif variant == "dequant":
            os.environ["SPATIALTHINKER_PREFILL_DEQUANT_M"] = "1024"
            tree = qparams
        else:
            os.environ["SPATIALTHINKER_PREFILL_DEQUANT_M"] = "0"
            tree = qparams

        fn = jax.jit(
            lambda tr, key: generate(
                tr, cfg, input_ids, segment_ids, position_ids, gen_pos_start,
                max_new_tokens=8, sampling=sampling, key=key,
                kv_cache_dtype=jnp.uint8, prefill_chunk=0, n=1,
            )
        )

        def run(key):
            out = fn(tree, key)
            float(np.asarray(jnp.sum(out.responses.astype(jnp.int32))))  # relay sync

        t0 = time.perf_counter()
        run(jax.random.key(1))
        print(f"[{variant}] compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            run(jax.random.key(2 + i))
        dt = (time.perf_counter() - t0) / iters
        tops = per_tok * b * p / dt / 1e12
        print(
            f"[{variant}] {dt * 1e3:.0f} ms for b={b} p={p} prefill+8 steps | "
            f"matmul-only {tops:.0f} eff-TOPS ({tops / 197 * 100:.0f}% of bf16 peak)",
            flush=True,
        )


if __name__ == "__main__":
    main()
