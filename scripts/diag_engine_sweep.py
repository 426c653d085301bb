"""Sweep engine/slot/refill configurations of the flagship_sched workload
end-to-end on the chip — the measurement behind the script's shipped paged
config (README "Round-5 result": paged 128 slots / page 1024 = 1.30x anchor
vs continuous@48 1.09x, continuous@64 OOM, paged@48 0.91x).

Runs `bench._measure_host_engine` at the shipped script's rollout shape
(n=8 grouped at 6144/2048; reference sequence budget:
/root/reference/scripts/spatialthinker_3b_grpo.sh) with W8A8 int8 weights.

Env:
  ES_CONFIGS  comma list of engine:slots[:refill] entries
              (default "paged:128:8,paged:96:8,paged:48:8,continuous:48:8")
  ES_B        unique prompts in the queue (64; x8 lanes)
  ES_SHAPE    flagship|long (flagship)
  BENCH_*     the bench knobs pass through (BENCH_PAGE_SIZE, BENCH_WQ, ...)

One JSON line per config on stdout; progress on stderr. ~10 min per
flagship config on a warm compile cache.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: E402


def main():
    bench._enable_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from spatialthinker_tpu.models.qwen2_5_vl import get_config
    from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
    from spatialthinker_tpu.ops.quant import quantize_params

    cfg = get_config(os.environ.get("BENCH_PRESET", "3b"))
    params = jax.jit(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16)
    )(jax.random.key(0))
    if bench.WQ in ("int8", "w4a8"):
        params = jax.jit(
            functools.partial(quantize_params, mode=bench.WQ), donate_argnums=(0,)
        )(params)
    jax.block_until_ready(params)
    print("[sweep] params ready", file=sys.stderr, flush=True)

    b = int(os.environ.get("ES_B", "64"))
    if os.environ.get("ES_SHAPE", "flagship") == "long":
        shape = (b, 2048, 256, "int4", 0, 1, 32)
    else:
        shape = (b, 6144, 2048, "int4", 0, 8, 8)
    configs = os.environ.get(
        "ES_CONFIGS", "paged:128:8,paged:96:8,paged:48:8,continuous:48:8"
    ).split(",")
    for spec in configs:
        parts = spec.strip().split(":")
        eng, slots = parts[0], int(parts[1])
        refill = int(parts[2]) if len(parts) > 2 else 8
        t0 = time.perf_counter()
        try:
            v = bench._measure_host_engine(
                params, cfg, shape, 1, engine=eng,
                slots_override=slots, refill_override=refill,
            )
            out = {"engine": eng, "slots": slots, "refill": refill,
                   "tok_s_chip": round(v, 2),
                   "vs_baseline": round(v / bench.H100_VLLM_3B_TOKS, 4),
                   "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # noqa: BLE001 — record OOMs as data points
            out = {"engine": eng, "slots": slots, "refill": refill,
                   "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
