"""Split a rollout-bench shape into prefill vs decode time.

Runs the dense engine at a shape twice — gen=GEN_LO (prefill + a few steps)
and gen=GEN_HI — and attributes the difference to decode:
    decode_ms_per_step = (t_hi - t_lo) / (GEN_HI - GEN_LO)
Prints both plus the implied HBM floor for the decode step (weights + KV).

Env: DR_BATCH, DR_PROMPT, DR_GEN (hi), DR_KV, DR_WQ, DR_CHUNK, DR_N.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.models.qwen2_5_vl import get_config
from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
from spatialthinker_tpu.rollout.engine import generate
from spatialthinker_tpu.rollout.sampling import SamplingParams


def main():
    b = int(os.environ.get("DR_BATCH", "128"))
    p = int(os.environ.get("DR_PROMPT", "2048"))
    gen_hi = int(os.environ.get("DR_GEN", "256"))
    gen_lo = int(os.environ.get("DR_GEN_LO", "8"))
    kv_name = os.environ.get("DR_KV", "int8")
    chunk = int(os.environ.get("DR_CHUNK", "256"))
    n = int(os.environ.get("DR_N", "1"))

    cfg = get_config(os.environ.get("DR_PRESET", "3b"))
    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
    jax.block_until_ready(params)
    if os.environ.get("DR_WQ", "int8") == "int8":
        from spatialthinker_tpu.ops.quant import quantize_params

        params = jax.jit(quantize_params)(params)

    kv_dtype = jnp.int8 if kv_name == "int8" else jnp.bfloat16
    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(rng.integers(1, 1000, size=(b, p), dtype=np.int32))
    segment_ids = jnp.ones((b, p), jnp.int32)
    position_ids = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None, None], (3, b, p))
    gen_pos_start = jnp.full((b,), p, jnp.int32)
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)
    gen = jax.jit(
        generate,
        static_argnames=(
            "cfg", "max_new_tokens", "sampling", "kv_cache_dtype", "prefill_chunk", "n"
        ),
    )

    def run(r, key):
        out = gen(
            params, cfg, input_ids, segment_ids, position_ids, gen_pos_start,
            max_new_tokens=r, sampling=sampling, key=key, kv_cache_dtype=kv_dtype,
            prefill_chunk=chunk, n=n,
        )
        float(np.asarray(jnp.sum(out.responses.astype(jnp.int32))))  # relay sync

    def timeit(r):
        run(r, jax.random.key(1))  # compile + warm
        iters = int(os.environ.get("DR_ITERS", "3"))
        t0 = time.perf_counter()
        for i in range(iters):
            run(r, jax.random.key(2 + i))
        return (time.perf_counter() - t0) / iters

    t_lo = timeit(gen_lo)
    print(f"gen={gen_lo}: {t_lo*1e3:.0f} ms", flush=True)
    t_hi = timeit(gen_hi)
    print(f"gen={gen_hi}: {t_hi*1e3:.0f} ms", flush=True)

    step_ms = (t_hi - t_lo) / (gen_hi - gen_lo) * 1e3
    lanes = b * n
    width = -(-(p + gen_hi) // 128) * 128
    t = cfg.text
    kv_cell = 1 if kv_name == "int8" else 2
    kv_gb = (
        2 * t.num_hidden_layers * lanes * t.num_key_value_heads * width
        * (t.head_dim * kv_cell + (2 * 2 if kv_name == "int8" else 0))
    ) / 1e9
    n_params = sum(x.size for x in jax.tree.leaves(params))
    w_gb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params)) / 1e9
    floor_ms = (kv_gb + w_gb) / 840 * 1e3
    # prefill MFU (int8 terms): 2 * params * tokens, vision excluded
    pf_flops = 2 * n_params * b * p
    pf_tops = pf_flops / t_lo / 1e12
    print(
        f"prefill ~{t_lo*1e3:.0f} ms ({pf_tops:.0f} TOPS eff) | "
        f"decode {step_ms:.2f} ms/step vs {floor_ms:.2f} ms floor "
        f"(KV {kv_gb:.2f} GB + W {w_gb:.2f} GB @ 840GB/s) -> "
        f"{floor_ms/step_ms*100:.0f}% of floor | "
        f"decode tok/s = {lanes/step_ms*1e3:.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
