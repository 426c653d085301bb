"""Diagnose the long-context shape's prefill/decode split on the TPU.

Times generate() at gen=8 (~prefill cost) and gen=256 (full) for the long_ctx
bench shape; the difference is decode. Env: DIAG_BATCH, DIAG_PROMPT,
DIAG_CHUNK, DIAG_WQ, DIAG_KV.
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
    b = int(os.environ.get("DIAG_BATCH", "128"))
    p = int(os.environ.get("DIAG_PROMPT", "2048"))
    chunk = int(os.environ.get("DIAG_CHUNK", "256"))
    kv = jnp.int8 if os.environ.get("DIAG_KV", "int8") == "int8" else jnp.bfloat16
    cfg = get_config("3b")
    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
    if os.environ.get("DIAG_WQ", "int8") == "int8":
        from spatialthinker_tpu.ops.quant import quantize_params

        params = jax.jit(quantize_params)(params)
    gen = jax.jit(generate, static_argnames=(
        "cfg", "max_new_tokens", "sampling", "kv_cache_dtype", "prefill_chunk", "n"))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 1000, size=(b, p), dtype=np.int32))
    seg = jnp.ones((b, p), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None, None], (3, b, p))
    gs = jnp.full((b,), p, jnp.int32)
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)

    def run(r, k):
        out = gen(params, cfg, ids, seg, pos, gs, max_new_tokens=r,
                  sampling=sampling, key=k, kv_cache_dtype=kv,
                  prefill_chunk=chunk, n=1)
        float(np.asarray(jnp.sum(out.responses.astype(jnp.int32))))

    def measure(r, ch):
        def go(k):
            out = gen(params, cfg, ids, seg, pos, gs, max_new_tokens=r,
                      sampling=sampling, key=k, kv_cache_dtype=kv,
                      prefill_chunk=ch, n=1)
            float(np.asarray(jnp.sum(out.responses.astype(jnp.int32))))

        go(jax.random.key(0))  # compile
        go(jax.random.key(1))
        t0 = time.perf_counter()
        for i in range(3):
            go(jax.random.key(2 + i))
        dt = (time.perf_counter() - t0) / 3
        print(f"gen={r} chunk={ch}: {dt:.3f}s  ({b * r / dt:.0f} tok/s)", flush=True)

    measure(8, chunk)     # ~prefill cost
    measure(256, chunk)   # full (decode = difference)
    for ch in (512, 1024):
        measure(8, ch)
    measure(256, 1024)


if __name__ == "__main__":
    main()
