"""Bisect the continuous-engine decode_chunk on the chip.

The e2e bench measured the continuous engine at ~255 tok/s on the long shape
while its per-phase trace attributes ~66 s per 64-step chunk to the decode
program itself (~1 s/token-step vs the dense engine's ~6 ms). This stages the
program in isolation:

  CD_STAGE=step     - decode_chunk jitted + donated at the bench shape
  CD_STAGE=scatter  - just the per-slot KV scatter (the only structural
                      difference from the dense engine's uniform-position
                      dynamic_update_slice), timed over CD_CHUNK iterations

Env: CD_SLOTS (136), CD_WIDTH (2304), CD_KV (int4), CD_WQ (int8),
     CD_CHUNK (16), CD_ITERS (3), CD_PRESET (3b).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.models.qwen2_5_vl import get_config


def main():
    stage = os.environ.get("CD_STAGE", "step")
    slots = int(os.environ.get("CD_SLOTS", "136"))
    width = int(os.environ.get("CD_WIDTH", "2304"))
    kv = os.environ.get("CD_KV", "int4")
    chunk = int(os.environ.get("CD_CHUNK", "16"))
    iters = int(os.environ.get("CD_ITERS", "3"))
    cfg = get_config(os.environ.get("CD_PRESET", "3b"))
    kv_dtype = {"int8": jnp.int8, "int4": jnp.uint8}.get(kv, jnp.bfloat16)

    from spatialthinker_tpu.rollout.continuous import decode_chunk, init_slot_state
    from spatialthinker_tpu.rollout.sampling import SamplingParams

    if stage == "scatter":
        t = cfg.text
        l, hkv, d = t.num_hidden_layers, t.num_key_value_heads, t.head_dim
        rows = width // 2 if kv == "int4" else width
        dt_ = jnp.uint8 if kv == "int4" else (jnp.int8 if kv == "int8" else jnp.bfloat16)
        cache = jnp.zeros((l, slots, hkv, rows, d), dt_)
        write_pos = jnp.full((slots,), width - 40, jnp.int32) + (
            jnp.arange(slots, dtype=jnp.int32) % 7
        )
        newv = jnp.ones((slots, hkv, d), jnp.int8)

        def one(cache, i):
            slot_idx = jnp.arange(slots)
            if kv == "int4":
                half = cache.shape[3]
                row = write_pos % half
                merged = jax.lax.bitcast_convert_type(newv, jnp.uint8)
                cache = cache.at[i % l, slot_idx, :, row].set(merged)
            else:
                cache = cache.at[i % l, slot_idx, :, write_pos].set(
                    newv.astype(cache.dtype)
                )
            return cache

        @jax.jit
        def run(cache, n):
            def body(i, c):
                return one(c, i)
            return jax.lax.fori_loop(0, n, body, cache)

        cache = run(cache, 2)
        float(np.asarray(jnp.sum(cache[0, 0, 0, 0].astype(jnp.int32))))
        t0 = time.perf_counter()
        cache = run(cache, iters * l)
        float(np.asarray(jnp.sum(cache[0, 0, 0, 0].astype(jnp.int32))))
        dt = (time.perf_counter() - t0) / (iters * l)
        print(f"scatter: {dt * 1e3:.3f} ms per layer-write (slots={slots})",
              flush=True)
        return

    from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
    from spatialthinker_tpu.ops.quant import quantize_params

    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
    wq = os.environ.get("CD_WQ", "int8")
    if wq in ("int8", "w4a8"):
        params = jax.jit(functools.partial(quantize_params, mode=wq),
                         donate_argnums=(0,))(params)
    # prompt_len sets the cache width; max_new small (responses buffer)
    state = init_slot_state(cfg, slots, width - 256, 256, jax.random.key(1), kv_dtype)
    filled = width - 300
    state = state._replace(
        length=jnp.full((slots,), filled, jnp.int32),
        gen_pos=jnp.full((slots,), filled, jnp.int32),
        cur_tokens=jnp.full((slots,), 11, jnp.int32),
        active=jnp.ones((slots,), bool),
        kv_seg=(jnp.arange(state.kv_seg.shape[1])[None] < filled).astype(jnp.int32)
        .repeat(slots, 0),
    )
    decode_jit = jax.jit(
        decode_chunk, static_argnames=("cfg", "sampling", "chunk"),
        donate_argnums=(2,),
    )
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)
    t0 = time.perf_counter()
    state = decode_jit(params, cfg, state, sampling, chunk)
    float(np.asarray(jnp.sum(state.length)))
    print(f"step compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = decode_jit(params, cfg, state, sampling, chunk)
        float(np.asarray(jnp.sum(state.length)))
    dt = (time.perf_counter() - t0) / iters / chunk
    print(f"decode step: {dt * 1e3:.2f} ms/token-step "
          f"(slots={slots}, width={width}, kv={kv}, wq={wq})", flush=True)


if __name__ == "__main__":
    main()
