"""Bisect the paged decode program at flagship scale on the chip.

Stages (PD_STAGE):
  kernel  - one paged_attention call, backend forced to pallas (errors surface)
  step    - decode_chunk_paged jitted + donated, flagship-scale state
Env: PD_SLOTS (64), PD_PAGES (2049), PD_PAGE (256), PD_KV (int4|int8|bf16),
     PD_CHUNK (8), PD_ITERS (3), PD_LEN (6144 filled cells per slot),
     PD_I8DOT (0; int4 only — both attention dots on the int8 MXU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.models.qwen2_5_vl import get_config


def main():
    stage = os.environ.get("PD_STAGE", "kernel")
    slots = int(os.environ.get("PD_SLOTS", "64"))
    pages = int(os.environ.get("PD_PAGES", "2049"))
    page_size = int(os.environ.get("PD_PAGE", "256"))
    kv = os.environ.get("PD_KV", "int4")
    filled = int(os.environ.get("PD_LEN", "6144"))
    cfg = get_config(os.environ.get("PD_PRESET", "3b"))
    t = cfg.text
    l, hkv, hq, d = (t.num_hidden_layers, t.num_key_value_heads,
                     t.num_attention_heads, t.head_dim)
    kv_dtype = {"int8": jnp.int8, "int4": jnp.uint8}.get(kv, jnp.bfloat16)
    i8dot = os.environ.get("PD_I8DOT", "0") == "1"
    # page-table width: what the ENGINE would allocate for this run's total
    # sequence width (prompt+gen; PD_WIDTH) — a too-wide table sweeps dummy
    # pages (fetched, fully masked) and inflates the measurement
    width = int(os.environ.get("PD_WIDTH", str(6144 + 2048)))
    p_max = -(-width // page_size) + 1

    if stage == "kernel":
        from spatialthinker_tpu.ops.paged_attention import paged_attention

        # PD_STAGED=1: include a dummy staging-ring block (width PD_STWIDTH,
        # default 128) so the kernel's fused staged update is measured too
        staged_on = os.environ.get("PD_STAGED", "0") == "1"
        st_width = int(os.environ.get("PD_STWIDTH", "128"))
        rows = page_size // 2 if kv == "int4" else page_size

        @jax.jit
        def make(key):
            ks = jax.random.split(key, 4)
            shape = (l, pages, hkv, rows, d)
            if kv == "int4":
                k = jax.random.randint(ks[0], shape, 0, 256, jnp.int32).astype(jnp.uint8)
                v = jax.random.randint(ks[1], shape, 0, 256, jnp.int32).astype(jnp.uint8)
            elif kv == "int8":
                k = jax.random.randint(ks[0], shape, -127, 128, jnp.int8)
                v = jax.random.randint(ks[1], shape, -127, 128, jnp.int8)
            else:
                k = jax.random.normal(ks[0], shape, jnp.bfloat16)
                v = jax.random.normal(ks[1], shape, jnp.bfloat16)
            sc = (jnp.full((l, pages, hkv, page_size), 0.01, jnp.bfloat16)
                  if kv in ("int4", "int8") else None)
            q = jax.random.normal(ks[2], (slots, hq, d), jnp.bfloat16)
            return k, v, sc, q

        k, v, sc, q = make(jax.random.key(0))
        # each slot's table points at distinct pages (worst-case DMA spread)
        pt = np.zeros((slots, p_max), np.int32)
        n_used = filled // page_size
        pid = 1
        for s in range(slots):
            for j in range(n_used):
                pt[s, j] = 1 + ((pid - 1) % (pages - 1))
                pid += 1
        pt = jnp.asarray(pt)
        lengths = jnp.full((slots,), filled, jnp.int32)
        staged = None
        if staged_on:
            kst = jax.random.randint(
                jax.random.key(9), (l, slots, hkv, st_width, d), -7, 8, jnp.int32
            ).astype(jnp.int8)
            vst = jax.random.randint(
                jax.random.key(10), (l, slots, hkv, st_width, d), -7, 8, jnp.int32
            ).astype(jnp.int8)
            quant = kv in ("int4", "int8")
            sks = (jnp.full((l, slots, hkv, st_width), 0.01, jnp.bfloat16)
                   if quant else None)
            if not quant:
                kst = kst.astype(jnp.bfloat16)
                vst = vst.astype(jnp.bfloat16)
            seg = jnp.ones((slots, st_width), jnp.int32)
            staged = (kst, vst, sks, sks, seg)

        @jax.jit
        def timed(q, k, v, sc, n):
            def body(i, acc):
                o = paged_attention(q, k, v, pt, lengths, i % l, sc, sc,
                                    backend="pallas", int4_i8dot=i8dot,
                                    staged=staged)
                return acc + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        t0 = time.perf_counter()
        float(np.asarray(timed(q, k, v, sc, l)))
        print(f"kernel compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
        iters = int(os.environ.get("PD_ITERS", "5"))
        t0 = time.perf_counter()
        float(np.asarray(timed(q, k, v, sc, iters * l)))
        dt = (time.perf_counter() - t0) / iters
        elem = {"int4": 0.5, "int8": 1.0}.get(kv, 2.0)
        kv_bytes = 2 * l * slots * hkv * filled * d * elem
        if elem < 2:
            kv_bytes += 2 * 2 * l * slots * hkv * filled
        print(f"paged kernel: {dt * 1e3:.2f} ms/36-layer pass "
              f"({kv_bytes / dt / 1e9:.0f} GB/s effective, filled={filled})",
              flush=True)
        return

    # stage == "step": full decode_chunk_paged with donation at flagship scale
    from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
    from spatialthinker_tpu.ops.quant import quantize_params
    from spatialthinker_tpu.rollout.paged import decode_chunk_paged, init_paged_state
    from spatialthinker_tpu.rollout.sampling import SamplingParams
    import functools

    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
    wq = os.environ.get("PD_WQ", "int8")
    if wq in ("int8", "w4a8"):
        params = jax.jit(functools.partial(quantize_params, mode=wq),
                         donate_argnums=(0,))(params)
    fuse = os.environ.get("PD_FUSE", "0") == "1"
    state = init_paged_state(cfg, slots + 1, pages, page_size, p_max, 2048,
                             jax.random.key(1), kv_dtype,
                             stage_width=int(os.environ.get("PD_CHUNK", "8")),
                             fuse_staged=fuse)
    pt = np.zeros((slots + 1, p_max), np.int32)
    n_used = filled // page_size
    pid = 1
    for s in range(slots):
        for j in range(n_used + 1):
            pt[s, j] = 1 + ((pid - 1) % (pages - 1))
            pid += 1
    state = state._replace(
        page_table=jnp.asarray(pt),
        length=jnp.full((slots + 1,), filled, jnp.int32).at[-1].set(0),
        active=jnp.ones((slots + 1,), bool).at[-1].set(False),
        finished=jnp.zeros((slots + 1,), bool).at[-1].set(True),
        gen_pos=jnp.full((slots + 1,), filled, jnp.int32),
        cur_tokens=jnp.full((slots + 1,), 11, jnp.int32),
    )
    decode_jit = jax.jit(
        decode_chunk_paged,
        static_argnames=("cfg", "sampling", "chunk", "int4_i8dot",
                         "fuse_staged"),
        donate_argnums=(2,),
    )
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)
    chunk = int(os.environ.get("PD_CHUNK", "8"))
    t0 = time.perf_counter()
    state = decode_jit(params, cfg, state, sampling, chunk, int4_i8dot=i8dot,
                       fuse_staged=fuse)
    float(np.asarray(jnp.sum(state.length)))
    print(f"step compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    iters = int(os.environ.get("PD_ITERS", "3"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = decode_jit(params, cfg, state, sampling, chunk, int4_i8dot=i8dot,
                           fuse_staged=fuse)
        float(np.asarray(jnp.sum(state.length)))
    dt = (time.perf_counter() - t0) / iters / chunk
    print(f"decode step: {dt * 1e3:.2f} ms/token-step "
          f"(slots={slots}, filled~{filled}, kv={kv}, wq={wq}, i8dot={i8dot}, "
          f"fuse={fuse})", flush=True)


if __name__ == "__main__":
    main()
