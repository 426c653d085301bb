"""Isolate the decode-attention kernel against its HBM floor.

Times ops/decode_attention.decode_attention over a full 36-layer pass at the
long-context bench shape and prints achieved GB/s vs the ~840GB/s v5e peak.
Env: DK_BATCH, DK_WIDTH, DK_KV (int8|bf16), DK_BLOCK_S.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.ops.decode_attention import decode_attention


def main():
    b = int(os.environ.get("DK_BATCH", "128"))
    s = int(os.environ.get("DK_WIDTH", "2304"))
    kv_int8 = os.environ.get("DK_KV", "int8") == "int8"
    l, hkv, hq, d = 36, 2, 16, 128

    rng = np.random.default_rng(0)
    if kv_int8:
        k = jnp.asarray(rng.integers(-127, 127, size=(l, b, hkv, s, d), dtype=np.int8))
        v = jnp.asarray(rng.integers(-127, 127, size=(l, b, hkv, s, d), dtype=np.int8))
        ks = jnp.full((l, b, hkv, s), 0.01, jnp.bfloat16)
        vs = jnp.full((l, b, hkv, s), 0.01, jnp.bfloat16)
        kv_bytes = 2 * l * b * hkv * s * d + 2 * 2 * l * b * hkv * s
    else:
        k = jnp.asarray(rng.normal(size=(l, b, hkv, s, d)).astype(np.float32), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(l, b, hkv, s, d)).astype(np.float32), jnp.bfloat16)
        ks = vs = None
        kv_bytes = 2 * 2 * l * b * hkv * s * d
    q = jnp.asarray(rng.normal(size=(b, hq, d)).astype(np.float32), jnp.bfloat16)
    seg = jnp.ones((b, s), jnp.int32)

    @jax.jit
    def full_pass(q, k, v, ks, vs):
        def body(i, acc):
            o = decode_attention(q, k, v, seg, i, ks, vs)
            return acc + jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, l, body, jnp.zeros((), jnp.float32))

    float(np.asarray(full_pass(q, k, v, ks, vs)))  # compile
    float(np.asarray(full_pass(q, k, v, ks, vs)))  # warm
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        float(np.asarray(full_pass(q, k, v, ks, vs)))
    dt = (time.perf_counter() - t0) / iters
    gbs = kv_bytes / dt / 1e9
    print(f"b={b} s={s} kv={'int8' if kv_int8 else 'bf16'}: "
          f"{dt*1e3:.2f} ms/pass, {gbs:.0f} GB/s ({gbs/840*100:.0f}% of peak)",
          flush=True)


if __name__ == "__main__":
    main()
