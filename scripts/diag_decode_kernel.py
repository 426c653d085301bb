"""Isolate the decode-attention kernel against its HBM floor.

Times ops/decode_attention.decode_attention over a full 36-layer pass at the
long-context bench shape and prints achieved GB/s vs the ~840GB/s v5e peak.
Env: DK_BATCH, DK_WIDTH, DK_KV (int8|bf16), DK_BLOCK_S.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.ops.decode_attention import decode_attention


def main():
    b = int(os.environ.get("DK_BATCH", "128"))
    s = int(os.environ.get("DK_WIDTH", "2304"))
    kv_mode = os.environ.get("DK_KV", "int8")  # int8 | int4 | bf16
    kv_int8 = kv_mode == "int8"
    l, hkv, hq, d = 36, 2, 16, 128

    # block-shape sweep overrides (monkeypatch the pickers so prod code stays
    # knob-free; the measured best goes back into the pickers' defaults)
    import spatialthinker_tpu.ops.decode_attention as da
    bb = os.environ.get("DK_BLOCK_B")
    bs = os.environ.get("DK_BLOCK_S")
    if bb:
        da._pick_block_b = lambda *_a, **_k: int(bb)
    if bs:
        da._pick_block = lambda *_a, **_k: int(bs)
        da.INT4_BLOCK_S_CAP = int(bs)  # the int4 path additionally caps

    # generate ON DEVICE: materializing the 5+GB cache on the host and pushing
    # it through the axon relay costs minutes per array
    if kv_int8:
        @jax.jit
        def make(key):
            k1, k2 = jax.random.split(key)
            shape = (l, b, hkv, s, d)
            k = jax.random.randint(k1, shape, -127, 128, jnp.int8)
            v = jax.random.randint(k2, shape, -127, 128, jnp.int8)
            ks = jnp.full((l, b, hkv, s), 0.01, jnp.bfloat16)
            return k, v, ks, ks
        k, v, ks, vs = make(jax.random.key(0))
        kv_bytes = 2 * l * b * hkv * s * d + 2 * 2 * l * b * hkv * s
    elif kv_mode == "int4":  # packed split-half rows (uint8 marker dtype)
        @jax.jit
        def make(key):
            k1, k2 = jax.random.split(key)
            shape = (l, b, hkv, s // 2, d)
            k = jax.random.randint(k1, shape, 0, 256, jnp.int32).astype(jnp.uint8)
            v = jax.random.randint(k2, shape, 0, 256, jnp.int32).astype(jnp.uint8)
            ks = jnp.full((l, b, hkv, s), 0.01, jnp.bfloat16)
            return k, v, ks, ks
        k, v, ks, vs = make(jax.random.key(0))
        kv_bytes = 2 * l * b * hkv * (s // 2) * d + 2 * 2 * l * b * hkv * s
    else:
        @jax.jit
        def make(key):
            k1, k2 = jax.random.split(key)
            shape = (l, b, hkv, s, d)
            return (jax.random.normal(k1, shape, jnp.bfloat16),
                    jax.random.normal(k2, shape, jnp.bfloat16))
        k, v = make(jax.random.key(0))
        ks = vs = None
        kv_bytes = 2 * 2 * l * b * hkv * s * d
    q = jax.jit(lambda key: jax.random.normal(key, (b, hq, d), jnp.bfloat16))(
        jax.random.key(1)
    )
    seg = jnp.ones((b, s), jnp.int32)

    iters = int(os.environ.get("DK_ITERS", "10"))

    # all iters ride INSIDE one jit call (single scalar fetch at the end):
    # through the axon relay each host->device sync costs real milliseconds,
    # which at a ~10ms kernel inflates a per-pass-fetch measurement badly.
    # The loop bound is a TRACED scalar: with a static bound XLA fully
    # unrolls, duplicating the kernel hundreds of times and blowing the
    # compile up to tens of minutes (the engines use while_loop — dynamic
    # bounds — which is why production never hit this).
    @jax.jit
    def timed(q, k, v, ks, vs, n):
        def body(i, acc):
            o = decode_attention(q, k, v, seg, i % l, ks, vs)
            return acc + jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    t0 = time.perf_counter()
    float(np.asarray(timed(q, k, v, ks, vs, l)))  # compile + 1 warm pass
    print(f"compile+warm in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    float(np.asarray(timed(q, k, v, ks, vs, iters * l)))
    dt = (time.perf_counter() - t0) / iters
    gbs = kv_bytes / dt / 1e9
    print(f"b={b} s={s} kv={kv_mode}: "
          f"{dt*1e3:.2f} ms/pass, {gbs:.0f} GB/s ({gbs/840*100:.0f}% of peak)",
          flush=True)


if __name__ == "__main__":
    main()
