"""Microbench: int8 vs bf16 matmul on the TPU (validates the W8A8 premise).

Times (a) plain bf16 dot, (b) plain int8 dot (int32 accum), (c) full W8A8:
per-token activation quant + int8 dot + rescale — the op the rollout
quantization path would run. Run on the real chip: python scripts/microbench_int8.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, iters=20):
    sync(fn(*args))  # compile + drain the async dispatch queue
    sync(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    m, k, n = 8192, 2048, 11008
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)
    xi = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    wi = jnp.clip(jnp.round(w.astype(jnp.float32) * 40), -127, 127).astype(jnp.int8)
    w_scale = jnp.full((n,), 1 / 40, jnp.float32)

    @jax.jit
    def bf16_dot(x, w):
        return jnp.dot(x, w)

    @jax.jit
    def int8_dot(xi, wi):
        return jax.lax.dot_general(
            xi, wi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    @jax.jit
    def w8a8(x, wi, w_scale):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x_scale = jnp.maximum(amax, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * x_scale * w_scale[None, :]).astype(jnp.bfloat16)

    flops = 2 * m * k * n
    for name, fn, args in [
        ("bf16", bf16_dot, (x, w)),
        ("int8", int8_dot, (xi, wi)),
        ("w8a8(full)", w8a8, (x, wi, w_scale)),
    ]:
        t = timeit(fn, *args)
        print(f"{name:12s} {t*1e3:8.3f} ms  {flops/t/1e12:8.1f} TF/s", flush=True)

    # decode-shaped: tiny activation, weight-bound (HBM read of W dominates)
    xd = jax.random.normal(key, (128, k), jnp.bfloat16)
    xdi = jnp.clip(jnp.round(xd.astype(jnp.float32)), -127, 127).astype(jnp.int8)
    tb = timeit(bf16_dot, xd, w)
    ti = timeit(int8_dot, xdi, wi)
    wbytes_bf16, wbytes_int8 = k * n * 2, k * n
    print(f"decode bf16  {tb*1e3:8.3f} ms  {wbytes_bf16/tb/1e9:8.1f} GB/s", flush=True)
    print(f"decode int8  {ti*1e3:8.3f} ms  {wbytes_int8/ti/1e9:8.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
