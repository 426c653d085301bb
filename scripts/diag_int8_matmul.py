"""W8A8 matmul pipeline microbench at prefill shapes.

Compares, per shape (M = batch x chunk tokens, K, N):
  bf16      — plain bf16 dot (the no-quantization alternative)
  xla_w8a8  — the production pipeline (ops/quant.quantized_dot: quantize ->
              int8 dot -> dequant as separate XLA stages)
  pallas    — ops/int8_matmul.fused_w8a8_matmul (one fused kernel)

Iterations ride inside one jit (traced loop bound; single relay sync).
Env: IM_M, IM_ITERS.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.ops.int8_matmul import fused_w8a8_matmul
from spatialthinker_tpu.ops.quant import quantize_weight, quantized_dot

SHAPES = [  # (K, N) of the 3B decoder matmuls
    ("qkv", 2048, 2560),
    ("o", 2048, 2048),
    ("gate_up", 2048, 22016),
    ("down", 11008, 2048),
]


def bench_one(name, m, k, n, iters):
    @jax.jit
    def make(key):
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, (m, k), jnp.bfloat16)
        w = jax.random.normal(k2, (k, n), jnp.bfloat16) * 0.02
        return x, w

    x, w = make(jax.random.key(0))
    qw = jax.jit(lambda w: quantize_weight(w, 0))(w)

    def timed(fn):
        @jax.jit
        def loop(x, n_it):
            def body(i, carry):
                x, acc = carry
                # one-element in-place poke keeps x loop-varying (defeats
                # hoisting) without a measurable copy
                x = x.at[0, 0].set(i.astype(x.dtype))
                o = fn(x)
                return (x, acc + o[0, 0].astype(jnp.float32))
            return jax.lax.fori_loop(
                0, n_it, body, (x, jnp.zeros((), jnp.float32))
            )[1]

        float(np.asarray(loop(x, 1)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(loop(x, iters)))
        return (time.perf_counter() - t0) / iters

    flops = 2.0 * m * k * n
    results = {}
    results["bf16"] = timed(lambda xx: jnp.dot(xx, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    results["xla_w8a8"] = timed(lambda xx: quantized_dot(xx, qw, 0))
    # int8-stored weights, bf16 MXU dot (dequant fused by XLA): if XLA's int8
    # dot caps below its bf16 dot, prefill (compute-bound) should dequantize
    # and ride the bf16 path while decode keeps reading int8 bytes
    results["dequant"] = timed(
        lambda xx: jnp.dot(
            xx,
            qw["qvalue"].astype(jnp.bfloat16) * qw["scale"].astype(jnp.bfloat16)[None, :],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    )
    pal = fused_w8a8_matmul(x, qw["qvalue"], qw["scale"])
    if pal is not None:
        results["pallas"] = timed(lambda xx: fused_w8a8_matmul(xx, qw["qvalue"], qw["scale"]))
        # numerics on a small row slice (full-M fp32 copies OOM at gate_up)
        xs_small = x[:2048]
        ref = np.asarray(quantized_dot(xs_small, qw, 0), np.float32)
        got = np.asarray(
            fused_w8a8_matmul(xs_small, qw["qvalue"], qw["scale"]), np.float32
        )
        err = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
        print(f"  [{name}] pallas-vs-xla rel err {err:.4f}", flush=True)
    for path, dt in results.items():
        print(f"  [{name}] {path:9s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} eff TOPS",
              flush=True)


def main():
    m = int(os.environ.get("IM_M", str(128 * 512)))
    iters = int(os.environ.get("IM_ITERS", "10"))
    only = os.environ.get("IM_SHAPES", "")  # comma-separated subset
    for name, k, n in SHAPES:
        if only and name not in only.split(","):
            continue
        bench_one(name, m, k, n, iters)


if __name__ == "__main__":
    main()
