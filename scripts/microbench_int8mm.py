"""Probe: XLA int8 dot vs a minimal Pallas int8 matmul kernel vs bf16.

Question: does XLA's int8 x int8 -> int32 dot hit the native int8 MXU rate
(2x bf16 peak), or does it cap well below — in which case the W8A8 rollout
path should run a Pallas matmul kernel instead.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, iters=30):
    sync(fn(*args))
    sync(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def _mm_kernel(x_ref, w_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def pallas_int8_mm(x, w, bm=512, bn=512, bk=1024):
    m, k = x.shape
    _, n = w.shape
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
    )(x, w)


def main():
    print("backend:", jax.default_backend(), flush=True)
    m, k, n = 8192, 2048, 11008
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(-127, 127, size=(m, k), dtype=np.int32), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, size=(k, n), dtype=np.int32), jnp.int8)
    x = xi.astype(jnp.bfloat16)
    w = wi.astype(jnp.bfloat16)

    @jax.jit
    def bf16_dot(x, w):
        return jnp.dot(x, w)

    @jax.jit
    def xla_int8(xi, wi):
        return jax.lax.dot_general(
            xi, wi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    flops = 2 * m * k * n
    for name, fn, args in [
        ("bf16", bf16_dot, (x, w)),
        ("xla_int8", xla_int8, (xi, wi)),
        ("pallas_int8", pallas_int8_mm, (xi, wi)),
    ]:
        t = timeit(fn, *args)
        print(f"{name:12s} {t*1e3:8.3f} ms  {flops/t/1e12:8.1f} TF/s", flush=True)
        # correctness spot-check for the pallas kernel
    ref = np.asarray(xla_int8(xi[:256], wi))
    out = np.asarray(pallas_int8_mm(xi[:256], wi, bm=256))
    np.testing.assert_array_equal(out, ref)
    print("pallas == xla int32 exact", flush=True)


if __name__ == "__main__":
    main()
