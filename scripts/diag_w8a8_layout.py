"""Probe: XLA W8A8 rate vs weight LAYOUT on the decoder's narrow panels.

Hypothesis: the qkv panel's low eff-TOPS (121 vs gate_up's 276) is the 3D
(Hkv, E, G) weight layout forcing a 3D dot_general — not a property of the
shape itself. If the same panel stored 2D (E, N) hits wide-matmul rates, the
fix is a rollout-tree layout change, not a kernel.

Measures the FULL quantized_dot (activation quantize + int8 dot + scale
fold epilogue) per shape/layout at the long-bench chunk m.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from spatialthinker_tpu.ops.quant import quantize_weight, quantized_dot

# quantized_dot is pure XLA (no Pallas dispatch) — this probe measures the
# production W8A8 pipeline directly; no knob needed.


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, *args, iters=30):
    sync(fn(*args))
    sync(fn(*args))
    start = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    m = int(os.environ.get("DIAG_M", "32768"))
    e = 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, e)).astype(np.float32), jnp.bfloat16)
    xi = jnp.asarray(rng.normal(size=(m, 11008)).astype(np.float32), jnp.bfloat16)

    def w(shape):
        return quantize_weight(
            jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.02,
                        jnp.bfloat16),
            # contract axis: E for qkv3d (axis 1), else 0
            1 if len(shape) == 3 else 0,
        )

    cases = [
        # name, x, weight shape, contract_axis, N total
        ("qkv_3d (Hkv,E,G)", x, (2, e, 1280), 1, 2560),
        ("qkv_2d (E,N)", x, (e, 2560), 0, 2560),
        ("o_2d (E,E)", x, (e, e), 0, 2048),
        ("down_2d (I,E)", xi, (11008, e), 0, 2048),
        ("gate_up (E,2I)", x, (e, 22016), 0, 22016),
    ]
    for name, act, shape, ca, n in cases:
        qw = w(shape)
        k = act.shape[-1]
        fn = jax.jit(lambda a, q=qw, c=ca: quantized_dot(a, q, c))
        t = timeit(fn, act)
        tops = 2 * m * k * n / t / 1e12
        print(f"{name:20s} m={m} k={k} n={n}  {t*1e3:8.3f} ms  {tops:7.1f} eff-TOPS",
              flush=True)


if __name__ == "__main__":
    main()
