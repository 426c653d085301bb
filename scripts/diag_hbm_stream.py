"""Empirical HBM read bandwidth ceiling for this chip.

Times an XLA full-array reduction (pure streaming read) over an int8 buffer
sized like the long-context KV cache; iterations ride inside one jit so the
axon relay sync cost is amortized. This is the number the decode kernel's
"% of peak" should really be judged against (the nominal 840GB/s assumes
ideal access patterns and no relay).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    gb = float(os.environ.get("HS_GB", "5.4"))
    iters = int(os.environ.get("HS_ITERS", "20"))
    n = int(gb * 1e9 // (1024 * 512)) * 1024  # rows of 512 bytes
    x = jnp.ones((n + 8, 512), jnp.int8)  # 8 spare rows for the rotating slice

    @jax.jit
    def timed(x):
        def body(i, acc):
            # the summed operand must be LOOP-VARYING or XLA hoists the whole
            # reduction out of the loop (measured: a loop-invariant sum here
            # reported an impossible 3.1TB/s on a v5e)
            win = jax.lax.dynamic_slice(x, (i % 8, 0), (n, 512))
            return acc + jnp.sum(win.astype(jnp.int32)) + i
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.int32))

    float(np.asarray(timed(x)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(timed(x)))
    dt = (time.perf_counter() - t0) / iters
    bw = x.size / dt / 1e9
    print(f"stream {x.size/1e9:.2f} GB int8 sum: {dt*1e3:.2f} ms -> {bw:.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()
