"""Compile-only HBM accounting for the 3B streamed-train grad program.

Lowers + compiles trainer.train_step.make_grad_fn at the bench shape and
prints memory_analysis() — the exact temp/argument/output budget — without
executing. Distinguishes "program genuinely over budget" from relay-side
runtime allocation failures that surface as opaque ResourceExhausted.

Env: TM_SEQ (2048), TM_BS (1), TM_NMICRO (1), TM_PRESET (3b), TM_REMAT (full).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from spatialthinker_tpu.models.qwen2_5_vl import get_config
from spatialthinker_tpu.trainer.train_step import TrainBatch, make_grad_fn


def main():
    seq = int(os.environ.get("TM_SEQ", "2048"))
    micro_bs = int(os.environ.get("TM_BS", "1"))
    n_micro = int(os.environ.get("TM_NMICRO", "1"))
    cfg = get_config(os.environ.get("TM_PRESET", "3b"))

    grad_fn = make_grad_fn(
        cfg,
        clip_ratio_low=0.2, clip_ratio_high=0.3, clip_ratio_dual=3.0,
        use_kl_loss=True, kl_loss_coef=0.01, kl_penalty="low_var_kl",
        max_grad_norm=1.0, remat=os.environ.get("TM_REMAT", "full"),
        chunk_size=128, grad_accum_dtype=jnp.bfloat16,
    )

    # abstract params: no HBM touched for the probe
    from spatialthinker_tpu.models.qwen2_5_vl.model import init_params

    params_shape = jax.eval_shape(
        lambda k: init_params(cfg, k, dtype=jnp.bfloat16), jax.random.key(0)
    )
    params_shape = {"text": params_shape["text"]}
    p = seq // 2
    r = seq - p
    batch = TrainBatch(
        input_ids=jax.ShapeDtypeStruct((n_micro, micro_bs, seq), jnp.int32),
        segment_ids=jax.ShapeDtypeStruct((n_micro, micro_bs, seq), jnp.int32),
        position_ids=jax.ShapeDtypeStruct((n_micro, 3, micro_bs, seq), jnp.int32),
        responses=jax.ShapeDtypeStruct((n_micro, micro_bs, r), jnp.int32),
        response_mask=jax.ShapeDtypeStruct((n_micro, micro_bs, r), jnp.float32),
        old_log_probs=jax.ShapeDtypeStruct((n_micro, micro_bs, r), jnp.float32),
        ref_log_probs=jax.ShapeDtypeStruct((n_micro, micro_bs, r), jnp.float32),
        advantages=jax.ShapeDtypeStruct((n_micro, micro_bs, r), jnp.float32),
    )
    lowered = jax.jit(grad_fn).lower(params_shape, batch)
    print("lowered; compiling...", flush=True)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    print(mem, flush=True)
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(mem, attr, None)
        if v is not None:
            print(f"{attr}: {v / 1e9:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
