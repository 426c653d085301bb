"""Benchmark: rollout decode throughput on the flagship model (Qwen2.5-VL-3B
shapes, random weights) on real TPU hardware.

Prints ONE JSON line. The headline metric is the GRPO TRAINING shape (prompt
2048 / gen 256, rollout.n=5 grouped sampling — what the trainer actually
runs); the short-context, distinct-prompt long-context, and flagship
(prompt 6144 / gen 2048, the reference scripts' sequence budget) numbers are
carried alongside, plus a GRPO update-step entry (tok/s + MFU):
  {"metric": "rollout_tokens_per_sec_per_chip_grpo", "value": N,
   "unit": "tok/s/chip", "vs_baseline": N / H100_VLLM_3B_TOKS,
   "short_ctx": {...}, "long_ctx": {...}, "flagship_ctx": {...},
   "train": {...}, "config": {...}}

Baseline anchor: the reference rolls out with vLLM on H100-class GPUs
(BASELINE.md: "rollout tokens/sec/chip >= H100-class on a v5p-8" is the
north-star). The repo publishes no number, so we anchor against a nominal
2800 tok/s/GPU for Qwen2.5-VL-3B bf16 decode on one H100 — vs_baseline > 1.0
means faster than that anchor per chip.

Rollout weights are W8A8 int8 by default (rollout.quantization=int8, the
framework's vLLM-quantization-parity knob; BENCH_WQ=none for bf16) — recorded
in each shape's config.

BENCH_MODE=train measures ONLY the update-step entry. BENCH_SHAPE selects a
single rollout shape (short|long|grpo|flagship) or "all" (default:
short+long+grpo+flagship+sched+train; headline = grpo).

The default run additionally records, each alarm-guarded so a stall can't
lose the numbers above it (order: train -> sched entries -> train_3b, with
a wall-time slot RESERVED for train_3b so nothing can starve it):
  train     — update step at the 1b preset (fused in-place AdamW);
  continuous_long_ctx / paged_long_ctx — the vLLM-scheduler replacement
    engines at the long shape, 256 prompts through BENCH_SCHED_SLOTS=128
    slots (exercises slot refill / page-pool admission);
    BENCH_SKIP_SCHED=1 skips, BENCH_SCHED_BUDGET seconds (1000).
  flagship_sched — the shipped script's rollout workload (n=8 grouped at
    6144/2048) through the engine the script selects;
  train_3b  — the 3B text stack via the host-streamed optimizer, moment
    streaming SAMPLED and extrapolated by bytes (full-stream transfers are
    relay-rate here; BENCH_STREAM_SAMPLE slices, default 4)
    (BENCH_SKIP_TRAIN3B=1 skips, BENCH_TRAIN3B_BUDGET seconds).

All sections share a persistent XLA compilation cache (.jax_cache/,
verified to hit through the axon relay) — a pre-warmed run is mostly
compile-free, which is what fits the suite in the driver's wall budget.
"""

from __future__ import annotations

import json
import os
import time


H100_VLLM_3B_TOKS = 2800.0  # nominal anchor, see module docstring


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, repo-local (gitignored). Verified to
    HIT through the axon relay (executables serialize/deserialize), where a
    single remote compile costs minutes — a pre-warmed cache is the
    difference between the default run fitting the driver's wall budget and
    BENCH_r04.json's rc=124. BENCH_NO_CACHE=1 disables."""
    if os.environ.get("BENCH_NO_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass

PRESET = os.environ.get("BENCH_PRESET", "3b")
SHAPE = os.environ.get("BENCH_SHAPE", "all")
WQ = os.environ.get("BENCH_WQ", "int8")
# which rollout engine serves the shapes: the dense grouped-fanout engine
# (default), the continuous slot-refill engine, or the paged pool engine
# (the vLLM-scheduler replacements — BENCH_ENGINE={continuous,paged} records
# their on-chip numbers; VERDICT r3 task 1)
ENGINE = os.environ.get("BENCH_ENGINE", "dense")
# int4 decode attention with both dots on the int8 MXU (nibbles unpacked to
# int8 lanes; q + softmax weights quantized per row in-register, scales
# recovered exactly in the f32 epilogues): measured 11.37 vs 14.68 ms/pass at
# the flagship decode shape (b=64, width 8192) and 15.17 vs 16.8 at
# b=256/2304 — the default for the int4-KV shapes. BENCH_I8DOT=0 reverts to
# the bf16-lane kernel.
I8DOT = os.environ.get("BENCH_I8DOT", "1") == "1"


def train_bench() -> dict:
    """GRPO update tok/s + MFU. Default preset 1b (~1.2B-param text stack: the
    largest Qwen-shaped config whose bf16-moment AdamW state + full-remat
    activations fit one 16GB chip at seq 4096; fp32-moment AdamW already
    exceeds HBM at 1B+, and the Kahan compensation buffer is the marginal
    2.4GB that tips it back over — see BENCH_KAHAN below)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spatialthinker_tpu.models.qwen2_5_vl import get_config
    from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
    from spatialthinker_tpu.trainer.train_step import TrainBatch, make_optimizer, make_update_fn

    preset = os.environ.get("BENCH_TRAIN_PRESET", "1b")
    cfg = get_config(preset)
    params = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
    # text-only update bench: a frozen vision tower would contribute zero
    # grads and zero FLOPs but still hold params + bf16 moments + a grad
    # accumulator (~5GB at the 1b preset's 670M-param tower) — excluded,
    # matching the MFU accounting below (text FLOPs only)
    params = {"text": params["text"]}
    # no Kahan compensation at the 1B bench scale: the buffer is one param
    # copy of HBM (2.5GB) — the difference between 1B fitting and OOM
    # (params 2.5 + grads 2.5 + bf16 moments 5.1 leaves ~3G for activations)
    kahan = os.environ.get("BENCH_KAHAN", "0") == "1"
    # BENCH_STREAM_OPT=1: host-streamed optimizer (trainer/streamed_opt.py) —
    # moments live on the host and stream through in layer slices, which is
    # what fits the 3B preset on one 16GB chip (fused needs 22.4GB; VERDICT
    # r3 task 3). The grad program jits alone; the apply runs host-side.
    stream = os.environ.get("BENCH_STREAM_OPT", "0") == "1"
    common_update = dict(
        clip_ratio_low=0.2, clip_ratio_high=0.3, clip_ratio_dual=3.0,
        use_kl_loss=True, kl_loss_coef=0.01, kl_penalty="low_var_kl",
        max_grad_norm=1.0,
        # "full" remat: the "dots" policy's saved gate_up stack is 6GB at
        # 1B/seq-4096 — full recompute is what fits 1B+ on one 16GB chip
        remat=os.environ.get("BENCH_REMAT", "full"),
        chunk_size=int(os.environ.get("BENCH_TRAIN_CHUNK", "128")),
        grad_accum_dtype=jnp.bfloat16,
    )
    offload_s = [0.0]
    # BENCH_STREAM_SAMPLE>0: only the first N layer slices actually round-trip
    # through the relay; their measured wall time extrapolates to the full
    # moment tree BY BYTES (streamed_opt.apply sample_slices). The full stream
    # is ~22 GB/step — at this host's relay rate (~20-40 MB/s, PCIe would be
    # ~10 GB/s) a full apply is >12 min and un-benchable; the sampled number
    # is labeled in the config dict.
    sample = int(os.environ.get("BENCH_STREAM_SAMPLE", "0"))
    sample_deficit = [0.0]  # (extrapolated - actually measured) per timed iter
    if stream:
        from spatialthinker_tpu.trainer.streamed_opt import StreamedAdamW
        from spatialthinker_tpu.trainer.train_step import make_grad_fn

        opt = StreamedAdamW(
            1e-6, use_kahan_summation=kahan,
            layer_chunk=int(os.environ.get("BENCH_STREAM_CHUNK", "4")),
        )
        opt_state = opt.init(params)  # host numpy (12.4GB at 3B)
        grad_jit = jax.jit(make_grad_fn(cfg, **common_update))
    else:
        opt = make_optimizer(1e-6, strategy="adamw_bf16", use_kahan_summation=kahan)
        opt_state = opt.init(params)
        update = jax.jit(
            make_update_fn(cfg, opt, **common_update),
            donate_argnums=(0, 1),  # in-place params/opt update (no double buffer)
        )
    # n_micro=1 matters at the 3B scale: micro-batch accumulation holds the
    # grad accumulator AND the current micro's grads live together — 2x 6.2GB
    # at 3B bf16, the difference between fitting and OOM on one 16GB chip
    n_micro = int(os.environ.get("BENCH_TRAIN_NMICRO", "2"))
    micro_bs = int(os.environ.get("BENCH_TRAIN_BS", "4"))
    p = r = int(os.environ.get("BENCH_TRAIN_SEQ", "4096")) // 2
    s = p + r
    rng = np.random.default_rng(0)
    bs = n_micro * micro_bs
    ids = rng.integers(1, 100_000, size=(bs, s), dtype=np.int32)
    batch = TrainBatch(
        input_ids=jnp.asarray(ids.reshape(n_micro, micro_bs, s)),
        segment_ids=jnp.ones((n_micro, micro_bs, s), jnp.int32),
        position_ids=jnp.asarray(
            np.tile(np.arange(s, dtype=np.int32)[None, None, None], (n_micro, 3, micro_bs, 1))
        ),
        responses=jnp.asarray(ids[:, p:].reshape(n_micro, micro_bs, r)),
        response_mask=jnp.ones((n_micro, micro_bs, r), jnp.float32),
        old_log_probs=jnp.zeros((n_micro, micro_bs, r), jnp.float32) - 3,
        ref_log_probs=jnp.zeros((n_micro, micro_bs, r), jnp.float32) - 3,
        advantages=jnp.asarray(rng.normal(size=(n_micro, micro_bs, r)).astype(np.float32)),
    )

    def run():
        nonlocal params, opt_state
        if stream:
            grads, metrics, finite, factor = grad_jit(params, batch)
            float(np.asarray(metrics["actor/loss"]))  # sync the grad program
            t0 = time.perf_counter()
            params, opt_state = opt.apply(
                params, grads, opt_state, finite=finite, grad_scale=factor,
                sample_slices=sample,
            )
            apply_s = time.perf_counter() - t0
            if sample:
                st = opt.last_apply_stats
                extrap = apply_s * st["total_bytes"] / max(st["measured_bytes"], 1)
                sample_deficit[0] += extrap - apply_s
                offload_s[0] = extrap  # full-stream moment round-trip estimate
            else:
                offload_s[0] = apply_s  # measured moment round-trip cost
            return
        params, opt_state, metrics = update(params, opt_state, batch)
        float(np.asarray(metrics["actor/loss"]))  # sync through the relay

    run()  # compile
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    sample_deficit[0] = 0.0
    start = time.perf_counter()
    for _ in range(iters):
        run()
    # sampled streaming: charge the timed loop the extrapolated full-stream
    # cost, not just the slices that actually round-tripped
    elapsed = time.perf_counter() - start + sample_deficit[0]
    tokens = bs * s * iters

    from spatialthinker_tpu.utils.flops_counter import FlopsCounter, compute_mfu

    mfu = compute_mfu(FlopsCounter(cfg), [s] * bs, elapsed / iters, n_chips=1)
    out = {
        "metric": "grpo_update_tokens_per_sec_per_chip",
        "value": round(tokens / elapsed, 2),
        "unit": "tok/s/chip",
        "steps_per_hr": round((iters / elapsed) * 3600, 1),
        "mfu": round(mfu, 4),
        "config": {"preset": preset, "seq": s, "micro_bs": micro_bs,
                   "n_micro": n_micro, "remat": os.environ.get("BENCH_REMAT", "full"),
                   "kahan": kahan, "stream_opt": stream,
                   **({"offload_s_per_step": round(offload_s[0], 2)} if stream else {}),
                   **({"stream_sample": {
                       "slices_measured": opt.last_apply_stats["measured_slices"],
                       "bytes_measured": opt.last_apply_stats["measured_bytes"],
                       "bytes_total": opt.last_apply_stats["total_bytes"],
                       "note": ("offload_s_per_step extrapolated by bytes from "
                                "the measured slices (relay-rate transfers; "
                                "full stream is un-benchable on this host)"),
                   }} if stream and sample else {})},
    }
    if stream and offload_s[0] > 0:
        # the moment round trip rides this host's axon relay (relay-rate,
        # not PCIe-rate) — also report the compute MFU with the transfer
        # normalized out, which is what a real TPU host would approach
        ex = elapsed / iters - offload_s[0]
        if ex > 0:
            out["mfu_ex_offload"] = round(
                compute_mfu(FlopsCounter(cfg), [s] * bs, ex, n_chips=1), 4
            )
            out["value_ex_offload"] = round(bs * s / ex, 2)
            out["config"]["offload_note"] = (
                "offload_s_per_step is relay-rate on this host; "
                "mfu_ex_offload removes it"
            )
    return out


# (batch, prompt, gen, kv_dtype, prefill_chunk, group_n) — memory-validated on
# a 16GB v5e with int8 weights. "grpo" is the training workload: rollout.n
# samples per prompt, prompt prefilled ONCE with KV fanout (engine.generate
# n>1); batch counts UNIQUE prompts there (64 x 5 = 320 decode lanes).
# "flagship" is the reference scripts' full sequence budget
# (/root/reference/scripts/spatialthinker_3b_grpo.sh:33-34).
#
# Long/grpo/flagship default to int4 KV: the packed cache admits ~2x the
# decode lanes at the same HBM, and the biased-nibble kernel reads it at
# int8's wall time — measured 2534 -> 2715 (long, b128 int8 -> b256 int4),
# 5028 -> 6720 (grpo, b26 -> b64), 1964 -> 2348 (flagship, b32 -> b64).
# Long/flagship additionally default to rows-mode prefill (batch-chunked,
# full sequence length): long 2715 -> 2918 (1.04x anchor), flagship
# 2348 -> 2603 (0.93x) — same activation bound as seq chunks, unchunked MFU.
# final field = prefill_rows: > 0 prefills in row groups at FULL sequence
# length (no per-chunk pass over the live cache prefix, one weight read per
# group) instead of sequence chunks — same rows*P activation bound as
# b*chunk, higher measured prefill MFU at uniform prompt lengths.
SHAPES = {
    "short": (256, 128, 128, "bfloat16", 0, 1, 0),
    "long": (
        int(os.environ.get("BENCH_BATCH", "256")),
        int(os.environ.get("BENCH_PROMPT", "2048")),
        int(os.environ.get("BENCH_GEN", "256")),
        os.environ.get("BENCH_KV", "int4"),
        # chunk 256 at batch 256: 512-chunks put 131k token-rows in one
        # prefill forward (5.4GB gate_up temp, OOM); rows-mode bounds the
        # same memory as 32-row groups at the unchunked MFU instead
        int(os.environ.get("BENCH_CHUNK", "0")),
        1,
        int(os.environ.get("BENCH_ROWS", "32")),
    ),
    "grpo": (
        int(os.environ.get("BENCH_GRPO_BATCH", "64")), 2048, 256,
        os.environ.get("BENCH_GRPO_KV", "int4"), 512, 5,
        int(os.environ.get("BENCH_GRPO_ROWS", "0")),
    ),
    "flagship": (
        # b=64 is the HBM ceiling: the packed int4 k+v caches are 70MB/row at
        # width 8192 (b=80 and b=96 ResourceExhausted at runtime; b=128 fails
        # compile needing 2x4.5GB cache zero-inits) — measured 2026-08 with
        # int8 weights + rows-mode prefill
        int(os.environ.get("BENCH_FLAGSHIP_BATCH", "64")),
        6144, 2048, os.environ.get("BENCH_FLAGSHIP_KV", "int4"),
        int(os.environ.get("BENCH_FLAGSHIP_CHUNK", "0")), 1,
        int(os.environ.get("BENCH_FLAGSHIP_ROWS", "8")),
    ),
}
# decode dominates the flagship shape (2048 steps); 2 timed iters keep the
# whole suite inside the driver budget without moving the number. The long
# shape is the most expensive per run (524k tokens) — 1 timed iter after the
# full warm run is stable and saves ~6 min of the driver's wall budget.
SHAPE_ITERS = {"flagship": 2, "long": 1}

# the shipped script's actual rollout workload (scripts/spatialthinker_3b_grpo.sh:
# rollout.n=8 grouped sampling at 6144/2048), measured through the continuous
# engine's slot cap — the dense flagship entry above is a single decode wave
# of n=1 unique prompts, NOT the training workload (VERDICT r4 tasks 4+9).
# 64 unique prompts x8 = 512 lanes through 48 slots (the measured 16GB fit,
# see the fs_slots comment below). Queue depth matters: a finite bench queue
# ends with a tail wave decoding at partial occupancy for its full 2048
# steps — at 32 uniques that tail is ~1/6 of the run (measured 2,781 tok/s =
# 0.99x); at 64 uniques it amortizes to 3,043 = 1.09x, which is the more
# representative number for the script's 512-prompt production queue.
FLAGSHIP_SCHED_SHAPE = (
    int(os.environ.get("BENCH_FSCHED_B", "64")), 6144, 2048,
    os.environ.get("BENCH_FLAGSHIP_KV", "int4"),
    int(os.environ.get("BENCH_FLAGSHIP_CHUNK", "0")),
    8,  # group_n — the script's rollout.n
    int(os.environ.get("BENCH_FLAGSHIP_ROWS", "8")),
)


def _pool_pages(cfg, page_size: int, kv_dtype, prompt: int, u_batch: int,
                rows: int, params=None) -> int:
    """Page-pool size from free HBM (mirrors trainer._paged_pool_size_uncached
    including the refill-prefill transient reserve; 0 = let the engine fall
    back to worst-case sizing). When the backend exposes no memory stats
    (this host's axon relay returns None), estimates free HBM as the known
    chip budget minus the live weight tree — the worst-case fallback left
    the flagship paged shape compile-blocked without a manual BENCH_PAGES."""
    import jax
    import jax.numpy as jnp

    from spatialthinker_tpu.rollout.paged import prefill_transient_bytes

    override = int(os.environ.get("BENCH_PAGES", "0"))
    if override:
        return override
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    limit = stats.get("bytes_limit")
    in_use = stats.get("bytes_in_use")
    estimated = False
    if not limit:
        if jax.default_backend() != "tpu":
            return 0
        estimated = True
        limit = int(os.environ.get("SPATIALTHINKER_HBM_BYTES",
                                   str(int(15.75 * 2**30))))
        live = sum(
            x.nbytes for x in jax.tree.leaves(params or {})
            if hasattr(x, "nbytes")
        )
        in_use = live + (512 << 20)  # allocator slack + logits/sampling bufs
    t = cfg.text
    elem = {jnp.dtype(jnp.int8): 1.0, jnp.dtype(jnp.uint8): 0.5}.get(
        jnp.dtype(kv_dtype), 2.0
    )
    cell = int(2 * t.num_hidden_layers * t.num_key_value_heads * t.head_dim * elem)
    if elem < 2:
        cell += 2 * t.num_hidden_layers * t.num_key_value_heads * 2
    util = float(os.environ.get("BENCH_MEM_UTIL", "0.9"))
    transient = prefill_transient_bytes(cfg, prompt, u_batch, rows, cell)
    free = int(limit * util) - int(in_use or 0) - transient
    if estimated:
        # no real memory stats: XLA cannot alias every donated buffer, so
        # the compile-time peak transiently holds part of the pool TWICE —
        # a raw-budget pool measured 19.06G of 15.75G at the long shape.
        # Derate so pool + its worst transient copy fits.
        free = int(free * float(os.environ.get("BENCH_MEM_DERATE", "0.6")))
    return max(free // (cell * page_size), 0)


def _measure_host_engine(params, cfg, shape, iters: int, engine: str = None,
                         slots_override: int = 0,
                         refill_override: int = 0) -> float:
    """Time the continuous or paged engine (host-orchestrated scheduling;
    their internal jits are module-level functions, so the warmup call's
    compilations are reused by the timed iterations).

    The warmup run drains a SHORTER prompt queue (just enough unique prompts
    to fill the slots, so slot clamping and every program shape match the
    timed run): queue length is host-side state, so the short warm compiles
    exactly the programs the full timed run replays — at roughly half the
    r4 warm cost, which is what blew the driver's wall budget
    (BENCH_r04.json rc=124)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spatialthinker_tpu.rollout.sampling import SamplingParams

    engine = engine or ENGINE
    b, p, r, kv_name, chunk, group_n, rows = shape
    kv_dtype = {"int8": jnp.int8, "int4": jnp.uint8}.get(kv_name, jnp.bfloat16)
    rng = np.random.default_rng(0)
    input_ids = rng.integers(1, 1000, size=(b, p), dtype=np.int32)
    segment_ids = np.ones((b, p), np.int32)
    position_ids = np.broadcast_to(np.arange(p, dtype=np.int32)[None, None], (3, b, p))
    gen_pos_start = np.full((b,), p, np.int32)
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)
    # default slot count caps at the sched entries' 128: slots == b*group_n
    # means no turnover at all (degenerate dense), and at the long shape the
    # 256-lane slot cache doesn't even compile (measured 18.7G of 15.75G)
    slots = (slots_override or int(os.environ.get("BENCH_SLOTS", "0"))
             or min(b * group_n,
                    int(os.environ.get("BENCH_SCHED_SLOTS", "128"))))
    refill = refill_override or int(os.environ.get("BENCH_REFILL", "16"))
    common = dict(
        max_new_tokens=r, sampling=sampling, slots=slots,
        decode_chunk_size=int(os.environ.get("BENCH_DECODE_CHUNK", "64")),
        kv_cache_dtype=kv_dtype, prefill_chunk_size=chunk,
        max_num_batched_tokens=0, prefill_rows=rows,
        refill_batch=refill,
        group_n=group_n,
        int4_i8dot=I8DOT,
    )
    if engine == "paged":
        from spatialthinker_tpu.rollout.paged import generate_paged

        # 2026-08 sweep (scripts/diag_paged_decode.py, 128 slots, filled
        # 2048, ms/36-layer pass): page 256: 21.07 bf16-lane / 19.40 i8dot;
        # 512: 17.95 / 16.34; 1024: 18.97 / 15.55. Bigger pages cut
        # per-program overhead and amortize the nibble converts the i8dot
        # variant removes; with i8dot (the bench default) 1024 wins
        page_size = int(os.environ.get("BENCH_PAGE_SIZE", "1024"))
        u_batch = max(slots // group_n, 1)
        if refill > 0:
            u_batch = min(u_batch, refill)
        pages = _pool_pages(cfg, page_size, kv_dtype, p, u_batch, rows,
                            params=params)
        fn = lambda k, nb=b: generate_paged(
            params, cfg, input_ids[:nb], segment_ids[:nb],
            position_ids[:, :nb], gen_pos_start[:nb],
            key=k, page_size=page_size, total_pages=pages, **common,
        )
    else:
        from spatialthinker_tpu.rollout.continuous import generate_continuous

        fn = lambda k, nb=b: generate_continuous(
            params, cfg, input_ids[:nb], segment_ids[:nb],
            position_ids[:, :nb], gen_pos_start[:nb],
            key=k, **common,
        )

    # warm with the smallest queue that still fills every slot (engines clamp
    # slots to the lane count, so fewer uniques than slots//group_n would
    # compile a DIFFERENT decode program) PLUS one refill batch, so the
    # mid-decode refill path compiles during the warm run, not the timed one
    warm_b = min(b, (int(os.environ.get("BENCH_WARM_B", "0"))
                     or -(-slots // group_n) + max(refill, 1)))
    out = fn(jax.random.key(1), nb=warm_b)  # compile + warm
    if engine == "paged":
        import sys

        print(f"[bench] paged stats (warm): {out.stats}", file=sys.stderr, flush=True)
    start = time.perf_counter()
    for i in range(iters):
        fn(jax.random.key(2 + i))  # host engines sync via their own fetches
    elapsed = time.perf_counter() - start
    return b * group_n * r * iters / elapsed


def _measure(gen, params, cfg, shape, iters: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spatialthinker_tpu.rollout.sampling import SamplingParams

    b, p, r, kv_name, chunk, group_n, rows = shape
    # uint8 = the packed-int4 marker dtype (models/.../text.KVCache)
    kv_dtype = {"int8": jnp.int8, "int4": jnp.uint8}.get(kv_name, jnp.bfloat16)
    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(rng.integers(1, 1000, size=(b, p), dtype=np.int32))
    segment_ids = jnp.ones((b, p), jnp.int32)
    position_ids = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None, None], (3, b, p))
    gen_pos_start = jnp.full((b,), p, jnp.int32)
    sampling = SamplingParams(temperature=1.0, top_p=1.0, top_k=-1)

    def run(k):
        out = gen(
            params, cfg, input_ids, segment_ids, position_ids, gen_pos_start,
            max_new_tokens=r, sampling=sampling, key=k, kv_cache_dtype=kv_dtype,
            prefill_chunk=chunk, prefill_rows=rows, n=group_n,
            int4_i8dot=I8DOT,
        )
        # NOTE: through the axon relay, block_until_ready returns before the
        # device finishes; a scalar fetch is the only reliable sync.
        float(np.asarray(jnp.sum(out.responses.astype(jnp.int32))))

    run(jax.random.key(1))  # compile + warm
    start = time.perf_counter()
    for i in range(iters):
        run(jax.random.key(2 + i))
    elapsed = time.perf_counter() - start
    return b * group_n * r * iters / elapsed


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spatialthinker_tpu.models.qwen2_5_vl import get_config
    from spatialthinker_tpu.models.qwen2_5_vl.model import init_params
    from spatialthinker_tpu.rollout.engine import generate

    cfg = get_config(PRESET)
    n_chips = len(jax.devices())

    def make_params():
        # random bf16 init directly on device (values irrelevant for
        # throughput); re-invoked after the train entries free the tree
        p = jax.jit(lambda k: init_params(cfg, k, dtype=jnp.bfloat16))(jax.random.key(0))
        jax.block_until_ready(p)
        if WQ in ("int8", "w4a8"):
            import functools

            from spatialthinker_tpu.ops.quant import quantize_params

            # rebind: the bf16 decoder stacks are freed, HBM holds int8 +
            # scales (w4a8 additionally carries the int4 MLP decode copies).
            # DONATE the bf16 tree — unlike the trainer (which must keep the
            # live training params), the bench never touches it again, and
            # without donation the caller-owned bf16 stacks stay resident for
            # the whole quantize pass (w4a8 peaks >20GB on a 16GB chip).
            p = jax.jit(
                functools.partial(quantize_params, mode=WQ), donate_argnums=(0,)
            )(p)
        return p

    params = make_params()
    gen = jax.jit(
        generate,
        static_argnames=(
            "cfg", "max_new_tokens", "sampling", "kv_cache_dtype", "prefill_chunk",
            "prefill_rows", "n", "int4_i8dot",
        ),
    )
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    import signal
    import sys

    t0 = time.perf_counter()
    # soft wall budget: the driver runs bench.py under a hard timeout
    # (BENCH_r04.json: rc=124 — one kill voided the whole artifact because the
    # single JSON line printed only at the very end). Two defenses now: the
    # accumulating JSON object prints to stdout after EVERY completed section
    # (last complete line wins), and sections that would not fit the wall
    # budget are recorded as skipped instead of dying mid-run.
    wall = float(os.environ.get("BENCH_WALL", "3300"))

    def wall_left() -> float:
        return wall - (time.perf_counter() - t0)

    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    def _recover_device():
        """After a failed section (OOM / worker restart): drop executables and
        their device constants, collect dead buffers, and force one tiny
        round trip so the deallocation stream drains before the next section
        allocates — an OOM otherwise cascades (r5: the flagship_sched OOM
        took the standalone-green train_3b entry down with it)."""
        import gc

        try:
            jax.clear_caches()
        except Exception:  # noqa: BLE001
            pass
        gc.collect()
        try:
            float(jnp.zeros(()) + 1)  # sync: relay block_until_ready lies
        except Exception:  # noqa: BLE001 — worker may still be restarting
            time.sleep(60)

    def guarded(label: str, budget: int, fn, reserve: int = 0):
        """Run one optional section under SIGALRM + the wall budget; a stall
        or overrun records an error/skip instead of losing the sections
        already measured. ``reserve`` holds back wall time for sections that
        MUST still run afterwards (train_3b's guaranteed slot)."""
        if wall_left() - reserve < 120:
            out[label] = {"skipped": f"wall budget ({int(wall)}s) exhausted"}
            emit()
            return

        def _alarm(signum, frame):
            raise TimeoutError(f"{label} exceeded its budget")

        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(max(int(min(budget, wall_left() - reserve)), 60))
        try:
            out[label] = fn()
        except Exception as e:  # noqa: BLE001 — record, don't lose the run
            out[label] = {"error": f"{type(e).__name__}: {e}"}
            signal.alarm(0)
            _recover_device()
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
        print(f"[bench] {label}: {out[label]}", file=sys.stderr, flush=True)
        emit()

    names = ["short", "long", "grpo", "flagship"] if SHAPE == "all" else [SHAPE]
    results = {}

    def shape_cfg(name):
        b, p, r, kv_name, chunk, group_n, rows = SHAPES[name]
        c = {"batch": b, "prompt": p, "gen": r, "kv": kv_name, "wq": WQ,
             "prefill_chunk": chunk, "prefill_rows": rows, "n": group_n,
             "engine": ENGINE}
        if kv_name == "int4":
            c["i8dot"] = I8DOT
        if name == "flagship":
            # scope label (VERDICT r4 task 9): one decode wave of distinct
            # prompts, no slot turnover — NOT the shipped script's n=8
            # grouped training workload (that is the flagship_sched entry)
            c["scope"] = ("n=1 single-wave dense decode; the script's "
                          "training workload is flagship_sched")
        return c

    def rebuild_headline():
        headline = "grpo" if "grpo" in results else list(results)[-1]
        out["metric"] = (f"rollout_tokens_per_sec_per_chip_{headline}"
                         if headline != "short" else "rollout_tokens_per_sec_per_chip")
        out["value"] = results[headline]
        out["unit"] = "tok/s/chip"
        out["vs_baseline"] = round(results[headline] / H100_VLLM_3B_TOKS, 4)
        out["config"] = shape_cfg(headline)
        for name in results:
            out.pop(f"{name}_ctx", None)
        for name in results:
            if name != headline:
                out[f"{name}_ctx"] = {
                    "value": results[name],
                    "vs_baseline": round(results[name] / H100_VLLM_3B_TOKS, 4),
                    "config": shape_cfg(name),
                }

    for name in names:
        shape = SHAPES[name]
        if name in ("long", "flagship") and shape[4] == 0 and shape[6] == 0:
            # a fully unchunked b x p prefill at these shapes OOMs (the 5.4GB
            # gate_up temp) — reinstate the seq-chunk bound when a BENCH_ROWS=0
            # override forgets to also set a chunk
            shape = shape[:4] + (512,) + shape[5:]
        n_iters = SHAPE_ITERS.get(name, iters)
        if ENGINE != "dense":
            results[name] = round(
                _measure_host_engine(params, cfg, shape, n_iters) / n_chips, 2
            )
        else:
            results[name] = round(
                _measure(gen, params, cfg, shape, n_iters) / n_chips, 2,
            )
        # progress to stderr: a late-shape failure must not lose earlier numbers
        print(f"[bench] {name}: {results[name]} tok/s/chip", file=sys.stderr, flush=True)
        rebuild_headline()
        emit()

    if SHAPE != "all":
        return

    # the 1B train entry runs BEFORE the scheduler entries (VERDICT r4 task 1:
    # an overrunning sched section must not starve the train numbers); the 3B
    # entry runs LAST with a RESERVED wall slot instead — its streamed apply
    # is the one section that has crashed the TPU worker when SIGALRM fired
    # mid-relay-transfer (r5: the unguarded re-init after it then lost every
    # sched entry), so nothing may run after it, and the reserve guarantees
    # the sched entries cannot starve it either.
    train3b_reserve = 0
    if (os.environ.get("BENCH_SKIP_TRAIN") != "1"
            and os.environ.get("BENCH_SKIP_TRAIN3B") != "1"):
        train3b_reserve = int(os.environ.get("BENCH_TRAIN3B_BUDGET", "900"))
    if os.environ.get("BENCH_SKIP_TRAIN") != "1":
        del params  # free rollout weights before the train-bench allocates
        guarded("train", int(os.environ.get("BENCH_TRAIN_BUDGET", "900")),
                train_bench, reserve=train3b_reserve)
        params = None

    def get_params():
        # lazy re-init inside the guarded sections: a crashed/restarting TPU
        # worker records a per-entry error instead of killing the run
        nonlocal params
        if params is None:
            params = make_params()
        return params

    if os.environ.get("BENCH_SKIP_SCHED") != "1":
        # the vLLM-scheduler replacements (continuous slot-refill, paged pool)
        # at the long shape: 256 prompts through 128 slots, so the measurement
        # exercises refill / page admission — not just a one-wave dense decode
        long_shape = SHAPES["long"]
        if long_shape[4] == 0 and long_shape[6] == 0:
            long_shape = long_shape[:4] + (512,) + long_shape[5:]
        sched_slots = int(os.environ.get("BENCH_SCHED_SLOTS", "128"))
        sched_iters = int(os.environ.get("BENCH_SCHED_ITERS", "1"))
        sched_budget = int(os.environ.get("BENCH_SCHED_BUDGET", "1000"))

        def sched_entry(eng, shape, slots, label_cfg, refill=0):
            v = round(
                _measure_host_engine(get_params(), cfg, shape, sched_iters,
                                     engine=eng, slots_override=slots,
                                     refill_override=refill) / n_chips,
                2,
            )
            return {"value": v, "vs_baseline": round(v / H100_VLLM_3B_TOKS, 4),
                    "config": {**label_cfg, "engine": eng, "slots": slots,
                               **({"refill": refill} if refill else {})}}

        for eng in ("continuous", "paged"):
            guarded(
                f"{eng}_long_ctx", sched_budget,
                lambda eng=eng: sched_entry(eng, long_shape, sched_slots,
                                            shape_cfg("long")),
                reserve=train3b_reserve,
            )

        # the shipped script's own rollout workload (rollout.n=8 grouped at
        # 6144/2048) through the engine the script selects (VERDICT r4 task 4)
        if os.environ.get("BENCH_SKIP_FSCHED") != "1":
            fs = FLAGSHIP_SCHED_SHAPE
            # the script ships the PAGED engine at 128 slots / page 1024 /
            # refill 8 — compacted pages + refcount-shared prompt pages back
            # 128 slots where a width-allocated slot cache caps at 48 (64
            # slots x 8192 int4 cells = 9 GiB packed + 2.8 GiB scales next
            # to the 4.1 GiB int8 tree OOMs; the continuous engine's staging
            # ring + 16-unique refill transient pushed even 64/16 over).
            # Measured 2026-08: paged 128 slots 3,647 tok/s (1.30x) vs
            # paged@48 2,561, continuous@48 3,065, continuous@64 OOM.
            fs_eng = os.environ.get("BENCH_FSCHED_ENGINE", "paged")
            fs_slots = int(os.environ.get(
                "BENCH_FSCHED_SLOTS", "128" if fs_eng == "paged" else "48"))
            fs_refill = int(os.environ.get("BENCH_FSCHED_REFILL", "8"))
            fs_cfg = {"batch": fs[0], "prompt": fs[1], "gen": fs[2],
                      "kv": fs[3], "wq": WQ, "prefill_chunk": fs[4],
                      "prefill_rows": fs[6], "n": fs[5], "i8dot": I8DOT,
                      "scope": "the shipped script's rollout shape (n=8 grouped)"}
            guarded(
                "flagship_sched", sched_budget,
                lambda: sched_entry(fs_eng, fs, fs_slots, fs_cfg,
                                    refill=fs_refill),
                reserve=train3b_reserve,
            )

    # 3B train entry LAST (see the ordering comment above): streamed
    # optimizer — the only single-chip 3B fit — with SAMPLED moment
    # streaming (full-stream extrapolated by bytes; a real full apply is
    # >12 min of relay transfers and crashed the worker when the alarm
    # interrupted it)
    if (os.environ.get("BENCH_SKIP_TRAIN") != "1"
            and os.environ.get("BENCH_SKIP_TRAIN3B") != "1"):
        def _train3b():
            nonlocal params
            params = None  # free the rollout weights for the 3B train tree
            os.environ["BENCH_TRAIN_PRESET"] = "3b"
            os.environ["BENCH_STREAM_OPT"] = "1"
            os.environ["BENCH_ITERS"] = "1"
            os.environ.setdefault("BENCH_TRAIN_BS", "1")
            os.environ.setdefault("BENCH_STREAM_SAMPLE", "4")
            # measured single-chip 3B fit (2026-08): micro_bs=1 x seq 2048
            # with one micro-batch; seq 4096 or n_micro=2 ResourceExhausted
            # even with the streamed optimizer (grads + params + one
            # layer-slice of moments is the whole budget)
            os.environ.setdefault("BENCH_TRAIN_SEQ", "2048")
            os.environ.setdefault("BENCH_TRAIN_NMICRO", "1")
            return train_bench()

        guarded("train_3b",
                int(os.environ.get("BENCH_TRAIN3B_BUDGET", "900")), _train3b)
    emit()


if __name__ == "__main__":
    _enable_compile_cache()
    if os.environ.get("BENCH_MODE") == "train":
        print(json.dumps(train_bench()))
    else:
        main()
