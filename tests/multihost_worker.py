"""Worker for the 2-process CPU multi-host integration test (run as a
subprocess by tests/test_multihost.py). Each process holds 4 virtual CPU
devices; together they form one 8-device SPMD program, mirroring a 2-host TPU
slice (the reference covers this role with Ray + NCCL rendezvous,
/root/reference/verl/single_controller/ray/base.py)."""

import json
import os
import sys


def main():
    rank = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = int(sys.argv[3])
    outfile = sys.argv[4]
    flags = sys.argv[5].split(",") if len(sys.argv) > 5 and sys.argv[5] else []
    multimodal = "mm" in flags
    ref_offload = "refoff" in flags
    continuous = "cont" in flags
    kv4 = "kv4" in flags
    paged = "paged" in flags
    # tiny fixed page pool (vLLM num_gpu_blocks_override parity): forces the
    # lockstep youngest-group preemption path under multi-host
    pg_small = "pgsmall" in flags

    os.environ["JAX_PLATFORMS"] = "cpu"
    local_devices = 8 // nprocs  # 8 global devices either way
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=rank
        )
    assert len(jax.devices()) == 8, jax.devices()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from spatialthinker_tpu.core.config import build_config
    from spatialthinker_tpu.data.dataset import DataLoader, RLHFDataset
    from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
    from spatialthinker_tpu.rewards.manager import RewardManager
    from spatialthinker_tpu.trainer.grpo_trainer import GRPOTrainer
    from tests.fake_tokenizer import FakeTokenizer

    VOCAB = 1024
    cfg = build_config(([
        "data.min_pixels=3136",  # keep images at 56x56 -> (1,4,4) grids
        "data.max_pixels=3136",
    ] if multimodal else []) + [
        "data.max_prompt_length=64" if multimodal else "data.max_prompt_length=32",
        "data.max_response_length=8",
        "data.rollout_batch_size=4",
        "worker.rollout.n=2",
        "worker.rollout.temperature=1.0",
        "worker.actor.global_batch_size=8",
        "worker.actor.micro_batch_size_per_device_for_update=1",
        "worker.actor.micro_batch_size_per_device_for_experience=2",
        # both modes exercise the packed (padding-free) layout — multimodal
        # packs negotiate vision width + slot-ordered merge offsets globally
        "worker.actor.padding_free=true",
        "worker.actor.optim.lr=1e-3",
        f"worker.ref.offload={'true' if ref_offload else 'false'}",
        # continuous/paged rollout multi-host: every process runs the
        # identical lockstep refill/harvest (and page-allocation) schedule
        # over the allgathered global queue
        f"worker.rollout.name={'continuous' if (continuous or paged) else 'jax'}",
        f"worker.rollout.page_size={4 if paged else 0}",
        f"worker.rollout.kv_pages_override={24 if pg_small else 0}",
        f"worker.rollout.kv_cache_dtype={'int4' if kv4 else 'bfloat16'}",
        "worker.reward.score_function=r1v",
        "trainer.logger=['console']",
        "trainer.max_steps=1",
        "worker.actor.sharding.data_size=1",
        "worker.actor.sharding.fsdp_size=8",
        "worker.actor.sharding.model_size=1",
    ])
    tok = FakeTokenizer(VOCAB)
    model_cfg = qwen25_vl_tiny(VOCAB)
    params = init_params(model_cfg, jax.random.key(0))

    if multimodal:
        import numpy as np

        img_rng = np.random.default_rng(7)
        rows = [
            {
                "problem": f"What color is object {i}?",
                "answer": "red",
                # image only on half the rows: hosts end up with DIFFERENT
                # patch counts, exercising the negotiated global vision pack
                **({"image": img_rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)}
                   if i % 2 == 0 else {}),
            }
            for i in range(8)
        ]
    else:
        rows = [
            {"problem": f"What is {i} plus {i}?", "answer": str(2 * i)}
            for i in range(8)
        ]
    ds = RLHFDataset.from_rows(rows, tok, cfg.data, model_cfg)
    shard = (rank, nprocs) if nprocs > 1 else None
    loader = DataLoader(ds, cfg.data.rollout_batch_size, shuffle=True, seed=0,
                        process_shard=shard)
    trainer = GRPOTrainer(
        config=cfg, tokenizer=tok, model_cfg=model_cfg, params=params,
        train_dataloader=loader, val_dataloader=None,
        reward_fn=RewardManager(tok, "r1v", num_workers=2),
    )
    batch = next(iter(loader))
    trainer.global_step = 1
    metrics = trainer.train_step(batch)
    with open(outfile, "w") as f:
        json.dump({k: float(v) for k, v in metrics.items()}, f)
    print(f"[worker {rank}] done", flush=True)


if __name__ == "__main__":
    main()
