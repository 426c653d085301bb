"""Single-device worker: GRPO trainer with ``worker.actor.optim.stream=true``.

Runs in its own process because the suite's conftest forces an 8-virtual-
device CPU topology, while the streamed optimizer is the single-device 3B
fit (the trainer rejects it on multi-device meshes — FSDP already fits
there). Exercises: 2 fit() steps with host-resident moments, checkpoint
save of the streamed state (numpy trees + python count through orbax), and
resume.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # default topology: ONE cpu device
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from spatialthinker_tpu.core.config import build_config
from spatialthinker_tpu.data.dataset import DataLoader, RLHFDataset
from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
from spatialthinker_tpu.rewards.manager import RewardManager
from spatialthinker_tpu.trainer.grpo_trainer import GRPOTrainer

from tests.fake_tokenizer import FakeTokenizer

VOCAB = 1024


def build(tmp, load=None, extra=()):
    overrides = [
        "data.max_prompt_length=32",
        "data.max_response_length=8",
        "data.rollout_batch_size=4",
        "worker.rollout.n=2",
        "worker.rollout.temperature=1.0",
        "worker.actor.global_batch_size=8",
        "worker.actor.micro_batch_size_per_device_for_update=1",
        "worker.actor.micro_batch_size_per_device_for_experience=2",
        "worker.actor.optim.lr=1e-3",
        "worker.actor.optim.stream=true",
        "worker.reward.score_function=r1v",
        "trainer.logger=['console']",
        "trainer.total_episodes=1",
        "trainer.max_steps=2",
        "trainer.save_freq=2",
        f"trainer.save_checkpoint_path={tmp}/ckpt",
        "worker.actor.sharding.data_size=1",
        "worker.actor.sharding.fsdp_size=1",
        "worker.actor.sharding.model_size=1",
    ]
    if load:
        overrides.append(f"trainer.load_checkpoint_path={load}")
    overrides.extend(extra)
    cfg = build_config(overrides)
    tok = FakeTokenizer(VOCAB)
    model_cfg = qwen25_vl_tiny(VOCAB)
    params = init_params(model_cfg, jax.random.key(0))
    rows = [
        {"problem": f"What is {i} plus {i}? Image size: (100 x 100)",
         "answer": str(2 * i)}
        for i in range(8)
    ]
    ds = RLHFDataset.from_rows(rows, tok, cfg.data, model_cfg)
    loader = DataLoader(ds, cfg.data.rollout_batch_size, shuffle=True, seed=0)
    reward = RewardManager(tok, "r1v", num_workers=2)
    return GRPOTrainer(
        config=cfg, tokenizer=tok, model_cfg=model_cfg, params=params,
        train_dataloader=loader, reward_fn=reward,
    )


def _f32(tree):
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), tree)


def main(out_path, tmp):
    assert jax.device_count() == 1, jax.devices()
    trainer = build(tmp)
    before = _f32(trainer.params)
    logged = {}
    orig = trainer.tracker.log
    trainer.tracker.log = (
        lambda data, step: (logged.update({step: data}), orig(data, step))[1]
    )
    trainer.fit()
    after = _f32(trainer.params)
    delta = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(np.abs(a - b).max()), before, after)
        )
    )
    final_count = int(np.asarray(trainer.opt_state.count))

    # resume: fresh trainer from the saved step-2 checkpoint — streamed
    # opt_state (host numpy + count) must round-trip through orbax
    resumed = build(tmp, load=f"{tmp}/ckpt")
    resumed.load_checkpoint()
    resumed_count = int(np.asarray(resumed.opt_state.count))
    params_match = all(
        jax.tree.leaves(
            jax.tree.map(
                lambda a, b: bool(np.array_equal(a, b)),
                after, _f32(resumed.params),
            )
        )
    )
    mu_match = all(
        jax.tree.leaves(
            jax.tree.map(
                lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
                trainer.opt_state.mu, resumed.opt_state.mu,
            )
        )
    )
    # restored-state usability: one optimizer apply ON the restored state —
    # the streamed apply writes mu[l0:l1] IN PLACE, so an orbax restore that
    # came back read-only (or with changed leaf types) must fail HERE, in
    # tree, not in the next real run
    trainable = resumed._stream_trainable(resumed.params)
    grads = jax.tree.map(
        lambda p: np.full(p.shape, 1e-3, np.float32).astype(p.dtype), trainable
    )
    # snapshot first: apply() DONATES the param leaves through the slice loop
    before_sp = _f32(trainable)
    stepped_params, stepped_state = resumed.optimizer.apply(
        trainable, grads, resumed.opt_state, finite=True, grad_scale=1.0,
    )
    post_restore_count = int(np.asarray(stepped_state.count))
    post_restore_moved = bool(
        max(
            jax.tree.leaves(
                jax.tree.map(
                    lambda a, b: float(np.abs(a - np.asarray(b, np.float32)).max()),
                    before_sp, stepped_params,
                )
            )
        )
        > 0
    )

    # kahan=false: the compensation sentinels are () scalars, not zero-size
    # arrays — orbax refuses zero-size arrays at save, which used to kill
    # stream+use_kahan_summation=false runs at their first save_freq step
    nk_tmp = os.path.join(tmp, "nokahan")
    os.makedirs(nk_tmp, exist_ok=True)
    nk = build(nk_tmp, extra=("worker.actor.optim.use_kahan_summation=false",))
    nk.fit()  # save_freq=2, max_steps=2 -> saves (crashed before the fix)
    nk_resumed = build(nk_tmp, load=f"{nk_tmp}/ckpt")
    nk_resumed.load_checkpoint()
    nokahan_ckpt_ok = (
        nk_resumed.global_step == 2
        and int(np.asarray(nk_resumed.opt_state.count))
        == int(np.asarray(nk.opt_state.count))
    )

    out = {
        "metrics": {k: float(v) for k, v in logged[2].items()},
        "param_delta": delta,
        "final_count": final_count,
        "resumed_count": resumed_count,
        "resumed_step": resumed.global_step,
        "params_match": params_match,
        "mu_match": mu_match,
        "post_restore_count": post_restore_count,
        "post_restore_moved": post_restore_moved,
        "nokahan_ckpt_ok": nokahan_ckpt_ok,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
