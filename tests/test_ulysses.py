"""Sequence-parallel (Ulysses) attention on the virtual 8-device mesh:
all-to-all resharded attention must equal single-device attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spatialthinker_tpu.ops.attention import attention
from spatialthinker_tpu.ops.ulysses import pad_seq_to_multiple, ulysses_attention


def _mesh(sp):
    devices = np.asarray(jax.devices()[:sp]).reshape(sp)
    return Mesh(devices, ("sp",))


@pytest.mark.parametrize("sp", [2, 4])
def test_ulysses_matches_dense(sp):
    rng = np.random.default_rng(0)
    b, s, hq, hkv, d = 2, 64, 8, 8, 32
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    seg = jnp.ones((b, s), jnp.int32)

    mesh = _mesh(sp)
    spec = NamedSharding(mesh, P(None, "sp", None, None))
    q_s = jax.device_put(q, spec)
    k_s = jax.device_put(k, spec)
    v_s = jax.device_put(v, spec)
    seg_s = jax.device_put(seg, NamedSharding(mesh, P(None, "sp")))

    out_sp = ulysses_attention(q_s, k_s, v_s, mesh, "sp", segment_ids=seg_s, causal=True)
    out_ref = attention(q, k, v, segment_ids=seg, causal=True)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_ref), rtol=2e-3, atol=2e-3)


def test_ulysses_packed_segments():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    seg = np.zeros((b, s), dtype=np.int32)
    seg[0, :12] = 1
    seg[0, 12:24] = 2
    seg = jnp.asarray(seg)

    mesh = _mesh(2)
    out_sp = ulysses_attention(q, k, v, mesh, "sp", segment_ids=seg, causal=True)
    out_ref = attention(q, k, v, segment_ids=seg, causal=True)
    valid = np.asarray(seg)[0] != 0
    np.testing.assert_allclose(
        np.asarray(out_sp)[0, valid], np.asarray(out_ref)[0, valid], rtol=2e-3, atol=2e-3
    )


def test_ulysses_grad_flows():
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 16, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mesh = _mesh(2)

    def loss(q):
        out = ulysses_attention(q, q, q, mesh, "sp", causal=True)
        return jnp.sum(out**2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


def test_pad_seq():
    x = jnp.ones((2, 10, 4, 8))
    padded, pad = pad_seq_to_multiple(x, 4)
    assert padded.shape[1] == 12 and pad == 2
    same, none = pad_seq_to_multiple(x, 5)
    assert none == 0 and same.shape == x.shape


def test_sp2_log_probs_match_sp1_multimodal():
    """End-to-end Ulysses wiring (VERDICT #5): compute_log_probs with sp=2 on
    a (data=2, fsdp=2, model=2) mesh equals the sp=None path, on a multimodal
    batch (image tokens + packed vision tower)."""
    from spatialthinker_tpu.data.packing import pack_vision_batch
    from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
    from spatialthinker_tpu.ops.ulysses import UlyssesSpec
    from spatialthinker_tpu.parallel.mesh import create_mesh
    from spatialthinker_tpu.trainer.train_step import TrainBatch, compute_log_probs

    cfg = qwen25_vl_tiny(256)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    bs, p_len, r = 4, 24, 8
    s = p_len + r  # 32, divisible by sp=2

    ids = rng.integers(1, 200, size=(bs, s), dtype=np.int32)
    # one (1,4,4)-grid image per sample -> 16 patches -> 4 merged tokens
    ids[:, 2:6] = cfg.image_token_id
    vcfg = cfg.vision
    feat = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size**2
    patches = [rng.normal(size=(16, feat)).astype(np.float32) for _ in range(bs)]
    grids = [np.asarray([[1, 4, 4]], dtype=np.int64)] * bs
    vision = pack_vision_batch(patches, grids, vcfg)
    vision = jax.tree.map(jnp.asarray, vision)

    batch = TrainBatch(
        input_ids=jnp.asarray(ids),
        segment_ids=jnp.ones((bs, s), jnp.int32),
        position_ids=jnp.asarray(np.tile(np.arange(s)[None, None], (3, bs, 1))),
        responses=jnp.asarray(ids[:, p_len:]),
        response_mask=jnp.ones((bs, r), jnp.float32),
        old_log_probs=jnp.zeros((bs, r), jnp.float32),
        ref_log_probs=jnp.zeros((bs, r), jnp.float32),
        advantages=jnp.zeros((bs, r), jnp.float32),
    )

    mesh = create_mesh(2, 2, 2)
    sp = UlyssesSpec(mesh, "model", ("data", "fsdp"))
    ref, _ = compute_log_probs(params, cfg, batch, vision, chunk_size=8)
    got, _ = compute_log_probs(params, cfg, batch, vision, chunk_size=8, sp=sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sp2_packed_log_probs_match_sp1():
    """Packed-row (padding-free) path under sp=2: same label log-probs."""
    from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
    from spatialthinker_tpu.ops.ulysses import UlyssesSpec
    from spatialthinker_tpu.parallel.mesh import create_mesh
    from spatialthinker_tpu.trainer.train_step import (
        PackedTrainBatch,
        compute_packed_log_probs,
    )

    cfg = qwen25_vl_tiny(256)
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(1)
    rows, L = 4, 32  # rows must divide the batch axes (data*fsdp = 4)
    ids = rng.integers(1, 200, size=(rows, L), dtype=np.int32)
    seg = np.zeros((rows, L), np.int32)
    seg[:, :14] = 1
    seg[:, 14:28] = 2  # two packed samples per row, 4 pad cells
    labels = np.roll(ids, -1, axis=1)
    loss_mask = (seg > 0).astype(np.float32)
    loss_mask[:, -1] = 0
    pos = np.tile(np.arange(L)[None, None], (3, rows, 1))

    batch = PackedTrainBatch(
        input_ids=jnp.asarray(ids), segment_ids=jnp.asarray(seg),
        position_ids=jnp.asarray(pos), labels=jnp.asarray(labels),
        loss_mask=jnp.asarray(loss_mask),
        old_log_probs=jnp.zeros((rows, L), jnp.float32),
        ref_log_probs=jnp.zeros((rows, L), jnp.float32),
        advantages=jnp.zeros((rows, L), jnp.float32),
    )
    mesh = create_mesh(2, 2, 2)
    sp = UlyssesSpec(mesh, "model", ("data", "fsdp"))
    ref, _ = compute_packed_log_probs(params, cfg, batch, chunk_size=8)
    got, _ = compute_packed_log_probs(params, cfg, batch, chunk_size=8, sp=sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
