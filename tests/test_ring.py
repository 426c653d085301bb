"""Ring attention (ops/ring.py): forward and backward equality against
single-device flash attention on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from spatialthinker_tpu.ops.flash_attention import flash_attention
from spatialthinker_tpu.ops.ring import ring_attention


def _mesh(sp):
    devs = np.array(jax.devices()[:sp]).reshape(sp)
    return Mesh(devs, ("sp",))


def _case(b, s, hq, hkv, d, seed=0, packed=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    if packed:
        # two packed documents per row + trailing padding (segment 0)
        seg = np.zeros((b, s), np.int32)
        seg[:, : s // 2] = 1
        seg[:, s // 2 : 7 * s // 8] = 2
        seg = jnp.asarray(seg)
    else:
        seg = jnp.ones((b, s), jnp.int32)
    return q, k, v, seg


@pytest.mark.parametrize("sp", [2, 4])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_forward_matches_flash(sp, causal):
    mesh = _mesh(sp)
    q, k, v, seg = _case(2, 64 * sp, 4, 2, 32, seed=sp)
    ref = flash_attention(q, k, v, segment_ids=seg, kv_segment_ids=seg, causal=causal)
    got = ring_attention(q, k, v, mesh, "sp", segment_ids=seg, causal=causal)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-4, atol=2e-4
    )


def test_ring_forward_packed_segments():
    """Packed documents spanning ring chunks mask correctly across devices."""
    sp = 4
    mesh = _mesh(sp)
    q, k, v, seg = _case(2, 64 * sp, 4, 2, 32, seed=9, packed=True)
    ref = flash_attention(q, k, v, segment_ids=seg, kv_segment_ids=seg, causal=True)
    got = ring_attention(q, k, v, mesh, "sp", segment_ids=seg, causal=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("causal", [True, False])
def test_ring_backward_matches_flash(causal):
    """Hand-written ring backward (rotating dk/dv accumulators, merged-lse
    flash backward per rotation) == single-device flash gradients."""
    sp = 4
    mesh = _mesh(sp)
    q, k, v, seg = _case(1, 64 * sp, 4, 2, 32, seed=17)

    def loss_ref(q, k, v):
        o = flash_attention(q, k, v, segment_ids=seg, kv_segment_ids=seg, causal=causal)
        return jnp.sum(o.astype(jnp.float32) * jnp.cos(jnp.arange(o.size).reshape(o.shape) / 1000))

    def loss_ring(q, k, v):
        o = ring_attention(q, k, v, mesh, "sp", segment_ids=seg, causal=causal)
        return jnp.sum(o.astype(jnp.float32) * jnp.cos(jnp.arange(o.size).reshape(o.shape) / 1000))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gg, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32), rtol=3e-4, atol=3e-4
        )


def test_ring_gqa_degree_beyond_heads():
    """The whole point: sp=4 with only 2 KV heads (Ulysses hard-caps at 2)."""
    sp = 4
    mesh = _mesh(sp)
    q, k, v, seg = _case(2, 64 * sp, 4, 2, 32, seed=23)
    got = ring_attention(q, k, v, mesh, "sp", segment_ids=seg, causal=True)
    assert got.shape == q.shape
    from spatialthinker_tpu.ops.ulysses import ulysses_attention

    with pytest.raises(ValueError, match="heads"):
        ulysses_attention(q, k, v, mesh, "sp", segment_ids=seg, causal=True)


def test_ring_sp2_log_probs_match_sp1():
    """Trainer-level ring backend: compute_log_probs with a ring UlyssesSpec
    on a (data=2, fsdp=2, model=2) mesh equals the sp=None path."""
    from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
    from spatialthinker_tpu.ops.ulysses import UlyssesSpec
    from spatialthinker_tpu.parallel.mesh import create_mesh
    from spatialthinker_tpu.trainer.train_step import TrainBatch, compute_log_probs

    cfg = qwen25_vl_tiny(256)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(5)
    bs, p_len, r = 4, 24, 8
    s = p_len + r

    ids = rng.integers(1, 200, size=(bs, s), dtype=np.int32)
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
    from spatialthinker_tpu.parallel.mesh import create_mesh  # noqa: F811

    mesh = create_mesh(2, 2, 2)
    sp = UlyssesSpec(mesh, "model", ("data", "fsdp"), backend="ring")
    ref, _ = compute_log_probs(params, cfg, batch, None, chunk_size=8)
    got, _ = compute_log_probs(params, cfg, batch, None, chunk_size=8, sp=sp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_ring_backend_config():
    from spatialthinker_tpu.core.config import PPOConfig, _merge_into

    cfg = PPOConfig()
    _merge_into(cfg, {"worker": {"actor": {"sequence_parallel_backend": "ring"}}})
    cfg.post_init()
    bad = PPOConfig()
    _merge_into(bad, {"worker": {"actor": {"sequence_parallel_backend": "zigzag"}}})
    with pytest.raises(ValueError, match="sequence_parallel_backend"):
        bad.post_init()


def test_param_sharding_degrades_indivisible_dims():
    """Per-leaf spec degradation: with model=4 and only 2 KV heads, qkv/o
    replicate over the model axis while the MLP (I=128 divisible) stays
    tensor-parallel — the layout ring SP relies on."""
    from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
    from spatialthinker_tpu.parallel.mesh import create_mesh
    from spatialthinker_tpu.parallel.sharding import param_shardings

    cfg = qwen25_vl_tiny(256)
    params = init_params(cfg, jax.random.key(0))
    mesh = create_mesh(1, 2, 4)
    sh = param_shardings(mesh, params)
    qkv = sh["text"]["layers"]["self_attn"]["qkv_proj"].spec
    gup = sh["text"]["layers"]["mlp"]["gate_up_proj"].spec
    # qkv (L, Hkv=2, E, G): Hkv % 4 != 0 -> model axis dropped on that dim
    assert "model" not in str(qkv)
    # gate_up (L, 2, E, I=128): I % 4 == 0 -> stays column-parallel
    assert "model" in str(gup)
