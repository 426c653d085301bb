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
