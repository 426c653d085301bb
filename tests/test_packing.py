"""Vision packing tests: batch packs, bucketing, micro-batch stacking, and the
merge-gather alignment across packed samples."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.data.packing import (
    bucket_size,
    empty_vision_pack,
    pack_vision_batch,
    patch_dim,
    stack_vision_packs,
)
from spatialthinker_tpu.models.qwen2_5_vl import qwen25_vl_tiny

CFG = qwen25_vl_tiny(256)
DIN = patch_dim(CFG.vision)


def _img(rng, grid=(1, 4, 4)):
    n = int(np.prod(grid))
    return rng.normal(size=(n, DIN)).astype(np.float32), np.asarray([list(grid)])


def test_bucket_size():
    assert bucket_size(1, 1024) == 1024
    assert bucket_size(1025, 1024) == 2048


def test_pack_vision_batch_none_for_text_only():
    assert pack_vision_batch([None, None], [None, None], CFG.vision) is None


def test_pack_vision_batch_shapes():
    rng = np.random.default_rng(0)
    p1, g1 = _img(rng)
    p2, g2 = _img(rng, (1, 8, 4))
    pack = pack_vision_batch([p1, None, p2], [g1, None, g2], CFG.vision, granularity=16)
    total = 16 + 32
    assert pack.patches.shape[0] % CFG.vision.spatial_merge_unit == 0
    assert pack.patches.shape[0] >= total
    assert (pack.seg_full > 0).sum() == total
    # two images -> two full-attention segments
    assert set(np.unique(pack.seg_full)) >= {0, 1, 2} or set(np.unique(pack.seg_full)) == {1, 2}


def test_stack_vision_packs_mixed():
    rng = np.random.default_rng(1)
    p1, g1 = _img(rng)
    pack1 = pack_vision_batch([p1], [g1], CFG.vision, granularity=16)
    stacked = stack_vision_packs([pack1, None], CFG.vision)
    assert stacked.patches.shape[0] == 2
    assert (stacked.seg_full[1] == 0).all()  # text-only micro-batch attends nothing
    assert stacked.patches.shape[1] == pack1.patches.shape[0]


def test_stack_vision_packs_uneven_buckets():
    rng = np.random.default_rng(2)
    p1, g1 = _img(rng, (1, 4, 4))
    p2, g2 = _img(rng, (1, 8, 8))
    pack1 = pack_vision_batch([p1], [g1], CFG.vision, granularity=4)
    pack2 = pack_vision_batch([p2], [g2], CFG.vision, granularity=4)
    stacked = stack_vision_packs([pack1, pack2], CFG.vision)
    assert stacked.patches.shape[1] == max(pack1.patches.shape[0], pack2.patches.shape[0])
    # original segments preserved in the grown pack
    assert (stacked.seg_full[0] > 0).sum() == 16


def test_empty_pack_shapes():
    pack = empty_vision_pack(CFG.vision, 16, DIN)
    assert pack.patches.shape == (16, DIN)
    assert pack.reverse_index.shape[0] == 16 // CFG.vision.spatial_merge_unit
    assert (pack.seg_full == 0).all()
