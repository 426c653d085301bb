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


def test_vision_layout_helpers():
    from spatialthinker_tpu.models.qwen2_5_vl.vision import (
        apply_patch_layout, layout_patch_count, prepare_vision_aux, window_patch_len,
    )

    wlen = window_patch_len(CFG.vision)  # merge_unit * win^2 = 4 * 16 = 64
    assert wlen == 64
    # (1, 4, 4) natural 16 patches -> 2x2 merged < 4x4 window -> padded to 1 window
    assert layout_patch_count((1, 4, 4), CFG.vision) == 64
    aux = prepare_vision_aux([(1, 4, 4)], CFG.vision)
    assert aux.num_patches == 64 and aux.num_merged == 4
    assert (aux.patch_perm >= 0).sum() == 16
    rng = np.random.default_rng(0)
    patches = rng.normal(size=(16, 8)).astype(np.float32)
    layout = apply_patch_layout(patches, aux)
    assert layout.shape == (64, 8)
    # every original row appears exactly once; pad rows are zero
    valid = aux.patch_perm >= 0
    np.testing.assert_allclose(np.sort(layout[valid], axis=0), np.sort(patches, axis=0))
    assert (layout[~valid] == 0).all()
    # reverse_index points at slots holding the natural merged tokens
    merged_slots = aux.reverse_index
    assert len(set(merged_slots.tolist())) == 4
