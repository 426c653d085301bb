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


def test_prefetch_loader_matches_sync_and_resumes():
    """num_workers>0 must yield identical batches in the same order as the
    synchronous loader, and checkpoint state must resume mid-epoch."""
    from spatialthinker_tpu.core.config import DataConfig
    from spatialthinker_tpu.data.dataset import DataLoader, RLHFDataset
    from spatialthinker_tpu.models.qwen2_5_vl import qwen25_vl_tiny
    from tests.fake_tokenizer import FakeTokenizer

    tok = FakeTokenizer(1024)
    model_cfg = qwen25_vl_tiny(1024)
    data_cfg = DataConfig(max_prompt_length=32)
    rows = [{"problem": f"What is {i} plus {i}?", "answer": str(2 * i)} for i in range(17)]
    ds = RLHFDataset.from_rows(rows, tok, data_cfg, model_cfg)

    sync_batches = list(DataLoader(ds, 4, shuffle=True, seed=7))
    pre_batches = list(DataLoader(ds, 4, shuffle=True, seed=7, num_workers=4, prefetch_batches=2))
    assert len(sync_batches) == len(pre_batches) == 4
    for a, b in zip(sync_batches, pre_batches):
        np.testing.assert_array_equal(a.tensors["input_ids"], b.tensors["input_ids"])
        assert list(a.non_tensors["problem"]) == list(b.non_tensors["problem"])

    # resume: consume 2 batches, checkpoint, rebuild, finish the epoch
    first = DataLoader(ds, 4, shuffle=True, seed=7, num_workers=4)
    it = iter(first)
    consumed = [next(it), next(it)]
    state = first.state_dict()
    resumed = DataLoader(ds, 4, shuffle=True, seed=7, num_workers=4)
    resumed.load_state_dict(state)
    rest = list(resumed)
    assert len(consumed) + len(rest) == 4
    for got, want in zip(consumed + rest, sync_batches):
        np.testing.assert_array_equal(got.tensors["input_ids"], want.tensors["input_ids"])
