"""mRoPE: multimodal 3D rotary position embeddings.

Two halves, split by where the work belongs on TPU:

- HOST (numpy, per-sample, ragged-friendly): ``get_mrope_position_ids`` computes
  the (3, seqlen) temporal/height/width position-id tensor from token ids and
  image grids — behavioral parity with the reference's pre-sharding
  ``get_rope_index`` (/root/reference/verl/models/transformers/qwen2_vl.py:36-136).
- DEVICE (jnp, static shapes): ``compute_cos_sin`` turns position ids into
  mrope-merged cos/sin tables once per forward (shared across layers), and
  ``apply_rotary`` rotates q/k. The per-channel t/h/w interleave of
  mrope_section is pre-merged into the tables so the per-layer work is two
  fused multiplies — cheaper than HF's per-layer split/cat.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def get_mrope_position_ids(
    input_ids: np.ndarray,  # (seqlen,) — one sample, already attention-masked
    image_grid_thw: Optional[np.ndarray],  # (num_images, 3)
    *,
    spatial_merge_size: int,
    image_token_id: int,
    video_token_id: int,
    vision_start_token_id: int,
    tokens_per_second: int = 2,
    video_grid_thw: Optional[np.ndarray] = None,
    second_per_grid_ts: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, int]:
    """Returns ((3, seqlen) position ids, mrope_delta).

    mrope_delta = (max position id + 1) - seqlen; decode continues text
    positions from max+1, so new tokens at sequence index i take position
    i + delta (the reference recomputes this in its vLLM wrapper,
    /root/reference/verl/workers/rollout/vllm_rollout_spmd.py:115-188).
    """
    input_ids = np.asarray(input_ids)
    seqlen = input_ids.shape[0]
    if image_grid_thw is None and video_grid_thw is None:
        pos = np.arange(seqlen, dtype=np.int64)
        return np.tile(pos, (3, 1)), 0

    vision_starts = np.flatnonzero(input_ids == vision_start_token_id)
    next_tokens = input_ids[np.minimum(vision_starts + 1, seqlen - 1)]
    image_nums = int(np.sum(next_tokens == image_token_id))
    video_nums = int(np.sum(next_tokens == video_token_id))

    tokens = input_ids.tolist()
    pos_chunks = []
    st = 0
    image_index, video_index = 0, 0
    remain_images, remain_videos = image_nums, video_nums

    def _find(token_id, start):
        try:
            return tokens.index(token_id, start)
        except ValueError:
            return len(tokens) + 1

    for _ in range(image_nums + video_nums):
        ed_image = _find(image_token_id, st) if remain_images > 0 else len(tokens) + 1
        ed_video = _find(video_token_id, st) if remain_videos > 0 else len(tokens) + 1
        if ed_image < ed_video:
            t, h, w = (int(x) for x in image_grid_thw[image_index])
            second_per_grid_t = 0.0
            image_index += 1
            remain_images -= 1
            ed = ed_image
        else:
            t, h, w = (int(x) for x in video_grid_thw[video_index])
            if second_per_grid_ts is not None:
                second_per_grid_t = float(second_per_grid_ts[video_index])
            else:
                second_per_grid_t = 1.0
            video_index += 1
            remain_videos -= 1
            ed = ed_video

        llm_t = t
        llm_h = h // spatial_merge_size
        llm_w = w // spatial_merge_size
        text_len = ed - st
        st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
        if text_len > 0:
            text_pos = np.arange(text_len, dtype=np.int64) + st_idx
            pos_chunks.append(np.tile(text_pos, (3, 1)))

        t_index = (
            (np.arange(llm_t, dtype=np.float64)[:, None] * second_per_grid_t * tokens_per_second)
            .astype(np.int64)
            .repeat(llm_h * llm_w, axis=1)
            .reshape(-1)
        )
        h_index = np.tile(np.repeat(np.arange(llm_h, dtype=np.int64), llm_w), llm_t)
        w_index = np.tile(np.arange(llm_w, dtype=np.int64), llm_t * llm_h)
        pos_chunks.append(np.stack([t_index, h_index, w_index]) + text_len + st_idx)
        st = ed + llm_t * llm_h * llm_w

    if st < len(tokens):
        st_idx = pos_chunks[-1].max() + 1 if pos_chunks else 0
        text_len = len(tokens) - st
        text_pos = np.arange(text_len, dtype=np.int64) + st_idx
        pos_chunks.append(np.tile(text_pos, (3, 1)))

    positions = np.concatenate(pos_chunks, axis=1)
    delta = int(positions.max()) + 1 - seqlen
    return positions, delta


def make_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    return 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))


def compute_cos_sin(
    position_ids: jnp.ndarray,  # (3, B, S) int
    inv_freq: jnp.ndarray,  # (head_dim/2,)
    mrope_section: Tuple[int, int, int],
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns mrope-merged cos/sin of shape (B, S, head_dim).

    freqs (3, B, S, head_dim/2) are selected per-channel-chunk from the t/h/w
    components according to mrope_section, then duplicated (cat(freqs, freqs))
    to cover the full head_dim rotate-half layout.
    """
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq[None, None, None, :]
    # channel selector: chunk c of mrope_section belongs to component c
    half = int(inv_freq.shape[0])
    sel = np.zeros((half,), dtype=np.int32)
    start = 0
    for comp, width in enumerate(mrope_section):
        sel[start : start + width] = comp
        start += width
    sel_j = jnp.asarray(sel)[None, None, :]  # (1, 1, half)
    # select per-channel component: (B, S, half)
    merged = jnp.where(sel_j == 0, freqs[0], jnp.where(sel_j == 1, freqs[1], freqs[2]))
    emb = jnp.concatenate([merged, merged], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, S, Hkv, D)
    cos: jnp.ndarray,  # (B, S, D)
    sin: jnp.ndarray,  # (B, S, D)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
