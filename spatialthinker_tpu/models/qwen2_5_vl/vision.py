"""Qwen2.5-VL vision tower in functional JAX (window attention, variable
resolution, 2x2 spatial merge).

TPU-first restructuring of the computation HF's
Qwen2_5_VisionTransformerPretrainedModel performs:

- The Conv3d patch embed has kernel == stride, i.e. it IS a matmul: patches
  arrive host-flattened as (N, C*T*P*P) rows and hit the MXU directly.
- All ragged bookkeeping (window permutation, window/full segment ids, h/w
  rotary position ids, reverse index) depends only on image grid shapes, so it
  is precomputed on the host in numpy (``prepare_vision_aux``) and enters the
  device program as dense int arrays — no data-dependent control flow under jit.
- UNIFORM-WINDOW layout: every window occupies exactly window_patch_len
  consecutive slots (edge windows padded in place), so the 28 windowed blocks
  run as a dense (num_windows, 64, heads, d) batched attention — no
  cross-window mask work at all; only the 4 full-attention blocks pay for a
  masked full-sequence pass (flash kernel above the seq threshold).
- The HF model permutes hidden states into window order after embedding; since
  the patch embed is pointwise per patch, the HOST scatters the patch rows
  into the layout instead (apply_patch_layout) and the device un-permutes once
  at the end (merged granularity, reverse_index).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from .config import VisionConfig
from .text import rms_norm

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# host-side aux computation (numpy)
# ---------------------------------------------------------------------------


@dataclass
class VisionAux:
    """Everything the device tower needs besides the pixels, in the
    UNIFORM-WINDOW layout: every window occupies exactly
    spatial_merge_unit * vit_window^2 consecutive patch slots (image-edge
    windows are padded in place), so windowed blocks run as a dense
    (num_windows, window_len, ...) batched attention with no cross-window
    masking — the TPU-shaped replacement for variable-size window segments."""

    patch_perm: np.ndarray     # (N',) source patch index per layout slot, -1 = pad
    pos_ids: np.ndarray        # (N', 2) h/w rotary ids (0 on pads)
    seg_full: np.ndarray       # (N',) frame id per slot (full-attn blocks), 0 on pads
    seg_window: np.ndarray     # (N',) window id per slot, 0 on pads
    reverse_index: np.ndarray  # (num_merged_natural,) layout merged slot per natural position
    num_patches: int           # N' = layout size (incl. intra-window pads)
    num_merged: int            # natural merged token count (pre-padding)


def prepare_vision_aux(grid_thw: Sequence[Tuple[int, int, int]], cfg: VisionConfig) -> VisionAux:
    """Compute the uniform-window layout + segment ids + rotary pos ids for a
    batch of images (all concatenated into one packed vision sequence)."""
    merge = cfg.spatial_merge_size
    unit = cfg.spatial_merge_unit
    win = cfg.window_size // merge // cfg.patch_size

    merged_src_parts: List[np.ndarray] = []  # layout -> natural merged idx (-1 pad)
    window_counts: List[int] = []            # windows per image (x frames)
    frame_of_merged_parts: List[np.ndarray] = []
    pos_ids_natural: List[np.ndarray] = []
    merged_offset = 0
    frame_id = 0
    frame_of_layout_parts: List[np.ndarray] = []
    for t, h, w in grid_thw:
        t, h, w = int(t), int(h), int(w)
        llm_h, llm_w = h // merge, w // merge
        index = np.arange(t * llm_h * llm_w).reshape(t, llm_h, llm_w)
        pad_h = (-llm_h) % win
        pad_w = (-llm_w) % win
        index = np.pad(index, ((0, 0), (0, pad_h), (0, pad_w)), constant_values=-1)
        nh, nw = (llm_h + pad_h) // win, (llm_w + pad_w) // win
        index = index.reshape(t, nh, win, nw, win).transpose(0, 1, 3, 2, 4)
        flat = index.reshape(-1)  # (t * nh * nw * win * win,), -1 on pads
        merged_src_parts.append(np.where(flat >= 0, flat + merged_offset, -1))
        window_counts.append(t * nh * nw)
        # frame id for every layout merged slot of this image (valid slots only)
        frames = np.repeat(np.arange(frame_id + 1, frame_id + t + 1), nh * nw * win * win)
        frame_of_layout_parts.append(np.where(flat >= 0, frames, 0))
        frame_id += t
        merged_offset += t * llm_h * llm_w

        # h/w position ids in NATURAL patch order, grouped by merge blocks
        # (patch rows inside a merged 2x2 block are consecutive).
        hpos = np.arange(h).reshape(h, 1).repeat(w, axis=1)
        wpos = np.arange(w).reshape(1, w).repeat(h, axis=0)

        def _block_order(x):
            x = x.reshape(h // merge, merge, w // merge, merge)
            return x.transpose(0, 2, 1, 3).reshape(-1)

        per_frame = np.stack([_block_order(hpos), _block_order(wpos)], axis=-1)
        pos_ids_natural.append(np.tile(per_frame, (t, 1)))

    merged_src = np.concatenate(merged_src_parts)        # (layout_merged,)
    frame_of_layout = np.concatenate(frame_of_layout_parts)
    pos_natural = np.concatenate(pos_ids_natural)        # (N_natural, 2)
    num_merged = merged_offset
    layout_merged = merged_src.shape[0]
    num_patches = layout_merged * unit

    # patch-level source map: merged slot expands to `unit` consecutive patches
    patch_src = np.where(
        merged_src[:, None] >= 0,
        merged_src[:, None] * unit + np.arange(unit)[None, :],
        -1,
    ).reshape(-1)

    pos_ids = np.zeros((num_patches, 2), dtype=np.int64)
    valid = patch_src >= 0
    pos_ids[valid] = pos_natural[patch_src[valid]]

    seg_full = np.repeat(frame_of_layout, unit)

    # window ids: every window is exactly win*win merged slots, consecutive
    total_windows = sum(window_counts)
    seg_window_merged = np.repeat(np.arange(1, total_windows + 1), win * win)
    seg_window = np.repeat(np.where(merged_src >= 0, seg_window_merged, 0), unit)

    # natural merged position m lives at layout slot reverse_index[m]
    reverse_index = np.zeros(num_merged, dtype=np.int64)
    layout_positions = np.arange(layout_merged)
    sel = merged_src >= 0
    reverse_index[merged_src[sel]] = layout_positions[sel]

    return VisionAux(
        patch_perm=patch_src.astype(np.int32),
        pos_ids=pos_ids.astype(np.int32),
        seg_full=seg_full.astype(np.int32),
        seg_window=seg_window.astype(np.int32),
        reverse_index=reverse_index.astype(np.int32),
        num_patches=num_patches,
        num_merged=num_merged,
    )


def apply_patch_layout(patches: np.ndarray, aux: VisionAux) -> np.ndarray:
    """Scatter natural-order patch rows into the uniform-window layout
    (pad slots zero)."""
    out = np.zeros((aux.patch_perm.shape[0], patches.shape[1]), dtype=patches.dtype)
    valid = aux.patch_perm >= 0
    out[valid] = patches[aux.patch_perm[valid]]
    return out


def window_patch_len(cfg: VisionConfig) -> int:
    win = cfg.window_size // cfg.spatial_merge_size // cfg.patch_size
    return cfg.spatial_merge_unit * win * win


def layout_patch_count(grid_thw, cfg: VisionConfig) -> int:
    """Uniform-window layout size (patches) for one image grid."""
    t, h, w = (int(v) for v in grid_thw)
    merge = cfg.spatial_merge_size
    win = cfg.window_size // merge // cfg.patch_size
    llm_h, llm_w = h // merge, w // merge
    nh = -(-llm_h // win)
    nw = -(-llm_w // win)
    return t * nh * nw * win * win * cfg.spatial_merge_unit


def pad_vision_inputs(
    patches: np.ndarray, aux: VisionAux, pad_to: int, merge_unit: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad (already permuted) patch rows + aux vectors to a static bucket size.
    Returns (patches, pos_ids, seg_full, seg_window, reverse_index_padded)."""
    n = aux.num_patches
    assert pad_to >= n and pad_to % merge_unit == 0
    pad = pad_to - n
    patches = np.pad(patches, ((0, pad), (0, 0)))
    pos_ids = np.pad(aux.pos_ids, ((0, pad), (0, 0)))
    seg_full = np.pad(aux.seg_full, (0, pad))  # pads with 0 = no attention
    seg_window = np.pad(aux.seg_window, (0, pad))
    merged_pad_to = pad_to // merge_unit
    reverse = np.pad(aux.reverse_index, (0, merged_pad_to - aux.num_merged))
    return patches, pos_ids, seg_full, seg_window, reverse


# ---------------------------------------------------------------------------
# device-side tower (jnp)
# ---------------------------------------------------------------------------


def _vision_cos_sin(pos_ids: jnp.ndarray, head_dim: int, theta: float = 10000.0):
    """cos/sin (N, head_dim) from (N, 2) h/w ids: channels [h-freqs | w-freqs] duplicated."""
    quarter = head_dim // 4
    inv_freq = 1.0 / (theta ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter))
    freqs_h = pos_ids[:, 0:1].astype(jnp.float32) * inv_freq[None, :]
    freqs_w = pos_ids[:, 1:2].astype(jnp.float32) * inv_freq[None, :]
    half = jnp.concatenate([freqs_h, freqs_w], axis=-1)  # (N, head_dim/2)
    emb = jnp.concatenate([half, half], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def vision_forward(
    params: Params,
    cfg: VisionConfig,
    patches: jnp.ndarray,      # (N, C*T*P*P) float, window order
    pos_ids: jnp.ndarray,      # (N, 2)
    seg_full: jnp.ndarray,     # (N,)
    seg_window: jnp.ndarray,   # (N,)
    reverse_index: jnp.ndarray,  # (N/unit,)
    remat: bool = False,
) -> jnp.ndarray:
    """Returns merged vision embeddings (N/unit, out_hidden) in natural order."""
    n = patches.shape[0]
    e, h, d = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    x = jnp.dot(patches.astype(params["patch_embed"].dtype), params["patch_embed"])  # (N, E)
    cos, sin = _vision_cos_sin(pos_ids, d)
    cos = cos.astype(x.dtype)[None, :, None, :]  # (1, N, 1, D)
    sin = sin.astype(x.dtype)[None, :, None, :]

    full_mask_blocks = np.zeros(cfg.depth, dtype=bool)
    full_mask_blocks[list(cfg.fullatt_block_indexes)] = True
    use_full = jnp.asarray(full_mask_blocks)

    seg_full_b = seg_full[None, :]
    wlen = window_patch_len(cfg)
    num_windows = n // wlen
    seg_window_w = seg_window.reshape(num_windows, wlen)

    def body(x, xs):
        layer_p, is_full = xs
        normed = rms_norm(x, layer_p["norm1"], 1e-6)
        qkv = jnp.dot(normed, layer_p["qkv"]) + layer_p["qkv_bias"]  # (N, 3E)
        q, k, v = jnp.split(qkv.reshape(n, 3, h, d), 3, axis=1)
        q = q.reshape(1, n, h, d)
        k = k.reshape(1, n, h, d)
        v = v.reshape(1, n, h, d)
        q = (q * cos + _rotate_half(q) * sin).astype(x.dtype)
        k = (k * cos + _rotate_half(k) * sin).astype(x.dtype)

        def full_attn(qkv3):
            q_, k_, v_ = qkv3
            return attention(q_, k_, v_, segment_ids=seg_full_b, causal=False).reshape(n, e)

        def win_attn(qkv3):
            # dense per-window attention: (num_windows, wlen, H, D) — no
            # cross-window mask work; edge-window padding via segment id 0
            q_, k_, v_ = (t.reshape(num_windows, wlen, h, d) for t in qkv3)
            out = attention(q_, k_, v_, segment_ids=seg_window_w, causal=False)
            return out.reshape(n, e)

        out = jax.lax.cond(is_full, full_attn, win_attn, (q, k, v))
        x = x + jnp.dot(out, layer_p["proj"]) + layer_p["proj_bias"]
        normed2 = rms_norm(x, layer_p["norm2"], 1e-6)
        gate = jnp.dot(normed2, layer_p["mlp"]["gate_proj"]) + layer_p["mlp"]["gate_bias"]
        up = jnp.dot(normed2, layer_p["mlp"]["up_proj"]) + layer_p["mlp"]["up_bias"]
        x = x + jnp.dot(jax.nn.silu(gate) * up, layer_p["mlp"]["down_proj"]) + layer_p["mlp"]["down_bias"]
        return x, None

    if remat:
        body = jax.checkpoint(body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    x, _ = jax.lax.scan(body, x, (params["blocks"], use_full))

    # merger: RMSNorm then fold 2x2 merge unit into features
    m = params["merger"]
    x = rms_norm(x, m["ln_q"], 1e-6)
    x = x.reshape(n // cfg.spatial_merge_unit, cfg.spatial_merge_unit * e)
    x = jnp.dot(x, m["fc1"]) + m["fc1_bias"]
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.dot(x, m["fc2"]) + m["fc2_bias"]  # (N/unit, out_hidden)
    return jnp.take(x, reverse_index, axis=0)


def init_vision_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    e, L, inter = cfg.hidden_size, cfg.depth, cfg.intermediate_size
    din = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size * cfg.patch_size
    unit = cfg.spatial_merge_unit
    keys = jax.random.split(key, 8)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    return {
        "patch_embed": dense(keys[0], (din, e)),
        "blocks": {
            "norm1": jnp.ones((L, e), dtype),
            "norm2": jnp.ones((L, e), dtype),
            "qkv": dense(keys[1], (L, e, 3 * e)),
            "qkv_bias": jnp.zeros((L, 3 * e), dtype),
            "proj": dense(keys[2], (L, e, e)),
            "proj_bias": jnp.zeros((L, e), dtype),
            "mlp": {
                "gate_proj": dense(keys[3], (L, e, inter)),
                "gate_bias": jnp.zeros((L, inter), dtype),
                "up_proj": dense(keys[4], (L, e, inter)),
                "up_bias": jnp.zeros((L, inter), dtype),
                "down_proj": dense(keys[5], (L, inter, e)),
                "down_bias": jnp.zeros((L, e), dtype),
            },
        },
        "merger": {
            "ln_q": jnp.ones((e,), dtype),
            "fc1": dense(keys[6], (unit * e, unit * e)),
            "fc1_bias": jnp.zeros((unit * e,), dtype),
            "fc2": dense(keys[7], (unit * e, cfg.out_hidden_size)),
            "fc2_bias": jnp.zeros((cfg.out_hidden_size,), dtype),
        },
    }
