"""Analytic FLOPs counting + MFU, keyed on TPU generation.

Parity with the reference's FlopsCounter
(/root/reference/verl/utils/flops_counter.py:27-133): dense matmul + attention
FLOPs for a Qwen-shaped decoder, divided by the device's promised peak to give
model FLOPs utilization. The peak table is TPU generations instead of GPU SKUs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from ..models.qwen2_5_vl.config import Qwen25VLConfig

# promised bf16 peak FLOPs per chip
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
    "cpu": 1e12,  # nominal, keeps MFU finite in tests
}


def device_peak_flops(device_kind: str) -> float:
    kind = device_kind.lower()
    for key, peak in TPU_PEAK_FLOPS.items():
        if key in kind:
            return peak
    return 197e12  # default to v5e-class


class FlopsCounter:
    def __init__(self, config: Qwen25VLConfig):
        self.config = config

    def _dense_flops_per_token(self) -> float:
        t = self.config.text
        e = t.hidden_size
        heads_dim = t.num_attention_heads * t.head_dim
        kv_dim = t.num_key_value_heads * t.head_dim
        per_layer = 2 * (
            e * heads_dim          # q
            + 2 * e * kv_dim       # k, v
            + heads_dim * e        # o
            + 3 * e * t.intermediate_size  # gate, up, down
        )
        lm_head = 2 * e * t.vocab_size
        return per_layer * t.num_hidden_layers + lm_head

    def _attention_flops(self, seqlen_sum_sq: float) -> float:
        t = self.config.text
        # qk^T and pv: 2 matmuls, 2 FLOPs per MAC, over all heads
        return 4 * t.num_attention_heads * t.head_dim * seqlen_sum_sq * t.num_hidden_layers

    def _vision_flops(self, num_patches: float) -> float:
        """Vision-tower forward FLOPs for ``num_patches`` packed patches.
        The reference's FlopsCounter ignores the tower entirely, overstating
        multimodal MFU — counted here: patch embed, per-block qkv/proj/gated
        MLP, window vs full attention context, and the spatial merger."""
        if num_patches <= 0:
            return 0.0
        v = self.config.vision
        e, inter = v.hidden_size, v.intermediate_size
        din = v.in_channels * v.temporal_patch_size * v.patch_size**2
        dense_per_patch_per_block = 2 * (e * 3 * e + e * e + 3 * e * inter)
        # window layers attend (window/patch)^2 patches; fullatt blocks attend
        # the whole packed sequence (approximation: one image of num_patches)
        win = (v.window_size // v.patch_size) ** 2
        n_full = len(v.fullatt_block_indexes)
        n_win = v.depth - n_full
        attn_per_patch = 4 * e * (n_win * min(win, num_patches) + n_full * num_patches)
        unit = v.spatial_merge_unit
        merger_per_patch = 2 * (unit * e * e + e * self.config.text.hidden_size)
        embed_per_patch = 2 * din * e
        return num_patches * (
            v.depth * dense_per_patch_per_block
            + attn_per_patch
            + merger_per_patch
            + embed_per_patch
        )

    def estimate_flops(
        self, batch_seqlens: Sequence[int], delta_time: float, vision_patches: float = 0.0
    ) -> Tuple[float, float]:
        """Returns (achieved TFLOPs/s, promised TFLOPs/s-per-chip). Mirrors the
        reference signature: token counts per sequence + wall time; plus the
        batch's packed vision patch count (reference counts text only)."""
        total_tokens = float(sum(batch_seqlens))
        seq_sq = float(sum(s * s for s in batch_seqlens))
        flops = (
            total_tokens * self._dense_flops_per_token()
            + self._attention_flops(seq_sq)
            + self._vision_flops(float(vision_patches))
        )
        achieved = flops / max(delta_time, 1e-9) / 1e12
        import jax

        promised = device_peak_flops(jax.devices()[0].device_kind) / 1e12
        return achieved, promised


def compute_mfu(
    counter: FlopsCounter,
    batch_seqlens: Sequence[int],
    delta_time: float,
    n_chips: int,
    ppo_epochs: int = 1,
    vision_patches: float = 0.0,
) -> float:
    achieved, promised = counter.estimate_flops(batch_seqlens, delta_time, vision_patches)
    # fwd + bwd = 3x forward FLOPs; multiplied by epochs over the same data
    return achieved * 3 * ppo_epochs / (promised * n_chips)
