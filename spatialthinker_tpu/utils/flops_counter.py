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

    def estimate_flops(self, batch_seqlens: Sequence[int], delta_time: float) -> Tuple[float, float]:
        """Returns (achieved TFLOPs/s, promised TFLOPs/s-per-chip). Mirrors the
        reference signature: token counts per sequence + wall time."""
        total_tokens = float(sum(batch_seqlens))
        seq_sq = float(sum(s * s for s in batch_seqlens))
        flops = total_tokens * self._dense_flops_per_token() + self._attention_flops(seq_sq)
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
) -> float:
    achieved, promised = counter.estimate_flops(batch_seqlens, delta_time)
    # fwd + bwd = 3x forward FLOPs; multiplied by epochs over the same data
    return achieved * 3 * ppo_epochs / (promised * n_chips)
