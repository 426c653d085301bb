from .engine import RolloutResult, generate
from .sampling import SamplingParams, get_response_mask, sample_tokens

__all__ = ["RolloutResult", "generate", "SamplingParams", "get_response_mask", "sample_tokens"]
