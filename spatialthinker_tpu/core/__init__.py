from .batch import RolloutBatch, pad_to_divisor, unpad
from .config import PPOConfig, build_config, load_yaml, parse_cli

__all__ = ["RolloutBatch", "pad_to_divisor", "unpad", "PPOConfig", "build_config", "load_yaml", "parse_cli"]
