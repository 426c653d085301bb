from . import qwen2_5_vl

__all__ = ["qwen2_5_vl"]
