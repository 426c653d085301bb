from .attention import attention, make_attention_mask, xla_attention

__all__ = ["attention", "make_attention_mask", "xla_attention"]
