"""Test alias for the packaged synthetic tokenizer."""

from spatialthinker_tpu.utils.synthetic_tokenizer import SyntheticTokenizer as FakeTokenizer

__all__ = ["FakeTokenizer"]
