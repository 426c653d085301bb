"""SpatialThinker-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for multimodal
GRPO training of vision-language models with dense spatial rewards.

This is a ground-up TPU-first rebuild of the capabilities of
hunarbatra/SpatialThinker (a verl/EasyR1 fork): Qwen2.5-VL GRPO training on
spatial-VQA data with a multi-objective dense reward (format + scene-graph
count + accuracy + bbox-IoU grounding), an on-device rollout engine replacing
vLLM, and a 19-benchmark spatial evaluation harness.

Architecture: one SPMD program, one device mesh, one copy of the weights shared
by training and decoding. See README.md for the layer map.
"""

__version__ = "0.1.0"
