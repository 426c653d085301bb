from .config import Qwen25VLConfig, TextConfig, VisionConfig, get_config, qwen25_vl_3b, qwen25_vl_7b, qwen25_vl_tiny
from .model import VisionInputs, forward, forward_logits, init_params, merge_multimodal_embeds
from .params import config_from_hf_json, load_params, params_from_hf_state_dict
from .rope import get_mrope_position_ids
from .text import KVCache, forward_hidden, init_text_params, logits_from_hidden
from .vision import VisionAux, apply_patch_layout, pad_vision_inputs, prepare_vision_aux, vision_forward, window_patch_len

__all__ = [
    "Qwen25VLConfig", "TextConfig", "VisionConfig", "get_config",
    "qwen25_vl_3b", "qwen25_vl_7b", "qwen25_vl_tiny",
    "VisionInputs", "forward", "forward_logits", "init_params", "merge_multimodal_embeds",
    "config_from_hf_json", "load_params", "params_from_hf_state_dict",
    "get_mrope_position_ids", "KVCache", "forward_hidden", "init_text_params",
    "logits_from_hidden", "VisionAux", "pad_vision_inputs", "prepare_vision_aux", "vision_forward",
]
