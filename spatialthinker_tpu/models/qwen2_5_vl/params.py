"""HF checkpoint loading: safetensors -> the functional param pytree.

Handles both HF key layouts (new: model.language_model.* / model.visual.*,
old: model.* / visual.*), transposes torch (out,in) Linear weights to (in,out),
flattens the Conv3d patch embed into a matmul weight, and stacks per-layer
tensors into the scanned (L, ...) leaves. Parity role: the model loading the
reference performs via HF AutoModel (/root/reference/verl/workers/fsdp_workers.py:189-236).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .config import Qwen25VLConfig, TextConfig, VisionConfig


def _open_all_safetensors(model_dir: str) -> Dict[str, np.ndarray]:
    try:
        from safetensors.numpy import load_file
    except ImportError as e:  # pragma: no cover
        raise ImportError("safetensors is required to load HF checkpoints") from e

    tensors: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    for f in files:
        tensors.update(load_file(f))
    return tensors


def config_from_hf_json(model_dir: str) -> Qwen25VLConfig:
    """Build our config from an HF config.json on disk."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    text_src = hf.get("text_config", hf)
    vis = hf["vision_config"]
    text = TextConfig(
        vocab_size=text_src["vocab_size"],
        hidden_size=text_src["hidden_size"],
        intermediate_size=text_src["intermediate_size"],
        num_hidden_layers=text_src["num_hidden_layers"],
        num_attention_heads=text_src["num_attention_heads"],
        num_key_value_heads=text_src["num_key_value_heads"],
        rms_norm_eps=text_src.get("rms_norm_eps", 1e-6),
        rope_theta=text_src.get("rope_theta", 1e6),
        mrope_section=tuple(text_src["rope_scaling"]["mrope_section"]),
        tie_word_embeddings=hf.get("tie_word_embeddings", text_src.get("tie_word_embeddings", False)),
    )
    vision = VisionConfig(
        depth=vis.get("depth", 32),
        hidden_size=vis.get("hidden_size", 1280),
        intermediate_size=vis.get("intermediate_size", 3420),
        num_heads=vis.get("num_heads", 16),
        in_channels=vis.get("in_channels", vis.get("in_chans", 3)),
        patch_size=vis.get("patch_size", 14),
        spatial_merge_size=vis.get("spatial_merge_size", 2),
        temporal_patch_size=vis.get("temporal_patch_size", 2),
        tokens_per_second=vis.get("tokens_per_second", 2),
        window_size=vis.get("window_size", 112),
        out_hidden_size=vis.get("out_hidden_size", text.hidden_size),
        fullatt_block_indexes=tuple(vis.get("fullatt_block_indexes", (7, 15, 23, 31))),
    )
    return Qwen25VLConfig(
        text=text,
        vision=vision,
        image_token_id=hf.get("image_token_id", 151655),
        video_token_id=hf.get("video_token_id", 151656),
        vision_start_token_id=hf.get("vision_start_token_id", 151652),
        vision_end_token_id=hf.get("vision_end_token_id", 151653),
        eos_token_id=hf.get("eos_token_id", 151645),
    )


def _detect_prefixes(keys) -> Dict[str, str]:
    if any(k.startswith("model.language_model.") for k in keys):
        return {"text": "model.language_model.", "vision": "model.visual."}
    return {"text": "model.", "vision": "visual."}


def params_from_hf_state_dict(
    state: Dict[str, np.ndarray], cfg: Qwen25VLConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Convert an HF state dict (numpy tensors, torch layout) to our pytree."""
    pref = _detect_prefixes(state.keys())
    tp, vp = pref["text"], pref["vision"]

    def t(name):  # torch linear -> (in, out)
        return np.ascontiguousarray(state[name].T)

    def raw(name):
        return state[name]

    L = cfg.text.num_hidden_layers
    tc = cfg.text
    h, hkv, d, e = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim, tc.hidden_size
    qper = h // hkv

    def stack_t(fmt):
        return np.stack([t(fmt.format(i=i)) for i in range(L)])

    def stack_raw(fmt):
        return np.stack([raw(fmt.format(i=i)) for i in range(L)])

    def fuse_qkv_weights(q_w, k_w, v_w):
        """(L,e,h*d)+(L,e,hkv*d)x2 -> (L,hkv,e,(qper+2)*d), per-group [q|k|v]
        (see text.fused_qkv; q head order within groups is the HF order;
        group axis leads so the stored layout is XLA's dot layout)."""
        q_g = q_w.reshape(L, e, hkv, qper * d).transpose(0, 2, 1, 3)
        k_g = k_w.reshape(L, e, hkv, d).transpose(0, 2, 1, 3)
        v_g = v_w.reshape(L, e, hkv, d).transpose(0, 2, 1, 3)
        return np.concatenate([q_g, k_g, v_g], axis=-1)

    def fuse_qkv_biases(q_b, k_b, v_b):
        q_g = q_b.reshape(L, hkv, qper * d)
        k_g = k_b.reshape(L, hkv, d)
        v_g = v_b.reshape(L, hkv, d)
        return np.concatenate([q_g, k_g, v_g], axis=-1)

    text = {
        "embed_tokens": raw(f"{tp}embed_tokens.weight"),
        "norm": raw(f"{tp}norm.weight"),
        "layers": {
            "self_attn": {
                "qkv_proj": fuse_qkv_weights(
                    stack_t(tp + "layers.{i}.self_attn.q_proj.weight"),
                    stack_t(tp + "layers.{i}.self_attn.k_proj.weight"),
                    stack_t(tp + "layers.{i}.self_attn.v_proj.weight"),
                ),
                "qkv_bias": fuse_qkv_biases(
                    stack_raw(tp + "layers.{i}.self_attn.q_proj.bias"),
                    stack_raw(tp + "layers.{i}.self_attn.k_proj.bias"),
                    stack_raw(tp + "layers.{i}.self_attn.v_proj.bias"),
                ),
                "o_proj": stack_t(tp + "layers.{i}.self_attn.o_proj.weight"),
            },
            "mlp": {
                "gate_up_proj": np.stack(
                    [
                        stack_t(tp + "layers.{i}.mlp.gate_proj.weight"),
                        stack_t(tp + "layers.{i}.mlp.up_proj.weight"),
                    ],
                    axis=1,
                ),  # (L, 2, e, inter)
                "down_proj": stack_t(tp + "layers.{i}.mlp.down_proj.weight"),
            },
            "input_layernorm": stack_raw(tp + "layers.{i}.input_layernorm.weight"),
            "post_attention_layernorm": stack_raw(tp + "layers.{i}.post_attention_layernorm.weight"),
        },
    }
    if not cfg.text.tie_word_embeddings:
        text["lm_head"] = t("lm_head.weight")

    VD = cfg.vision.depth

    def vstack_t(fmt):
        return np.stack([t(fmt.format(i=i)) for i in range(VD)])

    def vstack_raw(fmt):
        return np.stack([raw(fmt.format(i=i)) for i in range(VD)])

    patch_w = raw(f"{vp}patch_embed.proj.weight")  # (E, C, T, P, P)
    patch_w = patch_w.reshape(patch_w.shape[0], -1).T  # (C*T*P*P, E)

    vision = {
        "patch_embed": np.ascontiguousarray(patch_w),
        "blocks": {
            "norm1": vstack_raw(vp + "blocks.{i}.norm1.weight"),
            "norm2": vstack_raw(vp + "blocks.{i}.norm2.weight"),
            "qkv": vstack_t(vp + "blocks.{i}.attn.qkv.weight"),
            "qkv_bias": vstack_raw(vp + "blocks.{i}.attn.qkv.bias"),
            "proj": vstack_t(vp + "blocks.{i}.attn.proj.weight"),
            "proj_bias": vstack_raw(vp + "blocks.{i}.attn.proj.bias"),
            "mlp": {
                "gate_proj": vstack_t(vp + "blocks.{i}.mlp.gate_proj.weight"),
                "gate_bias": vstack_raw(vp + "blocks.{i}.mlp.gate_proj.bias"),
                "up_proj": vstack_t(vp + "blocks.{i}.mlp.up_proj.weight"),
                "up_bias": vstack_raw(vp + "blocks.{i}.mlp.up_proj.bias"),
                "down_proj": vstack_t(vp + "blocks.{i}.mlp.down_proj.weight"),
                "down_bias": vstack_raw(vp + "blocks.{i}.mlp.down_proj.bias"),
            },
        },
        "merger": {
            "ln_q": raw(f"{vp}merger.ln_q.weight"),
            "fc1": t(f"{vp}merger.mlp.0.weight"),
            "fc1_bias": raw(f"{vp}merger.mlp.0.bias"),
            "fc2": t(f"{vp}merger.mlp.2.weight"),
            "fc2_bias": raw(f"{vp}merger.mlp.2.bias"),
        },
    }

    import jax

    params = {"text": text, "vision": vision}
    return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), params)


def load_params(model_dir: str, dtype=jnp.bfloat16):
    """Load (config, params) from a local HF checkpoint directory."""
    cfg = config_from_hf_json(model_dir)
    state = _open_all_safetensors(model_dir)
    return cfg, params_from_hf_state_dict(state, cfg, dtype=dtype)
