"""Checkpoint -> HuggingFace export: convert a trained orbax checkpoint (the
functional param pytree) into HF safetensors + config.json so the model loads
in transformers / the eval harness's HF provider.

Role parity with /root/reference/scripts/model_merger.py:37-164 (which merges
FSDP DTensor shards); here there are no shards to merge — orbax restores the
global arrays — so this is a pure layout/key translation (the exact inverse of
params.params_from_hf_state_dict).

CLI: python -m spatialthinker_tpu.tools.model_merger \
       --checkpoint ckpts/global_step_75 --output ./hf_model [--preset 3b]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict

import numpy as np

from ..models.qwen2_5_vl.config import Qwen25VLConfig, get_config


def params_to_hf_state_dict(params: Dict[str, Any], cfg: Qwen25VLConfig) -> Dict[str, np.ndarray]:
    """Inverse of params_from_hf_state_dict: (in,out) -> torch (out,in),
    unstack the (L, ...) scan leaves, re-fold the patch embed to Conv3d."""
    state: Dict[str, np.ndarray] = {}

    def t(x):  # (in, out) -> (out, in)
        return np.ascontiguousarray(np.asarray(x).T)

    def raw(x):
        return np.ascontiguousarray(np.asarray(x))

    text = params["text"]
    tp, vp = "model.language_model.", "model.visual."
    state[f"{tp}embed_tokens.weight"] = raw(text["embed_tokens"])
    state[f"{tp}norm.weight"] = raw(text["norm"])
    if not cfg.text.tie_word_embeddings and "lm_head" in text:
        state["lm_head.weight"] = t(text["lm_head"])

    L = cfg.text.num_hidden_layers
    tc = cfg.text
    h, hkv, d, e = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim, tc.hidden_size
    qper = h // hkv
    layers = text["layers"]
    for i in range(L):
        pre = f"{tp}layers.{i}."
        attn = layers["self_attn"]
        # unfuse (Hkv, E, (qper+2)*d) -> HF q/k/v (exact inverse of the
        # loader's fuse: per-group columns are [q heads | k | v])
        qkv_w = np.asarray(attn["qkv_proj"][i]).transpose(1, 0, 2)  # (E, Hkv, G)
        qkv_b = np.asarray(attn["qkv_bias"][i])  # (Hkv, G)
        state[pre + "self_attn.q_proj.weight"] = t(qkv_w[..., : qper * d].reshape(e, h * d))
        state[pre + "self_attn.k_proj.weight"] = t(
            qkv_w[..., qper * d : (qper + 1) * d].reshape(e, hkv * d)
        )
        state[pre + "self_attn.v_proj.weight"] = t(
            qkv_w[..., (qper + 1) * d :].reshape(e, hkv * d)
        )
        state[pre + "self_attn.o_proj.weight"] = t(attn["o_proj"][i])
        state[pre + "self_attn.q_proj.bias"] = raw(qkv_b[..., : qper * d].reshape(h * d))
        state[pre + "self_attn.k_proj.bias"] = raw(
            qkv_b[..., qper * d : (qper + 1) * d].reshape(hkv * d)
        )
        state[pre + "self_attn.v_proj.bias"] = raw(qkv_b[..., (qper + 1) * d :].reshape(hkv * d))
        mlp = layers["mlp"]
        state[pre + "mlp.gate_proj.weight"] = t(mlp["gate_up_proj"][i][0])
        state[pre + "mlp.up_proj.weight"] = t(mlp["gate_up_proj"][i][1])
        state[pre + "mlp.down_proj.weight"] = t(mlp["down_proj"][i])
        state[pre + "input_layernorm.weight"] = raw(layers["input_layernorm"][i])
        state[pre + "post_attention_layernorm.weight"] = raw(layers["post_attention_layernorm"][i])

    vision = params["vision"]
    vc = cfg.vision
    patch = np.asarray(vision["patch_embed"]).T  # (E, C*T*P*P)
    state[f"{vp}patch_embed.proj.weight"] = np.ascontiguousarray(
        patch.reshape(vc.hidden_size, vc.in_channels, vc.temporal_patch_size,
                      vc.patch_size, vc.patch_size)
    )
    blocks = vision["blocks"]
    for i in range(vc.depth):
        pre = f"{vp}blocks.{i}."
        state[pre + "norm1.weight"] = raw(blocks["norm1"][i])
        state[pre + "norm2.weight"] = raw(blocks["norm2"][i])
        state[pre + "attn.qkv.weight"] = t(blocks["qkv"][i])
        state[pre + "attn.qkv.bias"] = raw(blocks["qkv_bias"][i])
        state[pre + "attn.proj.weight"] = t(blocks["proj"][i])
        state[pre + "attn.proj.bias"] = raw(blocks["proj_bias"][i])
        mlp = blocks["mlp"]
        state[pre + "mlp.gate_proj.weight"] = t(mlp["gate_proj"][i])
        state[pre + "mlp.gate_proj.bias"] = raw(mlp["gate_bias"][i])
        state[pre + "mlp.up_proj.weight"] = t(mlp["up_proj"][i])
        state[pre + "mlp.up_proj.bias"] = raw(mlp["up_bias"][i])
        state[pre + "mlp.down_proj.weight"] = t(mlp["down_proj"][i])
        state[pre + "mlp.down_proj.bias"] = raw(mlp["down_bias"][i])
    merger = vision["merger"]
    state[f"{vp}merger.ln_q.weight"] = raw(merger["ln_q"])
    state[f"{vp}merger.mlp.0.weight"] = t(merger["fc1"])
    state[f"{vp}merger.mlp.0.bias"] = raw(merger["fc1_bias"])
    state[f"{vp}merger.mlp.2.weight"] = t(merger["fc2"])
    state[f"{vp}merger.mlp.2.bias"] = raw(merger["fc2_bias"])
    return state


def hf_config_dict(cfg: Qwen25VLConfig) -> Dict[str, Any]:
    t, v = cfg.text, cfg.vision
    return {
        "architectures": ["Qwen2_5_VLForConditionalGeneration"],
        "model_type": "qwen2_5_vl",
        "tie_word_embeddings": t.tie_word_embeddings,
        "image_token_id": cfg.image_token_id,
        "video_token_id": cfg.video_token_id,
        "vision_start_token_id": cfg.vision_start_token_id,
        "vision_end_token_id": cfg.vision_end_token_id,
        "eos_token_id": cfg.eos_token_id,
        "text_config": {
            "model_type": "qwen2_5_vl_text",
            "vocab_size": t.vocab_size,
            "hidden_size": t.hidden_size,
            "intermediate_size": t.intermediate_size,
            "num_hidden_layers": t.num_hidden_layers,
            "num_attention_heads": t.num_attention_heads,
            "num_key_value_heads": t.num_key_value_heads,
            "rms_norm_eps": t.rms_norm_eps,
            "rope_theta": t.rope_theta,
            "max_position_embeddings": t.max_position_embeddings,
            "hidden_act": t.hidden_act,
            "tie_word_embeddings": t.tie_word_embeddings,
            "rope_scaling": {"type": "mrope", "mrope_section": list(t.mrope_section)},
        },
        "vision_config": {
            "model_type": "qwen2_5_vl",
            "depth": v.depth,
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_heads": v.num_heads,
            "in_channels": v.in_channels,
            "patch_size": v.patch_size,
            "spatial_merge_size": v.spatial_merge_size,
            "temporal_patch_size": v.temporal_patch_size,
            "tokens_per_second": v.tokens_per_second,
            "window_size": v.window_size,
            "out_hidden_size": v.out_hidden_size,
            "fullatt_block_indexes": list(v.fullatt_block_indexes),
            "hidden_act": v.hidden_act,
        },
    }


def export_hf(params: Dict[str, Any], cfg: Qwen25VLConfig, output_dir: str,
              dtype: str = "bfloat16") -> None:
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    state = params_to_hf_state_dict(params, cfg)
    # safetensors-numpy cannot hold bf16; save fp32 unless told otherwise
    np_dtype = np.float32 if dtype == "float32" else np.float16 if dtype == "float16" else None
    if np_dtype is not None:
        state = {k: v.astype(np_dtype) for k, v in state.items()}
    else:
        try:
            import ml_dtypes

            state = {k: v.astype(ml_dtypes.bfloat16) for k, v in state.items()}
        except ImportError:
            state = {k: v.astype(np.float32) for k, v in state.items()}
    save_file(state, os.path.join(output_dir, "model.safetensors"))
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(hf_config_dict(cfg), f, indent=2)


def load_checkpoint_params(checkpoint_dir: str, cfg: Qwen25VLConfig):
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..models.qwen2_5_vl.model import init_params

    template = jax.eval_shape(lambda: init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16))
    path = checkpoint_dir
    if os.path.isdir(os.path.join(checkpoint_dir, "params")):
        path = os.path.join(checkpoint_dir, "params")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help="global_step_N dir")
    parser.add_argument("--output", required=True)
    parser.add_argument("--preset", default="3b")
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    cfg = get_config(args.preset)
    params = load_checkpoint_params(args.checkpoint, cfg)
    export_hf(params, cfg, args.output, dtype=args.dtype)
    print(f"exported HF model to {args.output}")


if __name__ == "__main__":
    main()
