"""Round-trip test: our params -> HF state dict -> back = identity, and the
exported state dict loads into an actual HF model whose logits match ours."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatialthinker_tpu.models.qwen2_5_vl import init_params, qwen25_vl_tiny
from spatialthinker_tpu.models.qwen2_5_vl.params import params_from_hf_state_dict
from spatialthinker_tpu.tools.model_merger import hf_config_dict, params_to_hf_state_dict

CFG = qwen25_vl_tiny(512)


def test_state_dict_roundtrip():
    params = init_params(CFG, jax.random.key(0))
    state = params_to_hf_state_dict(params, CFG)
    assert "model.language_model.embed_tokens.weight" in state
    assert "model.visual.patch_embed.proj.weight" in state
    back = params_from_hf_state_dict(state, CFG, dtype=jnp.float32)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_exported_loads_into_hf_model():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig as HFConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    params = init_params(CFG, jax.random.key(1))
    state = params_to_hf_state_dict(params, CFG)
    cfg_dict = hf_config_dict(CFG)
    hf_cfg = HFConfig(**{k: v for k, v in cfg_dict.items() if k not in ("architectures", "model_type")})
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in state.items()}, strict=False
    )
    # tied lm_head is generated from embeddings; nothing else may be missing
    assert all("lm_head" in k for k in missing), missing
    assert not unexpected, unexpected

    # logits parity through the exported weights
    from spatialthinker_tpu.models.qwen2_5_vl import forward_logits

    ids = np.array([[5, 6, 7, 8, 9, 10, 11, 12]], dtype=np.int64)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids), attention_mask=torch.ones_like(torch.tensor(ids))
        ).logits.numpy()
    pos = np.tile(np.arange(8)[None, None], (3, 1, 1))
    ours, _ = forward_logits(
        params, CFG, jnp.asarray(ids), jnp.asarray(pos),
        segment_ids=jnp.ones((1, 8), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ours), hf_logits, rtol=2e-3, atol=2e-3)
