"""Golden-value tests: our functional JAX Qwen2.5-VL vs HF transformers (torch
CPU) on a tiny random-weight model — text path, vision tower, multimodal merge,
and mRoPE position ids. This is the numerics contract that makes loaded 3B/7B
checkpoints reproduce eval accuracy."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from transformers.models.qwen2_5_vl import (
    Qwen2_5_VLConfig as HFConfig,
    Qwen2_5_VLForConditionalGeneration,
)

from spatialthinker_tpu.models.qwen2_5_vl import (
    VisionInputs,
    forward_logits,
    get_mrope_position_ids,
    pad_vision_inputs,
    params_from_hf_state_dict,
    prepare_vision_aux,
    qwen25_vl_tiny,
)

VOCAB = 1024
CFG = qwen25_vl_tiny(VOCAB)


def make_hf_model():
    hf_cfg = HFConfig(
        text_config=dict(
            vocab_size=VOCAB,
            hidden_size=CFG.text.hidden_size,
            intermediate_size=CFG.text.intermediate_size,
            num_hidden_layers=CFG.text.num_hidden_layers,
            num_attention_heads=CFG.text.num_attention_heads,
            num_key_value_heads=CFG.text.num_key_value_heads,
            rms_norm_eps=CFG.text.rms_norm_eps,
            rope_theta=CFG.text.rope_theta,
            rope_scaling={"type": "mrope", "mrope_section": list(CFG.text.mrope_section)},
            tie_word_embeddings=True,
            max_position_embeddings=4096,
        ),
        vision_config=dict(
            depth=CFG.vision.depth,
            hidden_size=CFG.vision.hidden_size,
            intermediate_size=CFG.vision.intermediate_size,
            num_heads=CFG.vision.num_heads,
            in_channels=3,
            patch_size=CFG.vision.patch_size,
            spatial_merge_size=CFG.vision.spatial_merge_size,
            temporal_patch_size=CFG.vision.temporal_patch_size,
            tokens_per_second=CFG.vision.tokens_per_second,
            window_size=CFG.vision.window_size,
            out_hidden_size=CFG.vision.out_hidden_size,
            fullatt_block_indexes=list(CFG.vision.fullatt_block_indexes),
        ),
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        vision_end_token_id=CFG.vision_end_token_id,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(hf_cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def hf_model():
    return make_hf_model()


@pytest.fixture(scope="module")
def jax_params(hf_model):
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return params_from_hf_state_dict(state, CFG, dtype=jnp.float32)


def test_text_only_logits_match(hf_model, jax_params):
    rng = np.random.default_rng(0)
    input_ids = rng.integers(0, 900, size=(2, 12), dtype=np.int64)
    attention_mask = np.ones((2, 12), dtype=np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    pos = np.tile(np.arange(12)[None, None], (3, 2, 1))
    logits, _ = forward_logits(
        jax_params,
        CFG,
        jnp.asarray(input_ids),
        jnp.asarray(pos),
        segment_ids=jnp.asarray(attention_mask, dtype=jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(logits), hf_out, rtol=2e-3, atol=2e-3)


def test_mrope_position_ids_match_hf(hf_model):
    # sequence: text(3) <vis_start> <img x 4> <vis_end> text(2)
    grid = np.array([[1, 4, 4]])  # 16 patches -> 4 merged image tokens
    ids = (
        [5, 6, 7, CFG.vision_start_token_id]
        + [CFG.image_token_id] * 4
        + [CFG.vision_end_token_id, 9, 10]
    )
    input_ids = np.array(ids, dtype=np.int64)

    hf_pos, hf_delta = hf_model.model.get_rope_index(
        input_ids=torch.tensor(input_ids[None]),
        image_grid_thw=torch.tensor(grid),
        attention_mask=torch.ones((1, len(ids)), dtype=torch.long),
    )
    ours, delta = get_mrope_position_ids(
        input_ids,
        grid,
        spatial_merge_size=CFG.vision.spatial_merge_size,
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
        tokens_per_second=CFG.vision.tokens_per_second,
    )
    np.testing.assert_array_equal(ours, hf_pos[:, 0, :].numpy())
    assert delta == int(hf_delta[0])


def test_mrope_text_only():
    ids = np.arange(10)
    pos, delta = get_mrope_position_ids(
        ids, None,
        spatial_merge_size=2, image_token_id=1, video_token_id=2, vision_start_token_id=3,
    )
    np.testing.assert_array_equal(pos, np.tile(np.arange(10), (3, 1)))
    assert delta == 0


def _make_image_inputs(rng, grid):
    """Random pixel patches in HF processor layout: (num_patches, C*T*P*P)."""
    t, h, w = grid
    n = t * h * w
    din = 3 * CFG.vision.temporal_patch_size * CFG.vision.patch_size**2
    return rng.normal(size=(n, din)).astype(np.float32)


def test_multimodal_logits_match(hf_model, jax_params):
    rng = np.random.default_rng(1)
    grid = np.array([[1, 4, 4]])
    pixels = _make_image_inputs(rng, (1, 4, 4))
    ids = (
        [5, 6, 7, CFG.vision_start_token_id]
        + [CFG.image_token_id] * 4
        + [CFG.vision_end_token_id, 9, 10]
    )
    input_ids = np.array([ids], dtype=np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.ones_like(torch.tensor(input_ids)),
            pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    pos, _ = get_mrope_position_ids(
        input_ids[0], grid,
        spatial_merge_size=CFG.vision.spatial_merge_size,
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
    )
    from spatialthinker_tpu.models.qwen2_5_vl.vision import apply_patch_layout

    aux = prepare_vision_aux([tuple(g) for g in grid], CFG.vision)
    patches = apply_patch_layout(pixels, aux)
    p, pid, sf, sw, rev = pad_vision_inputs(patches, aux, pad_to=aux.num_patches)
    vision = VisionInputs(
        jnp.asarray(p), jnp.asarray(pid), jnp.asarray(sf), jnp.asarray(sw), jnp.asarray(rev)
    )
    logits, _ = forward_logits(
        jax_params, CFG, jnp.asarray(input_ids), jnp.asarray(pos[:, None, :]),
        segment_ids=jnp.ones_like(jnp.asarray(input_ids), dtype=jnp.int32),
        vision=vision,
    )
    np.testing.assert_allclose(np.asarray(logits), hf_out, rtol=5e-3, atol=5e-3)


def test_multimodal_window_attention_larger_grid(hf_model, jax_params):
    """Grid big enough (1, 16, 16) that window partition is non-trivial: 256
    patches -> 64 merged tokens, window size 4x4 merged = 4 windows."""
    rng = np.random.default_rng(2)
    grid = np.array([[1, 16, 16]])
    pixels = _make_image_inputs(rng, (1, 16, 16))
    n_merged = 256 // 4
    ids = [5, CFG.vision_start_token_id] + [CFG.image_token_id] * n_merged + [CFG.vision_end_token_id, 9]
    input_ids = np.array([ids], dtype=np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.ones_like(torch.tensor(input_ids)),
            pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    pos, _ = get_mrope_position_ids(
        input_ids[0], grid,
        spatial_merge_size=CFG.vision.spatial_merge_size,
        image_token_id=CFG.image_token_id,
        video_token_id=CFG.video_token_id,
        vision_start_token_id=CFG.vision_start_token_id,
    )
    from spatialthinker_tpu.models.qwen2_5_vl.vision import apply_patch_layout, window_patch_len

    aux = prepare_vision_aux([tuple(g) for g in grid], CFG.vision)
    patches = apply_patch_layout(pixels, aux)
    # pad to a bigger bucket to exercise padding correctness (whole windows)
    p, pid, sf, sw, rev = pad_vision_inputs(
        patches, aux, pad_to=aux.num_patches + window_patch_len(CFG.vision)
    )
    vision = VisionInputs(
        jnp.asarray(p), jnp.asarray(pid), jnp.asarray(sf), jnp.asarray(sw), jnp.asarray(rev)
    )
    logits, _ = forward_logits(
        jax_params, CFG, jnp.asarray(input_ids), jnp.asarray(pos[:, None, :]),
        segment_ids=jnp.ones_like(jnp.asarray(input_ids), dtype=jnp.int32),
        vision=vision,
    )
    np.testing.assert_allclose(np.asarray(logits), hf_out, rtol=5e-3, atol=5e-3)


def test_bf16_numerics_close_to_fp32(hf_model, jax_params):
    """bf16 params/compute vs the fp32 golden path: response log-probs within
    bf16 tolerance (guards silent drift in the production dtype)."""
    import jax
    import jax.numpy as jnp

    from spatialthinker_tpu.models.qwen2_5_vl.model import forward_logits

    rng = np.random.default_rng(4)
    b, s = 2, 16
    ids = rng.integers(5, 900, size=(b, s), dtype=np.int64)
    pos = np.tile(np.arange(s)[None, None], (3, b, 1))

    logits32, _ = forward_logits(
        jax_params, CFG, jnp.asarray(ids), jnp.asarray(pos),
        segment_ids=jnp.ones((b, s), jnp.int32),
    )
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), jax_params)
    logits16, _ = forward_logits(
        params_bf16, CFG, jnp.asarray(ids), jnp.asarray(pos),
        segment_ids=jnp.ones((b, s), jnp.int32),
    )
    lp32 = np.asarray(jax.nn.log_softmax(logits32, axis=-1))
    lp16 = np.asarray(jax.nn.log_softmax(logits16.astype(jnp.float32), axis=-1))
    # greedy argmax must agree; log-probs within bf16 tolerance
    np.testing.assert_array_equal(lp32.argmax(-1), lp16.argmax(-1))
    tok = np.take_along_axis(lp32, ids[..., None], axis=-1)
    tok16 = np.take_along_axis(lp16, ids[..., None], axis=-1)
    np.testing.assert_allclose(tok16, tok, atol=0.15, rtol=0.05)


def test_3b_param_shapes_match_hf_contract():
    """eval_shape parity on the REAL 3B config (no weights materialized):
    every fused leaf reshapes exactly back to the HF tensor inventory
    (Qwen2.5-VL-3B-Instruct: hidden 2048, 36 layers, 16/2 heads, inter 11008,
    vocab 151936, vision depth 32 hidden 1280)."""
    import jax

    from spatialthinker_tpu.models.qwen2_5_vl import get_config, init_params

    cfg = get_config("3b")
    t, v = cfg.text, cfg.vision
    assert (t.hidden_size, t.num_hidden_layers, t.intermediate_size) == (2048, 36, 11008)
    assert (t.num_attention_heads, t.num_key_value_heads, t.head_dim) == (16, 2, 128)
    assert t.vocab_size == 151936 and t.tie_word_embeddings
    assert (v.depth, v.hidden_size, v.out_hidden_size) == (32, 1280, 2048)

    shapes = jax.eval_shape(lambda k: init_params(cfg, k), jax.random.key(0))
    L, e, h, hkv, d, inter = (
        t.num_hidden_layers, t.hidden_size, t.num_attention_heads,
        t.num_key_value_heads, t.head_dim, t.intermediate_size,
    )
    layers = shapes["text"]["layers"]
    assert layers["self_attn"]["qkv_proj"].shape == (L, hkv, e, (h // hkv + 2) * d)
    assert layers["self_attn"]["o_proj"].shape == (L, h * d, e)
    assert layers["mlp"]["gate_up_proj"].shape == (L, 2, e, inter)
    assert layers["mlp"]["down_proj"].shape == (L, inter, e)
    assert shapes["text"]["embed_tokens"].shape == (t.vocab_size, e)
    assert "lm_head" not in shapes["text"]  # tied embeddings

    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 3.5e9 < n_params < 4.0e9, n_params  # Qwen2.5-VL-3B is ~3.75B


def test_7b_param_shapes_and_group_padding():
    """7B contract: 28 query heads / 4 kv heads gives GQA group 7 — the
    decode kernel pads groups to 8 (tested in test_decode_attention); here we
    pin the config + fused-leaf shapes + ~8.3B total params via eval_shape."""
    import jax

    from spatialthinker_tpu.models.qwen2_5_vl import get_config, init_params

    cfg = get_config("7b")
    t = cfg.text
    assert (t.hidden_size, t.num_hidden_layers, t.intermediate_size) == (3584, 28, 18944)
    assert (t.num_attention_heads, t.num_key_value_heads, t.head_dim) == (28, 4, 128)
    assert t.num_attention_heads % t.num_key_value_heads == 0
    assert not t.tie_word_embeddings

    shapes = jax.eval_shape(lambda k: init_params(cfg, k), jax.random.key(0))
    L, e, h, hkv, d = (
        t.num_hidden_layers, t.hidden_size, t.num_attention_heads,
        t.num_key_value_heads, t.head_dim,
    )
    attn = shapes["text"]["layers"]["self_attn"]
    assert attn["qkv_proj"].shape == (L, hkv, e, (h // hkv + 2) * d)
    assert shapes["text"]["lm_head"].shape == (e, t.vocab_size)
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 8.0e9 < n_params < 8.8e9, n_params  # Qwen2.5-VL-7B is ~8.3B
