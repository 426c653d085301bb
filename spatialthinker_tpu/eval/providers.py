"""Model providers for the eval harness.

Parity surface: /root/reference/evaluation/evals.py:114-456 (HF local model,
OpenAI, Anthropic). TPU-era addition: ``JaxProvider`` runs our own model +
on-device rollout engine — the path used for trained-checkpoint evaluation.
"""

from __future__ import annotations

import base64
import io
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


class Provider:
    """generate(prompts, images_per_prompt) -> list of output texts."""

    def generate(self, prompts: List[str], images: List[List[Any]]) -> List[str]:
        raise NotImplementedError


class JaxProvider(Provider):
    """Evaluate with the TPU-native model + rollout engine (greedy by default).

    Shapes are BUCKETED so a 30-benchmark sweep compiles a handful of kernels
    instead of one per ragged batch: prompts trim to ``prompt_bucket``
    multiples (the trainer's trim_prompt_padding, core/batch.py), rows pad
    cyclically up to the largest batch seen, and the vision pack width rounds
    up to whole-window buckets."""

    def __init__(self, params, model_cfg, tokenizer, max_new_tokens: int = 2048,
                 temperature: float = 0.0, max_prompt_length: int = 6144,
                 min_pixels: int = 262_144, max_pixels: int = 4_194_304,
                 prompt_bucket: int = 512):
        import jax

        from ..core.config import DataConfig
        from ..data.dataset import RLHFDataset, collate_fn
        from ..rollout.engine import generate as engine_generate
        from ..rollout.sampling import SamplingParams

        self.params = params
        self.model_cfg = model_cfg
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.sampling = SamplingParams(temperature=temperature)
        self._engine = jax.jit(
            engine_generate, static_argnames=("cfg", "max_new_tokens", "sampling", "kv_cache_dtype")
        )
        self._data_cfg = DataConfig(
            max_prompt_length=max_prompt_length, min_pixels=min_pixels, max_pixels=max_pixels
        )
        self._dataset_cls = RLHFDataset
        self._collate = collate_fn
        self._key = jax.random.key(0)
        self._prompt_bucket = prompt_bucket
        self._row_bucket = 0  # grows to the largest batch seen; never shrinks

    def generate(self, prompts: List[str], images: List[List[Any]]) -> List[str]:
        import jax
        import jax.numpy as jnp

        from ..core.batch import pad_to_divisor, trim_prompt_padding
        from ..data.packing import pack_vision_batch
        from ..models.qwen2_5_vl.vision import window_patch_len

        n_real = len(prompts)
        rows = [
            {"problem": ("<image>" * len(imgs)) + p, "answer": "", "image": imgs}
            for p, imgs in zip(prompts, images)
        ]
        ds = self._dataset_cls.from_rows(rows, self.tokenizer, self._data_cfg, self.model_cfg)
        batch = self._collate([ds[i] for i in range(len(rows))])
        # prompt-length bucket: trim the always-max left padding
        batch = trim_prompt_padding(batch, bucket=self._prompt_bucket)
        # row bucket: the final partial batch pads (cyclic self-repeat) up to
        # the full batch size every earlier call compiled for
        self._row_bucket = max(self._row_bucket, n_real)
        batch, _ = pad_to_divisor(batch, self._row_bucket)
        # vision bucket: whole-window multiples of 16 windows
        vision = pack_vision_batch(
            list(batch.non_tensors["patches"]),
            list(batch.non_tensors["image_grid_thw"]),
            self.model_cfg.vision,
        )
        if vision is not None:
            gran = window_patch_len(self.model_cfg.vision) * 16
            pad_to = -(-vision.patches.shape[0] // gran) * gran
            if pad_to != vision.patches.shape[0]:
                vision = pack_vision_batch(
                    list(batch.non_tensors["patches"]),
                    list(batch.non_tensors["image_grid_thw"]),
                    self.model_cfg.vision, pad_to=pad_to,
                )
        self._key, sub = jax.random.split(self._key)
        result = self._engine(
            self.params, self.model_cfg,
            jnp.asarray(batch.tensors["input_ids"]),
            jnp.asarray(batch.tensors["segment_ids"]),
            jnp.asarray(np.transpose(batch.tensors["position_ids"], (1, 0, 2))),
            jnp.asarray(batch.tensors["gen_pos_start"]),
            max_new_tokens=self.max_new_tokens,
            sampling=self.sampling,
            key=sub,
            vision=jax.tree.map(jnp.asarray, vision) if vision is not None else None,
        )
        responses = np.asarray(result.responses)[:n_real]
        lengths = np.asarray(result.response_mask).sum(-1)
        return self.tokenizer.batch_decode(
            [responses[i, : lengths[i]] for i in range(n_real)], skip_special_tokens=True
        )


class HFProvider(Provider):
    """Local HF transformers generation (reference parity path; torch CPU/GPU).
    Model family selected from the name, Qwen3-VL included (reference
    evals.py:134-140)."""

    def __init__(self, model_name: str, max_new_tokens: int = 2048, device: str = "cpu",
                 min_pixels: int = 262_144, max_pixels: int = 4_194_304):
        import torch
        from transformers import AutoProcessor, Qwen2_5_VLForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(
            model_name, min_pixels=min_pixels, max_pixels=max_pixels
        )
        if "qwen3" in model_name.lower():
            from transformers import Qwen3VLForConditionalGeneration as model_cls
        else:
            model_cls = Qwen2_5_VLForConditionalGeneration
        self.model = model_cls.from_pretrained(
            model_name, torch_dtype=torch.bfloat16
        ).to(device)
        self.model.eval()
        self.max_new_tokens = max_new_tokens
        self.device = device

    def generate(self, prompts: List[str], images: List[List[Any]]) -> List[str]:
        import torch

        messages = []
        for prompt, imgs in zip(prompts, images):
            content = [{"type": "image", "image": img} for img in imgs]
            content.append({"type": "text", "text": prompt})
            messages.append([{"role": "user", "content": content}])
        texts = [
            self.processor.apply_chat_template(m, tokenize=False, add_generation_prompt=True)
            for m in messages
        ]
        flat_images = [img for imgs in images for img in imgs]
        inputs = self.processor(
            text=texts, images=flat_images or None, return_tensors="pt", padding=True
        ).to(self.device)
        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=self.max_new_tokens, do_sample=False)
        trimmed = out[:, inputs["input_ids"].shape[1] :]
        return self.processor.batch_decode(trimmed, skip_special_tokens=True)


def _b64(image) -> str:
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def post_with_retry(url: str, *, headers: Dict, json_body: Dict, timeout: int = 120,
                    max_retries: int = 5, backoff_s: float = 2.0, _sleep=None):
    """POST with exponential backoff on rate limits / transient failures.

    The reference wraps provider calls in try/except-retry
    (/root/reference/evaluation/evals.py:371-373); without it one 429 kills a
    whole benchmark run. Retries on 429/5xx and connection errors; raises on
    other HTTP errors immediately."""
    import time as _time

    import requests

    sleep = _sleep if _sleep is not None else _time.sleep
    last_exc: Optional[Exception] = None
    for attempt in range(max_retries + 1):
        try:
            resp = requests.post(url, headers=headers, json=json_body, timeout=timeout)
        except requests.RequestException as exc:  # connection/timeout errors
            last_exc = exc
        else:
            if resp.status_code == 429 or resp.status_code >= 500:
                last_exc = requests.HTTPError(f"HTTP {resp.status_code}", response=resp)
            else:
                resp.raise_for_status()  # 4xx caller bugs surface immediately
                return resp
        if attempt < max_retries:
            sleep(backoff_s * (2**attempt))
    raise last_exc


class OpenAIProvider(Provider):
    def __init__(self, model: str = "gpt-4o", max_tokens: int = 2048,
                 api_key: Optional[str] = None):
        self.model = model
        self.max_tokens = max_tokens
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")

    def generate(self, prompts: List[str], images: List[List[Any]]) -> List[str]:
        outs = []
        for prompt, imgs in zip(prompts, images):
            content: List[Dict] = [
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{_b64(img)}"}}
                for img in imgs
            ]
            content.append({"type": "text", "text": prompt})
            resp = post_with_retry(
                "https://api.openai.com/v1/chat/completions",
                headers={"Authorization": f"Bearer {self.api_key}"},
                json_body={
                    "model": self.model,
                    "messages": [{"role": "user", "content": content}],
                    "max_tokens": self.max_tokens,
                },
            )
            outs.append(resp.json()["choices"][0]["message"]["content"])
        return outs


class AnthropicProvider(Provider):
    def __init__(self, model: str = "claude-sonnet-4-20250514", max_tokens: int = 2048,
                 api_key: Optional[str] = None):
        self.model = model
        self.max_tokens = max_tokens
        self.api_key = api_key or os.environ.get("ANTHROPIC_API_KEY", "")

    def generate(self, prompts: List[str], images: List[List[Any]]) -> List[str]:
        outs = []
        for prompt, imgs in zip(prompts, images):
            content: List[Dict] = [
                {"type": "image",
                 "source": {"type": "base64", "media_type": "image/png", "data": _b64(img)}}
                for img in imgs
            ]
            content.append({"type": "text", "text": prompt})
            resp = post_with_retry(
                "https://api.anthropic.com/v1/messages",
                headers={"x-api-key": self.api_key, "anthropic-version": "2023-06-01"},
                json_body={
                    "model": self.model,
                    "messages": [{"role": "user", "content": content}],
                    "max_tokens": self.max_tokens,
                },
            )
            outs.append(resp.json()["content"][0]["text"])
        return outs
