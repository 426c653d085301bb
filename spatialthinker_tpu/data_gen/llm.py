"""LLM API callers for the synthesis pipeline (Anthropic question generation,
OpenAI vision validation) — parity with /root/reference/data_gen/generate_data.py:52-87
and :878-914. Plain requests; retries with backoff."""

from __future__ import annotations

import base64
import io
import os
import time
from typing import Any, List, Optional


def call_anthropic(prompt: str, model: str = "claude-sonnet-4-20250514",
                   temperature: float = 0.0, max_tokens: int = 2048,
                   api_key: Optional[str] = None, retries: int = 3) -> str:
    import requests

    key = api_key or os.environ.get("ANTHROPIC_API_KEY", "")
    for attempt in range(retries):
        try:
            resp = requests.post(
                "https://api.anthropic.com/v1/messages",
                headers={"x-api-key": key, "anthropic-version": "2023-06-01"},
                json={
                    "model": model,
                    "max_tokens": max_tokens,
                    "temperature": temperature,
                    "messages": [{"role": "user", "content": prompt}],
                },
                timeout=120,
            )
            resp.raise_for_status()
            return resp.json()["content"][0]["text"]
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(2**attempt)
    raise RuntimeError("unreachable")


def call_openai_vision(question: str, options: List[str], image: Any,
                       model: str = "gpt-4o", api_key: Optional[str] = None,
                       retries: int = 3) -> str:
    import requests

    from .prompts import VALIDATION_PROMPT

    key = api_key or os.environ.get("OPENAI_API_KEY", "")
    buf = io.BytesIO()
    image.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    options_block = "\n".join(f"({chr(65 + i)}) {o}" for i, o in enumerate(options))
    prompt = VALIDATION_PROMPT.format(question=question, options=options_block)
    for attempt in range(retries):
        try:
            resp = requests.post(
                "https://api.openai.com/v1/chat/completions",
                headers={"Authorization": f"Bearer {key}"},
                json={
                    "model": model,
                    "messages": [
                        {
                            "role": "user",
                            "content": [
                                {"type": "image_url",
                                 "image_url": {"url": f"data:image/png;base64,{b64}"}},
                                {"type": "text", "text": prompt},
                            ],
                        }
                    ],
                    "max_tokens": 16,
                },
                timeout=120,
            )
            resp.raise_for_status()
            return resp.json()["choices"][0]["message"]["content"]
        except Exception:
            if attempt == retries - 1:
                raise
            time.sleep(2**attempt)
    raise RuntimeError("unreachable")
