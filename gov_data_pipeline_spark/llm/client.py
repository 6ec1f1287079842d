"""LLM client abstraction + retry policy (SURVEY L1, R25).

The engine never talks to a provider SDK directly: operators depend on
an async ``complete(request) -> str`` callable, injected per run. Tests
and the t2 oracle use ``MockLLMClient`` — a *pure function* of the
request, deliberately simple enough that DuckDB SQL can mirror it, so
the enrichment operators' gating logic is hash-checkable end-to-end.

Retry policy replicates the reference (``utils/gpt.py:73-145``):
5 attempts, exponential backoff starting at 2 s doubling each retry,
retrying RateLimit/Auth errors and transient API errors, re-raising
after the last attempt. It runs *inside* the UDF batch, per request —
Spark task retries are not a substitute (they would replay the whole
partition, multiplying cost and duplicating side effects).
"""

from __future__ import annotations

import asyncio
import base64
import json
import re
from collections.abc import Awaitable, Callable
from dataclasses import dataclass, field
from typing import Any


class RateLimitError(Exception):
    """HTTP 429 analogue (reference retries these)."""


class AuthError(Exception):
    """HTTP 401 analogue (reference retries these)."""


class TransientAPIError(Exception):
    """Other retryable API failure."""


@dataclass
class LLMRequest:
    """Provider-neutral chat request. ``messages`` follows the familiar
    role/content shape; image inputs ride in ``image_url`` parts."""

    messages: list[dict[str, Any]]
    model: str = "default"
    temperature: float = 0.1
    max_tokens: int = 64
    response_format: str = "text"  # "text" | "json_object"


async def call_with_retry(
    fn: Callable[[], Awaitable[str]],
    max_retries: int = 5,
    initial_delay: float = 2.0,
    sleep: Callable[[float], Awaitable[None]] = asyncio.sleep,
) -> str:
    """R25 semantics: retry rate-limit/auth/API errors with exponential
    backoff; any other exception propagates immediately."""
    delay = initial_delay
    for attempt in range(1, max_retries + 1):
        try:
            return await fn()
        except (RateLimitError, AuthError, TransientAPIError):
            if attempt >= max_retries:
                raise
            await sleep(delay)
            delay *= 2
    raise RuntimeError("unreachable")


_DATA_URI_PREFIX = "data:image/png;base64,"


def _text_content(request: LLMRequest) -> str:
    parts: list[str] = []
    for m in request.messages:
        c = m.get("content")
        if isinstance(c, str):
            parts.append(c)
        elif isinstance(c, list):
            for p in c:
                if p.get("type") == "text":
                    parts.append(p.get("text", ""))
    return "\n".join(parts)


def _image_payload(request: LLMRequest) -> str | None:
    for m in request.messages:
        c = m.get("content")
        if isinstance(c, list):
            for p in c:
                if p.get("type") == "image_url":
                    return p["image_url"]["url"]
    return None


@dataclass
class MockLLMClient:
    """Deterministic stand-in model (pure function of the request).

    - vision request (has an ``image_url``): "reads" the image by
      base64-decoding the data-URI payload — the test fixtures encode
      the ground-truth text as the image bytes, so mock-OCR returns
      exactly that text (mirrors an ideal OCR; SQL: ``decode(from_base64(...))``);
    - ``json_object`` brand request: english samples = [UPPER(prompt)],
      russian samples = [lower(prompt)] (SQL: upper/lower);
    - ``json_object`` correction request (prompt is a row JSON object):
      every value is whitespace-collapsed and trimmed (SQL-mirrorable
      regexp_replace);
    - anything else echoes the prompt text.

    ``fail_first`` injects that many transient failures (per client
    instance) before succeeding — for retry-path tests.
    """

    fail_first: int = 0
    _calls: int = field(default=0, repr=False)

    async def complete(self, request: LLMRequest) -> str:
        self._calls += 1
        if self._calls <= self.fail_first:
            raise RateLimitError("mock 429")
        img = _image_payload(request)
        if img is not None:
            payload = img.removeprefix(_DATA_URI_PREFIX)
            try:
                return base64.b64decode(payload).decode("utf-8", errors="replace")
            except Exception:
                return ""
        text = _text_content(request)
        if request.response_format == "json_object":
            user = next(
                (m["content"] for m in request.messages if m.get("role") == "user"),
                text,
            )
            if isinstance(user, str) and user.lstrip().startswith("{"):
                try:
                    row = json.loads(user)
                    corrected = {
                        k: re.sub(r"\s+", " ", str(v or "")).strip()
                        for k, v in row.items()
                    }
                    return json.dumps({"corrected_row": corrected}, ensure_ascii=False)
                except json.JSONDecodeError:
                    pass
            prompt = user if isinstance(user, str) else text
            return json.dumps(
                {
                    "english_samples": [prompt.upper()],
                    "russian_samples": [prompt.lower()],
                },
                ensure_ascii=False,
            )
        return text
