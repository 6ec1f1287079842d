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
class OpenAICompatClient:
    """Real provider adapter: OpenAI-compatible ``/chat/completions``
    over stdlib HTTP (re-expression of the reference's working client,
    ``utils/gpt.py:73-145``, minus the SDK dependency).

    Maps HTTP statuses onto the engine's retry taxonomy so
    ``call_with_retry`` replicates the reference's policy exactly:
    429 -> ``RateLimitError``, 401/403 -> ``AuthError`` (the reference
    retries auth errors too — key rotation races), 5xx ->
    ``TransientAPIError``; anything else is a non-retryable
    ``ValueError``. The blocking ``urllib`` call runs in a worker
    thread (``asyncio.to_thread``) so ``llm_map``'s bounded
    ``asyncio.gather`` concurrency still overlaps requests.

    Stays the *injected* implementation: operators depend only on
    ``complete(request) -> str``, and ``MockLLMClient`` remains the t2
    default (the oracle needs a pure function). Nothing in the engine
    constructs this client implicitly — no ambient env-var coupling;
    callers pass base_url/api_key explicitly.
    """

    base_url: str
    api_key: str = ""
    timeout: float = 60.0

    def _post_sync(self, body: dict[str, Any]) -> str:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.base_url.rstrip("/") + "/chat/completions",
            data=json.dumps(body).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                **(
                    {"Authorization": f"Bearer {self.api_key}"}
                    if self.api_key
                    else {}
                ),
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            detail = ""
            try:
                detail = e.read().decode("utf-8", errors="replace")[:200]
            except Exception:
                pass
            if e.code == 429:
                raise RateLimitError(f"429: {detail}") from e
            if e.code in (401, 403):
                raise AuthError(f"{e.code}: {detail}") from e
            if e.code >= 500:
                raise TransientAPIError(f"{e.code}: {detail}") from e
            raise ValueError(f"LLM API error {e.code}: {detail}") from e
        except urllib.error.URLError as e:
            raise TransientAPIError(f"connection error: {e.reason}") from e
        try:
            return payload["choices"][0]["message"]["content"] or ""
        except (KeyError, IndexError, TypeError) as e:
            raise ValueError(f"malformed completion payload: {payload!r:.200}") from e

    async def complete(self, request: LLMRequest) -> str:
        body: dict[str, Any] = {
            "model": request.model,
            "messages": request.messages,
            "temperature": request.temperature,
            "max_tokens": request.max_tokens,
        }
        if request.response_format == "json_object":
            body["response_format"] = {"type": "json_object"}
        return await asyncio.to_thread(self._post_sync, body)


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
