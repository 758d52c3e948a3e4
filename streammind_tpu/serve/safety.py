"""Content-safety hooks for the serving plane.

Reference behaviors:
  - model_worker.py:69-77 safety_check: keyword scan over streamed text
    every few tokens; on hit the stream is replaced with a refusal.
  - utils.py:102-124 violates_moderation: OpenAI moderation endpoint call
    on user input (optional, key-gated).
"""
from __future__ import annotations

import os
from typing import Iterable, Sequence

# Conservative keyword list, same role as the reference's in-file list.
DEFAULT_KEYWORDS: Sequence[str] = (
    "child sexual", "csam", "make a bomb", "build a bomb",
)

SAFETY_MSG = "I cannot help with that request."


def safety_check(text: str, keywords: Iterable[str] = DEFAULT_KEYWORDS) -> bool:
    """True → text is safe.  Mirrors the worker's periodic keyword scan."""
    lower = text.lower()
    return not any(k in lower for k in keywords)


def violates_moderation(text: str) -> bool:
    """OpenAI moderation check, enabled only when OPENAI_API_KEY is set;
    fails open (False) without a key/network, like the reference."""
    if not os.environ.get("OPENAI_API_KEY"):
        return False
    try:
        import openai  # type: ignore

        client = openai.OpenAI()
        result = client.moderations.create(input=text)
        return bool(result.results[0].flagged)
    except Exception:  # noqa: BLE001
        return False
