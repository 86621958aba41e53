"""Credit cost + token-count scalar functions.

Reference: packages/libs/src/credits.ts:96-139 — per-page cost is
``1 + (stealth proxy ? 2 : 0) + (json extraction ? 5 (x2 when
extract_source == 'html') : 0)``; token counting is tiktoken with a
``len(text)/4`` fallback (packages/ai/src/agents/BaseAgent.ts:116-123 — no
tiktoken in this sandbox, so the fallback IS the implementation, plus a
whitespace tokenizer used by the text-analysis stages).
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish split: words, numbers, or single non-space symbols.
# re.ASCII pins \d and \s to ASCII so the DuckDB oracle's character
# classes match exactly on non-ASCII text
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.ASCII)


def per_page_cost(
    proxy_mode: str | None = None,
    formats: list[str] | None = None,
    json_options: bool = False,
    extract_source: str = "markdown",
) -> int:
    """Per-page credit cost (credits.ts:96-139)."""
    cost = 1
    if proxy_mode == "stealth":
        cost += 2
    if json_options and formats and "json" in formats:
        cost += 10 if extract_source == "html" else 5
    return cost


def count_tokens_approx(text: str) -> int:
    """tiktoken-unavailable fallback: ceil(len/4) (BaseAgent.ts:116-123)."""
    return (len(text) + 3) // 4


def count_ws_tokens(text: str) -> int:
    """Whitespace token count (used by quality scoring / chunking)."""
    return len(_TOKEN_RE.findall(text))


def bpe_ish_tokens(text: str) -> list[str]:
    """Regex 'BPE-ish' tokenization: letter runs, digit runs, single symbols."""
    return _BPE_RE.findall(text)


def calculate_crawl_initial_credits(scrape_options: dict | None = None) -> int:
    """1 (base) + proxy credits; JSON credits accrue per page
    (credits.ts calculateCrawlInitialCredits)."""
    proxy = (scrape_options or {}).get("proxy")
    return 1 + (2 if proxy == "stealth" else 0)


def estimate_task_credits(task_type: str, task_payload: dict,
                          template: dict | None = None) -> int:
    """Pre-execution minimum-credit estimate for a scheduled task
    (credits.ts:161-203 estimateTaskCredits): template reqOptions merge
    under the payload, per-call template price added, base by type
    (scrape=1, search=pages [+limit when scrape_options], crawl=limit)."""
    try:
        base = 1
        template_credits = 0
        actual_type = task_type
        payload = dict(task_payload or {})
        if template:
            actual_type = template.get("templateType") or task_type
            payload = {**(template.get("reqOptions") or {}), **payload}
            template_credits = (template.get("pricing") or {}).get(
                "perCall") or 0
        if actual_type == "scrape":
            base = 1
        elif actual_type == "search":
            base = payload.get("pages") or 1
            # JS truthiness: any object counts, including {} (credits.ts)
            if payload.get("scrape_options") is not None:
                base += payload.get("limit") or 10
        elif actual_type == "crawl":
            base = (payload.get("limit")
                    or (payload.get("options") or {}).get("limit") or 10)
        return base + template_credits
    except Exception:
        return 1
