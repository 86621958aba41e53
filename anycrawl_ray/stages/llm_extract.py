"""LLM extraction stage: chunking, stubbed extraction, chunk-result merge.

Reference semantics (SURVEY.md T4/T5/A6):

- **chunking** (packages/ai/src/agents/TextChunker.ts:21-99): line-based
  packing up to ``max_tokens`` with token-budgeted overlap pulled backward
  from the split point; chunk budget in the caller is ``0.8 * max_input``;
- **merge** (packages/ai/src/agents/LLMExtract.ts:211-257): field-wise —
  first non-null wins, arrays concat + JSON-stringify dedup, objects
  shallow-merge, primitives prefer non-empty;
- **extraction**: no LLM in this sandbox; ``StubExtractor`` is a
  deterministic extractor with the REAL actor-pool plumbing (per-actor
  init, batched calls) so a provider-backed agent drops in unchanged
  (DataExtractor.ts:55-77 caches one agent per model id — here one per
  actor).

Token counting uses the reference's tiktoken fallback ``len/4``
(BaseAgent.ts:116-123 — credits.count_tokens_approx).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.credits import count_tokens_approx


def split_text_into_chunks(text: str, max_tokens: int, overlap_tokens: int,
                           token_counter=count_tokens_approx) -> list[dict]:
    """TextChunker.splitTextIntoChunks port: -> [{chunk, start_index,
    end_index, tokens}] (line-accurate, incl. the falsy-line skip)."""
    chunks: list[dict] = []
    lines = text.split("\n")
    current = ""
    current_tokens = 0
    start_index = 0
    for i, line in enumerate(lines):
        if not line:
            continue  # reference skips falsy lines
        line_tokens = token_counter(line + "\n")
        if current_tokens + line_tokens > max_tokens and current:
            chunks.append({"chunk": current.strip(), "start_index": start_index,
                           "end_index": i - 1, "tokens": current_tokens})
            overlap = _overlap_lines(lines, i, overlap_tokens, token_counter)
            current = "\n".join(overlap)
            current_tokens = token_counter(current)
            start_index = max(0, i - len(overlap) + 1)
        current += line + "\n"
        current_tokens += line_tokens
    if current.strip():
        chunks.append({"chunk": current.strip(), "start_index": start_index,
                       "end_index": len(lines) - 1, "tokens": current_tokens})
    return chunks


def _overlap_lines(lines: list[str], current_index: int, overlap_tokens: int,
                   token_counter) -> list[str]:
    out: list[str] = []
    tokens = 0
    for i in range(current_index - 1, -1, -1):
        line = lines[i]
        if not line:
            continue
        line_tokens = token_counter(line)
        if tokens + line_tokens > overlap_tokens:
            break
        out.insert(0, line)
        tokens += line_tokens
    return out


def dedup_array(arr: list) -> list:
    seen: set = set()
    out = []
    for item in arr:
        key = json.dumps(item, sort_keys=True) if isinstance(item, (dict, list)) else item
        if key in seen:
            continue
        seen.add(key)
        out.append(item)
    return out


def merge_results(results: list[dict | None]) -> dict | None:
    """LLMExtract.mergeResults port (field-wise chunk merge, A6)."""
    results = [r for r in results if r is not None]
    if not results:
        return None
    if len(results) == 1:
        return results[0]
    merged: dict = {}
    for result in results:
        for key, value in result.items():
            if value is None:
                continue
            if key not in merged or merged[key] is None:
                merged[key] = value
            elif isinstance(merged[key], list) and isinstance(value, list):
                merged[key] = dedup_array(merged[key] + value)
            elif isinstance(merged[key], dict) and isinstance(value, dict):
                merged[key] = {**merged[key], **value}
            elif merged[key] in (None, ""):
                merged[key] = value
    return merged


class StubExtractor:
    """Deterministic extraction 'agent' — actor-pool stage shape for the
    LLM path: ``map_batches(StubExtractor, concurrency=N, batch_size=B)``.

    Per-actor ``__init__`` is where a real provider client + tiktoken
    encoding would load once. Extraction here: word frequency summary of
    each chunk (deterministic), merged per doc by ``merge_results``."""

    def __init__(self, max_input_tokens: int = 256, overlap_tokens: int = 32) -> None:
        self.max_tokens = int(0.8 * max_input_tokens)  # 0.8*max_input budget
        self.overlap = overlap_tokens

    def extract_chunk(self, chunk: str) -> dict:
        words = chunk.split()
        top = sorted(set(words), key=lambda w: (-words.count(w), w))[:3]
        return {"top_words": top, "n_tokens": count_tokens_approx(chunk)}

    def extract_document(self, text: str) -> dict | None:
        chunks = split_text_into_chunks(text, self.max_tokens, self.overlap)
        return merge_results([self.extract_chunk(c["chunk"]) for c in chunks])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        payloads = []
        n_chunks = []
        for t in texts:
            chunks = split_text_into_chunks(t, self.max_tokens, self.overlap)
            n_chunks.append(len(chunks))
            merged = merge_results([self.extract_chunk(c["chunk"]) for c in chunks])
            payloads.append(json.dumps(merged, sort_keys=True) if merged else "")
        return (
            batch.append_column("n_chunks", pa.array(n_chunks, pa.int32()))
            .append_column("extracted_json", pa.array(payloads, pa.string()))
        )
