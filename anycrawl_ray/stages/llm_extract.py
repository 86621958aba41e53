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


class SchemaStubExtractor:
    """``json_options``-aware extraction stage (the reference's headline
    ``formats: ['json'] + json_options`` path, LLMExtract.ts perform()).

    Actor-pool shape: the user schema is normalized ONCE per actor
    (``normalize_schema`` — LLMExtract.ts:21-70), the field prompt rendered
    once (``create_field_prompt`` — :177-206); per document the text is
    chunked, each chunk yields a deterministic schema-conforming stub
    object (a real provider call drops in at ``extract_chunk``), chunk
    results merge via ``merge_results`` (:211-257) and the merged object is
    validated against the normalized schema — exactly the acceptance the
    ``ai`` SDK's generateObject enforces."""

    def __init__(self, json_options: dict, max_input_tokens: int = 256,
                 overlap_tokens: int = 32) -> None:
        from ..functions.json_schema import (
            create_field_prompt,
            normalize_schema,
            validate_against_schema,
        )

        self._validate = validate_against_schema
        user_schema = (json_options or {}).get("schema") or {}
        self.schema = normalize_schema(user_schema)
        self.field_prompt = create_field_prompt(self.schema)
        self.user_prompt = (json_options or {}).get("prompt") or ""
        self.max_tokens = int(0.8 * max_input_tokens)
        self.overlap = overlap_tokens

    # -- deterministic conforming stub (provider seam) --------------------
    def _stub_value(self, prop: dict, words: list[str], field: str):
        t = prop.get("type")
        if isinstance(t, list):
            t = t[0] if t else None
        if "enum" in prop and prop["enum"]:
            return prop["enum"][0]
        if t == "string":
            return " ".join(words[:2]) if words else ""
        if t == "number":
            return float(len(words))
        if t == "integer":
            return len(words)
        if t == "boolean":
            return len(words) % 2 == 0
        if t == "array":
            items = prop.get("items") or {}
            if not words:
                return []
            return [self._stub_value(items, words[i:], field)
                    for i in range(min(2, len(words)))]
        if t == "object":
            return {k: self._stub_value(v if isinstance(v, dict) else {},
                                        words, k)
                    for k, v in (prop.get("properties") or {}).items()}
        return None

    def extract_chunk(self, chunk: str) -> dict:
        words = chunk.split()
        out = self._stub_value(self.schema, words, "$")
        return out if isinstance(out, dict) else {"items": out}

    def extract_document(self, text: str) -> tuple[dict | None, int, bool]:
        chunks = split_text_into_chunks(text, self.max_tokens, self.overlap)
        merged = merge_results([self.extract_chunk(c["chunk"]) for c in chunks])
        valid = (merged is not None
                 and not self._validate(merged, self.schema))
        return merged, len(chunks), valid

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, n_chunks, valids = [], [], []
        for t in batch.column("text").to_pylist():
            merged, n, valid = self.extract_document(t)
            payloads.append(json.dumps(merged, sort_keys=True) if merged else "")
            n_chunks.append(n)
            valids.append(valid)
        return (
            batch.append_column("n_chunks", pa.array(n_chunks, pa.int32()))
            .append_column("extracted_json", pa.array(payloads, pa.string()))
            .append_column("schema_valid", pa.array(valids, pa.bool_()))
        )
