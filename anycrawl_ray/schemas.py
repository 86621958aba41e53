"""Authoritative Arrow schemas for every table the engine reads/writes.

Replaces the reference's Zod-validated-dynamic JSON model
(packages/libs/src/types/BaseSchema.ts:36-162, CrawlSchema.ts:6-49, output
JSONB at packages/db/src/db/schemas/PostgreSQL.ts:120-138) with strict
columnar schemas declared once (SURVEY.md §1.3).

``DOCUMENTS`` is the BASELINE.json ``input_hint`` shape:
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``.
"""

from __future__ import annotations

import pyarrow as pa

SPAN = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
    ]
)

# documents + provenance columns the pipelines carry alongside the core shape
DOCUMENTS_FULL = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("job_id", pa.string()),
        ("url", pa.string()),
        ("status", pa.string()),  # 'completed' | 'failed' | 'skipped'
    ]
)

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_key", pa.uint64()),  # xxh64(canonical url)
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("job_id", pa.string()),
        ("parent_url", pa.string()),
        ("discovered_seq", pa.int64()),  # global admission sequence within job
        ("host_seq", pa.int64()),  # FIFO sequence within (job, host)
        ("state", pa.string()),  # 'pending' | 'done' | 'failed'
    ]
)

SEEN = pa.schema(
    [
        ("job_id", pa.string()),
        ("url_key", pa.uint64()),
        ("canonical_url", pa.string()),
        ("first_seen_seq", pa.int64()),
    ]
)

LINEAGE = pa.schema(
    [
        ("job_id", pa.string()),
        ("partition_id", pa.int32()),
        ("epoch", pa.int64()),
        ("enqueued", pa.int64()),
        ("done", pa.int64()),
        ("succeeded", pa.int64()),
        ("failed", pa.int64()),
        ("bytes_fetched", pa.int64()),
        ("credits_used", pa.int64()),
    ]
)

RESULTS = pa.schema(
    [
        ("job_id", pa.string()),
        ("url", pa.string()),
        ("status", pa.string()),
        ("doc_id", pa.string()),
    ]
)

SERP_RESULTS = pa.schema(
    [
        ("engine", pa.string()),
        ("query", pa.string()),
        ("page", pa.int32()),
        ("position", pa.int32()),
        ("category", pa.string()),  # web | images | news
        ("title", pa.string()),
        ("url", pa.string()),
        ("description", pa.string()),
        ("source", pa.string()),
    ]
)

SITE_PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status_code", pa.int32()),
        ("html", pa.string()),
        ("links", pa.list_(pa.string())),
        ("content_bytes", pa.int64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
