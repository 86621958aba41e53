"""Crawl-results reader: paginated access to a job's span documents.

Rebuild of ``GET /v1/crawl/:jobId`` (apps/api/src/controllers/v1/
CrawlController.ts:198-266): page size 100, ``skip`` offset, a ``next``
marker when more rows remain. Reads the epoch-partitioned parquet layout
written by pipelines/crawl.py lazily — only the row groups needed for the
requested page are materialized.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

PAGE_SIZE = 100


def _part_files(out_dir: str, job_id: str) -> list[str]:
    from ..pipelines.crawl import epoch_part_files

    return epoch_part_files(os.path.join(out_dir, job_id))


def read_job_results(out_dir: str, job_id: str, skip: int = 0,
                     page_size: int = PAGE_SIZE) -> tuple[pa.Table, int | None]:
    """-> (page_table, next_skip or None). Documents arrive in doc_id
    (= admission) order; only the needed part files are read."""
    files = _part_files(out_dir, job_id)
    remaining_skip = skip
    want = page_size + 1  # +1 to detect a next page
    tables: list[pa.Table] = []
    got = 0
    for path in files:
        meta = pq.ParquetFile(path).metadata
        n = meta.num_rows
        if remaining_skip >= n:
            remaining_skip -= n
            continue
        t = pq.read_table(path)
        t = t.slice(remaining_skip, want - got)
        remaining_skip = 0
        tables.append(t)
        got += t.num_rows
        if got >= want:
            break
    if not tables:
        from ..schemas import DOCUMENTS_FULL

        empty = DOCUMENTS_FULL.empty_table().select(
            ["doc_id", "spans", "job_id", "url", "status"])
        return empty, None
    page = pa.concat_tables(tables)
    has_next = page.num_rows > page_size
    if has_next:
        page = page.slice(0, page_size)
    return page, (skip + page_size) if has_next else None


def iter_job_results(out_dir: str, job_id: str, page_size: int = PAGE_SIZE):
    """Generator over all result pages (client-side pagination loop)."""
    skip: int | None = 0
    while skip is not None:
        page, skip = read_job_results(out_dir, job_id, skip, page_size)
        if page.num_rows == 0:
            return
        yield page
