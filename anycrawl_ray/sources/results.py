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


def coerce_skip(raw) -> int:
    """``Math.max(0, Number(rawSkip ?? 0) || 0)`` (CrawlController.ts:231-232):
    array query params take the first element, None/NaN/non-numeric fold to 0,
    negatives clamp to 0."""
    if isinstance(raw, (list, tuple)):
        raw = raw[0] if raw else None
    if raw is None:
        return 0
    if isinstance(raw, bool):  # JS Number(true) == 1
        return int(raw)
    if isinstance(raw, str):
        s = raw.strip()
        if not s:  # Number("") == 0
            return 0
        try:
            raw = float(s)
        except ValueError:  # Number("abc") == NaN -> || 0
            return 0
    try:
        n = float(raw)
    except (TypeError, ValueError):
        return 0
    if n != n:  # NaN
        return 0
    if n == float("inf"):  # Number("Infinity") -> past-the-end page
        return 1 << 62
    if n == float("-inf"):
        return 0
    return max(0, int(n))


def count_job_results(out_dir: str, job_id: str) -> int:
    """Total result rows from parquet footers only (getJobResultsCount —
    no data pages are read)."""
    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in _part_files(out_dir, job_id))


def results_response(out_dir: str, job_id: str, skip=0,
                     base: str = "http://localhost:8080",
                     status: str = "completed",
                     stats: dict | None = None) -> dict:
    """The full ``GET /v1/crawl/:jobId/results`` envelope
    (CrawlController.ts:198-266): page size 100, coerced ``skip``,
    ``hasMore = skip + len(results) < total`` drives an absolute ``next``
    URL, and screenshot blob keys are rewritten to public storage routes
    (``{base}/v1/public/storage/file/{key}``, ScrapeController-aligned).

    ``stats`` (CrawlResult.stats / frontier.stats) supplies the job-record
    fields; absent ones fall back exactly like the controller's
    ``job.total ?? total`` / ``?? 0`` chain. Each data row is the stored
    span document plus its ``url`` (the controller's ``{...data, url}``),
    with screenshot spans surfaced as top-level ``screenshot`` /
    ``screenshot@fullPage`` keys the way the reference stores them."""
    skip = coerce_skip(skip)
    total = count_job_results(out_dir, job_id)
    page, _next_skip = read_job_results(out_dir, job_id, skip, PAGE_SIZE)
    got = page.num_rows
    has_more = skip + got < total
    next_url = (f"{base}/v1/crawl/{job_id}/results?skip={skip + got}"
                if has_more else None)

    prefix = f"{base}/v1/public/storage/file/"
    data = []
    for row in page.to_pylist():
        d = {"doc_id": row["doc_id"], "spans": row["spans"],
             "status": row["status"]}
        for span in row["spans"] or []:
            kind = span.get("kind")
            if kind in ("screenshot", "screenshot@fullPage"):
                ref = (span.get("media_ref") or "").rsplit("://", 1)[-1]
                from ..state.blobstore import screenshot_key

                d[kind] = prefix + screenshot_key(
                    row["job_id"], ref, full_page=(kind == "screenshot@fullPage"))
        d["url"] = row["url"]
        data.append(d)

    stats = stats or {}
    return {
        "success": True,
        "status": status,
        "total": stats.get("total", total),
        "completed": stats.get("done", 0),
        "credits_used": stats.get("credits_used", 0),
        "next": next_url,
        "data": data,
    }


def iter_job_results(out_dir: str, job_id: str, page_size: int = PAGE_SIZE):
    """Generator over all result pages (client-side pagination loop)."""
    skip: int | None = 0
    while skip is not None:
        page, skip = read_job_results(out_dir, job_id, skip, page_size)
        if page.num_rows == 0:
            return
        yield page
