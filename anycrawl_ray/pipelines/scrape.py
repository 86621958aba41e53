"""Scrape pipeline: single-page (and batched many-page) extraction.

Rebuild of ``POST /v1/scrape`` (SURVEY.md §3.1): no frontier involved —
resolve the URL, extract the requested formats, return one span document.
``run_scrape_many`` is the batched form used by the search pipeline's
enrichment fan-out (SearchController.ts:100-176) and by ad-hoc scraping:
one Dataset, fetch+parse ``map_batches``, no crawl state.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.fetch import cached_fetcher
from ..stages.parse import PageParser


def _wave_like(urls: list[str], job_id: str) -> pa.Table:
    return pa.table(
        {
            "url": urls,
            "depth": pa.array([0] * len(urls), pa.int32()),
            "discovered_seq": pa.array(list(range(len(urls))), pa.int64()),
            "job_id": [job_id] * len(urls),
        }
    )


def run_scrape_many(
    urls: list[str],
    pages: pa.Table,
    formats: list[str] | None = None,
    job_id: str = "scrape",
    use_ray: bool = False,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    batch_size: int = 256,
    engine: str = "cheerio",
    **engine_options,
) -> pa.Table:
    """Scrape a list of URLs against the page table. Returns
    (doc_id, spans, job_id, url, status) in input order. ``engine``
    resolves through the registry (cheerio / browser-sim / ...);
    ``engine_options`` carries wait_for / wait_until / wait_for_selector."""
    job = {
        "job_id": job_id,
        "formats": formats or ["markdown"],
        "include_tags": include_tags,
        "exclude_tags": exclude_tags,
        "max_depth": 0,  # no link following in scrape mode
        "engine": engine,
        **engine_options,
    }
    parser = PageParser(job)
    wave = _wave_like(urls, job_id)
    if use_ray and len(urls) >= 32:
        import ray
        import ray.data

        pages_ref = ray.put(pages)

        def fn(batch: pa.Table) -> pa.Table:
            fetcher = cached_fetcher(engine, pages_ref, job)
            return parser(fetcher(batch))

        ds = ray.data.from_arrow(wave).map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size
        )
        parsed = pa.concat_tables(
            [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
        ).sort_by("discovered_seq")
    else:
        parsed = parser(cached_fetcher(engine, pages, job)(wave))
    out = parsed.select(["doc_id", "spans", "job_id", "url", "status"])
    return out


def run_scrape(url: str, pages: pa.Table, formats: list[str] | None = None,
               **kw) -> dict:
    """Single page -> one document row as a dict (controller response shape,
    ScrapeController.ts:60-104 minus the HTTP envelope)."""
    table = run_scrape_many([url], pages, formats=formats, **kw)
    return table.to_pylist()[0]
