"""Search pipeline: SERP fetch/parse fan-out + optional scrape enrichment.

Rebuild of ``POST /v1/search`` (SURVEY.md §3.3, SearchController.ts:25-232 +
SearchService.ts:197-293):

1. effective page count = ``ceil(limit/10)`` for engines without direct
   limit support, 1 otherwise (SearchService.ts:210-219);
2. page bodies -> parse stage (``map_batches`` over Arrow batches of
   bodies, serp/engines.py) -> flat typed result rows;
3. accumulate + order by (page, position) + global ``limit`` slice
   (SearchService.ts:282-285 — A5);
4. optional enrichment: scrape each result URL and hash-join the scraped
   document onto results by url — the small side is bounded by
   ``limit <= 100``, so it is a **broadcast** join (J1,
   SearchController.ts:178-201), left-outer: unmatched rows pass through.
"""

from __future__ import annotations

import pyarrow as pa

from ..serp.engines import ENGINE_REGISTRY, parse_serp_batch
from .scrape import run_scrape_many


def run_search(
    serp_pages: list[dict],
    limit: int = 10,
    use_ray: bool = False,
    scrape_pages: pa.Table | None = None,
    scrape_formats: list[str] | None = None,
) -> pa.Table:
    """``serp_pages``: [{engine, query, page, body}] (pre-fetched bodies —
    in production the SERP fetch is an actor-pool stage like any other
    fetch; in-sandbox the fixture generator supplies bodies). Returns the
    SERP_RESULTS table limited to ``limit`` rows; when ``scrape_pages`` is
    given, result URLs are scraped against it and a ``spans`` column is
    attached (enrichment join)."""
    if not serp_pages:
        return _empty()
    engine = serp_pages[0]["engine"]
    if ENGINE_REGISTRY[engine]["supports_direct_limit"]:
        pages = serp_pages[:1]
    else:
        pages = serp_pages[: max(1, -(-limit // 10))]
    batch = pa.table(
        {
            "engine": [p["engine"] for p in pages],
            "query": [p["query"] for p in pages],
            "page": pa.array([p["page"] for p in pages], pa.int32()),
            "body": [p["body"] for p in pages],
        }
    )
    if use_ray:
        import ray
        import ray.data

        ds = ray.data.from_arrow(batch)
        # capture the DRIVER's registry (incl. runtime-registered engines)
        # in the task closure — workers' fresh imports only have builtins
        registry = dict(ENGINE_REGISTRY)
        ds = ds.map_batches(
            lambda b: parse_serp_batch(b, registry=registry),
            batch_format="pyarrow", batch_size=4)
        results = pa.concat_tables(
            [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
        )
    else:
        results = parse_serp_batch(batch)
    results = results.sort_by([("page", "ascending"), ("position", "ascending")])
    results = results.slice(0, limit)
    if scrape_pages is not None:
        results = _enrich(results, scrape_pages, scrape_formats, use_ray)
    return results


def _enrich(results: pa.Table, scrape_pages: pa.Table,
            formats: list[str] | None, use_ray: bool) -> pa.Table:
    """Broadcast hash join of scraped docs onto SERP rows by url (J1)."""
    urls = list(dict.fromkeys(results.column("url").to_pylist()))
    docs = run_scrape_many(urls, scrape_pages, formats=formats, use_ray=use_ray)
    by_url: dict[str, list] = {}
    for u, spans, status in zip(docs.column("url").to_pylist(),
                                docs.column("spans").to_pylist(),
                                docs.column("status").to_pylist()):
        if status == "completed":
            by_url[u] = spans
    from ..schemas import SPAN

    spans_col = [by_url.get(u) for u in results.column("url").to_pylist()]
    return results.append_column("spans", pa.array(spans_col, pa.list_(SPAN)))


def _empty() -> pa.Table:
    from ..schemas import SERP_RESULTS

    return SERP_RESULTS.empty_table()
