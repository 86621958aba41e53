"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in ``anycrawl_ray``) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship crawl pipeline at sf0.001 — synthetic site derived
  from the documents table, epoch-synchronous BFS crawl through the
  sharded frontier + fetch/parse map_batches stages, returning the
  interleaved span-document table (BASELINE.json input_hint shape plus
  provenance columns).
- ``queries()`` / ``oracle_sql()``: see anycrawl_ray/pipelines/queries.py —
  one entry per implemented operator family from SURVEY.md §2 plus the
  training-data additions; SQL oracles cover everything relationally
  expressible (crawl reachability included, via a recursive CTE over the
  synthetic graph rule).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: crawl the synthetic
    site graph and return the span-documents table."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(
        job_id="flagship",
        seed_urls=[page_url(0)],
        strategy="all",
        max_depth=20,
        limit=500,
        formats=["markdown", "html", "text"],
    )
    import ray

    res = run_crawl(job, pages, use_ray=ray.is_initialized())
    return res.documents


def queries() -> dict[str, Callable[[str], Any]]:
    from anycrawl_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from anycrawl_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
