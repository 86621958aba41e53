"""Independent single-threaded simulator of the reference crawler semantics.

Models AnyCrawl's crawl loop at ``maxConcurrency=1`` exactly as traced in
SURVEY.md §3.2 — strict FIFO queue, per-page pre-enqueue limit gate
(Base.ts:324-337), seed uniqueKey bypass (EngineQueue.ts:122-127),
first-sight dedup (Base.ts:412-420), depth gate (Base.ts:395-401), scope +
include/exclude filters (Base.ts:339-365) — using the site table's
ground-truth ``links`` column (FIXTURES.md F2), NOT the engine's link
extractor, so it is an independent oracle for admission order and the
URL-seen set.
"""

from __future__ import annotations

from collections import deque

from anycrawl_ray.functions.patterns import PathRules
from anycrawl_ray.functions.urls import canonicalize, same_scope


def simulate_crawl(job, pages) -> dict:
    """job: pipelines.crawl.CrawlJob; pages: SITE_PAGES arrow table.

    Returns {"admission": [(seq, url, canon, depth, parent)],
             "fetched": [url ...] (fetch order),
             "seen": {canonical_url}, "done": int}
    """
    urls = pages.column("url").to_pylist()
    statuses = pages.column("status_code").to_pylist()
    links_col = pages.column("links").to_pylist()
    lookup = {u: (s, l) for u, s, l in zip(urls, statuses, links_col)}
    rules = PathRules(job.include_paths, job.exclude_paths, job.scrape_paths)

    queue: deque[tuple[str, int]] = deque()
    admission: list[tuple[int, str, str, int, str]] = []
    seen: set[str] = set()
    enqueued = 0
    seq = 0
    for s in job.seed_urls:
        admission.append((seq, s, canonicalize(s), 0, ""))
        queue.append((s, 0))
        enqueued += 1
        seq += 1
    fetched: list[str] = []
    done = 0
    while queue and done < job.limit:
        url, depth = queue.popleft()
        status, links = lookup.get(url, (404, []))
        fetched.append(url)
        done += 1
        if not (200 <= status < 300):
            continue
        if enqueued >= job.limit:
            continue  # pre-enqueue gate: skip the whole page's enqueue
        # Crawlee slices filtered candidates at `limit` pre-dedup
        filtered = []
        for link in links:
            if depth + 1 > job.max_depth:
                continue
            if not same_scope(job.strategy, url, link):
                continue
            if not rules.should_follow(link, current_url=url):
                continue
            filtered.append(link)
        for link in filtered[: job.limit]:
            canon = canonicalize(link)
            if canon in seen:
                continue
            seen.add(canon)
            admission.append((seq, link, canon, depth + 1, url))
            queue.append((link, depth + 1))
            enqueued += 1
            seq += 1
    return {"admission": admission, "fetched": fetched, "seen": seen, "done": done}
