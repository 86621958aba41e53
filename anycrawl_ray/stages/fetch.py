"""Fetch stages: resolve wave URLs to (status, html, bytes).

The reference's Cheerio engine is an HTTP GET + HTML parse
(packages/scrape/src/engines/Cheerio.ts:31-57); in this sandbox the network
is replaced by a deterministic lookup against the synthetic site table
(FIXTURES.md F2), shipped to every fetch actor ONCE via ``ray.put`` —
broadcast, not re-shipped per batch (SURVEY.md §2.1 S3).

``SyntheticFetcher`` is a callable class for ``map_batches(...,
concurrency=N)`` — an actor pool whose per-actor ``__init__`` materializes
the url->page dict from the broadcast object ref, mirroring how a real
fetcher pool would hold connection pools / sessions (reference T1,
EngineConfigurator.ts:481-507). ``HttpFetcher`` sketches the real-network
path (manual retry loop + proxy-rotation hook, HttpClient.ts:31-129) and is
excluded from sandbox tests.
"""

from __future__ import annotations

import pyarrow as pa


# per-worker-process lookup cache: Ray reuses worker processes across tasks
# and dataset executions, so the url->page dict is built once per worker for
# a given broadcast ref — the broadcast-not-reshipped property without the
# per-execution cost of spinning up a fresh actor pool every crawl wave.
_LOOKUP_CACHE: dict[str, dict] = {}


def cached_lookup(pages_ref) -> dict[str, tuple[int, str, int]]:
    key = pages_ref.hex() if hasattr(pages_ref, "hex") else str(id(pages_ref))
    lookup = _LOOKUP_CACHE.get(key)
    if lookup is None:
        import ray

        pages = ray.get(pages_ref) if not isinstance(pages_ref, pa.Table) else pages_ref
        lookup = build_lookup(pages)
        if len(_LOOKUP_CACHE) > 2:
            _LOOKUP_CACHE.clear()
        _LOOKUP_CACHE[key] = lookup
    return lookup


class PageLookup:
    """Arrow-backed url -> (status, html, bytes) lookup.

    Only the url -> row-index dict is materialized per worker (O(#urls)
    small strings); html payloads stay zero-copy Arrow in the object store
    and are converted per row on access. Each page is fetched once per
    crawl, so total conversion cost equals one corpus pass spread across
    workers instead of one full to_pylist per worker (that eager version
    cost seconds per worker at ~100 MB corpora — measured)."""

    def __init__(self, pages: pa.Table) -> None:
        self._idx = {u: i for i, u in enumerate(pages.column("url").to_pylist())}
        self._status = pages.column("status_code").combine_chunks()
        self._html = pages.column("html").combine_chunks()
        self._nbytes = pages.column("content_bytes").combine_chunks()

    def get(self, url: str, default: tuple[int, str, int] = (404, "", 0)):
        i = self._idx.get(url)
        if i is None:
            return default
        return (self._status[i].as_py(), self._html[i].as_py(),
                self._nbytes[i].as_py())


def build_lookup(pages: pa.Table) -> PageLookup:
    """site table -> lazy PageLookup (see class docstring)."""
    return PageLookup(pages)


def fetch_batch(batch: pa.Table, lookup) -> pa.Table:
    """Append status_code / html / content_bytes columns to a wave batch.
    Unknown URLs -> 404 with empty body (error path, Base.ts:60-113).
    ``lookup`` is a PageLookup or any mapping with ``.get(url, default)``."""
    urls = batch.column("url").to_pylist()
    statuses, htmls, sizes = [], [], []
    for u in urls:
        status, html, nb = lookup.get(u, (404, "", 0))
        statuses.append(status)
        htmls.append(html)
        sizes.append(nb)
    return (
        batch.append_column("status_code", pa.array(statuses, pa.int32()))
        .append_column("html", pa.array(htmls, pa.string()))
        .append_column("content_bytes", pa.array(sizes, pa.int64()))
    )


class SyntheticFetcher:
    """Actor-pool fetch stage: ``map_batches(SyntheticFetcher,
    fn_constructor_args=(pages_ref,), concurrency=N, batch_format='pyarrow')``.

    ``pages_ref`` is a ``ray.put`` ObjectRef of the site table — read once
    per actor in ``__init__`` (zero-copy from the local object store), never
    per batch."""

    def __init__(self, pages_ref, options: dict | None = None) -> None:
        import ray

        pages = ray.get(pages_ref) if not isinstance(pages_ref, pa.Table) else pages_ref
        self.lookup = build_lookup(pages)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(batch, self.lookup)


# per-worker fetcher cache, keyed by (engine, broadcast ref, option
# signature): engine construction (lookup build, option parsing) happens
# once per worker process, not per wave chunk
_FETCHER_CACHE: dict[tuple, object] = {}

_FETCHER_OPTION_KEYS = ("wait_for", "wait_until", "wait_for_selector",
                        "formats")


def cached_fetcher(engine: str, pages_ref, options: dict | None = None):
    """Resolve + memoize a fetch stage from the engine registry.

    Inline (non-ObjectRef) page tables are pinned in the cache entry and
    re-checked by identity — ``id()`` alone can be recycled after GC,
    which would silently serve a stale fetcher for a different corpus."""
    from ..registry import get_engine

    opts = {k: options[k] for k in _FETCHER_OPTION_KEYS
            if options and options.get(k) is not None}
    key = (engine,
           pages_ref.hex() if hasattr(pages_ref, "hex") else str(id(pages_ref)),
           repr(sorted(opts.items())))
    entry = _FETCHER_CACHE.get(key)
    if entry is not None:
        pinned, fetcher = entry
        # ObjectRef keys (pinned None) are stable by hex; inline tables
        # must still be the same object
        if pinned is None or pinned is pages_ref:
            return fetcher
    if len(_FETCHER_CACHE) > 8:
        _FETCHER_CACHE.clear()
    fetcher = get_engine(engine)(pages_ref, options=opts)
    pin = None if hasattr(pages_ref, "hex") else pages_ref
    _FETCHER_CACHE[key] = (pin, fetcher)
    return fetcher


class HttpFetcher:
    """Real-network fetch stage, exercised live against loopback sockets
    (tests/test_http_fetcher.py: retry policy, proxy rotation, refused
    connections — no external network needed).

    Mirrors HttpClient.ts:31-129: bounded manual retries with a proxy list
    rotated per attempt; selective retry on 403/429/5xx, other 4xx return
    immediately (HttpClient.ts:59-123). Plug in as the fetch stage class in
    place of ``SyntheticFetcher`` when running outside the sandbox."""

    def __init__(self, timeout_s: float = 30.0, retries: int = 3,
                 proxies: list[str] | None = None) -> None:
        self.timeout_s = timeout_s
        self.retries = retries
        self.proxies = proxies or []
        self._attempt = 0

    def _fetch_one(self, url: str) -> tuple[int, str, int]:
        import urllib.error
        import urllib.request

        last_status = 0
        for attempt in range(self.retries + 1):
            handlers = []
            if self.proxies:
                proxy = self.proxies[(self._attempt + attempt) % len(self.proxies)]
                handlers.append(urllib.request.ProxyHandler({"http": proxy, "https": proxy}))
            opener = urllib.request.build_opener(*handlers)
            try:
                with opener.open(url, timeout=self.timeout_s) as resp:
                    body = resp.read()
                    return resp.status, body.decode("utf-8", "replace"), len(body)
            except urllib.error.HTTPError as e:
                last_status = e.code
                if e.code not in (403, 429) and e.code < 500:
                    return e.code, "", 0  # non-retryable (selective retry policy)
            except OSError:
                last_status = 0
        self._attempt += 1
        return last_status or 599, "", 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        triples = [self._fetch_one(u) for u in urls]
        return (
            batch.append_column(
                "status_code", pa.array([t[0] for t in triples], pa.int32())
            )
            .append_column("html", pa.array([t[1] for t in triples], pa.string()))
            .append_column(
                "content_bytes", pa.array([t[2] for t in triples], pa.int64())
            )
        )
