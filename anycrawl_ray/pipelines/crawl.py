"""Epoch-synchronous crawl driver — the rebuild of ``POST /v1/crawl``.

Reference lifecycle (SURVEY.md §3.2): seed -> frontier -> always-running
engines pull FIFO -> extract -> enqueue links -> Redis counters -> Lua
finalize. The rebuild runs the same computation as a loop of BFS **waves**:

    wave = frontier.next_wave()                       # (depth, seq) order
    ds   = ray.data.from_arrow(wave)                  # Arrow blocks
            .map_batches(SyntheticFetcher, concurrency=F)   # actor pool
            .map_batches(PageParser(job))                   # stateless
    documents -> partitioned parquet (epoch dir, atomic rename)
    links    -> frontier.offer_groups(parent-ordered)  # dedup + limit gate
    frontier.checkpoint(epoch)                         # resumable
    terminate when wave empty or done >= limit         # Progress.ts:279-298

Termination needs no in-flight gauge or Lua CAS (A2) — the epoch barrier
makes "done == enqueued && nothing enqueuing" trivially observable.

Scale notes:
- page bodies never touch the driver: fetch+parse run as a Dataset, the
  ``html`` column is dropped inside the parse stage, documents are written
  straight from the dataset to parquet; only the light link/status columns
  return to the driver for frontier admission;
- waves smaller than ``ray_wave_threshold`` run inline on the driver (the
  per-wave Dataset execution overhead dominates below that); identical
  code path semantics either way — asserted by tests;
- output layout ``{out_dir}/{job_id}/epoch=K/part.parquet`` — a resumed run
  skips finished epochs (north_rule resumability).

Determinism: fetch completion order is irrelevant — results are re-sorted
by ``discovered_seq`` before link admission, so the admission order equals
the reference's concurrency-1 order (SURVEY.md §7.1) for any actor-pool
size. Verified against an independent simulator in tests/test_crawl.py.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.fetch import build_lookup, cached_fetcher
from ..stages.parse import PageParser
from ..state import storage as _storage
from ..state.frontier import Frontier

DOC_COLUMNS = ["doc_id", "spans", "job_id", "url", "status"]
LIGHT_COLUMNS = [
    "url", "canonical_url", "host", "depth", "discovered_seq",
    "status", "should_scrape", "candidates", "content_bytes", "doc_id", "title",
]
# what the driver actually touches after a worker-side document write:
# completion accounting (status/host/content_bytes), admission
# (url/depth/candidates + worker-precomputed canon/key/host vectors) and
# the order guard (discovered_seq). Everything else stays worker-side —
# fewer columns = materially cheaper per-chunk result deserialization in
# the dispatch loop (driver-serial time).
WAVE_RESULT_COLUMNS = [
    "url", "host", "depth", "discovered_seq", "status", "content_bytes",
    "candidates", "cand_canon", "cand_key", "cand_host",
]


@dataclass
class CrawlJob:
    """crawlSchema equivalent (packages/libs/src/types/CrawlSchema.ts:6-49)."""

    job_id: str
    seed_urls: list[str]
    max_depth: int = 10
    limit: int = 100
    strategy: str = "same-domain"
    include_paths: list[str] = field(default_factory=list)
    exclude_paths: list[str] = field(default_factory=list)
    scrape_paths: list[str] = field(default_factory=list)
    formats: list[str] = field(default_factory=lambda: ["markdown"])
    include_tags: list[str] | None = None
    exclude_tags: list[str] | None = None
    politeness_max_inflight_per_host: int = 1_000_000
    politeness_min_delay_ms: int = 0
    obey_robots: bool = False  # north_rule addition; reference never checks
    # engine selection + browser option surface (BaseSchema.ts:36-162);
    # resolved through the engine registry (EngineFactory.ts:141-170)
    engine: str = "cheerio"
    wait_for: int | None = None
    wait_until: str | None = None
    wait_for_selector: object | None = None
    # blob store root for media payloads (S7, s3.ts seam); None = no sink
    blob_dir: str | None = None

    # option validation = the reference's Zod crawlSchema bounds
    # (CrawlSchema.ts:6-49: depth 1-50 -> we also allow 0 for scrape mode,
    # limit 1-50000, strategy enum, formats subset)
    _STRATEGIES = ("all", "same-domain", "same-hostname", "same-origin")
    _FORMATS = ("markdown", "html", "text", "rawHtml", "screenshot",
                "screenshot@fullPage", "json")

    def __post_init__(self) -> None:
        if not self.seed_urls and self.limit > 0:
            pass  # empty seed list is a no-op crawl, allowed
        if not 0 <= self.max_depth <= 50:
            raise ValueError(f"max_depth must be in [0, 50], got {self.max_depth}")
        if not 0 <= self.limit <= 50_000:
            raise ValueError(f"limit must be in [0, 50000], got {self.limit}")
        if self.strategy not in self._STRATEGIES:
            raise ValueError(
                f"strategy must be one of {self._STRATEGIES}, got {self.strategy!r}")
        bad = [f for f in self.formats if f not in self._FORMATS]
        if bad:
            raise ValueError(f"unknown formats {bad}; allowed: {self._FORMATS}")

    def to_dict(self) -> dict:
        return {
            "job_id": self.job_id,
            "max_depth": self.max_depth,
            "limit": self.limit,
            "strategy": self.strategy,
            "include_paths": self.include_paths,
            "exclude_paths": self.exclude_paths,
            "scrape_paths": self.scrape_paths,
            "formats": self.formats,
            "include_tags": self.include_tags,
            "exclude_tags": self.exclude_tags,
            "engine": self.engine,
            "wait_for": self.wait_for,
            "wait_until": self.wait_until,
            "wait_for_selector": self.wait_for_selector,
            "blob_dir": self.blob_dir,
        }


class CrawlResult:
    """Crawl outputs. ``documents`` (DOCUMENTS_FULL shape, doc_id order) is
    loaded lazily when the crawl wrote to disk — at scale the span table is
    the big artifact and callers usually read the parquet directly."""

    def __init__(self, job_id: str, order: pa.Table, seen: pa.Table,
                 lineage: pa.Table, stats: dict[str, int], epochs: int,
                 documents: pa.Table | None = None,
                 out_path: str | None = None) -> None:
        self.job_id = job_id
        self.order = order
        self.seen = seen
        self.lineage = lineage
        self.stats = stats
        self.epochs = epochs
        self.out_path = out_path
        self._documents = documents

    @property
    def documents(self) -> pa.Table:
        if self._documents is None:
            self._documents = _read_docs(self.out_path)
        return self._documents


def epoch_part_files(job_out: str | None) -> list[str]:
    """All document part files of a job, epochs in NUMERIC order (a
    lexicographic listdir would read epoch=10 before epoch=2)."""
    if not job_out or not os.path.isdir(job_out):
        return []
    epochs = sorted(
        (int(name.split("=", 1)[1]), name)
        for name in os.listdir(job_out)
        if name.startswith("epoch=") and name.split("=", 1)[1].isdigit()
    )
    files: list[str] = []
    for _n, name in epochs:
        edir = os.path.join(job_out, name)
        files.extend(
            os.path.join(edir, f)
            for f in sorted(os.listdir(edir))
            if _storage.is_part(f)
        )
    return files


def _read_docs(job_out: str | None) -> pa.Table:
    parts = [_storage.read_table(f) for f in epoch_part_files(job_out)]
    docs = pa.concat_tables(parts) if parts else _empty_docs()
    return docs.sort_by("doc_id")


def _run_fetch_parse(chunk: pa.Table, fetcher, parser: PageParser) -> pa.Table:
    """Shared worker body for every wave path: fetch, sink media blobs
    (worker-side — payloads never cross the driver), parse."""
    fetched = fetcher(chunk)
    blob_dir = parser.job.get("blob_dir")
    if blob_dir and "screenshot" in fetched.schema.names:
        from ..stages.browser import persist_screenshots

        full = "screenshot@fullPage" in (parser.job.get("formats") or [])
        persist_screenshots(fetched, blob_dir,
                            parser.job.get("job_id", "job"), full_page=full)
    return parser(fetched)


def _parse_wave_inline(wave: pa.Table, fetcher, parser: PageParser) -> pa.Table:
    return _run_fetch_parse(wave, fetcher, parser)


# pages table -> ObjectRef memo (strong table ref pins id()); repeated
# run_crawl calls over the same table (warmup, multi-job) broadcast once
_PAGES_REF_MEMO: dict[int, tuple] = {}


def _memoized_put(pages: pa.Table):
    import ray

    entry = _PAGES_REF_MEMO.get(id(pages))
    if entry is not None and entry[0] is pages:
        return entry[1]
    ref = ray.put(pages)
    if len(_PAGES_REF_MEMO) > 4:
        _PAGES_REF_MEMO.clear()
    _PAGES_REF_MEMO[id(pages)] = (pages, ref)
    return ref


# (pages_ref hex, job-config signature, size) -> FetchParsePool; pools are
# expensive to spin up (32 interpreter spawns), so they live for the session
_POOL_MEMO: dict[tuple, "FetchParsePool"] = {}


def _memoized_pool(pages_ref, parser: PageParser, job: "CrawlJob",
                   pool_size: int | None) -> "FetchParsePool":
    import ray

    size = pool_size or max(1, min(32, int(ray.cluster_resources().get("CPU", 1))))
    # job_id flows through wave batches (doc ids) and limit is frontier-side,
    # so neither affects parser behavior -> pools are shared across jobs
    cfg = {k: v for k, v in job.to_dict().items() if k not in ("job_id", "limit")}
    key = (getattr(pages_ref, "hex", lambda: str(id(pages_ref)))(),
           repr(sorted(cfg.items(), key=lambda kv: kv[0])), size)
    pool = _POOL_MEMO.get(key)
    if pool is None:
        if len(_POOL_MEMO) > 4:
            close_pools()
        pool = FetchParsePool(pages_ref, parser, size)
        _POOL_MEMO[key] = pool
    return pool


def close_pools() -> None:
    """Kill all memoized fetch+parse pools (end-of-session cleanup)."""
    for pool in _POOL_MEMO.values():
        pool.shutdown()
    _POOL_MEMO.clear()


def _fetch_parse_fn(pages_ref, parser: PageParser):
    """Combined fetch+parse task fn. The synthetic fetch is a dict lookup, so
    fusing it with parse halves task dispatch; a real-HTTP fetch would stay
    its own actor-pool stage (stages/fetch.py HttpFetcher). The fetch stage
    is resolved from the engine registry (job['engine'], default cheerio) —
    browser-sim etc. plug in here with no driver changes."""

    def fn(batch: pa.Table) -> pa.Table:
        fetcher = cached_fetcher(parser.job.get("engine") or "cheerio",
                                 pages_ref, parser.job)
        return _run_fetch_parse(batch, fetcher, parser)

    return fn


def _chunk(wave: pa.Table, batch_size: int, ncpu: int) -> list[pa.Table]:
    """Split a wave so every CPU gets work and the per-wave critical path is
    short: target ~2 chunks per CPU with a 16-row floor, capped at
    ``batch_size`` rows per chunk (memory). The floor matters both ways:
    the driver pays per-chunk dispatch + result-deserialize time (an 8-row
    floor once turned a 5k-page crawl into ~400 chunks of parallelism-
    INDEPENDENT driver work), while a 32-row floor left most of a 32-actor
    pool idle on the politeness-capped 100-800-row waves (measured r4:
    floor 32 -> 1318 pages/s, floor 16 -> 1626 pages/s at 32 CPUs; floor 16
    beats 8 and 4 too, now that the persistent pool's range-call dispatch
    costs ~2 ms/chunk instead of the round-robin path's 5-8 ms)."""
    rows = wave.num_rows
    chunk_rows = min(batch_size, max(16, (rows + ncpu * 2 - 1) // (ncpu * 2)))
    nchunks = (rows + chunk_rows - 1) // chunk_rows
    return [wave.slice(i * chunk_rows, chunk_rows) for i in range(nchunks)]


def make_doc_table(parsed: pa.Table, job_id: str) -> pa.Table:
    """parsed wave rows -> persisted document rows: stored pages
    (should_scrape AND completed) plus failed job_results rows
    (Base.ts:992-1006, 1090-1163), doc_id-ordered."""
    stored = parsed.filter(
        pa.compute.and_(
            parsed.column("should_scrape"),
            pa.compute.equal(parsed.column("status"), "completed"),
        )
    ).select(["doc_id", "spans", "url", "status"])
    failed = parsed.filter(
        pa.compute.equal(parsed.column("status"), "failed")
    ).select(["doc_id", "spans", "url", "status"])
    doc = pa.concat_tables([stored, failed]) if failed.num_rows else stored
    doc = doc.append_column(
        "job_id", pa.array([job_id] * doc.num_rows, pa.string())
    ).select(DOC_COLUMNS)
    return doc.sort_by("doc_id")


_WAVE_TASK = None


def _wave_task():
    """Lazily-decorated remote fn (module import must not require ray)."""
    global _WAVE_TASK
    if _WAVE_TASK is None:
        import ray

        @ray.remote
        def fetch_parse_chunk(chunk: pa.Table, pages_ref, parser: PageParser,
                              job_id: str = "", write_path: str | None = None) -> pa.Table:
            fetcher = cached_fetcher(parser.job.get("engine") or "cheerio",
                                     pages_ref, parser.job)
            parsed = _run_fetch_parse(chunk, fetcher, parser)
            if write_path is not None:
                # sink documents at the worker — span payloads never cross
                # the driver; only light link/status columns return
                _storage.write_table(make_doc_table(parsed, job_id), write_path)
                return parsed.select(WAVE_RESULT_COLUMNS)
            return parsed

        _WAVE_TASK = fetch_parse_chunk
    return _WAVE_TASK


class FetchParsePool:
    """Persistent fetch+parse actor pool for the crawl inner loop.

    One actor per CPU, created ONCE per crawl and reused by every wave:
    per-actor state (the broadcast page lookup, the compiled parser) is
    built in ``__init__``, and the pool avoids Ray's on-demand worker
    spawn/reclaim churn that stateless per-wave tasks exhibit (measured:
    early-wave in-task wall inflates ~10x while the worker fleet warms).
    This is the reference's engine-pool shape (SURVEY.md T1) expressed as
    explicit actors."""

    def __init__(self, pages_ref, parser: PageParser, size: int) -> None:
        import ray

        # num_cpus=0: the pool's parallelism is governed by its size (we
        # create exactly one per CPU); zero reservation keeps long-lived
        # pools from starving subsequent Dataset stages in the same session
        @ray.remote(num_cpus=0)
        class _Worker:
            def __init__(self, pages_ref, parser):
                self.fetcher = cached_fetcher(
                    parser.job.get("engine") or "cheerio", pages_ref,
                    parser.job)
                self.parser = parser

            def ping(self):
                return True

            def run(self, chunk: pa.Table, job_id: str,
                    write_path: str | None) -> pa.Table:
                parsed = _run_fetch_parse(chunk, self.fetcher, self.parser)
                if write_path is not None:
                    _storage.write_table(make_doc_table(parsed, job_id), write_path)
                    return parsed.select(WAVE_RESULT_COLUMNS)
                return parsed

            def run_range(self, wave: pa.Table, start: int, length: int,
                          job_id: str, write_path: str | None) -> pa.Table:
                # the wave arrives as a zero-copy plasma-backed table (the
                # driver put it once and passes the ObjectRef per call)
                return self.run(wave.slice(start, length), job_id, write_path)

        self.actors = [_Worker.remote(pages_ref, parser) for _ in range(size)]
        ray.get([a.ping.remote() for a in self.actors])  # barrier: pool up

    def run_wave(self, chunks: list[pa.Table], job_id: str,
                 write_paths: list[str | None]) -> list[pa.Table]:
        import ray

        futures = [
            self.actors[i % len(self.actors)].run.remote(c, job_id, wp)
            for i, (c, wp) in enumerate(zip(chunks, write_paths))
        ]
        return ray.get(futures)

    def run_wave_ranges(self, wave: pa.Table, ranges: list[tuple[int, int]],
                        job_id: str, write_paths: list[str | None]) -> list[pa.Table]:
        """One plasma put for the whole wave + tiny (ref,start,len) calls —
        dispatch cost is O(#calls), independent of wave bytes. Chunks are
        assigned DYNAMICALLY (next chunk to the first free actor) so skewed
        chunk costs don't leave actors idle behind a static round-robin."""
        return list(self.run_wave_ranges_iter(wave, ranges, job_id,
                                              write_paths))

    def run_wave_ranges_iter(self, wave: pa.Table,
                             ranges: list[tuple[int, int]], job_id: str,
                             write_paths: list[str | None]):
        """``run_wave_ranges`` as an IN-ORDER generator: yields chunk i's
        result as soon as chunks 0..i-1 have been yielded (out-of-order
        completions buffer). This lets the caller overlap its serial
        per-chunk work — result deserialization, frontier admission — with
        the remaining wave compute instead of paying it after the epoch
        barrier (the parallelism-independent tail that caps scaling
        efficiency)."""
        import ray

        wave_ref = ray.put(wave)
        work = list(enumerate(zip(ranges, write_paths)))
        ready: dict[int, pa.Table] = {}
        next_out = 0
        free = list(self.actors)
        pending: dict = {}
        wi = 0
        while wi < len(work) or pending:
            while free and wi < len(work):
                idx, ((start, length), wp) = work[wi]
                actor = free.pop()
                fut = actor.run_range.remote(wave_ref, start, length, job_id, wp)
                pending[fut] = (idx, actor)
                wi += 1
            if pending:
                done, _ = ray.wait(list(pending), num_returns=1)
                for fut in done:
                    idx, actor = pending.pop(fut)
                    ready[idx] = ray.get(fut)
                    free.append(actor)
            while next_out in ready:
                table = ready.pop(next_out)
                next_out += 1
                if table.num_rows:
                    yield table

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)


def _ensure_seq_order(table: pa.Table) -> pa.Table:
    """Results are normally already in discovered_seq order (chunks are
    sequential ranges of the sorted wave); sort only if that ever breaks."""
    import numpy as np

    seq = table.column("discovered_seq").to_numpy(zero_copy_only=False)
    if seq.size and np.all(np.diff(seq) >= 0):
        return table
    return table.sort_by("discovered_seq")


def _parse_wave_ray(wave: pa.Table, pages_ref, parser: PageParser,
                    batch_size: int, engine: str = "actors",
                    job_id: str = "", write_tmp_dir: str | None = None,
                    pool: "FetchParsePool | None" = None,
                    part_ext: str = ".parquet") -> pa.Table:
    """Distributed wave execution.

    Default is raw Ray tasks over Arrow chunks: the crawl inner loop is an
    epoch-synchronous barrier with a frontier feedback edge — the one shape
    the Dataset API cannot express (SURVEY.md §7.3 puts the frontier outside
    the Dataset graph). A per-wave ``ray.data`` execution pays ~0.5-1s of
    planning/teardown per epoch, which at 2.5 ms/page of useful parse work
    is >90% overhead (measured); plain tasks over the same batch functions
    cost ~10 ms dispatch. ``engine='dataset'`` keeps the Dataset path (same
    semantics, asserted by tests) for pipelines that want the streaming
    executor, e.g. when fetch is a real actor-pool HTTP stage."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    chunks = _chunk(wave, batch_size, ncpu)
    if engine == "dataset":
        import ray.data

        ds = ray.data.from_arrow(chunks)
        ds = ds.map_batches(
            _fetch_parse_fn(pages_ref, parser), batch_format="pyarrow",
            batch_size=batch_size,
        )
        tables = ray.get(ds.materialize().to_arrow_refs())
    else:
        if write_tmp_dir is not None:
            write_paths = [os.path.join(write_tmp_dir, f"part-{i:04d}{part_ext}")
                           for i in range(len(chunks))]
        else:
            write_paths = [None] * len(chunks)
        if engine == "actors" and pool is not None:
            ranges = []
            off = 0
            for c in chunks:
                ranges.append((off, c.num_rows))
                off += c.num_rows
            tables = pool.run_wave_ranges(wave, ranges, job_id, write_paths)
        else:
            task = _wave_task()
            tables = ray.get([
                task.remote(c, pages_ref, parser, job_id, wp)
                for c, wp in zip(chunks, write_paths)
            ])
    tables = [t for t in tables if t.num_rows]
    out = pa.concat_tables(tables, promote_options="default")
    # chunks are sequential ranges of the already-(depth,seq)-sorted wave
    # and results are reassembled by chunk index, so the concat is normally
    # already ordered — the full-table sort (a `take` copying the candidate
    # list columns, ~50 ms/epoch measured) only runs if that ever breaks
    return _ensure_seq_order(out)


def run_crawl(
    job: CrawlJob,
    pages: pa.Table,
    out_dir: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_shards: int = 4,
    use_ray: bool = True,
    ray_wave_threshold: int = 64,
    wave_engine: str = "actors",
    batch_size: int = 256,
    pool_size: int | None = None,
    hot_host_lane_size: int = 1 << 30,
    spill_dir: str | None = None,
    spill_segment_size: int = 4096,
    seen_spill_threshold: int = 1 << 30,
    crash_after_epoch: int | None = None,
    crash_before_checkpoint: int | None = None,
    record_admissions: bool = True,
    cancel_check=None,
    webhooks=None,
    storage_format: str = "parquet",
) -> CrawlResult:
    """Run one crawl job to completion (or until ``crash_after_epoch`` for
    resume tests). Ray must already be initialised when ``use_ray``.

    ``storage_format``: ``"parquet"`` (default) or ``"lance"`` — the
    north-rule Lance sink behind an import guard (state/storage.py);
    validated up front so a missing backend fails at submit time."""
    part_ext = _storage.part_extension(_storage.require_format(storage_format))
    pages_ref = None
    if use_ray:
        pages_ref = _memoized_put(pages)
    # inline lookup also needed for sub-threshold waves + robots; the
    # inline FETCH stage itself resolves through the engine registry
    lookup = build_lookup(pages)
    inline_fetcher = cached_fetcher(job.engine or "cheerio", pages,
                                    job.to_dict())
    parser = PageParser(job.to_dict())
    robots = None
    if job.obey_robots:
        from ..state.robots import RobotsCache

        robots = RobotsCache(lookup)

    epoch = 0
    done = 0
    pool: FetchParsePool | None = None
    if resume and checkpoint_dir and Frontier.latest_epoch(checkpoint_dir) is not None:
        frontier, manifest = Frontier.restore(checkpoint_dir, use_actors=use_ray)
        epoch = manifest["epoch"] + 1
        done = manifest["extra"].get("done", 0)
    else:
        frontier = Frontier(num_shards=num_shards, use_actors=use_ray,
                            hot_host_lane_size=hot_host_lane_size,
                            spill_dir=spill_dir,
                            spill_segment_size=spill_segment_size,
                            seen_spill_threshold=seen_spill_threshold,
                            record_admissions=record_admissions)
        frontier.add_seeds(job.job_id, job.seed_urls)

    try:
        doc_tables: list[pa.Table] = []
        job_out = os.path.join(out_dir, job.job_id) if out_dir else None
        if job_out and not resume and os.path.exists(job_out):
            shutil.rmtree(job_out)
        if job_out:
            os.makedirs(job_out, exist_ok=True)
        if resume and job_out and epoch_part_files(job_out):
            # a resumed job keeps writing whatever format its first run
            # wrote (ARCHITECTURE §6) — the detected format wins over the
            # argument, and a missing backend still fails up front
            detected = _storage.latest_format(job_out)
            if detected != storage_format:
                part_ext = _storage.part_extension(
                    _storage.require_format(detected))

        cancelled = False
        start_epoch = epoch
        while done < job.limit:
            # cooperative cancellation, checked at the epoch boundary — the
            # reference's Redis cancelled flag short-circuits engines
            # pre-navigation (Progress.ts:361-374); the epoch-synchronous
            # rebuild stops before pulling the next wave
            if cancel_check is not None and cancel_check():
                cancelled = True
                break
            wave = frontier.next_wave(
                job.job_id,
                per_host_budget=job.politeness_max_inflight_per_host,
                max_pages=job.limit - done,
            )
            if wave.num_rows == 0:
                break
            tmp_dir = None
            if job_out:
                tmp_dir = os.path.join(job_out, f".epoch={epoch}.tmp")
                if os.path.exists(tmp_dir):
                    shutil.rmtree(tmp_dir)
                os.makedirs(tmp_dir)
            distributed = use_ray and wave.num_rows >= ray_wave_threshold
            dist_write = (distributed and wave_engine in ("tasks", "actors")
                          and tmp_dir is not None)
            epoch_docs: list[pa.Table] = []

            def consume(parsed: pa.Table) -> None:
                """Per-result accounting + admission. Called once per wave (the
                classic path) or once per in-order chunk (the overlapped actors
                path) — chunk-wise application is equivalent because the
                frontier counters/gates are global driver state and chunks
                arrive in admission (discovered_seq) order."""
                nonlocal done
                # completion accounting (per host shard -> lineage partitions)
                import pyarrow.compute as _pc

                ok = _pc.equal(parsed.column("status"), "completed") \
                    .combine_chunks().to_numpy(zero_copy_only=False)
                hosts = parsed.column("host").to_numpy(zero_copy_only=False)
                nbytes = parsed.column("content_bytes").to_numpy(
                    zero_copy_only=False)
                frontier.mark_done_batch(job.job_id, hosts, ok, nbytes)
                done += parsed.num_rows
                # link admission in deterministic parent order; canonical
                # forms and xxh64 keys were computed worker-side in the
                # parse stage, and offer_table flattens the candidate list
                # columns with Arrow kernels — the driver's serial
                # admission prep does no nested to_pylist or per-page loop
                frontier.offer_table(
                    job.job_id, parsed, limit=job.limit,
                    allowed_fn=(robots.allowed_batch
                                if robots is not None else None))
                if not dist_write:
                    epoch_docs.append(make_doc_table(parsed, job.job_id))

            if distributed and wave_engine == "actors":
                # overlapped path: consume chunk results in order while the
                # rest of the wave is still executing, hiding the driver's
                # serial admission/deserialization under worker compute
                import ray

                if pool is None:
                    pool = _memoized_pool(pages_ref, parser, job, pool_size)
                ncpu = int(ray.cluster_resources().get("CPU", 8))
                chunk_sizes = [c.num_rows for c in _chunk(wave, batch_size, ncpu)]
                ranges = []
                off = 0
                for ln in chunk_sizes:
                    ranges.append((off, ln))
                    off += ln
                if dist_write:
                    write_paths: list[str | None] = [
                        os.path.join(tmp_dir, f"part-{i:04d}{part_ext}")
                        for i in range(len(ranges))
                    ]
                else:
                    write_paths = [None] * len(ranges)
                # consume in ~4 in-order slices per wave: admission RPCs stay
                # near-batched (per-chunk offers measured 40% slower — 300+
                # tiny shard RPC rounds; 4 rounds/wave keeps that amortized)
                # while the driver's serial admission/deserialization for the
                # first 3 slices hides UNDER the remaining wave compute — the
                # epoch-barrier tail is the parallelism-independent constant
                # that caps N->4N scaling efficiency
                slice_rows = max(1, (wave.num_rows + 3) // 4)
                acc: list[pa.Table] = []
                acc_rows = 0

                def flush_acc() -> None:
                    nonlocal acc, acc_rows
                    if acc:
                        consume(_ensure_seq_order(pa.concat_tables(
                            acc, promote_options="default")))
                        acc, acc_rows = [], 0

                for t in pool.run_wave_ranges_iter(
                        wave, ranges, job.job_id, write_paths):
                    if t.num_rows:
                        acc.append(t)
                        acc_rows += t.num_rows
                    if acc_rows >= slice_rows:
                        flush_acc()
                flush_acc()
            elif distributed:
                consume(_parse_wave_ray(
                    wave, pages_ref, parser, batch_size, wave_engine,
                    job_id=job.job_id,
                    write_tmp_dir=tmp_dir if dist_write else None,
                    part_ext=part_ext,
                ))
            else:
                consume(_parse_wave_inline(wave, inline_fetcher, parser))
            # persist documents for this epoch
            if epoch_docs:
                doc_table = (epoch_docs[0] if len(epoch_docs) == 1 else
                             pa.concat_tables(epoch_docs,
                                              promote_options="default"))
                if tmp_dir is not None:
                    _storage.write_table(
                        doc_table, os.path.join(tmp_dir, f"part-0000{part_ext}"))
                else:
                    doc_tables.append(doc_table)
            if tmp_dir is not None:
                # atomic epoch commit: parts land in tmp, rename publishes
                epoch_dir = os.path.join(job_out, f"epoch={epoch}")
                if os.path.exists(epoch_dir):
                    shutil.rmtree(epoch_dir)
                os.rename(tmp_dir, epoch_dir)
            if crash_before_checkpoint is not None and epoch >= crash_before_checkpoint:
                # simulates dying after the epoch dir was published but before
                # the frontier checkpoint — resume must redo this epoch
                # deterministically, overwriting the published dir
                raise RuntimeError(f"simulated crash before checkpoint {epoch}")
            if checkpoint_dir:
                frontier.checkpoint(checkpoint_dir, epoch, extra={"done": done})
            if crash_after_epoch is not None and epoch >= crash_after_epoch:
                raise RuntimeError(f"simulated crash after epoch {epoch}")
            epoch += 1
            if job.politeness_min_delay_ms > 0:
                # inter-wave politeness delay: with per-host wave budgets this
                # bounds the per-host request rate at budget/delay
                import time as _t

                _t.sleep(job.politeness_min_delay_ms / 1000.0)

        # assemble result: with an out_dir the authoritative copy is on disk
        # (CrawlResult loads it lazily); in-memory mode concatenates here
        if job_out:
            documents = None
        else:
            documents = (
                pa.concat_tables(doc_tables) if doc_tables else _empty_docs()
            ).sort_by("doc_id")
        order = frontier.admission_table(job.job_id)
        stats = frontier.stats(job.job_id)
        stats["cancelled"] = cancelled
        result = CrawlResult(
            job_id=job.job_id,
            order=order,
            seen=frontier.seen_table(job.job_id),
            lineage=frontier.lineage_rows(job.job_id, epoch),
            stats=stats,
            epochs=epoch,
            documents=documents,
            out_path=job_out,
        )
        # live spill files are no longer needed (checkpoints hold their own
        # copies); leaving them would leak disk across jobs sharing a spill_dir
        frontier.dispose_spill_files()
        if webhooks is not None and (epoch > start_epoch or not resume):
            # Base.ts:1003 -> WebhookManager.triggerEvent on job completion;
            # the dispatcher owns retry/backoff — trigger is fire-and-forget.
            # A resume of an ALREADY-finished job runs zero epochs and must not
            # re-fire completion (the reference fires once, at actual finish)
            event = "crawl.cancelled" if cancelled else "crawl.completed"
            webhooks.trigger_event(event, {
                "job_id": job.job_id,
                "status": "cancelled" if cancelled else "completed",
                "done": stats["done"],
                "succeeded": stats["succeeded"],
                "failed": stats["failed"],
                "credits_used": stats["credits_used"],
            }, "crawl", job.job_id)
            webhooks.process_queue()
        return result
    except BaseException:
        # error path: return the memoized shard pool to the cache so
        # one failed crawl doesn't force every later crawl back to
        # cold actor spawns (reset-on-lease keeps reuse safe)
        frontier.release_pool()
        raise


def _empty_docs() -> pa.Table:
    from ..schemas import DOCUMENTS_FULL

    return DOCUMENTS_FULL.empty_table().select(DOC_COLUMNS)


def job_from_template(job_id: str, url: str, template: dict,
                      request_options: dict | None = None,
                      current_user_id: str | None = None,
                      variables: dict | None = None) -> CrawlJob:
    """Template-driven crawl-job construction: the TemplateHandler flow
    (templateHandler.ts:75-160) feeding the CrawlJob dataclass — access
    check, type check, domain validation, deep option merge (request wins),
    engine resolution against the live registry, {{var}} URL rendering."""
    from dataclasses import fields as _fields

    from ..functions.template_system import process_template
    from ..functions.templates import render_url_template
    from ..registry import available_engines

    url = render_url_template(url, variables)
    res = process_template(template, url, request_options or {}, "crawl",
                           current_user_id,
                           allowed_engines=tuple(available_engines()))
    if not res["success"]:
        raise ValueError(res["error"])
    opts = dict(res["merged_options"])
    opts.pop("engine", None)
    known = {f.name for f in _fields(CrawlJob)} - {"job_id", "seed_urls",
                                                   "engine"}
    return CrawlJob(job_id=job_id, seed_urls=[url],
                    engine=res["engine_name"],
                    **{k: v for k, v in opts.items() if k in known})
