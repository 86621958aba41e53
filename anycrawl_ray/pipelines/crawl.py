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

from ..stages.fetch import build_lookup, cached_lookup, fetch_batch
from ..stages.parse import PageParser
from ..state.frontier import Frontier

DOC_COLUMNS = ["doc_id", "spans", "job_id", "url", "status"]
LIGHT_COLUMNS = [
    "url", "canonical_url", "host", "depth", "discovered_seq",
    "status", "should_scrape", "candidates", "content_bytes", "doc_id", "title",
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
        }


@dataclass
class CrawlResult:
    job_id: str
    documents: pa.Table  # DOCUMENTS_FULL shape, admission (= doc_id) order
    order: pa.Table  # golden_order shape: admission_seq, url, depth, parent_url
    seen: pa.Table  # SEEN shape
    lineage: pa.Table
    stats: dict[str, int]
    epochs: int
    out_path: str | None = None


def _parse_wave_inline(wave: pa.Table, lookup: dict, parser: PageParser) -> pa.Table:
    return parser(fetch_batch(wave, lookup))


def _fetch_parse_fn(pages_ref, parser: PageParser):
    """Combined fetch+parse task fn. The synthetic fetch is a dict lookup, so
    fusing it with parse halves task dispatch; a real-HTTP fetch would stay
    its own actor-pool stage (stages/fetch.py HttpFetcher)."""

    def fn(batch: pa.Table) -> pa.Table:
        lookup = cached_lookup(pages_ref)
        return parser(fetch_batch(batch, lookup))

    return fn


def _parse_wave_ray(wave: pa.Table, pages_ref, parser: PageParser,
                    batch_size: int) -> pa.Table:
    import ray
    import ray.data

    # pre-chunk the wave so the map stage gets parallel input blocks
    # (from_arrow on one table = one block = one task)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nchunks = max(1, min((wave.num_rows + batch_size - 1) // batch_size, ncpu * 2))
    step = (wave.num_rows + nchunks - 1) // nchunks
    chunks = [wave.slice(i * step, step) for i in range(nchunks) if i * step < wave.num_rows]
    ds = ray.data.from_arrow(chunks)
    ds = ds.map_batches(
        _fetch_parse_fn(pages_ref, parser), batch_format="pyarrow", batch_size=batch_size
    )
    tables = ray.get(ds.materialize().to_arrow_refs())
    tables = [t for t in tables if t.num_rows]
    out = pa.concat_tables(tables, promote_options="default")
    return out.sort_by("discovered_seq")


def run_crawl(
    job: CrawlJob,
    pages: pa.Table,
    out_dir: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    num_shards: int = 4,
    use_ray: bool = True,
    ray_wave_threshold: int = 64,
    fetch_concurrency: int = 4,
    batch_size: int = 256,
    crash_after_epoch: int | None = None,
) -> CrawlResult:
    """Run one crawl job to completion (or until ``crash_after_epoch`` for
    resume tests). Ray must already be initialised when ``use_ray``."""
    pages_ref = None
    lookup = None
    if use_ray:
        import ray

        pages_ref = ray.put(pages)
    # inline lookup also needed for sub-threshold waves
    lookup = build_lookup(pages)
    parser = PageParser(job.to_dict())

    epoch = 0
    done = 0
    if resume and checkpoint_dir and Frontier.latest_epoch(checkpoint_dir) is not None:
        frontier, manifest = Frontier.restore(checkpoint_dir, use_actors=use_ray)
        epoch = manifest["epoch"] + 1
        done = manifest["extra"].get("done", 0)
    else:
        frontier = Frontier(num_shards=num_shards, use_actors=use_ray)
        frontier.add_seeds(job.job_id, job.seed_urls)

    doc_tables: list[pa.Table] = []
    job_out = os.path.join(out_dir, job.job_id) if out_dir else None
    if job_out and not resume and os.path.exists(job_out):
        shutil.rmtree(job_out)
    if job_out:
        os.makedirs(job_out, exist_ok=True)

    while done < job.limit:
        wave = frontier.next_wave(
            job.job_id,
            per_host_budget=job.politeness_max_inflight_per_host,
            max_pages=job.limit - done,
        )
        if wave.num_rows == 0:
            break
        if use_ray and wave.num_rows >= ray_wave_threshold:
            parsed = _parse_wave_ray(wave, pages_ref, parser, batch_size)
        else:
            parsed = _parse_wave_inline(wave, lookup, parser)
        # completion accounting (per host shard -> lineage partitions)
        statuses = parsed.column("status").to_pylist()
        hosts = parsed.column("host").to_pylist()
        nbytes = parsed.column("content_bytes").to_pylist()
        ok = [s == "completed" for s in statuses]
        frontier.mark_done_batch(job.job_id, hosts, ok, nbytes)
        done += parsed.num_rows
        # link admission in deterministic parent order
        groups = []
        urls = parsed.column("url").to_pylist()
        depths = parsed.column("depth").to_pylist()
        cands = parsed.column("candidates").to_pylist()
        for u, d, c in zip(urls, depths, cands):
            if c:
                groups.append((u, c, d + 1))
        frontier.offer_groups(job.job_id, groups, limit=job.limit)
        # persist documents for this epoch (only stored/should_scrape rows)
        doc_table = parsed.filter(
            pa.compute.and_(
                parsed.column("should_scrape"),
                pa.compute.equal(parsed.column("status"), "completed"),
            )
        ).select(["doc_id", "spans", "url", "status"])
        doc_table = doc_table.append_column(
            "job_id", pa.array([job.job_id] * doc_table.num_rows, pa.string())
        ).select(DOC_COLUMNS)
        # failed rows are job_results too (Base.ts:1090-1163) — status only
        failed = parsed.filter(pa.compute.equal(parsed.column("status"), "failed"))
        if failed.num_rows:
            failed_docs = failed.select(["doc_id", "spans", "url", "status"])
            failed_docs = failed_docs.append_column(
                "job_id", pa.array([job.job_id] * failed.num_rows, pa.string())
            ).select(DOC_COLUMNS)
            doc_table = pa.concat_tables([doc_table, failed_docs]).sort_by("doc_id")
        doc_tables.append(doc_table)
        if job_out:
            epoch_dir = os.path.join(job_out, f"epoch={epoch}")
            tmp_dir = os.path.join(job_out, f".epoch={epoch}.tmp")
            if os.path.exists(tmp_dir):
                shutil.rmtree(tmp_dir)
            os.makedirs(tmp_dir)
            pq.write_table(doc_table, os.path.join(tmp_dir, "part-0.parquet"))
            if os.path.exists(epoch_dir):
                shutil.rmtree(epoch_dir)
            os.rename(tmp_dir, epoch_dir)
        if checkpoint_dir:
            frontier.checkpoint(checkpoint_dir, epoch, extra={"done": done})
        if crash_after_epoch is not None and epoch >= crash_after_epoch:
            raise RuntimeError(f"simulated crash after epoch {epoch}")
        epoch += 1

    # assemble result
    if resume and job_out:
        # pick up docs written by the pre-crash run
        prior: list[pa.Table] = []
        for name in sorted(os.listdir(job_out)):
            if name.startswith("epoch="):
                prior.append(pq.read_table(os.path.join(job_out, name, "part-0.parquet")))
        documents = pa.concat_tables(prior) if prior else _empty_docs()
    else:
        documents = (
            pa.concat_tables(doc_tables) if doc_tables else _empty_docs()
        )
    documents = documents.sort_by("doc_id")
    log = frontier.admission_log.get(job.job_id, [])
    order = pa.table(
        {
            "job_id": [job.job_id] * len(log),
            "admission_seq": pa.array([e[0] for e in log], pa.int64()),
            "url": [e[1] for e in log],
            "canonical_url": [e[2] for e in log],
            "depth": pa.array([e[3] for e in log], pa.int32()),
            "parent_url": [e[4] for e in log],
        }
    )
    stats = frontier.stats(job.job_id)
    result = CrawlResult(
        job_id=job.job_id,
        documents=documents,
        order=order,
        seen=frontier.seen_table(job.job_id),
        lineage=frontier.lineage_rows(job.job_id, epoch),
        stats=stats,
        epochs=epoch,
        out_path=job_out,
    )
    return result


def _empty_docs() -> pa.Table:
    from ..schemas import DOCUMENTS_FULL

    return DOCUMENTS_FULL.empty_table().select(DOC_COLUMNS)
