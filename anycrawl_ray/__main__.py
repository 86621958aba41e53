"""CLI entry points — the rebuild's stand-in for the reference's HTTP API
surface (apps/api/src/routers/v1/index.ts: scrape / crawl / search), shaped
for batch use:

    python -m anycrawl_ray crawl  --pages site.parquet --seed URL \
        --out /tmp/out [--limit N] [--strategy all] [--engine browser-sim]
    python -m anycrawl_ray scrape --pages site.parquet --url URL [...]
    python -m anycrawl_ray search --serp serp_pages.json [--limit N]

The CLI owns the Ray session (guarded init); library code never calls
ray.init. ``--pages`` is the synthetic page table (url, status_code, html,
content_bytes) — with a real network engine the flag is unnecessary.
"""

from __future__ import annotations

import argparse
import json
import sys


_OWNS_RAY = False  # did this CLI invocation open the Ray session?


def _init_ray(num_cpus: int | None):
    global _OWNS_RAY
    import ray

    from .util import init_local_ray

    if not ray.is_initialized():
        _OWNS_RAY = True
    init_local_ray(num_cpus)


def _load_pages(path: str):
    import pyarrow.parquet as pq

    return pq.read_table(path)


def cmd_crawl(args) -> int:
    from .pipelines.crawl import CrawlJob, run_crawl

    _init_ray(args.num_cpus)
    pages = _load_pages(args.pages)
    job = CrawlJob(
        job_id=args.job_id, seed_urls=args.seed, limit=args.limit,
        max_depth=args.max_depth, strategy=args.strategy,
        formats=args.formats.split(","), engine=args.engine,
        blob_dir=args.blob_dir,
    )
    res = run_crawl(job, pages, out_dir=args.out,
                    checkpoint_dir=args.checkpoint_dir,
                    resume=args.resume, use_ray=True)
    print(json.dumps({"job_id": res.job_id, "stats": res.stats,
                      "epochs": res.epochs, "out": res.out_path}))
    return 0


def cmd_scrape(args) -> int:
    from .pipelines.scrape import run_scrape

    _init_ray(args.num_cpus)
    pages = _load_pages(args.pages)
    doc = run_scrape(args.url, pages, formats=args.formats.split(","),
                     engine=args.engine)
    doc["spans"] = doc["spans"][: args.max_spans]
    print(json.dumps(doc, default=str))
    return 0


def cmd_results(args) -> int:
    """Paginated results page for a finished crawl — the CLI stand-in for
    ``GET /v1/crawl/:jobId/results?skip=N`` (CrawlController.ts:198-266).
    Pure disk reader: no Ray session, only the page's part files are read."""
    from .sources.results import results_response

    resp = results_response(args.out, args.job_id, skip=args.skip,
                            base=args.base)
    if not args.full:
        for row in resp["data"]:
            row.pop("spans", None)
    print(json.dumps(resp, default=str))
    return 0


def cmd_search(args) -> int:
    from .pipelines.search import run_search

    _init_ray(args.num_cpus)
    with open(args.serp) as f:
        serp_pages = json.load(f)
    out = run_search(serp_pages, limit=args.limit, use_ray=True)
    print(json.dumps(out.to_pylist()))
    return 0


def cmd_api(args) -> int:
    """Serve the v1 HTTP API (apps/api/src/index.ts) over the stdlib
    server; pages/documents come from local fixtures."""
    from .api.app import App
    from .sources.synthetic_site import build_site_table

    pages = build_site_table(args.pages) if args.pages else None
    if pages is not None and args.num_cpus:
        _init_ray(args.num_cpus)
    app = App(pages=pages, documents_path=args.documents,
              out_dir=args.out, checkpoint_dir=args.checkpoint_dir,
              auth_enabled=args.auth, credits_enabled=args.credits,
              storage_dir=args.storage_dir,
              use_ray=bool(args.num_cpus))
    for key in args.api_key or []:
        app.state.add_api_key(key)
    print(f"anycrawl_ray api listening on :{args.port} "
          f"(auth={'on' if args.auth else 'off'})")
    app.serve(port=args.port)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="anycrawl_ray")
    parser.add_argument("--num-cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--pages", required=True)
    c.add_argument("--seed", action="append", required=True)
    c.add_argument("--job-id", default="cli")
    c.add_argument("--limit", type=int, default=100)
    c.add_argument("--max-depth", type=int, default=10)
    c.add_argument("--strategy", default="same-domain")
    c.add_argument("--formats", default="markdown")
    c.add_argument("--engine", default="cheerio")
    c.add_argument("--out", default=None)
    c.add_argument("--checkpoint-dir", default=None)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--blob-dir", default=None)
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("scrape")
    s.add_argument("--pages", required=True)
    s.add_argument("--url", required=True)
    s.add_argument("--formats", default="markdown")
    s.add_argument("--engine", default="cheerio")
    s.add_argument("--max-spans", type=int, default=1_000_000)
    s.set_defaults(fn=cmd_scrape)

    r = sub.add_parser("results")
    r.add_argument("--out", required=True, help="crawl --out directory")
    r.add_argument("--job-id", required=True)
    # string on purpose: the controller coerces with Number(raw ?? 0) || 0
    r.add_argument("--skip", default="0")
    r.add_argument("--base", default="http://localhost:8080")
    r.add_argument("--full", action="store_true",
                   help="include span arrays in each data row")
    r.set_defaults(fn=cmd_results)

    se = sub.add_parser("search")
    se.add_argument("--serp", required=True,
                    help="JSON list of {engine, query, page, body}")
    se.add_argument("--limit", type=int, default=10)
    se.set_defaults(fn=cmd_search)

    a = sub.add_parser("api")
    a.add_argument("--port", type=int, default=8080)
    a.add_argument("--pages", default=None,
                   help="documents.parquet for the synthetic site corpus")
    a.add_argument("--documents", default=None,
                   help="documents.parquet for SERP fixtures")
    a.add_argument("--out", default="/tmp/anycrawl_api_out")
    a.add_argument("--checkpoint-dir", default="/tmp/anycrawl_api_ckpt")
    a.add_argument("--storage-dir", default=None)
    a.add_argument("--auth", action="store_true")
    a.add_argument("--credits", action="store_true")
    a.add_argument("--api-key", action="append", default=None)
    a.set_defaults(fn=cmd_api)

    args = parser.parse_args(argv)
    code = args.fn(args)
    # only close a session this invocation opened — in-process callers
    # (tests, embedding apps) keep theirs
    if _OWNS_RAY:
        import ray

        if ray.is_initialized():
            ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())
