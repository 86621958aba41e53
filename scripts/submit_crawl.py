"""Cluster entrypoint for a crawl job — the ``ray job submit`` surface.

On a real cluster:

    ray job submit --working-dir . -- python scripts/submit_crawl.py \
        --seeds seeds.txt --out /shared/crawl_out --ckpt /shared/crawl_ckpt \
        --job-id prod-crawl-1 --strategy same-domain --limit 50000 [--resume]

In this sandbox (no cluster) it runs against a local session and the
synthetic site (``--pages-from`` documents parquet). The script owns its
Ray session (guarded init per the driver contract); resumability comes
from ``--resume`` + the checkpoint dir (north_rule: a killed submission
resumes mid-crawl without re-fetching or duplicating spans).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job-id", default="submitted")
    ap.add_argument("--seeds", help="file with one seed URL per line")
    ap.add_argument("--pages-from",
                    default="/root/testdata/sf0.001/documents.parquet",
                    help="documents parquet for the synthetic site resolver")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--strategy", default="same-domain")
    ap.add_argument("--limit", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=10)
    ap.add_argument("--formats", default="markdown")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--obey-robots", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from anycrawl_ray.util import init_local_ray

    init_local_ray(args.num_cpus)

    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table(args.pages_from)
    if args.seeds:
        with open(args.seeds) as f:
            seeds = [line.strip() for line in f if line.strip()]
    else:
        seeds = [page_url(0)]
    job = CrawlJob(job_id=args.job_id, seed_urls=seeds, strategy=args.strategy,
                   limit=args.limit, max_depth=args.max_depth,
                   formats=args.formats.split(","), obey_robots=args.obey_robots)
    res = run_crawl(job, pages, out_dir=args.out, checkpoint_dir=args.ckpt,
                    resume=args.resume)
    print(json.dumps({"job_id": res.job_id, "stats": res.stats,
                      "epochs": res.epochs, "out": res.out_path}), flush=True)
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
