"""Benchmark harness. Prints ONE JSON line on stdout.

Headline: full crawl of the synthetic site derived from ``$GRAFT_SF_DIR``
documents (fetch + parse + span assembly + frontier, the BASELINE.json
metric pipeline), timed end-to-end. ``queries`` adds representative
operator timings (aggregate, dedup, knn, text stats, windows).

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default
32). ``--scaling`` runs the plain bench twice in fresh processes at 8 and
32 CPUs on the same input and prints throughput + scaling efficiency.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time


def _eprint(*args) -> None:
    print(*args, file=sys.stderr, flush=True)


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from anycrawl_ray.pipelines import queries as Q
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    # warm the page cache (untimed read)
    pages = build_site_table(f"{sf_dir}/documents.parquet")
    n_pages = pages.num_rows

    # ---- headline: full-site crawl (fetch+parse+frontier+span assembly)
    job = CrawlJob(job_id="bench", seed_urls=[page_url(0)], strategy="all",
                   max_depth=30, limit=10_000_000,
                   formats=["markdown", "html", "text"])
    t0 = time.perf_counter()
    res = run_crawl(job, pages, use_ray=True, ray_wave_threshold=32,
                    batch_size=128, num_shards=8)
    crawl_sec = time.perf_counter() - t0
    done = res.stats["done"]
    _eprint(f"crawl: {done}/{n_pages} pages in {crawl_sec:.2f}s "
            f"({done / crawl_sec:.1f} pages/s, {res.epochs} epochs)")

    # ---- operator timings
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t = time.perf_counter()
        fn(sf_dir)
        timings[name] = round(time.perf_counter() - t, 3)
        _eprint(f"{name}: {timings[name]:.2f}s")

    timed("q1_pricing_summary", Q.q1_pricing_summary)
    timed("revenue_by_brand", Q.revenue_by_brand)
    timed("events_hourly", Q.events_hourly)
    timed("sessionize", Q.sessionize)
    timed("docs_text_stats", Q.docs_text_stats)
    timed("docs_minhash_pairs", Q.docs_minhash_pairs)
    timed("embeddings_knn", Q.embeddings_knn)
    timed("media_features", Q.media_features)
    timings["crawl_full_site"] = round(crawl_sec, 3)

    return {
        "metric": "synthetic-site crawl fetch+parse wall time (headline) + operator timings",
        "value": round(crawl_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "pages": int(done),
        "pages_per_sec": round(done / crawl_sec, 1),
    }


def run_scaling(sf_dir: str) -> dict:
    """Two fresh processes at 8 and 32 CPUs on identical input; efficiency
    = (T8/T32)/(32/8) per BASELINE.md's sandbox evidence plan."""
    out = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True, check=True,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        line = json.loads(proc.stdout.strip().splitlines()[-1])
        out[ncpu] = line
        _eprint(f"[scaling] num_cpus={ncpu}: {line['value']}s "
                f"({line['pages_per_sec']} pages/s)")
    t8, t32 = out[8]["value"], out[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "crawl scaling efficiency (8 -> 32 cpus, fresh sessions)",
        "sec_8": t8,
        "sec_32": t32,
        "pages_per_sec_8": out[8]["pages_per_sec"],
        "pages_per_sec_32": out[32]["pages_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": sf_dir,
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        result = run_scaling(sf_dir)
    else:
        result = run_bench(sf_dir, num_cpus)
        import ray

        ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
