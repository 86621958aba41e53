"""Crawl conformance: admission order, seen-set, span invariants, resume.

The oracle is tests/reference_sim.py (independent FIFO simulator of the
reference at concurrency 1). Per BASELINE.json the invariants are:
span-sequence equality (kind, text, media_ref, order), exact admission
order, final URL-seen-set equality.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
from anycrawl_ray.sources.synthetic_site import (
    build_site_table,
    page_url,
    site_table_from_rows,
)
from tests.reference_sim import simulate_crawl

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _check_conformance(job: CrawlJob, pages: pa.Table, **kw):
    res = run_crawl(job, pages, use_ray=False, **kw)
    sim = simulate_crawl(job, pages)
    # exact admission order
    got = list(
        zip(
            res.order.column("admission_seq").to_pylist(),
            res.order.column("url").to_pylist(),
            res.order.column("depth").to_pylist(),
            res.order.column("parent_url").to_pylist(),
        )
    )
    want = [(s, u, d, p) for (s, u, _c, d, p) in sim["admission"]]
    assert got == want, f"admission order mismatch: {got[:5]} vs {want[:5]}"
    # URL-seen set equality
    assert set(res.seen.column("canonical_url").to_pylist()) == sim["seen"]
    # fetched pages = limit-prefix of admission order
    fetched_urls = res.documents.column("url").to_pylist()
    want_fetch = [u for u in sim["fetched"]]
    # documents are doc_id (= admission seq) ordered; drop skipped (scrape_paths)
    if not job.scrape_paths:
        assert fetched_urls == want_fetch
    assert res.stats["done"] == sim["done"]
    return res, sim


@pytest.mark.parametrize("strategy", ["all", "same-hostname", "same-domain"])
def test_conformance_strategies(strategy):
    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy=strategy,
                   max_depth=12, limit=120)
    _check_conformance(job, pages)


@pytest.mark.parametrize("max_depth", [1, 2, 4])
def test_conformance_depth_gate(max_depth):
    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all",
                   max_depth=max_depth, limit=500)
    res, sim = _check_conformance(job, pages)
    assert max(res.order.column("depth").to_pylist()) <= max_depth


def test_conformance_include_exclude():
    pages = build_site_table(DOCS)
    job = CrawlJob(
        job_id="t", seed_urls=[page_url(0)], strategy="all", max_depth=10, limit=200,
        include_paths=["**/p/0000*", "/p\\/0001\\d{2}$/"],
        exclude_paths=["**/p/00001?"],
    )
    res, _ = _check_conformance(job, pages)
    urls = res.order.column("url").to_pylist()
    assert all("/p/0000" in u or "/p/0001" in u for u in urls[1:])
    assert not any("/p/000010" in u for u in urls[1:])


def test_conformance_scrape_paths():
    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all",
                   max_depth=10, limit=60, scrape_paths=["**/p/00000?"])
    res, sim = _check_conformance(job, pages)
    stored = res.documents.column("url").to_pylist()
    # only matching pages stored; links still followed (60 pages done)
    assert all(u[-2] == "0" for u in stored)
    assert res.stats["done"] == 60


def test_limit_exact_page_count():
    pages = build_site_table(DOCS)
    for limit in (1, 7, 33):
        job = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all", limit=limit)
        res, sim = _check_conformance(job, pages)
        assert res.documents.num_rows == limit


def test_seed_bypasses_dedup():
    # a page linking back to the seed re-admits it (EngineQueue.ts:122-127)
    rows = [
        {"url": "http://s.test/", "html": "", "links": ["http://s.test/a"]},
        {"url": "http://s.test/a", "html": "", "links": ["http://s.test/"]},
    ]
    for r in rows:
        r["html"] = "<html><body>" + "".join(
            f'<a href="{l}">x</a>' for l in r["links"]
        ) + "</body></html>"
    pages = site_table_from_rows(rows)
    job = CrawlJob(job_id="t", seed_urls=["http://s.test/"], strategy="all", limit=10)
    res, sim = _check_conformance(job, pages)
    urls = res.order.column("url").to_pylist()
    assert urls.count("http://s.test/") == 2  # seed + re-discovered


def test_failed_pages_accounted_no_links():
    rows = [
        {"url": "http://s.test/", "status_code": 200,
         "html": '<a href="/bad">b</a><a href="/ok">o</a>',
         "links": ["http://s.test/bad", "http://s.test/ok"]},
        {"url": "http://s.test/bad", "status_code": 500,
         "html": '<a href="/never">n</a>', "links": ["http://s.test/never"]},
        {"url": "http://s.test/ok", "status_code": 200, "html": "fine", "links": []},
    ]
    pages = site_table_from_rows(rows)
    job = CrawlJob(job_id="t", seed_urls=["http://s.test/"], strategy="all", limit=10)
    res, sim = _check_conformance(job, pages)
    assert res.stats["failed"] == 1
    assert res.stats["succeeded"] == 2
    statuses = dict(zip(res.documents.column("url").to_pylist(),
                        res.documents.column("status").to_pylist()))
    assert statuses["http://s.test/bad"] == "failed"
    assert "http://s.test/never" not in res.order.column("url").to_pylist()


def test_politeness_budget_invariants():
    """Finite politeness deliberately throttles hot hosts, so cross-host
    admission order may differ from the unthrottled FIFO (the reference has
    no politeness — the conformance config is budget=inf, covered above).
    The politeness contract is: (a) runs are deterministic, (b) per-host
    fetch order is FIFO by host_seq, (c) an exhaustive crawl reaches the
    same URL-seen set."""
    pages = build_site_table(DOCS)
    exhaustive = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all",
                          max_depth=30, limit=1000)
    res_full = run_crawl(exhaustive, pages, use_ray=False)
    polite = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all",
                      max_depth=30, limit=1000, politeness_max_inflight_per_host=1)
    res_p1 = run_crawl(polite, pages, use_ray=False)
    res_p2 = run_crawl(polite, pages, use_ray=False)
    # (a) deterministic
    assert res_p1.order.equals(res_p2.order)
    assert res_p1.documents.equals(res_p2.documents)
    # (b) per-host FIFO: doc order restricted to one host is host_seq-ordered
    fetched = res_p1.documents.column("url").to_pylist()
    admitted_pos = {u: i for i, u in enumerate(res_p1.order.column("url").to_pylist())}
    for host in ("site0.test", "site1.test"):
        host_fetch = [admitted_pos[u] for u in fetched if host in u]
        assert host_fetch == sorted(host_fetch)
    # (c) exhaustive crawl: same seen set, many more epochs (throttled waves)
    assert set(res_p1.seen.column("canonical_url").to_pylist()) == set(
        res_full.seen.column("canonical_url").to_pylist()
    )
    assert res_p1.epochs > res_full.epochs


def test_span_sequence_golden():
    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="g", seed_urls=[page_url(0)], strategy="all", limit=1,
                   formats=["markdown", "html", "text", "rawHtml", "screenshot", "json"])
    res = run_crawl(job, pages, use_ray=False)
    spans = res.documents.column("spans").to_pylist()[0]
    kinds = [s["kind"] for s in spans]
    # order: title, rawHtml, metadata*, html, markdown*, text, media*, screenshot, json
    assert kinds[0] == "title" and spans[0]["text"] == "Doc 0"
    assert kinds[1] == "rawHtml"
    assert kinds[2:4] == ["metadata", "metadata"]
    assert spans[2]["text"] == "description=synthetic page 0"
    assert kinds[4] == "html"
    i = kinds.index("text")
    assert all(k == "markdown" for k in kinds[5:i])
    assert kinds[i + 1] == "media"
    assert spans[i + 1]["media_ref"].startswith("http://site0.test/img/")
    assert kinds[i + 2] == "screenshot"
    assert spans[i + 2]["media_ref"].startswith("screenshot://")
    assert kinds[i + 3] == "json"
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    # cleaned html excludes nav/ads/footer; absolute links
    html_span = spans[4]["text"]
    assert "site nav" not in html_span and "buy things" not in html_span
    assert "footer text" not in html_span and "<!--" not in html_span
    assert 'href="http://site1.test/p/000001"' in html_span


def test_resume_no_duplicates(tmp_path):
    pages = build_site_table(DOCS)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    job = CrawlJob(job_id="r", seed_urls=[page_url(0)], strategy="all",
                   max_depth=10, limit=150)
    # full run for the golden
    golden = run_crawl(job, pages, use_ray=False)
    # crashed run
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_crawl(job, pages, use_ray=False, out_dir=out, checkpoint_dir=ckpt,
                  crash_after_epoch=2)
    # resume
    res = run_crawl(job, pages, use_ray=False, out_dir=out, checkpoint_dir=ckpt,
                    resume=True)
    doc_ids = res.documents.column("doc_id").to_pylist()
    assert len(doc_ids) == len(set(doc_ids)) == 150
    assert res.documents.equals(golden.documents)
    assert res.seen.to_pydict()["canonical_url"] == golden.seen.to_pydict()["canonical_url"]


def test_crawl_via_ray_matches_inline(ray_session):
    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all",
                   max_depth=10, limit=150)
    res_ray = run_crawl(job, pages, use_ray=True, ray_wave_threshold=4, num_shards=3)
    res_inline = run_crawl(job, pages, use_ray=False)
    assert res_ray.order.equals(res_inline.order)
    assert res_ray.documents.equals(res_inline.documents)
    assert res_ray.seen.equals(res_inline.seen)


def test_hot_host_lane_splitting():
    """north_rule skew control: a hot host's queue spreads across shards
    when lanes are enabled; admission order and results are unchanged."""
    from anycrawl_ray.state.frontier import Frontier

    pages = build_site_table(DOCS, num_hosts=1)  # everything on one host
    job = CrawlJob(job_id="t", seed_urls=[page_url(0, num_hosts=1)],
                   strategy="all", max_depth=12, limit=200)
    base = run_crawl(job, pages, use_ray=False)
    split = run_crawl(job, pages, use_ray=False, hot_host_lane_size=8)
    assert split.order.equals(base.order)
    assert split.documents.equals(base.documents)
    assert split.seen.equals(base.seen)
    # verify lanes actually spread pending entries over multiple shards
    f = Frontier(num_shards=4, use_actors=False, hot_host_lane_size=8)
    f.add_seeds("j", [page_url(0, num_hosts=1)])
    f.offer_groups("j", [(page_url(0, num_hosts=1),
                          [page_url(i, num_hosts=1) for i in range(1, 64)], 1)])
    occupied = sum(1 for s in f.shards if s.pending_count("j") > 0)
    assert occupied >= 3


def test_resume_after_crash_before_checkpoint(tmp_path):
    """Crash in the window between epoch-dir publish and frontier
    checkpoint: resume redoes that epoch deterministically (idempotent
    overwrite), no duplicate or missing doc_ids."""
    pages = build_site_table(DOCS)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    job = CrawlJob(job_id="r", seed_urls=[page_url(0)], strategy="all",
                   max_depth=10, limit=150)
    golden = run_crawl(job, pages, use_ray=False)
    with pytest.raises(RuntimeError, match="before checkpoint"):
        run_crawl(job, pages, use_ray=False, out_dir=out, checkpoint_dir=ckpt,
                  crash_before_checkpoint=3)
    res = run_crawl(job, pages, use_ray=False, out_dir=out, checkpoint_dir=ckpt,
                    resume=True)
    ids = res.documents.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids)) == 150
    assert res.documents.equals(golden.documents)


def test_resume_with_ray_actors(ray_session, tmp_path):
    pages = build_site_table(DOCS)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    job = CrawlJob(job_id="ra", seed_urls=[page_url(0)], strategy="all",
                   max_depth=10, limit=150)
    golden = run_crawl(job, pages, use_ray=False)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_crawl(job, pages, use_ray=True, ray_wave_threshold=8, out_dir=out,
                  checkpoint_dir=ckpt, crash_after_epoch=2)
    res = run_crawl(job, pages, use_ray=True, ray_wave_threshold=8, out_dir=out,
                    checkpoint_dir=ckpt, resume=True)
    assert res.documents.equals(golden.documents)
    assert res.seen.to_pydict() == golden.seen.to_pydict()


def test_seen_set_exact_under_filter_saturation():
    """A saturated cuckoo filter must degrade to exact lookups, never to
    missed dedup (duplicate admission)."""
    from anycrawl_ray.state.frontier import Frontier

    # capacity 64 per shard, 1 shard -> guaranteed saturation at 5k keys
    f = Frontier(num_shards=1, capacity_per_shard=64, use_actors=False)
    f.add_seeds("j", ["http://s.test/"])
    urls = [f"http://s.test/p{i}" for i in range(5000)]
    n1 = f.offer_groups("j", [("http://s.test/", urls, 1)])
    assert n1 == 5000
    assert len(f.shards[0].overflow) > 0  # filter actually saturated
    # re-offering every URL must admit zero
    n2 = f.offer_groups("j", [("http://s.test/x", urls, 2)])
    assert n2 == 0
    # saturation survives checkpoint/restore
    import tempfile

    d = tempfile.mkdtemp()
    f.checkpoint(d, 0)
    g, _ = Frontier.restore(d, use_actors=False)
    assert g.offer_groups("j", [("http://s.test/y", urls, 2)]) == 0


def test_per_call_limit_slices_candidates_pre_dedup():
    """Crawlee's enqueueLinks `limit` slices the filtered candidate list
    BEFORE dedup: a page with more candidates than `limit` only considers
    the first `limit`, and already-seen candidates inside that window eat
    into the budget."""
    many = [f"http://s.test/x{i}" for i in range(8)]
    rows = [
        {"url": "http://s.test/", "links": ["http://s.test/a"]},
        # /a links to /a (seen) then 8 fresh urls; with limit=3 only
        # [/a, x0, x1] are considered -> admits x0, x1 (2 new)
        {"url": "http://s.test/a", "links": ["http://s.test/a"] + many},
    ] + [{"url": u, "links": []} for u in many]
    for r in rows:
        r["html"] = "<html><body>" + "".join(
            f'<a href="{l}">x</a>' for l in r["links"]) + "</body></html>"
    pages = site_table_from_rows(rows)
    job = CrawlJob(job_id="t", seed_urls=["http://s.test/"], strategy="all",
                   limit=3, max_depth=10)
    res, sim = _check_conformance(job, pages)
    admitted = res.order.column("url").to_pylist()
    assert "http://s.test/x0" in admitted and "http://s.test/x1" in admitted
    assert "http://s.test/x2" not in admitted


def test_crawl_cooperative_cancellation():
    """§2.9 cancellation: the cancel flag stops the crawl at the next
    epoch boundary; fetched pages stay, stats record the cancel."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    job = CrawlJob(job_id="cx", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=400)
    epochs_seen = {"n": 0}

    def cancel_after_two():
        epochs_seen["n"] += 1
        return epochs_seen["n"] > 2

    res = run_crawl(job, pages, use_ray=False, cancel_check=cancel_after_two)
    assert res.stats["cancelled"] is True
    assert 0 < res.stats["done"] < 400
    assert res.documents.num_rows == res.stats["done"]
    # un-cancelled run reports cancelled=False
    res2 = run_crawl(CrawlJob(job_id="cy", seed_urls=[page_url(0)],
                              strategy="all", max_depth=20, limit=50),
                     pages, use_ray=False)
    assert res2.stats["cancelled"] is False


def test_register_search_engine():
    import pytest

    from anycrawl_ray.serp.engines import ENGINE_REGISTRY, register_search_engine

    def parse(body):
        return [{"category": "web", "title": "t", "url": "http://x.test/",
                 "description": "d", "source": "Custom"}]

    register_search_engine("custom-engine", parse, supports_direct_limit=True)
    try:
        assert ENGINE_REGISTRY["custom-engine"]["supports_direct_limit"]
        with pytest.raises(ValueError):
            register_search_engine("custom-engine", parse)
        register_search_engine("custom-engine", parse, overwrite=True)
    finally:
        ENGINE_REGISTRY.pop("custom-engine", None)


def test_custom_search_engine_works_distributed(ray_session):
    """Review fix: a driver-registered custom engine must work through the
    Ray map_batches path (the driver's registry ships in the closure —
    worker processes' fresh imports only have builtins)."""
    from anycrawl_ray.pipelines.search import run_search
    from anycrawl_ray.serp.engines import (
        ENGINE_REGISTRY,
        build_search_url,
        register_search_engine,
    )

    def parse(body):
        # 10 rows/page like a real SERP; direct-limit engines consume
        # only page 1 (ACEngine semantics), which limit=5 then slices
        return [{"category": "web", "title": f"t{i}", "url": f"http://x.test/{i}",
                 "description": body, "source": "Custom"} for i in range(10)]

    def build_url(base_url="", query="", **kw):
        return f"{base_url}/custom?q={query}"

    register_search_engine("custom-dist", parse, build_url=build_url,
                           supports_direct_limit=True, overwrite=True)
    try:
        assert build_search_url("custom-dist", "hi", base_url="http://s.local") \
            == "http://s.local/custom?q=hi"
        pages = [{"engine": "custom-dist", "query": "hi", "page": i + 1,
                  "body": f"b{i}"} for i in range(40)]
        out = run_search(pages, limit=5, use_ray=True)
        assert out.num_rows == 5
        assert out.column("source").to_pylist()[0] == "Custom"
    finally:
        ENGINE_REGISTRY.pop("custom-dist", None)
