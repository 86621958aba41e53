"""Secondary pipeline paths: dataset wave engine, politeness delay,
multi-job frontier isolation, include_tags scrape, composed pipeline."""

from __future__ import annotations

import time

from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
from anycrawl_ray.pipelines.scrape import run_scrape
from anycrawl_ray.sources.synthetic_site import build_site_table, page_url
from anycrawl_ray.state.frontier import Frontier

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_dataset_wave_engine_matches_actors(ray_session, tmp_path):
    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all",
                   max_depth=10, limit=150)
    res_a = run_crawl(job, pages, use_ray=True, ray_wave_threshold=8,
                      wave_engine="actors", out_dir=str(tmp_path / "a"))
    res_d = run_crawl(job, pages, use_ray=True, ray_wave_threshold=8,
                      wave_engine="dataset", out_dir=str(tmp_path / "d"))
    assert res_a.order.equals(res_d.order)
    assert res_a.documents.equals(res_d.documents)


def test_politeness_min_delay_slows_epochs():
    pages = build_site_table(DOCS)
    job_fast = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all", limit=30)
    job_slow = CrawlJob(job_id="t", seed_urls=[page_url(0)], strategy="all", limit=30,
                        politeness_min_delay_ms=100)
    t0 = time.perf_counter()
    r1 = run_crawl(job_fast, pages, use_ray=False)
    fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    r2 = run_crawl(job_slow, pages, use_ray=False)
    slow = time.perf_counter() - t0
    assert r1.order.equals(r2.order)  # delay never changes results
    assert slow >= fast + 0.1 * (r2.epochs - 1) * 0.9


def test_multi_job_frontier_isolation():
    f = Frontier(num_shards=3, use_actors=False)
    f.add_seeds("job1", ["http://a.test/"])
    f.add_seeds("job2", ["http://a.test/"])  # same URL, different job
    f.offer_groups("job1", [("http://a.test/", ["http://a.test/x"], 1)])
    f.offer_groups("job2", [("http://a.test/", ["http://a.test/y"], 1)])
    w1 = f.next_wave("job1")
    w2 = f.next_wave("job2")
    assert w1.column("url").to_pylist() == ["http://a.test/", "http://a.test/x"]
    assert w2.column("url").to_pylist() == ["http://a.test/", "http://a.test/y"]
    # per-job seen sets are independent
    assert f.seen_table("job1").column("canonical_url").to_pylist() == ["http://a.test/x"]
    assert f.seen_table("job2").column("canonical_url").to_pylist() == ["http://a.test/y"]
    assert f.stats("job1")["enqueued"] == 2


def test_scrape_include_exclude_tags():
    pages = build_site_table(DOCS)
    doc = run_scrape(page_url(0), pages, formats=["html", "markdown"],
                     include_tags=["h1"])
    html_span = next(s for s in doc["spans"] if s["kind"] == "html")
    assert html_span["text"] == "<h1>Doc 0</h1>"
    md_span = [s for s in doc["spans"] if s["kind"] == "markdown"]
    assert md_span[0]["text"].startswith("Doc 0")
    doc2 = run_scrape(page_url(0), pages, formats=["html"], exclude_tags=["h1"])
    html2 = next(s for s in doc2["spans"] if s["kind"] == "html")
    assert "<h1>" not in html2["text"]


def test_training_pipeline_compose(ray_session):
    """Flagship composition: crawl -> text spans -> quality -> dedup."""
    from anycrawl_ray.pipelines.queries import training_pipeline

    out = training_pipeline(DOCS.rsplit("/", 1)[0])
    assert out.num_rows > 0
    cols = set(out.schema.names)
    assert {"doc_id", "n_tokens", "quality"} <= cols
    ids = out.column("doc_id").to_pylist()
    assert len(ids) == len(set(ids))


def test_paginated_results_reader(tmp_path):
    from anycrawl_ray.sources.results import iter_job_results, read_job_results

    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="pg", seed_urls=[page_url(0)], strategy="all", limit=250)
    res = run_crawl(job, pages, use_ray=False, out_dir=str(tmp_path))
    page1, next_skip = read_job_results(str(tmp_path), "pg", skip=0)
    assert page1.num_rows == 100 and next_skip == 100
    page2, next2 = read_job_results(str(tmp_path), "pg", skip=next_skip)
    assert page2.num_rows == 100 and next2 == 200
    page3, next3 = read_job_results(str(tmp_path), "pg", skip=next2)
    assert page3.num_rows == 50 and next3 is None
    all_ids = [r for p in (page1, page2, page3) for r in p.column("doc_id").to_pylist()]
    assert all_ids == res.documents.column("doc_id").to_pylist()
    # generator covers everything exactly once
    total = sum(p.num_rows for p in iter_job_results(str(tmp_path), "pg"))
    assert total == 250
    # missing job -> empty
    empty, nxt = read_job_results(str(tmp_path), "nope")
    assert empty.num_rows == 0 and nxt is None


def test_job_validation_bounds():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_depth"):
        CrawlJob(job_id="x", seed_urls=["http://a/"], max_depth=51)
    with _pytest.raises(ValueError, match="limit"):
        CrawlJob(job_id="x", seed_urls=["http://a/"], limit=50_001)
    with _pytest.raises(ValueError, match="strategy"):
        CrawlJob(job_id="x", seed_urls=["http://a/"], strategy="everything")
    with _pytest.raises(ValueError, match="formats"):
        CrawlJob(job_id="x", seed_urls=["http://a/"], formats=["pdf"])
    CrawlJob(job_id="x", seed_urls=["http://a/"])  # defaults valid


def test_engine_registry():
    import pytest as _pytest

    from anycrawl_ray.registry import available_engines, get_engine, register_engine

    assert {"cheerio", "http"} <= set(available_engines())
    assert get_engine("cheerio") is not None
    with _pytest.raises(ValueError, match="unknown engine"):
        get_engine("nope")
    calls = []
    register_engine("custom-test", lambda pages: calls.append(pages) or (lambda b: b))
    assert "custom-test" in available_engines()
    with _pytest.raises(ValueError, match="already registered"):
        register_engine("custom-test", lambda p: p)
    register_engine("custom-test", lambda p: p, overwrite=True)


def test_query_registry_consistency():
    from anycrawl_ray.pipelines.queries import ORACLE_SQL, QUERIES

    assert set(ORACLE_SQL) <= set(QUERIES)
    assert all(callable(fn) for fn in QUERIES.values())
    assert all(isinstance(sql, str) and "SELECT" in sql.upper()
               for sql in ORACLE_SQL.values())
    assert len(QUERIES) >= 32 and len(ORACLE_SQL) >= 23


def test_pagination_numeric_epoch_order(tmp_path):
    """Review regression: epoch dirs must be read in numeric order
    (lexicographic listdir puts epoch=10 before epoch=2)."""
    from anycrawl_ray.sources.results import read_job_results

    pages = build_site_table(DOCS)
    # politeness=1 forces many epochs (>10)
    job = CrawlJob(job_id="np", seed_urls=[page_url(0)], strategy="all",
                   limit=120, max_depth=20, politeness_max_inflight_per_host=2)
    res = run_crawl(job, pages, use_ray=False, out_dir=str(tmp_path))
    assert res.epochs > 10
    collected = []
    skip = 0
    while skip is not None:
        page, skip = read_job_results(str(tmp_path), "np", skip or 0)
        if page.num_rows == 0:
            break
        collected.extend(page.column("doc_id").to_pylist())
    # pagination order = completion (epoch) order, like the reference's
    # job_results insertion order; epochs must be visited numerically
    from anycrawl_ray.pipelines.crawl import epoch_part_files
    import pyarrow.parquet as _pq

    want = []
    for f in epoch_part_files(str(tmp_path / "np")):
        want.extend(_pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist())
    assert collected == want
    assert sorted(collected) == res.documents.column("doc_id").to_pylist()
    # regression: lexicographic epoch walk would misorder epoch>=10
    names = sorted(x for x in __import__("os").listdir(str(tmp_path / "np")))
    assert names.index("epoch=10") < names.index("epoch=2")  # lexicographic trap exists


def test_scrape_many_engine_registry(ray_session):
    """run_scrape_many resolves engines through the registry: browser-sim
    produces the same span documents as cheerio plus screenshot spans when
    the format asks for them."""
    from anycrawl_ray.pipelines.scrape import run_scrape_many
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    urls = [page_url(i) for i in range(10)]
    base = run_scrape_many(urls, pages, formats=["markdown"])
    sim = run_scrape_many(urls, pages, formats=["markdown"],
                          engine="browser-sim", wait_for_selector="h1")
    assert base.equals(sim)  # same documents, engine-independent
    shot = run_scrape_many(urls, pages, formats=["markdown", "screenshot"],
                           engine="browser-sim")
    kinds = [s["kind"] for s in shot.column("spans").to_pylist()[0]]
    assert "screenshot" in kinds


def test_cli_crawl_and_scrape(tmp_path):
    """`python -m anycrawl_ray` end-to-end in a subprocess (owns its own
    Ray session): crawl writes epoch parquet + prints stats JSON; scrape
    prints one document."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "anycrawl_ray", "--num-cpus", "4", "crawl",
         "--pages", pages_path, "--seed", page_url(0), "--strategy", "all",
         "--limit", "40", "--out", out_dir],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["stats"]["done"] == 40
    job_dir = os.path.join(out_dir, "cli")
    assert any(n.startswith("epoch=") for n in os.listdir(job_dir))

    r2 = subprocess.run(
        [sys.executable, "-m", "anycrawl_ray", "--num-cpus", "4", "scrape",
         "--pages", pages_path, "--url", page_url(3),
         "--formats", "markdown,text"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    doc = json.loads(r2.stdout.strip().splitlines()[-1])
    assert doc["url"] == page_url(3)
    kinds = {s["kind"] for s in doc["spans"]}
    assert "markdown" in kinds and "text" in kinds


def test_results_response_envelope(tmp_path):
    """CrawlController.ts:198-266 parity: coerced skip, total from footers,
    hasMore-driven absolute next URL, screenshot keys rewritten to the
    public storage route, each data row = {...data, url}."""
    from anycrawl_ray.sources.results import coerce_skip, results_response

    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="pgr", seed_urls=[page_url(0)], strategy="all",
                   limit=120, engine="browser-sim",
                   formats=["markdown", "screenshot"],
                   blob_dir=str(tmp_path / "blobs"))
    res = run_crawl(job, pages, use_ray=False, out_dir=str(tmp_path))
    base = "https://api.example.com"

    r0 = results_response(str(tmp_path), "pgr", skip=0, base=base,
                          stats=res.stats)
    assert r0["success"] is True and r0["status"] == "completed"
    assert r0["total"] == 120 and len(r0["data"]) == 100
    assert r0["completed"] == res.stats["done"]
    assert r0["credits_used"] == res.stats["credits_used"]
    assert r0["next"] == f"{base}/v1/crawl/pgr/results?skip=100"
    row = r0["data"][0]
    assert row["url"] and row["doc_id"].startswith("pgr_")
    # screenshot span surfaced as a prefixed public-storage URL
    assert row["screenshot"].startswith(f"{base}/v1/public/storage/file/"
                                        "screenshot-pgr-")
    assert row["screenshot"].endswith(".jpeg")
    # the blob it points at exists in the store
    key = row["screenshot"].rsplit("/", 1)[-1]
    assert (tmp_path / "blobs" / key).exists()

    # page 2 via the next link's skip; final page has no next
    r1 = results_response(str(tmp_path), "pgr", skip="100", base=base)
    assert len(r1["data"]) == 20 and r1["next"] is None
    ids = [d["doc_id"] for d in r0["data"] + r1["data"]]
    assert ids == res.documents.column("doc_id").to_pylist()

    # skip beyond total: empty page, no next, total intact
    far = results_response(str(tmp_path), "pgr", skip=500, base=base)
    assert far["data"] == [] and far["next"] is None and far["total"] == 120

    # Number()-coercion table (CrawlController.ts:231-232)
    assert coerce_skip(None) == 0
    assert coerce_skip("") == 0
    assert coerce_skip("abc") == 0
    assert coerce_skip(-5) == 0
    assert coerce_skip("-5") == 0
    assert coerce_skip(["50", "60"]) == 50
    assert coerce_skip([]) == 0
    assert coerce_skip("100") == 100
    assert results_response(str(tmp_path), "pgr", skip="abc",
                            base=base)["data"] == r0["data"]


def test_cli_results_paging(tmp_path):
    """`python -m anycrawl_ray results` pages a >100-doc crawl end-to-end:
    page 1 in one subprocess, then follow the printed next link's skip in a
    second; the union is every document exactly once."""
    import json
    import os
    import re
    import subprocess
    import sys

    pages = build_site_table(DOCS)
    job = CrawlJob(job_id="clipage", seed_urls=[page_url(0)],
                   strategy="all", limit=130)
    res = run_crawl(job, pages, use_ray=False, out_dir=str(tmp_path))

    def cli_page(skip: str) -> dict:
        r = subprocess.run(
            [sys.executable, "-m", "anycrawl_ray", "results",
             "--out", str(tmp_path), "--job-id", "clipage", "--skip", skip],
            capture_output=True, text=True, cwd="/root/repo",
            env=dict(os.environ), timeout=120)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    p1 = cli_page("0")
    assert p1["total"] == 130 and len(p1["data"]) == 100
    m = re.search(r"skip=(\d+)$", p1["next"])
    p2 = cli_page(m.group(1))
    assert len(p2["data"]) == 30 and p2["next"] is None
    ids = [d["doc_id"] for d in p1["data"] + p2["data"]]
    assert ids == res.documents.column("doc_id").to_pylist()
    assert all("spans" not in d for d in p1["data"])  # --full not passed


# ------------------------- TPC-H shape queries: edge-case equivalence

def _tpch_dir(tmp_path, customer=None, orders=None, lineitem=None,
              supplier=None, nation=None):
    """Write tiny synthetic TPC-H tables to a tmp sf_dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    if customer is not None:
        pq.write_table(pa.table(customer), d / "customer.parquet")
    if orders is not None:
        pq.write_table(pa.table(orders), d / "orders.parquet")
    if lineitem is not None:
        pq.write_table(pa.table(lineitem), d / "lineitem.parquet")
    if supplier is not None:
        pq.write_table(pa.table(supplier), d / "supplier.parquet")
    if nation is not None:
        pq.write_table(pa.table(nation), d / "nation.parquet")
    return str(d)


def _oracle_df(sf_dir, sql, tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def test_q13_zero_order_customers(ray_session, tmp_path):
    """Customers with NO orders must appear in the c_count=0 bucket —
    the left-join edge the sf data never exercises (every sf customer
    has orders)."""
    import pandas as pd
    import pyarrow as pa

    from anycrawl_ray.pipelines.queries import _Q13_SQL, \
        q13_customer_distribution

    ts = pd.Timestamp("1996-06-01")
    sf = _tpch_dir(
        tmp_path,
        customer={"c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                  "c_nationkey": pa.array([0] * 6, pa.int32()),
                  "c_acctbal": pa.array([10.0] * 6)},
        orders={"o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_custkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 5),
                "o_totalprice": pa.array([1.0] * 5),
                "o_orderdate": pa.array([ts] * 5),
                "o_orderpriority": pa.array(["5-LOW"] * 5)},
    )
    got = q13_customer_distribution(sf).to_pandas()
    want = _oracle_df(sf, _Q13_SQL, ["customer", "orders"])
    assert got.values.tolist() == want.values.tolist()
    assert (got[got["c_count"] == 0]["custdist"] == 3).all()


def test_join_query_guard_crossing(ray_session):
    """The TPC-H join rows' driver-fold plan (default) and distributed
    hash-join plan (driver_limit=0) must return identical rows."""
    from anycrawl_ray.pipelines.queries import (q3_shipping_priority,
                                                q4_order_priority,
                                                q5_local_supplier,
                                                q7_volume_shipping,
                                                q8_market_share,
                                                q10_returned_items,
                                                q18_large_orders,
                                                q22_sales_opportunity)

    sf = "/root/testdata/sf0.001"
    for fn in (q3_shipping_priority, q4_order_priority, q5_local_supplier,
               q7_volume_shipping, q8_market_share, q10_returned_items,
               q18_large_orders, q22_sales_opportunity):
        fold = fn(sf).to_pandas()
        join = fn(sf, driver_limit=0).to_pandas()
        assert fold.values.tolist() == join.values.tolist(), fn.__name__
        assert list(fold.columns) == list(join.columns), fn.__name__


def test_q15_revenue_tie_returns_all_max_suppliers(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa

    from anycrawl_ray.pipelines.queries import _Q15_SQL, q15_top_supplier

    inside = pd.Timestamp("1996-02-01")
    outside = pd.Timestamp("1997-02-01")
    sf = _tpch_dir(
        tmp_path,
        lineitem={"l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                  "l_partkey": pa.array([1] * 4, pa.int64()),
                  "l_suppkey": pa.array([7, 8, 8, 9], pa.int64()),
                  "l_linenumber": pa.array([1] * 4, pa.int32()),
                  "l_quantity": pa.array([1.0] * 4),
                  "l_extendedprice": pa.array([100.0, 50.0, 50.0, 999.0]),
                  "l_discount": pa.array([0.0] * 4),
                  "l_tax": pa.array([0.0] * 4),
                  "l_returnflag": pa.array(["N"] * 4),
                  "l_linestatus": pa.array(["O"] * 4),
                  # supplier 9's big row ships OUTSIDE the window
                  "l_shipdate": pa.array([inside, inside, inside,
                                          outside])},
        supplier={"s_suppkey": pa.array([7, 8, 9], pa.int64()),
                  "s_name": pa.array(["a", "b", "c"]),
                  "s_nationkey": pa.array([0, 0, 0], pa.int32()),
                  "s_acctbal": pa.array([0.0, 0.0, 0.0])},
    )
    got = q15_top_supplier(sf).to_pandas()
    want = _oracle_df(sf, _Q15_SQL, ["lineitem", "supplier"])
    assert got.values.tolist() == want.values.tolist()
    assert sorted(got["s_suppkey"]) == [7, 8]  # tie at 100.0 revenue


def test_q4_exists_semantics(ray_session, tmp_path):
    """Orders with no lineitems and orders whose lineitems all shipped
    on/before the order date must NOT count; multiple qualifying
    lineitems count once."""
    import pandas as pd
    import pyarrow as pa

    from anycrawl_ray.pipelines.queries import _Q4_SQL, q4_order_priority

    od = pd.Timestamp("1996-06-01")
    sf = _tpch_dir(
        tmp_path,
        orders={"o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                "o_custkey": pa.array([1] * 4, pa.int64()),
                "o_orderstatus": pa.array(["O"] * 4),
                "o_totalprice": pa.array([1.0] * 4),
                "o_orderdate": pa.array([od] * 4),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"])},
        # order 1: two late lineitems (counts once); order 2: shipped
        # same-day (no); order 3: none (no); order 4: one late (yes)
        lineitem={"l_orderkey": pa.array([1, 1, 2, 4], pa.int64()),
                  "l_partkey": pa.array([1] * 4, pa.int64()),
                  "l_suppkey": pa.array([1] * 4, pa.int64()),
                  "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
                  "l_quantity": pa.array([1.0] * 4),
                  "l_extendedprice": pa.array([1.0] * 4),
                  "l_discount": pa.array([0.0] * 4),
                  "l_tax": pa.array([0.0] * 4),
                  "l_returnflag": pa.array(["N"] * 4),
                  "l_linestatus": pa.array(["O"] * 4),
                  "l_shipdate": pa.array([
                      od + pd.Timedelta(days=3),
                      od + pd.Timedelta(days=9),
                      od,
                      od + pd.Timedelta(days=1)])},
    )
    got = q4_order_priority(sf).to_pandas()
    want = _oracle_df(sf, _Q4_SQL, ["orders", "lineitem"])
    assert got.values.tolist() == want.values.tolist()
    assert got.set_index("o_orderpriority")["order_count"].to_dict() == {
        "1-URGENT": 1, "2-HIGH": 1}


def test_q22_anti_join_and_avg_cross_multiply(ray_session, tmp_path):
    """Negative balances stay out of the average; the urgent anti-join
    drops candidates; the avg comparison is exact (cross-multiply)."""
    import pandas as pd
    import pyarrow as pa

    from anycrawl_ray.pipelines.queries import _Q22_SQL, \
        q22_sales_opportunity

    ts = pd.Timestamp("1996-06-01")
    sf = _tpch_dir(
        tmp_path,
        # positive avg = (300+100+200)/3 = 200.00
        customer={"c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "c_nationkey": pa.array([0, 0, 1, 1, 1], pa.int32()),
                  "c_acctbal": pa.array([300.0, 100.0, 200.0, -50.0,
                                         250.0])},
        # cust 1 (above avg) has an urgent order -> dropped;
        # cust 5 (above avg) has only a LOW order -> kept
        orders={"o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([1, 5], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 2),
                "o_totalprice": pa.array([1.0] * 2),
                "o_orderdate": pa.array([ts] * 2),
                "o_orderpriority": pa.array(["1-URGENT", "5-LOW"])},
    )
    got = q22_sales_opportunity(sf).to_pandas()
    want = _oracle_df(sf, _Q22_SQL, ["customer", "orders"])
    assert got.values.tolist() == want.values.tolist()
    assert got["numcust"].tolist() == [1] and \
        got["totacctbal_cents"].tolist() == [25000]


def test_q7_excludes_same_nation_and_sums_per_year(ray_session, tmp_path):
    """An order where both supplier and customer sit in nation 3 must
    not count; cross-nation revenue lands in the right (direction,
    year) bucket."""
    import pandas as pd
    import pyarrow as pa

    from anycrawl_ray.pipelines.queries import _Q7_SQL, q7_volume_shipping

    d96 = pd.Timestamp("1996-07-01")
    d97 = pd.Timestamp("1997-07-01")
    sf = _tpch_dir(
        tmp_path,
        lineitem={"l_orderkey": pa.array([1, 2, 3], pa.int64()),
                  "l_partkey": pa.array([1] * 3, pa.int64()),
                  # supp 7 in nation 3; supp 8 in nation 8
                  "l_suppkey": pa.array([7, 7, 8], pa.int64()),
                  "l_linenumber": pa.array([1] * 3, pa.int32()),
                  "l_quantity": pa.array([1.0] * 3),
                  "l_extendedprice": pa.array([100.0, 200.0, 400.0]),
                  "l_discount": pa.array([0.0] * 3),
                  "l_tax": pa.array([0.0] * 3),
                  "l_returnflag": pa.array(["N"] * 3),
                  "l_linestatus": pa.array(["O"] * 3),
                  "l_shipdate": pa.array([d96, d96, d97])},
        # order 1: cust in nation 8 (counts, 3->8); order 2: cust in
        # nation 3 (same as supplier -> excluded); order 3: cust in 3
        # (counts, 8->3, year 1997)
        orders={"o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([21, 22, 22], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array([d96] * 3),
                "o_orderpriority": pa.array(["5-LOW"] * 3)},
        customer={"c_custkey": pa.array([21, 22], pa.int64()),
                  "c_nationkey": pa.array([8, 3], pa.int32()),
                  "c_acctbal": pa.array([0.0, 0.0])},
        supplier={"s_suppkey": pa.array([7, 8], pa.int64()),
                  "s_name": pa.array(["a", "b"]),
                  "s_nationkey": pa.array([3, 8], pa.int32()),
                  "s_acctbal": pa.array([0.0, 0.0])},
        nation={"n_nationkey": pa.array([3, 8], pa.int32()),
                "n_name": pa.array(["NATION_3", "NATION_8"])},
    )
    got = q7_volume_shipping(sf).to_pandas()
    want = _oracle_df(sf, _Q7_SQL,
                      ["lineitem", "orders", "customer", "supplier",
                       "nation"])
    assert got.values.tolist() == want.values.tolist()
    assert got["revenue"].tolist() == [1000000, 4000000]  # 1e-4 units


def test_q10_tie_at_rank_boundary(ray_session, tmp_path):
    """Customers tied on revenue at the top-20 boundary resolve by
    custkey on both sides."""
    import pandas as pd
    import pyarrow as pa

    from anycrawl_ray.pipelines.queries import _Q10_SQL, q10_returned_items

    od = pd.Timestamp("1996-02-01")
    n_cust = 25
    custkeys = list(range(1, n_cust + 1))
    sf = _tpch_dir(
        tmp_path,
        customer={"c_custkey": pa.array(custkeys, pa.int64()),
                  "c_name": pa.array([f"Customer{k}" for k in custkeys]),
                  "c_nationkey": pa.array([0] * n_cust, pa.int32()),
                  "c_acctbal": pa.array([float(k) for k in custkeys])},
        orders={"o_orderkey": pa.array(custkeys, pa.int64()),
                "o_custkey": pa.array(custkeys, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n_cust),
                "o_totalprice": pa.array([1.0] * n_cust),
                "o_orderdate": pa.array([od] * n_cust),
                "o_orderpriority": pa.array(["5-LOW"] * n_cust)},
        # every customer returns exactly 10.00 -> all tied
        lineitem={"l_orderkey": pa.array(custkeys, pa.int64()),
                  "l_partkey": pa.array([1] * n_cust, pa.int64()),
                  "l_suppkey": pa.array([1] * n_cust, pa.int64()),
                  "l_linenumber": pa.array([1] * n_cust, pa.int32()),
                  "l_quantity": pa.array([1.0] * n_cust),
                  "l_extendedprice": pa.array([10.0] * n_cust),
                  "l_discount": pa.array([0.0] * n_cust),
                  "l_tax": pa.array([0.0] * n_cust),
                  "l_returnflag": pa.array(["R"] * n_cust),
                  "l_linestatus": pa.array(["O"] * n_cust),
                  "l_shipdate": pa.array([od] * n_cust)},
    )
    got = q10_returned_items(sf).to_pandas()
    want = _oracle_df(sf, _Q10_SQL, ["customer", "orders", "lineitem"])
    assert got.values.tolist() == want.values.tolist()
    assert got["c_custkey"].tolist() == custkeys[:20]  # lowest keys win


def test_q21_tie_at_max_excludes_order(ray_session, tmp_path):
    """An order where TWO suppliers share the max shipdate blames
    nobody; single-supplier orders never count; the unique last shipper
    of a multi-supplier order counts once."""
    import pandas as pd
    import pyarrow as pa

    from anycrawl_ray.pipelines.queries import _Q21_SQL, \
        q21_waiting_suppliers

    d = pd.Timestamp("1996-06-01")
    d2 = d + pd.Timedelta(days=5)
    sf = _tpch_dir(
        tmp_path,
        # order 1: supp 7 ships last alone (counts for 7)
        # order 2: supp 7 and 8 tie at max (excluded)
        # order 3: single supplier (excluded)
        lineitem={"l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
                  "l_partkey": pa.array([1] * 5, pa.int64()),
                  "l_suppkey": pa.array([7, 8, 7, 8, 9], pa.int64()),
                  "l_linenumber": pa.array([1, 2, 1, 2, 1], pa.int32()),
                  "l_quantity": pa.array([1.0] * 5),
                  "l_extendedprice": pa.array([1.0] * 5),
                  "l_discount": pa.array([0.0] * 5),
                  "l_tax": pa.array([0.0] * 5),
                  "l_returnflag": pa.array(["N"] * 5),
                  "l_linestatus": pa.array(["O"] * 5),
                  "l_shipdate": pa.array([d2, d, d2, d2, d])},
    )
    got = q21_waiting_suppliers(sf).to_pandas()
    want = _oracle_df(sf, _Q21_SQL, ["lineitem"])
    assert got.values.tolist() == want.values.tolist()
    assert got.values.tolist() == [[7, 1]]
