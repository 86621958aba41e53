"""Extension-surface tests: URL templates, proxy rules, chunker+merge,
robots cache, credits."""

from __future__ import annotations

from anycrawl_ray.functions.credits import count_tokens_approx, per_page_cost
from anycrawl_ray.functions.proxy import ProxyConfig, ProxyRotator, ProxyRule
from anycrawl_ray.functions.templates import render_text_template, render_url_template
from anycrawl_ray.stages.llm_extract import (
    StubExtractor,
    merge_results,
    split_text_into_chunks,
)
from anycrawl_ray.state.robots import RobotsCache


# ------------------------------------------------------------- templates
def test_url_template_filters():
    v = {"q": "a b/c", "site": {"host": "Ex!ample.COM"}, "n": 7}
    assert render_url_template("http://x/{{q|query}}", v) == "http://x/a%20b%2Fc"
    assert render_url_template("http://x/{{q|path}}", v) == "http://x/a%20b/c"
    assert render_url_template("http://{{site.host|host}}/", v) == "http://example.com/"
    assert render_url_template("{{n}}", v) == "7"
    # missing variable stays verbatim; escaped braces restored
    assert render_url_template("{{missing}} \\{{x}}", v) == "{{missing}} {{x}}"
    # text templates force raw
    assert render_text_template("{{q|query}}", v) == "a b/c"


# ----------------------------------------------------------------- proxy
def test_proxy_rule_priority():
    cfg = ProxyConfig(rules=[
        ProxyRule(proxy="p-domain", domain="*.example.com"),
        ProxyRule(proxy="p-pattern", pattern="https://*.example.com/admin/*"),
        ProxyRule(proxy="p-exact", url="https://www.example.com/admin/x"),
    ])
    assert cfg.find_proxy_for_url("https://www.example.com/admin/x") == "p-exact"
    assert cfg.find_proxy_for_url("https://www.example.com/admin/y") == "p-pattern"
    assert cfg.find_proxy_for_url("https://www.example.com/other") == "p-domain"
    assert cfg.find_proxy_for_url("https://nope.test/") is None


def test_proxy_tiers_and_rotation():
    cfg = ProxyConfig(base_url="http://base", stealth_url="http://stealth")
    assert cfg.resolve_tiers("auto") == ["http://base", "http://stealth"]
    assert cfg.resolve_tiers("base") == ["http://base"]
    assert cfg.resolve_tiers("stealth") == ["http://stealth", "http://base"]
    assert cfg.resolve_tiers("http://custom") == ["http://custom"]
    rot = ProxyRotator(["a", "b"])
    assert [rot.next() for _ in range(4)] == ["a", "b", "a", "b"]
    assert ProxyRotator([]).next() is None


# --------------------------------------------------------------- chunker
def test_chunker_packs_lines_with_overlap():
    text = "\n".join(f"line {i} " + "w" * 20 for i in range(20))
    chunks = split_text_into_chunks(text, max_tokens=30, overlap_tokens=8)
    assert len(chunks) > 1
    # every chunk within budget-ish; consecutive chunks overlap by content
    for a, b in zip(chunks, chunks[1:]):
        assert a["end_index"] >= b["start_index"] - 1
    joined = "\n".join(c["chunk"] for c in chunks)
    for i in range(20):
        assert f"line {i} " in joined
    # single small text -> one chunk
    assert len(split_text_into_chunks("short", 100, 10)) == 1


def test_merge_results_semantics():
    # LLMExtract.ts:211-257: first-non-null, array concat+dedup, object
    # shallow merge, prefer non-empty primitives
    merged = merge_results([
        {"a": 1, "arr": [1, 2], "obj": {"x": 1}, "s": ""},
        {"a": 2, "arr": [2, 3], "obj": {"y": 2}, "s": "val", "extra": None},
    ])
    assert merged == {"a": 1, "arr": [1, 2, 3], "obj": {"x": 1, "y": 2},
                      "s": "val"}
    assert merge_results([]) is None
    assert merge_results([None, {"k": 1}]) == {"k": 1}


def test_stub_extractor_deterministic():
    ex = StubExtractor(max_input_tokens=64, overlap_tokens=8)
    text = "alpha beta alpha gamma " * 30
    r1, r2 = ex.extract_document(text), ex.extract_document(text)
    assert r1 == r2
    assert "alpha" in r1["top_words"]


# ---------------------------------------------------------------- robots
class _FakeLookup:
    def __init__(self, robots_by_host):
        self.robots = robots_by_host

    def get(self, url, default=(404, "", 0)):
        for host, body in self.robots.items():
            if url == f"http://{host}/robots.txt":
                return (200, body, len(body))
        return default


def test_robots_cache_rules():
    lookup = _FakeLookup({
        "a.test": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n",
        "b.test": "User-agent: anycrawl\nDisallow: /\n",
    })
    rc = RobotsCache(lookup)
    assert rc.allowed("http://a.test/public/x")
    assert not rc.allowed("http://a.test/private/x")
    assert not rc.allowed("http://b.test/anything")
    assert rc.allowed("http://nohost.test/x")  # no robots.txt -> allow
    assert rc.crawl_delay("a.test") == 2.0


def test_crawl_with_robots_gate():
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import site_table_from_rows

    rows = [
        {"url": "http://s.test/", "html": '<a href="/ok">a</a><a href="/private/no">b</a>',
         "links": []},
        {"url": "http://s.test/ok", "html": "fine", "links": []},
        {"url": "http://s.test/private/no", "html": "secret", "links": []},
        {"url": "http://s.test/robots.txt", "html": "User-agent: *\nDisallow: /private/\n",
         "links": []},
    ]
    pages = site_table_from_rows(rows)
    job = CrawlJob(job_id="r", seed_urls=["http://s.test/"], strategy="all",
                   limit=10, obey_robots=True)
    res = run_crawl(job, pages, use_ray=False)
    urls = res.order.column("url").to_pylist()
    assert "http://s.test/ok" in urls
    assert "http://s.test/private/no" not in urls
    # without robots the private page is crawled
    job2 = CrawlJob(job_id="r2", seed_urls=["http://s.test/"], strategy="all",
                    limit=10, obey_robots=False)
    res2 = run_crawl(job2, pages, use_ray=False)
    assert "http://s.test/private/no" in res2.order.column("url").to_pylist()


# --------------------------------------------------------------- credits
def test_credits_costs():
    # credits.ts:96-139
    assert per_page_cost() == 1
    assert per_page_cost(proxy_mode="stealth") == 3
    assert per_page_cost(formats=["json"], json_options=True) == 6
    assert per_page_cost(formats=["json"], json_options=True,
                         extract_source="html") == 11
    assert count_tokens_approx("x" * 10) == 3


# ----------------------------------------------- json_options / schema
# conformance vs packages/ai/src/agents/LLMExtract.ts:9-70,177-206 and the
# behaviors pinned by packages/ai/src/__tests__/llmExtract.test.ts
def test_remove_default_property_recursive():
    from anycrawl_ray.functions.json_schema import remove_default_property

    schema = {"type": "object", "default": {"x": 1},
              "properties": {"a": {"type": "string", "default": "n/a"},
                             "b": {"type": "array",
                                   "items": {"type": "number", "default": 0}}}}
    out = remove_default_property(schema)
    assert "default" not in out
    assert "default" not in out["properties"]["a"]
    assert "default" not in out["properties"]["b"]["items"]
    # lists are mapped, not dropped
    assert remove_default_property([{"default": 1, "k": 2}]) == [{"k": 2}]


def test_normalize_schema_wraps_top_level_array():
    from anycrawl_ray.functions.json_schema import normalize_schema

    arr = {"type": "array", "items": {"type": "string"}}
    out = normalize_schema(arr)
    assert out["type"] == "object"
    assert out["required"] == ["items"]
    assert out["additionalProperties"] is False
    assert out["properties"]["items"]["type"] == "array"


def test_normalize_schema_promotes_property_bag():
    from anycrawl_ray.functions.json_schema import normalize_schema

    bag = {"company": {"type": "string"},
           "tags": {"type": "array", "items": {"type": "string"}}}
    out = normalize_schema(bag)
    assert out["type"] == "object"
    assert sorted(out["required"]) == ["company", "tags"]
    assert out["additionalProperties"] is False
    assert out["properties"]["company"] == {"type": "string"}


def test_normalize_schema_enforces_additional_false_recursively():
    from anycrawl_ray.functions.json_schema import normalize_schema

    schema = {"type": "object",
              "properties": {
                  "nested": {"type": "object",
                             "properties": {"x": {"type": "string"}}},
                  "listed": {"type": "array",
                             "items": {"type": "object",
                                       "properties": {"y": {"type": "number"}}}},
                  "open": {"type": "object", "additionalProperties": True},
              }}
    out = normalize_schema(schema)
    assert out["additionalProperties"] is False
    assert out["properties"]["nested"]["additionalProperties"] is False
    assert out["properties"]["listed"]["items"]["additionalProperties"] is False
    # explicit True is preserved (only undefined is forced to False)
    assert out["properties"]["open"]["additionalProperties"] is True


def test_create_field_prompt_format():
    from anycrawl_ray.functions.json_schema import create_field_prompt

    schema = {"type": "object", "properties": {
        "name": {"type": "string", "description": "Company name"},
        "count": {"type": "number"},
        "tags": {"type": "array", "items": {"type": "string"},
                 "description": "Tag list"},
        "people": {"type": "array",
                   "items": {"type": "object",
                             "properties": {"n": {"type": "string",
                                                  "description": "who"}}}},
        "meta": {"type": "object",
                 "properties": {"k": {"type": "boolean"}}},
    }}
    out = create_field_prompt(schema)
    lines = out.split("\n")
    assert lines[0] == "- name (string): Company name"
    assert lines[1] == "- count (number): "
    assert lines[2] == "- tags (array of strings): Tag list"
    assert "- people (array of objects): " in lines[3]
    assert lines[4] == "    - n (string): who"
    assert "- meta (object): " in lines[5]
    assert lines[6] == "    - k (boolean): "
    # empty / type-less schemas render nothing
    assert create_field_prompt({}) == ""
    assert create_field_prompt({"type": "object"}) == ""


def test_validate_against_schema():
    from anycrawl_ray.functions.json_schema import (
        normalize_schema,
        validate_against_schema,
    )

    schema = normalize_schema({
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "n": {"type": "integer"},
                       "tags": {"type": "array", "items": {"type": "string"}}},
        "required": ["name"]})
    assert validate_against_schema({"name": "x", "n": 2, "tags": ["a"]},
                                   schema) == []
    assert any("required" in e for e in
               validate_against_schema({"n": 2}, schema))
    assert any("expected integer" in e for e in
               validate_against_schema({"name": "x", "n": "two"}, schema))
    assert any("additional property" in e for e in
               validate_against_schema({"name": "x", "zzz": 1}, schema))
    assert any("[1]" in e for e in
               validate_against_schema({"name": "x", "tags": ["a", 3]},
                                       schema))
    # booleans are not integers/numbers (JS typeof semantics port)
    assert validate_against_schema(True, {"type": "integer"}) != []


def test_schema_stub_extractor_end_to_end():
    import json as _json

    from anycrawl_ray.stages.llm_extract import SchemaStubExtractor

    opts = {"prompt": "extract", "schema": {
        "type": "object",
        "properties": {"summary": {"type": "string", "default": "n/a"},
                       "n_words": {"type": "integer"},
                       "keywords": {"type": "array",
                                    "items": {"type": "string"}},
                       "meta": {"type": "object",
                                "properties": {"ok": {"type": "boolean"}}}},
        "required": ["summary"]}}
    ex = SchemaStubExtractor(opts, max_input_tokens=64, overlap_tokens=8)
    long_text = "\n".join(f"line {i} with some words here" for i in range(100))
    merged, n_chunks, valid = ex.extract_document(long_text)
    assert n_chunks > 1
    assert valid, "merged chunk output must conform to the normalized schema"
    assert isinstance(merged["summary"], str)
    assert isinstance(merged["n_words"], int)
    assert isinstance(merged["keywords"], list)
    assert isinstance(merged["meta"], dict)
    # determinism
    merged2, n2, _ = ex.extract_document(long_text)
    assert _json.dumps(merged, sort_keys=True) == _json.dumps(merged2, sort_keys=True)


# ------------------------------------------------- browser-engine seam
def test_browser_sim_registered_and_validates():
    import pytest

    from anycrawl_ray.registry import available_engines, get_engine

    assert "browser-sim" in available_engines()
    with pytest.raises(ValueError):
        get_engine("no-such-engine")


def test_browser_sim_wait_and_adblock_semantics():
    import pyarrow as pa

    from anycrawl_ray.stages.browser import (
        BrowserSimFetcher,
        fake_screenshot_bytes,
        normalize_wait_for_selector,
    )

    # wait_for_selector normalization (Base.ts:753-766)
    assert normalize_wait_for_selector("h1") == [
        {"selector": "h1", "timeout": None, "state": "visible"}]
    assert normalize_wait_for_selector(
        [{"selector": ".x", "timeout": 100, "state": "hidden"},
         {"no_selector": True}, "p"]) == [
        {"selector": ".x", "timeout": 100, "state": "hidden"},
        {"selector": "p", "timeout": None, "state": "visible"}]
    assert normalize_wait_for_selector(None) == []

    pages = pa.table({
        "url": ["http://b.test/a", "http://b.test/missing-h1"],
        "status_code": pa.array([200, 200], pa.int32()),
        "html": [
            "<html><body><h1>hi</h1>"
            "<img src='http://doubleclick.net/ad.png'>"
            "<script src='https://x.google-analytics.com/ga.js'></script>"
            "<img src='http://b.test/ok.png'></body></html>",
            "<html><body><p>no header</p></body></html>",
        ],
        "content_bytes": pa.array([100, 50], pa.int64()),
    })
    wave = pa.table({"url": ["http://b.test/a", "http://b.test/missing-h1",
                             "http://b.test/404"]})
    f = BrowserSimFetcher(pages, options={
        "wait_for": 250, "wait_until": "networkidle",
        "wait_for_selector": ["h1", {"selector": ".gone", "timeout": 1000,
                                     "state": "hidden"}],
        "formats": ["markdown", "screenshot"]})
    out = f(wave)
    # ad domains blocked (2 of 3 sub-resources on page a)
    assert out.column("ads_blocked").to_pylist() == [2, 0, 0]
    # selector semantics: h1 visible on page a (+.gone hidden) = 2 hits;
    # page b misses h1 (timeout elapses: 250 base + 30000 default)
    assert out.column("selector_hits").to_pylist() == [2, 1, 0]
    assert out.column("sim_wait_ms").to_pylist()[0] == 250
    assert out.column("sim_wait_ms").to_pylist()[1] == 250 + 30_000
    # screenshots: deterministic JPEG-framed payload for fetched pages only
    shots = out.column("screenshot").to_pylist()
    assert shots[0] == fake_screenshot_bytes("http://b.test/a")
    assert shots[0][:4] == b"\xff\xd8\xff\xe0" and shots[0][-2:] == b"\xff\xd9"
    assert shots[2] == b""
    assert out.column("viewport").to_pylist()[0] == "1920x1080"
    assert out.column("status_code").to_pylist() == [200, 200, 404]

    # invalid wait_until rejected (EngineConfigurator nav modes)
    import pytest

    with pytest.raises(ValueError):
        BrowserSimFetcher(pages, options={"wait_until": "whenever"})


def test_browser_sim_crawl_matches_cheerio_reachability(ray_session, tmp_path):
    """Swapping the engine must not change WHAT is crawled — only the
    browser columns; screenshot spans appear with the md5-8 key."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url
    from anycrawl_ray.stages.browser import _md5_8

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    base = run_crawl(CrawlJob(job_id="ch", seed_urls=[page_url(0)],
                              strategy="all", max_depth=20, limit=200),
                     pages, use_ray=False)
    bjob = CrawlJob(job_id="bw", seed_urls=[page_url(0)], strategy="all",
                    max_depth=20, limit=200, engine="browser-sim",
                    formats=["markdown", "screenshot"],
                    wait_for_selector="h1")
    bres = run_crawl(bjob, pages, use_ray=False)
    assert (bres.order.column("canonical_url").to_pylist()
            == base.order.column("canonical_url").to_pylist())
    docs = bres.documents.to_pandas()
    row = docs.iloc[0]
    shot_refs = [s["media_ref"] for s in row["spans"]
                 if s["kind"] == "screenshot"]
    assert shot_refs == [f"screenshot://{_md5_8(row['url'])}"]
    # distributed path produces identical documents
    bray = run_crawl(bjob, pages, use_ray=True, ray_wave_threshold=8)
    assert bray.documents.equals(bres.documents)


# --------------------------------------------------------------- webhooks
class _FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def _collecting_transport(fail_times=0, status=200):
    calls = []
    state = {"n": 0}

    def transport(method, url, headers, body, timeout_s):
        state["n"] += 1
        calls.append({"method": method, "url": url, "headers": dict(headers),
                      "body": body, "timeout": timeout_s})
        if state["n"] <= fail_times:
            raise ConnectionError("boom")
        return status, {}, {"ok": True}

    return transport, calls


def test_webhook_delivery_signs_and_delivers():
    from anycrawl_ray.state.webhooks import (
        WebhookManager,
        WebhookSubscription,
        sign_payload,
    )

    transport, calls = _collecting_transport()
    clock = _FakeClock()
    mgr = WebhookManager(transport, clock=clock)
    sub = WebhookSubscription(webhook_url="https://hooks.example.com/x",
                              secret="s3cret", event_types=("crawl.completed",),
                              custom_headers={"X-Custom": "v"})
    mgr.subscribe(sub)
    ids = mgr.trigger_event("crawl.completed", {"job": "j1"}, "crawl", "j1")
    assert len(ids) == 1
    mgr.process_queue()
    d = mgr.deliveries[ids[0]]
    assert d.status == "delivered"
    assert calls[0]["headers"]["X-AnyCrawl-Signature"] == sign_payload(
        {"job": "j1"}, "s3cret")
    assert calls[0]["headers"]["X-Webhook-Event"] == "crawl.completed"
    assert calls[0]["headers"]["X-Custom"] == "v"
    assert sub.successful_deliveries == 1 and sub.consecutive_failures == 0
    # non-matching event or user delivers nothing
    assert mgr.trigger_event("scrape.completed", {}, "scrape", "s1") == []
    sub2 = WebhookSubscription(webhook_url="https://hooks.example.com/y",
                               event_types=("crawl.completed",),
                               user_id="alice")
    mgr.subscribe(sub2)
    # Webhook.ts:106-108: when a user id is given, ONLY subscriptions with
    # that exact user id receive the event (unowned subs are skipped too)
    assert mgr.trigger_event("crawl.completed", {}, "crawl", "j2",
                             user_id="bob") == []
    assert len(mgr.trigger_event("crawl.completed", {}, "crawl", "j2",
                                 user_id="alice")) == 1


def test_webhook_retry_backoff_schedule_and_auto_disable():
    from anycrawl_ray.state.webhooks import WebhookManager, WebhookSubscription

    transport, calls = _collecting_transport(fail_times=10**9)  # always fails
    clock = _FakeClock()
    mgr = WebhookManager(transport, clock=clock)
    sub = WebhookSubscription(webhook_url="https://h.example.com/x",
                              event_types=("e",), max_retries=3,
                              auto_disable_after_failures=2)
    mgr.subscribe(sub)
    did = mgr.trigger_event("e", {"n": 1}, "job", "j")[0]
    mgr.process_queue()
    d = mgr.deliveries[did]
    # attempt 1 failed -> retrying, backoff = 2^1 min
    assert d.status == "retrying" and d.attempt_number == 2
    assert d.next_retry_at == clock.t + 120.0
    # not due yet
    clock.t += 60
    assert mgr.process_retries() == 0
    clock.t += 61
    assert mgr.process_retries() == 1
    assert d.status == "retrying" and d.attempt_number == 3
    assert d.next_retry_at == clock.t + 240.0  # 2^2 min
    clock.t += 241
    mgr.process_retries()
    # attempt 3 == max_attempts -> permanent failure, consecutive=1
    assert d.status == "failed"
    assert sub.consecutive_failures == 1 and sub.failed_deliveries == 1
    assert sub.is_active
    # second delivery fails through -> consecutive=2 -> auto-disable
    did2 = mgr.trigger_event("e", {"n": 2}, "job", "j")[0]
    mgr.process_queue()
    for _ in range(3):
        clock.t += 10_000
        mgr.process_retries()
    assert mgr.deliveries[did2].status == "failed"
    assert sub.consecutive_failures == 2
    assert not sub.is_active
    # disabled subscription receives nothing further
    assert mgr.trigger_event("e", {"n": 3}, "job", "j") == []


def test_webhook_private_ip_blocked():
    from anycrawl_ray.state.webhooks import (
        WebhookManager,
        WebhookSubscription,
        is_private_ip,
    )

    assert is_private_ip("http://localhost/cb")
    assert is_private_ip("http://10.1.2.3/cb")
    assert is_private_ip("http://172.20.0.1/cb")
    assert is_private_ip("http://192.168.1.1/cb")
    assert is_private_ip("http://169.254.0.1/cb")
    assert is_private_ip("http://[fe80::1]/cb")
    assert is_private_ip("http://[fd00::1]/cb")
    assert not is_private_ip("https://hooks.example.com/cb")
    assert not is_private_ip("http://172.32.0.1/cb")  # outside /12

    transport, calls = _collecting_transport()
    mgr = WebhookManager(transport, clock=_FakeClock())
    sub = WebhookSubscription(webhook_url="http://192.168.0.9/cb",
                              event_types=("e",))
    mgr.subscribe(sub)
    did = mgr.trigger_event("e", {}, "job", "j")[0]
    mgr.process_queue()
    assert mgr.deliveries[did].status == "failed"
    assert mgr.deliveries[did].error_code == "PRIVATE_IP_BLOCKED"
    assert calls == []  # transport never touched
    # allow_local overrides (ALLOW_LOCAL_WEBHOOKS)
    mgr2 = WebhookManager(transport, clock=_FakeClock(), allow_local=True)
    mgr2.subscribe(sub)
    did2 = mgr2.trigger_event("e", {}, "job", "j")[0]
    mgr2.process_queue()
    assert mgr2.deliveries[did2].status == "delivered"


def test_webhook_scope_filtering():
    from anycrawl_ray.state.webhooks import WebhookManager, WebhookSubscription

    transport, _ = _collecting_transport()
    mgr = WebhookManager(transport, clock=_FakeClock())
    sub = WebhookSubscription(webhook_url="https://h.example.com/x",
                              event_types=("e",), scope="specific",
                              specific_task_ids=("job-a",))
    mgr.subscribe(sub)
    assert len(mgr.trigger_event("e", {}, "job", "job-a")) == 1
    assert mgr.trigger_event("e", {}, "job", "job-b") == []


# --------------------------------------------------------------- scheduler
def _utc(*args):
    from datetime import datetime, timezone

    return datetime(*args, tzinfo=timezone.utc)


def test_cron_next_fire_times():
    from anycrawl_ray.state.scheduler import Cron

    c = Cron("*/15 * * * *")
    assert c.next_after(_utc(2026, 1, 1, 10, 0)) == _utc(2026, 1, 1, 10, 15)
    assert c.next_after(_utc(2026, 1, 1, 10, 50)) == _utc(2026, 1, 1, 11, 0)
    c = Cron("30 9 * * 1-5")  # weekdays 09:30
    assert c.next_after(_utc(2026, 1, 2, 10, 0)) == _utc(2026, 1, 5, 9, 30)  # Fri->Mon
    c = Cron("0 0 1 * *")  # first of month
    assert c.next_after(_utc(2026, 1, 15, 0, 0)) == _utc(2026, 2, 1, 0, 0)
    # dom OR dow when both restricted (Vixie semantics)
    c = Cron("0 0 13 * 5")  # the 13th OR any Friday
    assert c.next_after(_utc(2026, 1, 1, 0, 0)) == _utc(2026, 1, 2, 0, 0)  # Fri Jan 2
    assert c.next_after(_utc(2026, 1, 10, 0, 0)) == _utc(2026, 1, 13, 0, 0)
    import pytest

    with pytest.raises(ValueError):
        Cron("* * * *")  # 4 fields
    with pytest.raises(ValueError):
        Cron("99 * * * *")


def test_scheduler_fires_and_respects_gates():
    from anycrawl_ray.state.scheduler import ScheduledTask, SchedulerManager

    now = {"t": _utc(2026, 1, 1, 9, 59)}
    launched = []

    def trigger(task, execution):
        launched.append((task.name, execution.execution_number))
        return f"job-{len(launched)}"

    mgr = SchedulerManager(trigger, clock=lambda: now["t"])
    t = ScheduledTask(name="hourly", cron_expression="0 * * * *",
                      concurrency_mode="skip")
    mgr.add_task(t)
    assert mgr.tick() == []  # 09:59, not due
    now["t"] = _utc(2026, 1, 1, 10, 0)
    (e1,) = mgr.tick()
    assert launched == [("hourly", 1)]
    assert mgr.executions[e1].status == "running"
    assert mgr.executions[e1].idempotency_key.startswith(t.uuid)
    # concurrency skip: still running at 11:00 -> no new execution
    now["t"] = _utc(2026, 1, 1, 11, 0)
    assert mgr.tick() == []
    mgr.complete_execution(e1)
    # queue mode would have fired; next hour fires again
    now["t"] = _utc(2026, 1, 1, 12, 0)
    (e2,) = mgr.tick()
    assert mgr.executions[e2].execution_number == 2
    # a long outage fires ONCE, not once per missed hour
    now["t"] = _utc(2026, 1, 2, 3, 0)
    mgr.complete_execution(e2)
    assert len(mgr.tick()) == 1
    assert t.total_executions == 3


def test_scheduler_daily_cap_and_pause():
    from anycrawl_ray.state.scheduler import ScheduledTask, SchedulerManager

    now = {"t": _utc(2026, 1, 1, 0, 0)}
    mgr = SchedulerManager(lambda *_: "j", clock=lambda: now["t"])
    t = ScheduledTask(name="m", cron_expression="* * * * *",
                      concurrency_mode="queue", max_executions_per_day=3)
    mgr.add_task(t)
    fired = 0
    for minute in range(1, 10):
        now["t"] = _utc(2026, 1, 1, 0, minute)
        fired += len(mgr.tick())
    assert fired == 3  # daily cap
    # next day resets
    now["t"] = _utc(2026, 1, 2, 0, 1)
    assert len(mgr.tick()) == 1
    # paused tasks don't fire; resume re-arms
    mgr.pause_task(t.uuid, "manual")
    now["t"] = _utc(2026, 1, 2, 0, 5)
    assert mgr.tick() == []
    mgr.resume_task(t.uuid)
    now["t"] = _utc(2026, 1, 2, 0, 7)
    assert len(mgr.tick()) == 1


def test_scheduler_credit_auto_pause():
    from anycrawl_ray.state.scheduler import ScheduledTask, SchedulerManager

    now = {"t": _utc(2026, 1, 1, 0, 0)}
    mgr = SchedulerManager(lambda *_: "j", clock=lambda: now["t"],
                           check_credits=lambda task: False,
                           credits_enabled=True)
    t = ScheduledTask(name="c", cron_expression="* * * * *",
                      min_credits_required=5)
    mgr.add_task(t)
    now["t"] = _utc(2026, 1, 1, 0, 1)
    assert mgr.tick() == []
    assert t.is_paused
    assert "Insufficient credits" in t.pause_reason
    # unscheduled: further ticks are no-ops even after time passes
    now["t"] = _utc(2026, 1, 1, 0, 10)
    assert mgr.tick() == []


# --------------------------------------------------------------- blob store
def test_blobstore_roundtrip_and_safety(tmp_path):
    import pytest

    from anycrawl_ray.state.blobstore import (
        LocalDirStorage,
        NoOpStorage,
        get_storage,
        screenshot_key,
    )

    st = LocalDirStorage(str(tmp_path / "blobs"))
    st.upload("a/b.bin", b"\x01\x02")
    assert st.get("a/b.bin") == b"\x01\x02"
    assert st.exists("a/b.bin")
    assert st.get_temporary_url("a/b.bin").startswith("file://")
    with pytest.raises(ValueError):
        st.upload("../escape.bin", b"x")
    assert isinstance(get_storage(None), NoOpStorage)
    assert isinstance(get_storage("noop"), NoOpStorage)
    noop = NoOpStorage()
    noop.upload("k", b"x")
    assert not noop.exists("k")
    assert screenshot_key("j1", "abcd1234") == "screenshot-j1-abcd1234.jpeg"
    assert screenshot_key("j1", "abcd1234", full_page=True) == \
        "screenshot-fullPage-j1-abcd1234.jpeg"


def test_crawl_persists_screenshots_to_blob_store(ray_session, tmp_path):
    """S7 end-to-end: a browser-sim crawl with blob_dir writes one JPEG per
    page, keyed to match the screenshot:// span refs; payloads never cross
    the driver (written worker-side), identical for inline and ray paths."""
    import os

    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url
    from anycrawl_ray.stages.browser import _md5_8, fake_screenshot_bytes

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    blob_dir = str(tmp_path / "blobs")
    job = CrawlJob(job_id="bs", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=60, engine="browser-sim",
                   formats=["markdown", "screenshot"], blob_dir=blob_dir)
    res = run_crawl(job, pages, use_ray=False)
    names = set(os.listdir(blob_dir))
    docs = res.documents.to_pandas()
    assert len(names) == len(set(docs["url"]))
    for url in docs["url"]:
        key = f"screenshot-bs-{_md5_8(url)}.jpeg"
        assert key in names
        with open(os.path.join(blob_dir, key), "rb") as f:
            assert f.read() == fake_screenshot_bytes(url)
    # distributed path writes the same blob set
    blob_dir2 = str(tmp_path / "blobs2")
    job2 = CrawlJob(job_id="bs", seed_urls=[page_url(0)], strategy="all",
                    max_depth=20, limit=60, engine="browser-sim",
                    formats=["markdown", "screenshot"], blob_dir=blob_dir2)
    run_crawl(job2, pages, use_ray=True, ray_wave_threshold=8)
    assert set(os.listdir(blob_dir2)) == names


# --------------------------------------------------------- template system
def test_option_merge_semantics():
    from anycrawl_ray.functions.template_system import (
        deep_merge_options_with_template,
        merge_options_with_template,
    )

    tpl = {"a": 1, "b": {"x": 1, "y": 2}, "c": [1, 2]}
    req = {"a": None, "b": {"x": 9}, "c": [3], "d": 4}
    # shallow: request wins per top-level key unless None; dicts replace
    assert merge_options_with_template(tpl, req) == {
        "a": 1, "b": {"x": 9}, "c": [3], "d": 4}
    # deep: dict-dict recurses, arrays replace wholesale, None skipped
    assert deep_merge_options_with_template(req, tpl) == {
        "a": 1, "b": {"x": 9, "y": 2}, "c": [3], "d": 4}


def test_template_access_and_processing():
    from anycrawl_ray.functions.template_system import (
        has_template_access,
        process_template,
    )

    tpl = {"template_type": "scrape", "created_by": "u1",
           "status": "draft", "review_status": "pending",
           "req_options": {"formats": ["markdown"], "timeout": 5},
           "allowed_domains": ["example.com"], "engine": "cheerio"}
    assert has_template_access(tpl, None)          # self-hosted
    assert has_template_access(tpl, "u1")          # owner
    assert not has_template_access(tpl, "u2")      # draft + other user
    assert has_template_access({**tpl, "status": "published",
                                "review_status": "approved"}, "u2")

    res = process_template(tpl, "https://example.com/p", {"timeout": 9},
                           "scrape", "u1")
    assert res["success"]
    assert res["merged_options"] == {"formats": ["markdown"], "timeout": 9}
    assert res["engine_name"] == "cheerio"
    # type mismatch / domain / access / engine failures
    assert not process_template(tpl, "https://example.com/p", {}, "crawl",
                                "u1")["success"]
    assert "not allowed" in process_template(
        tpl, "https://other.com/p", {}, "scrape", "u1")["error"]
    assert "Access denied" in process_template(
        tpl, "https://example.com/p", {}, "scrape", "u2")["error"]
    assert "Invalid engine" in process_template(
        tpl, "https://example.com/p", {"engine": "warpdrive"}, "scrape",
        "u1")["error"]


def test_domain_validator_glob_candidates():
    from anycrawl_ray.functions.template_system import (
        parse_domain_restriction,
        validate_domain,
        validate_pattern,
    )

    # string / list / dict / comma-split forms (parsePatternInput)
    assert parse_domain_restriction("a.com") == {
        "type": "exact", "patterns": ["a.com"]}
    assert parse_domain_restriction(["a.com, b.com", "c.com"]) == {
        "type": "exact", "patterns": ["a.com", "b.com", "c.com"]}
    assert parse_domain_restriction({"type": "glob",
                                     "patterns": ["*.example.com"]}) == {
        "type": "glob", "patterns": ["*.example.com"]}
    assert parse_domain_restriction(None) is None
    assert parse_domain_restriction({"patterns": "notalist"}) is None

    glob = {"type": "glob", "patterns": ["*.example.com"]}
    assert validate_domain("https://api.example.com/v1?q=1", glob)[0]
    assert not validate_domain("https://example.org/", glob)[0]
    # path globs match with and without trailing slash
    pglob = {"type": "glob", "patterns": ["api.example.com/v1/*"]}
    assert validate_domain("https://api.example.com/v1/data", pglob)[0]
    # exact: full URL or bare hostname
    exact = {"type": "exact", "patterns": ["https://a.com/x", "b.com"]}
    assert validate_domain("https://a.com/x", exact)[0]
    assert validate_domain("https://b.com/anything", exact)[0]
    assert not validate_domain("https://c.com/", exact)[0]
    # unrestricted / invalid URL
    assert validate_domain("https://anything.io/", None)[0]
    assert not validate_domain("not a url", exact)[0]
    ok, err = validate_pattern("Hello", {"type": "exact",
                                         "patterns": ["hello"]})
    assert ok  # case-insensitive
    assert not validate_pattern("x", {"type": "exact",
                                      "patterns": ["y"]})[0]


def test_prenav_capture_rules():
    from anycrawl_ray.state.prenav import PreNavCapture

    cap = PreNavCapture([
        {"key": "tweets", "rules": [
            {"type": "glob", "pattern": "https://api.x.test/graphql/*"},
        ]},
        {"key": "profile", "rules": [
            {"type": "regex", "pattern": r"https://api\.x\.test/users/\d+"},
            {"type": "exact", "pattern": "https://api.x.test/me"},
        ]},
        {"key": "bad", "rules": [{"type": "regex", "pattern": "("}]},  # invalid
        {"key": "", "rules": [{"type": "exact", "pattern": "x"}]},  # dropped
    ])
    assert cap.enabled
    assert sorted(cap.pending_keys()) == ["bad", "profile", "tweets"]
    assert cap.offer_response("https://api.x.test/graphql/UserTweets",
                              {"n": 1}) == ["tweets"]
    # first capture wins; later matches for the same key are ignored
    assert cap.offer_response("https://api.x.test/graphql/More",
                              {"n": 2}) == []
    assert cap.get("tweets") == {"n": 1}
    # regex is fully anchored
    assert cap.offer_response("https://api.x.test/users/42/extra", {}) == []
    assert cap.offer_response("https://api.x.test/users/42",
                              {"id": 42}) == ["profile"]
    # invalid regex never matches, wait() returns None (no raise)
    assert cap.offer_response("anything", {}) == []
    assert cap.wait("bad", timeout_ms=5) is None
    assert cap.has("profile") and not cap.has("bad")
    assert not PreNavCapture([]).enabled


def test_job_from_template_end_to_end():
    import pytest

    from anycrawl_ray.pipelines.crawl import job_from_template

    tpl = {"template_type": "crawl", "created_by": "u1",
           "status": "published", "review_status": "approved",
           "req_options": {"max_depth": 3, "formats": ["markdown", "html"],
                           "limit": 25, "strategy": "same-domain",
                           "wait_for": 100},
           "allowed_domains": {"type": "glob", "patterns": ["*.site.test"]},
           "engine": "browser-sim"}
    job = job_from_template(
        "tj", "http://{{sub}}.site.test/start", tpl,
        request_options={"limit": 10}, variables={"sub": "a"})
    assert job.seed_urls == ["http://a.site.test/start"]
    assert job.engine == "browser-sim"
    assert job.limit == 10          # request wins
    assert job.max_depth == 3       # template fills
    assert job.formats == ["markdown", "html"]
    assert job.wait_for == 100
    with pytest.raises(ValueError, match="not allowed"):
        job_from_template("tj", "http://other.test/", tpl)
    with pytest.raises(ValueError, match="type mismatch"):
        job_from_template("tj", "http://a.site.test/",
                          {**tpl, "template_type": "scrape"})


# ------------------------------------------- review-fix regression tests
def test_cron_dow_seven_and_steps():
    """Review fix: '7' in dow ranges/steps must not be string-mangled."""
    from anycrawl_ray.state.scheduler import Cron

    every_day = Cron("0 0 * * 1-7")
    # 1-7 covers all days (7 folds to Sunday=0)
    for day in range(1, 8):
        assert every_day.matches(_utc(2026, 2, day, 0, 0)), day
    assert Cron("0 0 * * 7").matches(_utc(2026, 1, 4, 0, 0))  # Sunday
    assert Cron("0 0 * * 0").matches(_utc(2026, 1, 4, 0, 0))


def test_webhook_signs_exact_transmitted_bytes():
    """Review fix: the HMAC must cover the same serialized bytes the
    transport receives — incl. non-ASCII content."""
    import hashlib
    import hmac as _hmac

    from anycrawl_ray.state.webhooks import (
        WebhookManager,
        WebhookSubscription,
        serialize_payload,
    )

    seen = {}

    def transport(method, url, headers, body, timeout_s):
        seen["body"] = body
        seen["sig"] = headers["X-AnyCrawl-Signature"]
        return 200, {}, None

    mgr = WebhookManager(transport, clock=_FakeClock())
    sub = WebhookSubscription(webhook_url="https://h.example.com/x",
                              secret="s", event_types=("e",))
    mgr.subscribe(sub)
    payload = {"title": "café news", "n": 1}
    mgr.trigger_event("e", payload, "job", "j")
    mgr.process_queue()
    assert isinstance(seen["body"], str)
    assert seen["body"] == serialize_payload(payload)
    want = _hmac.new(b"s", seen["body"].encode(), hashlib.sha256).hexdigest()
    assert seen["sig"] == f"sha256={want}"


def test_private_ip_loopback_range_blocked():
    from anycrawl_ray.state.webhooks import is_private_ip

    assert is_private_ip("http://127.0.0.2/cb")  # whole /8, not just .1
    assert is_private_ip("http://0.0.0.0/cb")
    assert not is_private_ip("http://128.0.0.1/cb")


def test_browser_selector_timeout_zero_not_defaulted():
    import pyarrow as pa

    from anycrawl_ray.stages.browser import BrowserSimFetcher

    pages = pa.table({"url": ["http://b.test/a"],
                      "status_code": pa.array([200], pa.int32()),
                      "html": ["<html><body><p>x</p></body></html>"],
                      "content_bytes": pa.array([10], pa.int64())})
    f = BrowserSimFetcher(pages, options={
        "wait_for_selector": [{"selector": ".missing", "timeout": 0}]})
    out = f(pa.table({"url": ["http://b.test/a"]}))
    assert out.column("sim_wait_ms").to_pylist() == [0]


def test_cached_fetcher_no_stale_inline_table(ray_session):
    """Review fix: a recycled id() on a NEW inline page table must not
    serve the previous table's fetcher."""
    import pyarrow as pa

    from anycrawl_ray.stages.fetch import _FETCHER_CACHE, cached_fetcher

    def mk(html):
        return pa.table({"url": ["http://c.test/"],
                         "status_code": pa.array([200], pa.int32()),
                         "html": [html],
                         "content_bytes": pa.array([5], pa.int64())})

    _FETCHER_CACHE.clear()
    t1 = mk("<p>one</p>")
    f1 = cached_fetcher("cheerio", t1)
    # simulate id reuse: force the stale entry under t2's key
    t2 = mk("<p>two</p>")
    stale_key = ("cheerio", str(id(t2)), repr([]))
    _FETCHER_CACHE[stale_key] = (t1, f1)
    f2 = cached_fetcher("cheerio", t2)
    out = f2(pa.table({"url": ["http://c.test/"]}))
    assert out.column("html").to_pylist() == ["<p>two</p>"]
    # same-object hit still memoizes
    assert cached_fetcher("cheerio", t2) is f2


def test_normalize_schema_bag_wraps_nested_arrays_like_reference():
    """Pin the REFERENCE behavior (LLMExtract.ts:36-48): a type-less
    property bag normalizes each value through normalizeSchema itself, so
    an array value inside a bag IS wrapped in {items: ...} — only values
    under an explicitly typed object schema keep their raw array shape."""
    from anycrawl_ray.functions.json_schema import normalize_schema

    bag = {"tags": {"type": "array", "items": {"type": "string"}}}
    out = normalize_schema(bag)
    tags = out["properties"]["tags"]
    assert tags["type"] == "object" and tags["required"] == ["items"]
    # typed object schema: array property is NOT wrapped
    typed = normalize_schema({
        "type": "object",
        "properties": {"tags": {"type": "array",
                                "items": {"type": "string"}}}})
    assert typed["properties"]["tags"]["type"] == "array"


def test_crawl_triggers_webhooks_and_scheduler_launches_crawls():
    """Control-plane integration: a completed crawl fires crawl.completed
    through the dispatcher, and a scheduled task's trigger launches a real
    crawl job."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url
    from anycrawl_ray.state.scheduler import ScheduledTask, SchedulerManager
    from anycrawl_ray.state.webhooks import WebhookManager, WebhookSubscription

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    transport_calls = []

    def transport(method, url, headers, body, timeout_s):
        transport_calls.append((headers["X-Webhook-Event"], body))
        return 200, {}, None

    hooks = WebhookManager(transport, clock=_FakeClock())
    hooks.subscribe(WebhookSubscription(
        webhook_url="https://h.example.com/cb", secret="s",
        event_types=("crawl.completed", "crawl.cancelled")))

    res = run_crawl(CrawlJob(job_id="wh", seed_urls=[page_url(0)],
                             strategy="all", limit=40),
                    pages, use_ray=False, webhooks=hooks)
    assert len(transport_calls) == 1
    event, body = transport_calls[0]
    assert event == "crawl.completed"
    assert f'"done":{res.stats["done"]}' in body.replace(" ", "")

    # scheduler -> crawl trigger
    launched = []

    def trigger(task, execution):
        job = CrawlJob(job_id=f"sched-{execution.execution_number}",
                       seed_urls=[page_url(0)], strategy="all",
                       limit=task.task_payload["limit"])
        r = run_crawl(job, pages, use_ray=False, webhooks=hooks)
        launched.append(r.stats["done"])
        return job.job_id

    now = {"t": _utc(2026, 1, 1, 9, 59)}
    mgr = SchedulerManager(trigger, clock=lambda: now["t"])
    mgr.add_task(ScheduledTask(name="nightly", cron_expression="0 10 * * *",
                               task_type="crawl",
                               task_payload={"limit": 25}))
    now["t"] = _utc(2026, 1, 1, 10, 0)
    (eid,) = mgr.tick()
    assert launched == [25]
    assert mgr.executions[eid].job_uuid == "sched-1"
    # the scheduled crawl also fired its completion webhook
    assert len(transport_calls) == 2


def test_webhook_not_refired_on_noop_resume(tmp_path):
    """Review fix: resuming an already-finished job runs zero epochs and
    must NOT re-fire crawl.completed (the reference fires once)."""
    from anycrawl_ray.pipelines.crawl import CrawlJob, run_crawl
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url
    from anycrawl_ray.state.webhooks import WebhookManager, WebhookSubscription

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    events = []
    hooks = WebhookManager(lambda m, u, h, b, t: (events.append(
        h["X-Webhook-Event"]) or (200, {}, None)), clock=_FakeClock())
    hooks.subscribe(WebhookSubscription(webhook_url="https://h.example.com/x",
                                        event_types=("crawl.completed",)))
    ck = str(tmp_path / "ck")
    job = CrawlJob(job_id="nr", seed_urls=[page_url(0)], strategy="all",
                   limit=30)
    run_crawl(job, pages, use_ray=False, checkpoint_dir=ck, webhooks=hooks)
    assert events == ["crawl.completed"]
    # resume of the finished job: no epochs run, no second event
    run_crawl(job, pages, use_ray=False, checkpoint_dir=ck, resume=True,
              webhooks=hooks)
    assert events == ["crawl.completed"]


def test_user_schema_request_validation():
    """Mirror apps/api/src/__tests__/jsonSchema.test.ts through the Zod
    jsonSchemaType port (BaseSchema.ts:7-18): the API edge requires `type`
    from its enum and well-formed properties/items/required."""
    from anycrawl_ray.functions.json_schema import (
        validate_json_options,
        validate_user_schema,
    )

    # accepted: simple / nested / array / complex nested (test cases 1,2,5,6)
    assert validate_user_schema({
        "type": "object",
        "properties": {"title": {"type": "string"},
                       "description": {"type": "string"}},
        "required": ["title"]}) == []
    assert validate_user_schema({
        "type": "object",
        "properties": {"page": {"type": "object",
                                "properties": {"h1": {"type": "string"}}}}}) == []
    assert validate_user_schema({
        "type": "array", "items": {"type": "string"}}) == []
    assert validate_user_schema({
        "type": "object",
        "properties": {"links": {"type": "array",
                                 "items": {"type": "object",
                                           "properties": {"href": {"type": "string"},
                                                          "n": {"type": "number"}}}}}}) == []
    # rejected: invalid type (case 3), properties not an object (case 4)
    assert any(".type" in e for e in
               validate_user_schema({"type": "invalid_type",
                                     "properties": {"t": {"type": "string"}}}))
    assert any("properties" in e for e in
               validate_user_schema({"type": "object",
                                     "properties": "invalid"}))
    # type is REQUIRED at the API edge (unlike the extractor's bag promote)
    assert validate_user_schema({"properties": {}}) != []
    # "integer" is not in the reference's enum
    assert validate_user_schema({"type": "integer"}) != []
    assert validate_user_schema("not a schema") != []
    # items as tuple-of-schemas form
    assert validate_user_schema({"type": "array",
                                 "items": [{"type": "string"},
                                           {"type": "number"}]}) == []
    # required must be string list
    assert validate_user_schema({"type": "object",
                                 "required": [1]}) != []

    # json_options is .strict()
    assert validate_json_options({"schema": {"type": "object"},
                                  "user_prompt": "x",
                                  "schema_name": "n"}) == []
    assert any("unrecognized" in e for e in
               validate_json_options({"schema": {"type": "object"},
                                      "bogus": 1}))
    assert validate_json_options({"user_prompt": 5}) != []
    assert validate_json_options("nope") != []


def test_engine_options_validation():
    """Mirror packages/scrape/src/__tests__/core/ConfigValidator.test.ts."""
    import pytest

    from anycrawl_ray.functions.engine_config import validate_engine_options

    validate_engine_options({})  # empty passes
    validate_engine_options({"min_concurrency": 1, "max_concurrency": 10,
                             "max_request_retries": 3,
                             "request_handler_timeout_secs": 30,
                             "max_requests_per_crawl": 1000,
                             "max_request_timeout": 30000,
                             "navigation_timeout_secs": 30,
                             "max_session_rotations": 5,
                             "request_queue_name": "test-queue"})
    validate_engine_options({"max_request_retries": 0})   # zero allowed
    validate_engine_options({"max_session_rotations": 0})  # zero allowed
    cases = [
        ({"min_concurrency": 0}, "minConcurrency must be at least 1"),
        ({"max_concurrency": 0}, "maxConcurrency must be at least 1"),
        ({"min_concurrency": 10, "max_concurrency": 5},
         "minConcurrency cannot be greater than maxConcurrency"),
        ({"request_handler_timeout_secs": 0},
         "requestHandlerTimeoutSecs must be at least 1"),
        ({"max_request_timeout": 0}, "maxRequestTimeout must be at least 1"),
        ({"navigation_timeout_secs": 0},
         "navigationTimeoutSecs must be at least 1"),
        ({"max_request_retries": -1}, "maxRequestRetries cannot be negative"),
        ({"max_requests_per_crawl": 0},
         "maxRequestsPerCrawl must be at least 1"),
        ({"max_session_rotations": -1},
         "maxSessionRotations cannot be negative"),
        ({"request_queue_name": 123}, "requestQueueName must be a string"),
    ]
    for options, msg in cases:
        with pytest.raises(ValueError, match=msg):
            validate_engine_options(options)


def test_template_cache_semantics():
    """Mirror packages/template-client/src/__tests__/cache.test.ts: TTL
    expiry, oldest-entry eviction at max size, invalidate/clear, and
    ttl<=0 disabling the cache."""
    from anycrawl_ray.functions.template_system import TemplateCache

    now = {"t": 1_000_000.0}
    c = TemplateCache(ttl_ms=1000, max_size=3, clock=lambda: now["t"])
    c.set("a", {"id": "a"})
    assert c.get("a") == {"id": "a"}
    assert c.get("missing") is None
    # expiry
    now["t"] += 1001
    assert c.get("a") is None
    assert c.size() == 0
    # eviction: oldest out when full
    for k in ("a", "b", "c"):
        c.set(k, {"id": k})
    c.set("d", {"id": "d"})
    assert c.size() == 3
    assert c.get("a") is None  # oldest evicted
    assert c.get("d") == {"id": "d"}
    # re-setting an existing key must not evict others
    c.set("d", {"id": "d2"})
    assert c.size() == 3 and c.get("b") is not None
    # invalidate / clear / cleanup
    c.invalidate("b")
    assert c.get("b") is None
    now["t"] += 1001
    assert c.cleanup() == 2  # c and d expired
    c.set("x", {"id": "x"})
    c.clear()
    assert c.size() == 0
    # ttl <= 0 disables the cache entirely
    off = TemplateCache(ttl_ms=0, clock=lambda: now["t"])
    off.set("a", {"id": "a"})
    assert off.get("a") is None and off.size() == 0


class _FakeS3Client:
    """boto3-shaped S3 client (put/get/head/presign) for S3Storage tests."""

    def __init__(self):
        self.objects: dict[str, tuple[bytes, str | None]] = {}

    def put_object(self, Bucket, Key, Body, ContentType=None):
        self.objects[f"{Bucket}/{Key}"] = (Body, ContentType)
        return {"ETag": f'"{len(Body)}"'}

    def get_object(self, Bucket, Key):
        try:
            body, _ct = self.objects[f"{Bucket}/{Key}"]
        except KeyError:
            raise RuntimeError("NoSuchKey")
        return {"Body": body}

    def head_object(self, Bucket, Key):
        if f"{Bucket}/{Key}" not in self.objects:
            raise RuntimeError("404")
        return {}

    def generate_presigned_url(self, op, Params, ExpiresIn):
        return (f"https://s3.test/{Params['Bucket']}/{Params['Key']}"
                f"?X-Amz-Expires={ExpiresIn}")


def test_s3_storage_adapter():
    """s3.ts:12-71 S3Storage: env validation + IStorage ops over an
    injected boto3-shaped client."""
    import pytest as _pytest

    from anycrawl_ray.state.blobstore import S3Storage, get_storage

    env = {"ANYCRAWL_S3_ENDPOINT": "https://s3.test",
           "ANYCRAWL_S3_ACCESS_KEY": "ak",
           "ANYCRAWL_S3_SECRET_ACCESS_KEY": "sk",
           "ANYCRAWL_S3_BUCKET": "blobs"}
    # required-variable errors, message-for-message (s3.ts:17-25)
    for missing, msg in (("ANYCRAWL_S3_ENDPOINT",
                          "ANYCRAWL_S3_ENDPOINT is required"),
                         ("ANYCRAWL_S3_ACCESS_KEY",
                          "ANYCRAWL_S3_ACCESS_KEY is required"),
                         ("ANYCRAWL_S3_BUCKET",
                          "ANYCRAWL_S3_BUCKET is required")):
        bad = {k: v for k, v in env.items() if k != missing}
        with _pytest.raises(RuntimeError, match=msg):
            S3Storage(client=_FakeS3Client(), env=bad)

    client = _FakeS3Client()
    st = S3Storage(client=client, env=env)
    st.upload("a/b.txt", "hello")
    assert st.get("a/b.txt") == b"hello"
    assert st.exists("a/b.txt") and not st.exists("nope")
    st.upload_image("shot.jpeg", b"\xff\xd8jpeg", content_type="image/jpeg")
    assert client.objects["blobs/shot.jpeg"] == (b"\xff\xd8jpeg",
                                                 "image/jpeg")
    url = st.get_temporary_url("a/b.txt", expires_in=60)
    assert url == "https://s3.test/blobs/a/b.txt?X-Amz-Expires=60"

    # selector: "s3" routes to S3Storage with the injected client
    import os as _os

    old = {k: _os.environ.get(k) for k in env}
    _os.environ.update(env)
    try:
        assert isinstance(get_storage("s3", s3_client=client), S3Storage)
    finally:
        for k, v in old.items():
            if v is None:
                _os.environ.pop(k, None)
            else:
                _os.environ[k] = v


def test_auto_blocks_sizing(ray_session, tmp_path):
    """Small inputs get a size-proportional block count (floor 1, cap
    2x CPUs); inputs past cpus*8MiB return None (Ray's own sizing)."""
    import pyarrow as pa
    import pyarrow.parquet as pqt

    from anycrawl_ray.util import auto_blocks, sized_read_parquet

    f = tmp_path / "t.parquet"
    pqt.write_table(pa.table({"x": list(range(1000))}), f)
    nb = auto_blocks(str(f))
    assert nb is not None and 1 <= nb <= 2 * 32
    sz = f.stat().st_size
    assert sz < 256 << 10 and nb == max(1, min(8, -(-sz // (32 << 10))))
    # list + directory forms count the same bytes
    assert auto_blocks([str(f)]) == nb
    assert auto_blocks(str(tmp_path)) == nb
    # missing file -> don't override
    assert auto_blocks(str(tmp_path / "nope.parquet")) is None
    # the read applies it (1 block for a tiny file) and an explicit
    # caller override always wins
    assert sized_read_parquet(str(f)).materialize().num_blocks() == nb
    assert sized_read_parquet(
        str(f), override_num_blocks=3).materialize().num_blocks() == 3
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # big-input threshold: fake via a paths list long enough to cross it
    many = [str(f)] * (cpus * (8 << 20) // sz + 1)
    assert auto_blocks(many) is None
