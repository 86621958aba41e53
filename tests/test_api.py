"""API surface parity: router + middleware chain + controllers.

Mirrors the reference's Express app behavior (apps/api/src/index.ts,
middlewares/*, controllers/v1/*, routers/v1/index.ts) driven fully
in-process through ``App.request`` — no sockets, no Ray.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from anycrawl_ray.api.app import App
from anycrawl_ray.api.controllers import run_pending_jobs
from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def pages():
    return build_site_table(DOCS)


def make_app(pages=None, **kw):
    kw.setdefault("out_dir", "/tmp/anycrawl_api_test_out")
    kw.setdefault("checkpoint_dir", "/tmp/anycrawl_api_test_ckpt")
    kw.setdefault("documents_path", DOCS)
    return App(pages=pages, use_ray=False, **kw)


# ------------------------------------------------------------ basics


def test_health_and_root_and_404():
    app = make_app()
    assert app.request("GET", "/") == (200, "Hello World")
    assert app.request("GET", "/health") == (200, {"status": "ok"})
    status, body = app.request("GET", "/v2/nope")
    assert status == 404 and body == "Cannot GET /v2/nope"
    # wrong method on a known path is also a 404 (Express default)
    assert app.request("PUT", "/v1/scrape")[0] == 404


# ------------------------------------------------------------ auth


def test_auth_disabled_is_open(pages):
    app = make_app(pages)
    status, body = app.request("POST", "/v1/scrape",
                               body={"url": page_url(0)})
    assert status == 200 and body["success"] is True


def test_auth_chain():
    app = make_app(auth_enabled=True)
    app.state.add_api_key("good")
    app.state.add_api_key("dead", is_active=False)

    status, body = app.request("GET", "/v1/webhook-events")
    assert (status, body["error"]) == (401,
                                       "No authorization header provided")
    status, body = app.request("GET", "/v1/webhook-events",
                               headers={"Authorization": "Token x"})
    assert (status, body["error"]) == (401,
                                       "Invalid authorization header format")
    status, body = app.request("GET", "/v1/webhook-events",
                               headers={"Authorization": "Bearer nope"})
    assert (status, body["error"]) == (401, "Invalid API key")
    status, body = app.request("GET", "/v1/webhook-events",
                               headers={"Authorization": "Bearer dead"})
    assert (status, body["error"]) == (401, "API key is inactive")
    status, body = app.request("GET", "/v1/webhook-events",
                               headers={"Authorization": "Bearer good"})
    assert status == 200 and body["success"] is True


def test_auth_ip_whitelist():
    app = make_app(auth_enabled=True)
    app.state.add_api_key("k", allowed_ips=("10.0.0.0/8", "192.168.1.5"))
    hdr = {"Authorization": "Bearer k"}

    status, body = app.request("GET", "/v1/webhook-events",
                               headers={**hdr, "remote-addr": "8.8.8.8"})
    assert (status, body["error"]) == (403, "IP address not allowed")
    assert body["clientIp"] == "8.8.8.8"
    # no client ip at all -> denied when a whitelist exists
    assert app.request("GET", "/v1/webhook-events", headers=hdr)[0] == 403
    # CIDR match via X-Forwarded-For first hop
    status, _ = app.request(
        "GET", "/v1/webhook-events",
        headers={**hdr, "X-Forwarded-For": "10.2.3.4, 1.2.3.4"})
    assert status == 200
    status, _ = app.request("GET", "/v1/webhook-events",
                            headers={**hdr,
                                     "CF-Connecting-IP": "192.168.1.5"})
    assert status == 200


def test_public_routes_bypass_auth(tmp_path):
    app = make_app(auth_enabled=True, storage_dir=str(tmp_path))
    (tmp_path / "shot.jpg").write_bytes(b"JPEGDATA")
    status, body = app.request("GET", "/v1/public/storage/file/shot.jpg")
    assert (status, body) == (200, b"JPEGDATA")
    status, body = app.request("GET", "/v1/public/storage/file/missing.jpg")
    assert status == 500 and body["error"] == "Error sending file"


# ------------------------------------------------------------ credits


def test_credits_402_and_deduction(pages):
    app = make_app(pages, auth_enabled=True, credits_enabled=True)
    rich = app.state.add_api_key("rich", credits=100)
    app.state.add_api_key("broke", credits=0)

    status, body = app.request("POST", "/v1/scrape",
                               body={"url": page_url(0)},
                               headers={"Authorization": "Bearer broke"})
    assert status == 402 and body["current_credits"] == 0

    status, body = app.request("POST", "/v1/scrape",
                               body={"url": page_url(0)},
                               headers={"Authorization": "Bearer rich"})
    assert status == 200 and body["success"] is True
    assert rich.credits == 99  # markdown-only scrape = 1 credit

    # crawl limit precheck: requested limit > available -> 402, no job
    status, body = app.request("POST", "/v1/crawl",
                               body={"url": page_url(0), "limit": 500},
                               headers={"Authorization": "Bearer rich"})
    assert status == 402
    assert "Desired requested limit (500) exceeds" in body["message"]
    assert len(app.state.jobs) == 1  # only the scrape job

    before = rich.credits
    status, body = app.request(
        "POST", "/v1/crawl", body={"url": page_url(0), "limit": 5},
        headers={"Authorization": "Bearer rich"})
    assert status == 200
    assert rich.credits == before - 1  # initial crawl credit (no stealth)


def test_failed_scrape_costs_nothing():
    from anycrawl_ray.sources.synthetic_site import site_table_from_rows

    tiny = site_table_from_rows([
        {"url": page_url(0), "html": "<html><body>x</body></html>"}])
    app = make_app(tiny, auth_enabled=True, credits_enabled=True)
    key = app.state.add_api_key("k", credits=10)
    status, body = app.request(
        "POST", "/v1/scrape", body={"url": "http://h0.site.test/nope"},
        headers={"Authorization": "Bearer k"})
    assert status == 200 and body["success"] is False
    assert body["error"] == "Scrape task failed"
    assert key.credits == 10


# ------------------------------------------------------------ scrape


def test_scrape_validation(pages):
    app = make_app(pages)
    status, body = app.request("POST", "/v1/scrape", body={})
    assert status == 400
    assert body["data"]["type"] == "VALIDATION_ERROR"
    assert body["data"]["issues"][0]["field"] == "url"

    status, body = app.request(
        "POST", "/v1/scrape", body={"url": page_url(0), "engine": "bogus"})
    assert status == 400
    assert body["data"]["issues"][0]["field"] == "engine"


def test_scrape_formats(pages):
    app = make_app(pages)
    status, body = app.request(
        "POST", "/v1/scrape",
        body={"url": page_url(0), "formats": ["html", "markdown"]})
    assert status == 200
    doc = body["data"]
    assert doc["status"] == "completed"
    kinds = {s["kind"] for s in doc["spans"]}
    assert "markdown" in kinds and "html" in kinds


# ------------------------------------------------------------ search


def test_search(pages):
    app = make_app(pages)
    status, body = app.request("POST", "/v1/search", body={})
    assert status == 400 and body["data"]["issues"][0]["field"] == "query"

    status, body = app.request("POST", "/v1/search",
                               body={"query": "ray data", "limit": 7})
    assert status == 200 and body["success"] is True
    assert len(body["data"]) == 7
    assert all(r["query"] == "ray data" for r in body["data"])

    status, body = app.request("POST", "/v1/search",
                               body={"query": "q", "engine": "bogus"})
    assert status == 400 and body["data"]["issues"][0]["field"] == "engine"


# ------------------------------------------------------------ crawl


def test_crawl_e2e_sync(pages):
    app = make_app(pages)
    status, body = app.request("POST", "/v1/crawl",
                               body={"url": page_url(0), "limit": 12,
                                     "strategy": "all"})
    assert status == 200
    job_id = body["data"]["job_id"]
    assert body["data"]["status"] == "created"

    status, body = app.request("GET", f"/v1/crawl/{job_id}/status")
    assert status == 200
    st = body["data"]
    assert st["status"] == "completed"
    assert st["completed"] > 0 and st["total"] >= st["completed"]

    status, body = app.request("GET", f"/v1/crawl/{job_id}")
    assert status == 200 and body["success"] is True
    assert body["status"] == "completed"
    assert 0 < len(body["data"]) <= 100
    assert all("url" in row for row in body["data"])

    # finished jobs cannot be cancelled (409)
    status, body = app.request("DELETE", f"/v1/crawl/{job_id}")
    assert status == 409 and body["error"] == "Job already finished"


def test_crawl_results_paging(pages):
    app = make_app(pages)
    _, body = app.request("POST", "/v1/crawl",
                          body={"url": page_url(0), "limit": 130,
                                "strategy": "all"})
    job_id = body["data"]["job_id"]
    status, page1 = app.request("GET", f"/v1/crawl/{job_id}")
    assert status == 200 and len(page1["data"]) == 100
    assert page1["next"] and f"/v1/crawl/{job_id}/results?skip=100" \
        in page1["next"]
    # follow the next link's query string through the router
    status, page2 = app.request("GET", f"/v1/crawl/{job_id}?skip=100")
    assert status == 200
    assert 0 < len(page2["data"]) <= 30
    assert page2.get("next") is None
    ids1 = {r["doc_id"] for r in page1["data"]}
    ids2 = {r["doc_id"] for r in page2["data"]}
    assert not ids1 & ids2


def test_crawl_bad_ids(pages):
    app = make_app(pages)
    status, body = app.request("GET", "/v1/crawl/not-a-uuid/status")
    assert status == 400 and body["error"] == "Invalid job ID"
    status, body = app.request(
        "GET", "/v1/crawl/00000000-0000-0000-0000-000000000000/status")
    assert status == 400 and body["message"] == "Job not found"
    status, body = app.request(
        "DELETE", "/v1/crawl/00000000-0000-0000-0000-000000000000")
    assert status == 404 and body["message"] == "Job not found"


def test_crawl_manual_mode_cancel(pages):
    app = make_app(pages, run_mode="manual")
    _, body = app.request("POST", "/v1/crawl",
                          body={"url": page_url(0), "limit": 5})
    job_id = body["data"]["job_id"]
    assert app.state.jobs[job_id].status == "pending"
    status, body = app.request("DELETE", f"/v1/crawl/{job_id}")
    assert status == 200 and body["data"]["status"] == "cancelled"
    assert run_pending_jobs(app.state) == 0  # dequeued by cancel

    _, body = app.request("POST", "/v1/crawl",
                          body={"url": page_url(0), "limit": 5})
    assert run_pending_jobs(app.state) == 1
    assert app.state.jobs[body["data"]["job_id"]].status == "completed"


# ---------------------------------------------------- scheduled tasks


def _fixed_clock():
    t = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)
    return lambda: t


def test_tasks_crud(pages):
    app = make_app(pages, clock=_fixed_clock())
    bad = app.request("POST", "/v1/scheduled-tasks", body={
        "name": "", "cron_expression": "nope", "task_type": "x"})
    assert bad[0] == 400
    fields = {i["field"] for i in bad[1]["details"]}
    assert {"name", "cron_expression", "task_type",
            "task_payload"} <= fields

    status, body = app.request("POST", "/v1/scheduled-tasks", body={
        "name": "hourly crawl", "cron_expression": "0 * * * *",
        "task_type": "crawl",
        "task_payload": {"url": page_url(0), "limit": 3}})
    assert status == 201
    task_id = body["data"]["task_id"]
    assert body["data"]["next_execution_at"] == "2026-01-01T01:00:00+00:00"

    status, body = app.request("GET", "/v1/scheduled-tasks")
    assert status == 200 and len(body["data"]) == 1
    row = body["data"][0]
    assert row["min_credits_required"] == 3  # crawl -> limit
    assert row["is_active"] and not row["is_paused"]

    status, body = app.request("GET", f"/v1/scheduled-tasks/{task_id}")
    assert status == 200 and body["data"]["name"] == "hourly crawl"

    status, _ = app.request("PUT", f"/v1/scheduled-tasks/{task_id}",
                            body={"cron_expression": "30 2 * * *"})
    assert status == 200
    _, body = app.request("GET", f"/v1/scheduled-tasks/{task_id}")
    assert body["data"]["next_execution_at"] == \
        "2026-01-01T02:30:00+00:00"

    status, _ = app.request("PATCH",
                            f"/v1/scheduled-tasks/{task_id}/pause",
                            body={"reason": "maintenance"})
    assert status == 200
    _, body = app.request("GET", f"/v1/scheduled-tasks/{task_id}")
    assert body["data"]["is_paused"] and \
        body["data"]["pause_reason"] == "maintenance"

    status, _ = app.request("PATCH",
                            f"/v1/scheduled-tasks/{task_id}/resume")
    assert status == 200
    _, body = app.request("GET", f"/v1/scheduled-tasks/{task_id}")
    assert not body["data"]["is_paused"]

    status, _ = app.request("DELETE", f"/v1/scheduled-tasks/{task_id}")
    assert status == 200
    assert app.request("GET", f"/v1/scheduled-tasks/{task_id}")[0] == 404
    assert task_id not in app.state.scheduler.tasks


def test_tasks_ownership_isolation(pages):
    app = make_app(pages, auth_enabled=True)
    app.state.add_api_key("alice", user="alice-user")
    app.state.add_api_key("bob", user="bob-user")
    a = {"Authorization": "Bearer alice"}
    b = {"Authorization": "Bearer bob"}
    _, body = app.request("POST", "/v1/scheduled-tasks", headers=a, body={
        "name": "mine", "cron_expression": "* * * * *",
        "task_type": "scrape", "task_payload": {"url": page_url(0)}})
    task_id = body["data"]["task_id"]
    assert len(app.request("GET", "/v1/scheduled-tasks",
                           headers=a)[1]["data"]) == 1
    assert app.request("GET", "/v1/scheduled-tasks",
                       headers=b)[1]["data"] == []
    assert app.request("GET", f"/v1/scheduled-tasks/{task_id}",
                       headers=b)[0] == 404
    # blind-update semantics: pause by non-owner succeeds but is a no-op
    assert app.request("PATCH", f"/v1/scheduled-tasks/{task_id}/pause",
                       headers=b)[0] == 200
    assert not app.state.scheduled_tasks[task_id]["is_paused"]


def test_task_execution_fires_job(pages):
    """Scheduler tick -> task fires through the same job path as HTTP."""
    from datetime import timedelta

    t = {"now": datetime(2026, 1, 1, 0, 0, 30, tzinfo=timezone.utc)}
    app = make_app(pages, clock=lambda: t["now"])
    _, body = app.request("POST", "/v1/scheduled-tasks", body={
        "name": "every minute", "cron_expression": "* * * * *",
        "task_type": "crawl",
        "task_payload": {"url": page_url(0), "limit": 3}})
    task_id = body["data"]["task_id"]
    t["now"] += timedelta(seconds=60)
    fired = app.state.tick_scheduler()
    assert fired
    assert any(j.job_type == "crawl" and j.status == "completed"
               for j in app.state.jobs.values())
    status, body = app.request(
        "GET", f"/v1/scheduled-tasks/{task_id}/executions")
    assert status == 200 and len(body["data"]) == 1
    ex = body["data"][0]
    assert ex["status"] == "completed" and ex["job_uuid"]


# ------------------------------------------------------------ webhooks


def test_webhooks_crud_and_delivery(pages):
    app = make_app(pages, clock=_fixed_clock())
    bad = app.request("POST", "/v1/webhooks", body={
        "name": "w", "webhook_url": "ftp://x", "event_types": ["nope"]})
    assert bad[0] == 400
    fields = {i["field"] for i in bad[1]["details"]}
    assert {"webhook_url", "event_types"} <= fields

    status, body = app.request("POST", "/v1/webhooks", body={
        "name": "w", "webhook_url": "https://example.com/hook",
        "event_types": ["crawl.completed", "webhook.test"]})
    assert status == 201
    wid = body["data"]["webhook_id"]
    secret = body["data"]["secret"]
    assert len(secret) == 64  # randomBytes(32).hex

    _, body = app.request("GET", "/v1/webhooks")
    assert body["data"][0]["webhook_secret"] == "***hidden***"
    _, body = app.request("GET", f"/v1/webhooks/{wid}")
    assert body["data"]["webhook_secret"] == "***hidden***"

    # scope=specific without ids is rejected
    status, body = app.request("POST", "/v1/webhooks", body={
        "name": "w2", "webhook_url": "https://example.com/h2",
        "event_types": ["webhook.test"], "scope": "specific"})
    assert status == 400 and "specific_task_ids is required" \
        in body["error"]

    # test trigger -> recorded send with HMAC headers
    status, _ = app.request("POST", f"/v1/webhooks/{wid}/test")
    assert status == 200
    sent = app.state.webhook_transport.sent
    assert len(sent) == 1
    assert sent[0]["url"] == "https://example.com/hook"
    assert "X-AnyCrawl-Signature" in sent[0]["headers"]

    status, body = app.request("GET", f"/v1/webhooks/{wid}/deliveries")
    assert status == 200 and len(body["data"]) == 1
    d = body["data"][0]
    assert d["event_type"] == "webhook.test" and d["status"] == "delivered"

    # replay the delivery
    status, _ = app.request(
        "POST", f"/v1/webhooks/{wid}/deliveries/{d['uuid']}/replay")
    assert status == 200 and len(sent) == 2
    status, body = app.request(
        "POST", f"/v1/webhooks/{wid}/deliveries/"
                f"00000000-0000-0000-0000-000000000000/replay")
    assert status == 404

    # deactivate stops deliveries; activate resumes
    app.request("PUT", f"/v1/webhooks/{wid}/deactivate")
    app.request("POST", f"/v1/webhooks/{wid}/test")
    assert len(sent) == 2
    app.request("PUT", f"/v1/webhooks/{wid}/activate")
    app.request("POST", f"/v1/webhooks/{wid}/test")
    assert len(sent) == 3

    status, _ = app.request("DELETE", f"/v1/webhooks/{wid}")
    assert status == 200
    assert app.request("GET", f"/v1/webhooks/{wid}")[0] == 404


def test_webhook_events_catalog():
    app = make_app()
    _, body = app.request("GET", "/v1/webhook-events")
    data = body["data"]
    assert "crawl.completed" in data["event_types"]
    assert data["categories"]["scheduled_tasks"] == [
        "task.executed", "task.failed", "task.paused", "task.resumed"]


def test_crawl_triggers_webhook(pages):
    app = make_app(pages)
    app.request("POST", "/v1/webhooks", body={
        "name": "w", "webhook_url": "https://example.com/hook",
        "event_types": ["crawl.completed"]})
    app.request("POST", "/v1/crawl", body={"url": page_url(0),
                                           "limit": 3})
    sent = app.state.webhook_transport.sent
    events = [s["headers"]["X-Webhook-Event"] for s in sent]
    assert "crawl.completed" in events


def test_task_webhook_url_autocreates(pages):
    app = make_app(pages)
    _, body = app.request("POST", "/v1/scheduled-tasks", body={
        "name": "t", "cron_expression": "* * * * *",
        "task_type": "scrape", "task_payload": {"url": page_url(0)},
        "webhook_url": "https://example.com/task-hook"})
    task_id = body["data"]["task_id"]
    hooks = list(app.state.webhooks.values())
    assert len(hooks) == 1
    assert hooks[0]["scope"] == "specific"
    assert hooks[0]["specific_task_ids"] == [task_id]
    assert hooks[0]["event_types"] == ["task.executed", "task.failed",
                                       "task.paused", "task.resumed"]


def test_query_string_multi_digit():
    """_int_query reads parse_qs-shaped lists: limit=25 stays 25."""
    app = make_app(clock=_fixed_clock())
    _, body = app.request("POST", "/v1/webhooks", body={
        "name": "w", "webhook_url": "https://example.com/hook",
        "event_types": ["webhook.test"]})
    wid = body["data"]["webhook_id"]
    for _ in range(3):
        app.request("POST", f"/v1/webhooks/{wid}/test")
    _, body = app.request("GET",
                          f"/v1/webhooks/{wid}/deliveries?limit=25")
    assert body["meta"]["limit"] == 25 and len(body["data"]) == 3
    _, body = app.request(
        "GET", f"/v1/webhooks/{wid}/deliveries?limit=2&offset=1")
    assert len(body["data"]) == 2


# ---------------------------------------------------- real HTTP server


def test_served_over_socket(pages):
    """`python -m anycrawl_ray api` path: the same dispatch over a real
    socket (stdlib server), JSON in/out."""
    import json
    import threading
    import time
    import urllib.error
    import urllib.request

    app = make_app(pages)
    port = 18777
    threading.Thread(target=app.serve, kwargs={"port": port},
                     daemon=True).start()
    deadline = time.time() + 5

    def req(method, path, body=None):
        data = json.dumps(body).encode() if body is not None else None
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    while True:
        try:
            status, raw = req("GET", "/health")
            break
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.05)
    assert status == 200 and json.loads(raw) == {"status": "ok"}

    status, raw = req("POST", "/v1/crawl",
                      {"url": page_url(0), "limit": 5, "strategy": "all"})
    assert status == 200
    job_id = json.loads(raw)["data"]["job_id"]
    status, raw = req("GET", f"/v1/crawl/{job_id}")
    body = json.loads(raw)
    assert status == 200 and len(body["data"]) == 5
    status, raw = req("POST", "/v1/scrape", {"url": "x"})
    assert status == 400
    assert json.loads(raw)["data"]["type"] == "VALIDATION_ERROR"


# ------------------------------------------------------------ SDK client


def test_sdk_client_end_to_end(pages):
    """packages/js-sdk AnyCrawlClient surface over the in-process app."""
    from anycrawl_ray.client import AnyCrawlClient, InProcessTransport

    app = make_app(pages)
    cli = AnyCrawlClient(api_key="", transport=InProcessTransport(app),
                         sleep=lambda s: None)
    assert cli.health_check() == {"status": "ok"}

    doc = cli.scrape(page_url(0), engine="cheerio",
                     formats=["markdown", "html"])
    assert doc["status"] == "completed"

    # crawl() polls to completion and aggregates every page via skip
    res = cli.crawl(page_url(0), engine="cheerio", strategy="all",
                    limit=130)
    assert res["status"] == "completed"
    # total mirrors the job's enqueued counter (may exceed fetched docs
    # when the limit gate lands mid-wave, CrawlController semantics)
    assert len(res["data"]) == 130 and res["total"] >= 130
    assert len({r["doc_id"] for r in res["data"]}) == 130

    hits = cli.search("ray", limit=5)
    assert len(hits) == 5

    job = cli.create_crawl(page_url(0), engine="cheerio", limit=3)
    status = cli.get_crawl_status(job["job_id"])
    assert status["status"] == "completed"
    with pytest.raises(RuntimeError, match="API Error 409"):
        cli.cancel_crawl(job["job_id"])


def test_sdk_client_error_normalization(pages):
    from anycrawl_ray.client import AnyCrawlClient, InProcessTransport

    app = make_app(pages, auth_enabled=True, credits_enabled=True)
    app.state.add_api_key("k", credits=0)
    calls = []
    cli = AnyCrawlClient(api_key="bad",
                         transport=InProcessTransport(app),
                         on_auth_failure=lambda: calls.append(1))
    with pytest.raises(RuntimeError,
                       match="Authentication failed: Invalid API key"):
        cli.scrape(page_url(0))
    assert calls == [1]

    broke = AnyCrawlClient(api_key="k", transport=InProcessTransport(app))
    with pytest.raises(RuntimeError,
                       match=r"Payment required: .*current_credits=0"):
        broke.scrape(page_url(0))

    ok = AnyCrawlClient(api_key="", transport=InProcessTransport(make_app(pages)))
    with pytest.raises(RuntimeError, match="API Error 400"):
        ok.scrape("not-a-url")


def test_generate_api_key_format():
    """scripts/generateApiKey.ts format: ac- + 32 alphanumeric chars."""
    import re

    from anycrawl_ray.api.store import generate_api_key

    keys = {generate_api_key() for _ in range(50)}
    assert len(keys) == 50
    for k in keys:
        assert re.fullmatch(r"ac-[A-Za-z0-9]{32}", k)


# ------------------------------------------- review-finding regressions


def test_next_link_route_dereferences(pages):
    """The server-issued /results?skip= next link must itself resolve."""
    app = make_app(pages)
    _, body = app.request("POST", "/v1/crawl",
                          body={"url": page_url(0), "limit": 130,
                                "strategy": "all"})
    job_id = body["data"]["job_id"]
    _, page1 = app.request("GET", f"/v1/crawl/{job_id}")
    from urllib.parse import urlparse

    next_path = urlparse(page1["next"]).path + "?" + \
        urlparse(page1["next"]).query
    status, page2 = app.request("GET", next_path)
    assert status == 200 and page2["success"] and len(page2["data"]) > 0


def test_numeric_body_fields_reject_strings(pages):
    """Zod-style 400 (not 500) for string numerics."""
    app = make_app(pages, auth_enabled=True, credits_enabled=True)
    app.state.add_api_key("k", credits=10)
    status, body = app.request(
        "POST", "/v1/crawl", body={"url": page_url(0), "limit": "50"},
        headers={"Authorization": "Bearer k"})
    assert status == 400 and body["error"] == "Validation error"
    status, body = app.request("POST", "/v1/search",
                               body={"query": "x", "limit": "abc"},
                               headers={"Authorization": "Bearer k"})
    assert status == 400 and body["error"] == "Validation error"
    open_app = make_app(pages)
    status, body = open_app.request(
        "POST", "/v1/crawl", body={"url": page_url(0),
                                   "options": {"limit": "9"}})
    assert status == 400


def test_scheduled_scrape_and_search_actually_run(pages):
    """Scheduled scrape/search tasks execute the real pipelines and a bad
    payload records a failed execution instead of wedging the tick."""
    from datetime import datetime, timedelta, timezone

    t = {"now": datetime(2026, 1, 1, 0, 0, 30, tzinfo=timezone.utc)}
    app = make_app(pages, clock=lambda: t["now"])
    for name, ttype, payload in (
            ("s1", "scrape", {"url": page_url(0)}),
            ("s2", "search", {"query": "ray", "limit": 3}),
            ("bad", "crawl", {})):  # no url -> trigger failure
        app.request("POST", "/v1/scheduled-tasks", body={
            "name": name, "cron_expression": "* * * * *",
            "task_type": ttype, "task_payload": payload})
    t["now"] += timedelta(seconds=60)
    fired = app.state.tick_scheduler()
    assert len(fired) == 3
    by_type = {}
    for j in app.state.jobs.values():
        by_type.setdefault(j.job_type, j)
    assert by_type["scrape"].status == "completed"
    assert by_type["scrape"].credits_used == 1
    assert by_type["search"].status == "completed"
    assert by_type["search"].completed == 3
    statuses = sorted(e.status for e in
                      app.state.scheduler.executions.values())
    assert statuses == ["completed", "completed", "failed"]
    # the failed task is not wedged: it fires again next minute
    t["now"] += timedelta(seconds=60)
    assert len(app.state.tick_scheduler()) == 3


def test_file_get_traversal_key_stays_enveloped(tmp_path):
    app = make_app(storage_dir=str(tmp_path))
    status, body = app.request(
        "GET", "/v1/public/storage/file/..%2F..%2Fetc%2Fpasswd")
    assert status == 500
    assert body["error"] == "Error sending file"
    assert "escapes storage root" in body["message"]


def test_parity_quirk_delete_side_effects_unconditional(pages):
    """Reference parity (ScheduledTasksController.ts:441-477): only the
    row delete is ownership-filtered; scheduler removal + webhook
    disassociation run on the requested id regardless of owner."""
    app = make_app(pages, auth_enabled=True)
    app.state.add_api_key("alice", user="alice-user")
    app.state.add_api_key("bob", user="bob-user")
    a = {"Authorization": "Bearer alice"}
    _, body = app.request("POST", "/v1/scheduled-tasks", headers=a, body={
        "name": "t", "cron_expression": "* * * * *",
        "task_type": "scrape", "task_payload": {"url": page_url(0)},
        "webhook_url": "https://example.com/hook"})
    task_id = body["data"]["task_id"]
    assert task_id in app.state.scheduler.tasks
    status, _ = app.request("DELETE", f"/v1/scheduled-tasks/{task_id}",
                            headers={"Authorization": "Bearer bob"})
    assert status == 200
    # row survives (ownership-filtered) ...
    assert task_id in app.state.scheduled_tasks
    # ... but the live scheduler entry and webhook association are gone
    assert task_id not in app.state.scheduler.tasks
    hooks = list(app.state.webhooks.values())
    assert hooks and task_id not in (hooks[0]["specific_task_ids"] or [])


def test_parity_quirk_min_credits_fixed_at_create(pages):
    """Reference parity: min_credits_required is estimated at create
    (ts:64) and never recomputed on update (ts:270-300)."""
    app = make_app(pages)
    _, body = app.request("POST", "/v1/scheduled-tasks", body={
        "name": "t", "cron_expression": "* * * * *",
        "task_type": "scrape", "task_payload": {"url": page_url(0)}})
    task_id = body["data"]["task_id"]
    assert app.state.scheduled_tasks[task_id]["min_credits_required"] == 1
    app.request("PUT", f"/v1/scheduled-tasks/{task_id}", body={
        "task_type": "crawl",
        "task_payload": {"url": page_url(0), "limit": 1000}})
    assert app.state.scheduled_tasks[task_id]["min_credits_required"] == 1


# -------------------------------------------------- live-socket server


def test_sdk_client_over_real_http_socket(pages):
    """The stdlib server + UrllibTransport path that interactive use and
    the CLI `api` subcommand take: a real loopback socket, real HTTP
    framing, the same envelopes as InProcessTransport — closes the last
    transport seam the same way test_http_fetcher.py does for the
    fetcher (S1 over a live socket)."""
    import threading

    from anycrawl_ray.client import AnyCrawlClient, UrllibTransport

    app = make_app(pages)
    srv = app.make_server(0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cli = AnyCrawlClient(
            api_key="", sleep=lambda s: None,
            transport=UrllibTransport(f"http://127.0.0.1:{port}"))
        assert cli.health_check() == {"status": "ok"}

        doc = cli.scrape(page_url(0), engine="cheerio",
                         formats=["markdown"])
        assert doc["status"] == "completed" and doc["spans"]

        res = cli.crawl(page_url(0), engine="cheerio", strategy="all",
                        limit=25)
        assert res["status"] == "completed" and len(res["data"]) == 25

        # error envelope over the wire: unknown engine -> API Error
        with pytest.raises(RuntimeError, match="API Error|Validation"):
            cli.scrape(page_url(0), engine="nope")
    finally:
        srv.shutdown()
        srv.server_close()


def test_sdk_client_real_socket_auth_failure(pages):
    import threading

    from anycrawl_ray.client import AnyCrawlClient, UrllibTransport

    app = make_app(pages, auth_enabled=True)
    app.state.add_api_key("good-key", credits=100)
    srv = app.make_server(0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        calls = []
        bad = AnyCrawlClient(api_key="wrong", sleep=lambda s: None,
                             on_auth_failure=lambda: calls.append(1),
                             transport=UrllibTransport(base))
        with pytest.raises(RuntimeError, match="Authentication failed"):
            bad.scrape(page_url(0), engine="cheerio")
        assert calls == [1]

        good = AnyCrawlClient(api_key="good-key", sleep=lambda s: None,
                              transport=UrllibTransport(base))
        doc = good.scrape(page_url(0), engine="cheerio")
        assert doc["status"] == "completed"
    finally:
        srv.shutdown()
        srv.server_close()
