"""Loopback-socket integration tests for HttpFetcher — the real-network
fetch stage (stages/fetch.py) exercised against a live local http.server,
matching the reference's selective-retry + proxy-rotation semantics
(packages/scrape/src/HttpClient.ts:59-123): 403/429/5xx retry with proxy
rotation per attempt, other 4xx return immediately. No external network —
everything binds 127.0.0.1.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from anycrawl_ray.stages.fetch import HttpFetcher


class _SiteHandler(BaseHTTPRequestHandler):
    hits: dict[str, int] = {}

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        cls = type(self)
        cls.hits[self.path] = cls.hits.get(self.path, 0) + 1
        if self.path == "/ok":
            body = b"<html><title>ok</title></html>"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/missing":
            self.send_error(404)
        elif self.path == "/teapot":
            self.send_error(418)
        elif self.path == "/flaky403":
            if cls.hits[self.path] < 3:
                self.send_error(403)
            else:
                body = b"third time lucky"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
        elif self.path == "/always500":
            self.send_error(500)
        else:
            self.send_error(404)


class _ProxyHandler(BaseHTTPRequestHandler):
    """Fake forward proxy: for plain-http proxying the full URL arrives in
    the request line; respond directly (no upstream needed) and record it."""

    requests: list[str] = []
    status = 200
    tag = b"via-proxy"

    def log_message(self, *a):
        pass

    def do_GET(self):
        type(self).requests.append(self.path)
        if type(self).status != 200:
            self.send_error(type(self).status)
            return
        body = type(self).tag
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def _serve(handler_cls):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


@pytest.fixture()
def site():
    _SiteHandler.hits = {}
    srv, base = _serve(_SiteHandler)
    yield base
    srv.shutdown()
    srv.server_close()


def test_live_fetch_batch_columns(site):
    f = HttpFetcher(timeout_s=5.0, retries=0)
    out = f(pa.table({"url": [f"{site}/ok", f"{site}/missing"]}))
    assert out.column("status_code").to_pylist() == [200, 404]
    assert out.column("html").to_pylist()[0] == "<html><title>ok</title></html>"
    assert out.column("content_bytes").to_pylist()[0] == 30
    assert out.column("html").to_pylist()[1] == ""


def test_selective_retry_policy(site):
    # 403 retries until success (HttpClient.ts retries 403/429)...
    f = HttpFetcher(timeout_s=5.0, retries=3)
    status, html, nb = f._fetch_one(f"{site}/flaky403")
    assert (status, html) == (200, "third time lucky")
    assert _SiteHandler.hits["/flaky403"] == 3
    # ...non-retryable 4xx returns after ONE attempt...
    status, _, _ = f._fetch_one(f"{site}/teapot")
    assert status == 418
    assert _SiteHandler.hits["/teapot"] == 1
    # ...5xx retries to exhaustion then reports the last status
    status, _, _ = f._fetch_one(f"{site}/always500")
    assert status == 500
    assert _SiteHandler.hits["/always500"] == 4  # initial + 3 retries


def test_connection_refused_yields_599():
    # nothing listens on this port: OSError path -> 599 after retries
    f = HttpFetcher(timeout_s=0.5, retries=1)
    status, html, nb = f._fetch_one("http://127.0.0.1:9/none")
    assert (status, html, nb) == (599, "", 0)


def test_proxy_rotation_on_retry(site):
    class _BadProxy(_ProxyHandler):
        requests: list[str] = []
        status = 403

    class _GoodProxy(_ProxyHandler):
        requests: list[str] = []
        status = 200

    bad_srv, bad = _serve(_BadProxy)
    good_srv, good = _serve(_GoodProxy)
    try:
        f = HttpFetcher(timeout_s=5.0, retries=3, proxies=[bad, good])
        target = "http://upstream.invalid/page"  # only reachable VIA proxy
        status, html, _ = f._fetch_one(target)
        assert (status, html) == (200, "via-proxy")
        # attempt 0 hit the bad proxy (403 -> retry), attempt 1 rotated
        assert _BadProxy.requests == [target]
        assert _GoodProxy.requests == [target]
    finally:
        bad_srv.shutdown(), bad_srv.server_close()
        good_srv.shutdown(), good_srv.server_close()


def test_proxy_receives_absolute_url(site):
    class _P(_ProxyHandler):
        requests: list[str] = []
        status = 200

    srv, proxy = _serve(_P)
    try:
        f = HttpFetcher(timeout_s=5.0, retries=0, proxies=[proxy])
        status, html, _ = f._fetch_one("http://origin.invalid/a/b?c=1")
        assert status == 200 and html == "via-proxy"
        assert _P.requests == ["http://origin.invalid/a/b?c=1"]
    finally:
        srv.shutdown()
        srv.server_close()
