"""AnyCrawl SDK client — the rebuild of ``packages/js-sdk/src/index.ts``.

Thin wrappers over the HTTP API with the reference's error
normalization, auth-failure callback and poll-and-aggregate ``crawl()``
(including its quirks: cancelled jobs break the poll loop without
raising, and pagination advances ``skip`` by the aggregate length,
js-sdk index.ts:229-301).

The HTTP layer is injectable: ``transport(method, path, body) ->
(status, payload)``.  The default transport speaks real HTTP via
urllib against ``base_url``; tests (and embedded use) pass
``InProcessTransport(app)`` to drive an ``api.app.App`` directly — same
envelopes, no socket.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request


class InProcessTransport:
    """Drive an ``anycrawl_ray.api.app.App`` without a socket."""

    def __init__(self, app, headers: dict | None = None) -> None:
        self.app = app
        self.headers = dict(headers or {})

    def __call__(self, method: str, path: str, body, headers: dict):
        return self.app.request(method, path, body=body,
                                headers={**self.headers, **headers})


class UrllibTransport:
    """Real-HTTP transport (axios.create equivalent; 300 s timeout)."""

    def __init__(self, base_url: str, timeout: float = 300.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def __call__(self, method: str, path: str, body, headers: dict):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(self.base_url + path, data=data,
                                     method=method, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, json.loads(resp.read() or b"null")
        except urllib.error.HTTPError as e:
            raw = e.read()
            try:
                payload = json.loads(raw) if raw else None
            except json.JSONDecodeError:
                payload = raw.decode(errors="replace")
            return e.code, payload
        except OSError:
            # axios "error.request" branch (index.ts:95-97)
            raise ConnectionError(
                "Network error: Unable to reach AnyCrawl API")


class AnyCrawlClient:
    """js-sdk AnyCrawlClient: scrape / crawl / search / job management."""

    def __init__(self, api_key: str = "",
                 base_url: str = "https://api.anycrawl.dev",
                 on_auth_failure=None, transport=None,
                 sleep=time.sleep, clock=time.monotonic) -> None:
        self.api_key = api_key
        self.base_url = base_url
        self.on_auth_failure = on_auth_failure
        self.transport = transport or UrllibTransport(base_url)
        self._sleep = sleep
        self._clock = clock

    def set_auth_failure_callback(self, callback) -> None:
        self.on_auth_failure = callback

    # -- plumbing ---------------------------------------------------------

    def _headers(self) -> dict:
        h = {"Content-Type": "application/json"}
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        return h

    def _request(self, method: str, path: str, body=None):
        """One call + the normalizeAxiosError mapping (index.ts:78-101)."""
        status, payload = self.transport(method, path, body,
                                         self._headers())
        if 200 <= status < 300:
            return payload
        msg = "Unknown error"
        if isinstance(payload, dict):
            msg = payload.get("error") or payload.get("message") or msg
        if status in (401, 403):
            if self.on_auth_failure is not None:
                self.on_auth_failure()
            raise RuntimeError(f"Authentication failed: {msg}")
        if status == 402 and isinstance(payload, dict) \
                and isinstance(payload.get("current_credits"), (int, float)):
            raise RuntimeError(f"Payment required: {msg}. "
                               f"current_credits={payload['current_credits']}")
        raise RuntimeError(f"API Error {status}: {msg}")

    # -- endpoints --------------------------------------------------------

    def health_check(self) -> dict:
        return self._request("GET", "/health")

    _SCRAPE_FIELDS = ("proxy", "formats", "timeout", "retry", "wait_for",
                      "include_tags", "exclude_tags", "json_options",
                      "extract_source")

    def scrape(self, url: str, engine: str = "playwright", **options) -> dict:
        """methods/scrape.ts — body keeps only the known, non-None
        fields; non-success 200s raise with the payload error."""
        body = {"url": url, "engine": engine}
        for k in self._SCRAPE_FIELDS:
            if options.get(k) is not None:
                body[k] = options[k]
        payload = self._request("POST", "/v1/scrape", body)
        if not payload.get("success"):
            raise RuntimeError(payload.get("error") or "Scraping failed")
        return payload["data"]

    def create_crawl(self, url: str, engine: str = "playwright",
                     **options) -> dict:
        """methods/crawl.ts createCrawl."""
        body = {"url": url, "engine": engine}
        body.update({k: v for k, v in options.items() if v is not None})
        payload = self._request("POST", "/v1/crawl", body)
        if not payload.get("success"):
            raise RuntimeError(payload.get("error")
                               or "Failed to create crawl")
        return payload["data"]

    def get_crawl_status(self, job_id: str) -> dict:
        payload = self._request("GET", f"/v1/crawl/{job_id}/status")
        if not payload.get("success"):
            raise RuntimeError(payload.get("error")
                               or "Failed to get crawl status")
        return payload["data"]

    def get_crawl_results(self, job_id: str, skip: int = 0) -> dict:
        return self._request("GET", f"/v1/crawl/{job_id}?skip={skip}")

    def cancel_crawl(self, job_id: str) -> dict:
        payload = self._request("DELETE", f"/v1/crawl/{job_id}")
        if not payload.get("success"):
            raise RuntimeError(payload.get("error")
                               or "Failed to cancel crawl")
        return payload["data"]

    def search(self, query: str, **options) -> list:
        """methods/search.ts — returns the result list."""
        body = {"query": query}
        body.update({k: v for k, v in options.items() if v is not None})
        payload = self._request("POST", "/v1/search", body)
        if not payload.get("success"):
            raise RuntimeError(payload.get("error") or "Search failed")
        return payload["data"]

    def crawl(self, url: str, engine: str = "playwright",
              poll_interval_seconds: float = 2.0,
              timeout_ms: float | None = None, **options) -> dict:
        """createCrawl + poll to terminal state + aggregate every results
        page (index.ts:229-301). Failed jobs raise; cancelled jobs break
        and aggregate what exists (the reference's commented-out throw)."""
        started = self.create_crawl(url, engine=engine, **options)
        job_id = started["job_id"]
        t0 = self._clock()
        while True:
            status = self.get_crawl_status(job_id)
            if status["status"] == "completed":
                break
            if status["status"] == "failed":
                raise RuntimeError(f"Crawl failed (job_id={job_id})")
            if status["status"] == "cancelled":
                break
            if timeout_ms is not None \
                    and (self._clock() - t0) * 1000 > timeout_ms:
                raise RuntimeError(
                    f"Crawl timed out after {timeout_ms}ms "
                    f"(job_id={job_id})")
            self._sleep(max(0.0, poll_interval_seconds))

        aggregated: list = []
        skip = 0
        total = completed = credits_used = 0
        while True:
            page = self.get_crawl_results(job_id, skip)
            if isinstance(page.get("total"), (int, float)):
                total = page["total"]
            if isinstance(page.get("completed"), (int, float)):
                completed = page["completed"]
            if isinstance(page.get("creditsUsed"), (int, float)):
                credits_used = page["creditsUsed"]
            if isinstance(page.get("credits_used"), (int, float)):
                credits_used = page["credits_used"]
            if page.get("data"):
                aggregated.extend(page["data"])
            if page.get("next"):
                skip = len(aggregated)
            else:
                break
        return {"job_id": job_id, "status": "completed", "total": total,
                "completed": completed, "creditsUsed": credits_used,
                "data": aggregated}
