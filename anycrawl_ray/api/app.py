"""The API app: route table + middleware chain, callable in-process.

Mirrors ``apps/api/src/index.ts`` (middleware order: public routes →
auth → checkCredits → deductCredits → v1 router) and
``routers/v1/index.ts`` (the 22-route table) without a web framework:
``App.request(method, path, ...)`` builds a :class:`Request`, runs the
chain and returns ``(status, payload)`` exactly as Express would send
it.  ``App.serve()`` optionally exposes the same dispatch over stdlib
``http.server`` for manual use; tests and the CLI drive ``request()``
directly, so no socket is needed for parity checks.

Reference files: apps/api/src/index.ts:52-72 (mount order),
middlewares/AuthMiddleware.ts:6-76, CheckCreditsMiddleware.ts:6-67,
DeductCreditsMiddleware.ts:12-52, utils/ipUtils.ts:13-101.
"""

from __future__ import annotations

import ipaddress
import json
import re
import urllib.parse

from . import controllers as c
from .store import ApiState


class Request:
    """What the Express handlers see: body/params/query plus the fields
    middlewares and controllers hang on the request object
    (``req.auth``, ``req.creditsUsed``, ``req.jobId``)."""

    def __init__(self, method: str, path: str, body=None, headers=None,
                 query=None, base_url: str = "http://localhost:8080"):
        self.method = method.upper()
        self.path = path
        self.body = body if body is not None else {}
        self.headers = {k.lower(): v for k, v in (headers or {}).items()}
        # parse_qs-shaped: every value is a list (the controllers index
        # [0], matching the reference's query-string access)
        self.query = {k: (v if isinstance(v, list) else [v])
                      for k, v in (query or {}).items()}
        self.params: dict = {}
        self.base_url = base_url
        self.auth = None
        self.check_credits = False
        self.credits_used: int | None = None
        self.job_id: str | None = None


# (method, path-template) -> handler; ":name" segments bind req.params.
# Table order mirrors routers/v1/index.ts:16-46 + public.ts:8.
ROUTES = [
    ("POST", "/v1/scrape", c.scrape_handle),
    ("POST", "/v1/search", c.search_handle),
    ("POST", "/v1/crawl", c.crawl_start),
    ("GET", "/v1/crawl/:jobId/status", c.crawl_status),
    # the reference's Express router mounts results only at
    # GET /v1/crawl/:jobId, yet CrawlController.ts:242 emits `next` links
    # to /v1/crawl/:jobId/results — serve both so the self-issued link
    # dereferences (the SDK rebuilds the URL and never notices)
    ("GET", "/v1/crawl/:jobId/results", c.crawl_results),
    ("GET", "/v1/crawl/:jobId", c.crawl_results),
    ("DELETE", "/v1/crawl/:jobId", c.crawl_cancel),
    ("POST", "/v1/scheduled-tasks", c.tasks_create),
    ("GET", "/v1/scheduled-tasks", c.tasks_list),
    ("GET", "/v1/scheduled-tasks/:taskId", c.tasks_get),
    ("PUT", "/v1/scheduled-tasks/:taskId", c.tasks_update),
    ("PATCH", "/v1/scheduled-tasks/:taskId/pause", c.tasks_pause),
    ("PATCH", "/v1/scheduled-tasks/:taskId/resume", c.tasks_resume),
    ("DELETE", "/v1/scheduled-tasks/:taskId", c.tasks_delete),
    ("GET", "/v1/scheduled-tasks/:taskId/executions", c.tasks_executions),
    ("POST", "/v1/webhooks", c.webhooks_create),
    ("GET", "/v1/webhooks", c.webhooks_list),
    ("GET", "/v1/webhooks/:webhookId", c.webhooks_get),
    ("PUT", "/v1/webhooks/:webhookId", c.webhooks_update),
    ("DELETE", "/v1/webhooks/:webhookId", c.webhooks_delete),
    ("GET", "/v1/webhooks/:webhookId/deliveries", c.webhooks_deliveries),
    ("POST", "/v1/webhooks/:webhookId/test", c.webhooks_test),
    ("PUT", "/v1/webhooks/:webhookId/activate", c.webhooks_activate),
    ("PUT", "/v1/webhooks/:webhookId/deactivate", c.webhooks_deactivate),
    ("POST", "/v1/webhooks/:webhookId/deliveries/:deliveryId/replay",
     c.webhooks_replay),
    ("GET", "/v1/webhook-events", c.webhooks_events),
]

PUBLIC_ROUTES = [
    ("GET", "/v1/public/storage/file/:path", c.file_get),
]


def _compile(template: str):
    parts = []
    names = []
    for seg in template.split("/"):
        if seg.startswith(":"):
            names.append(seg[1:])
            # :path (file route) may span slashes, like Express's greedy
            # match on the final param when the client URL-encodes "/".
            parts.append("([^/]+)" if seg != ":path" else "(.+)")
        else:
            parts.append(re.escape(seg))
    return re.compile("^" + "/".join(parts) + "$"), names


_COMPILED = [(m, *_compile(t), h) for m, t, h in ROUTES]
_COMPILED_PUBLIC = [(m, *_compile(t), h) for m, t, h in PUBLIC_ROUTES]


def _match(table, method: str, path: str):
    for m, rx, names, handler in table:
        if m != method:
            continue
        mo = rx.match(path)
        if mo:
            return handler, dict(zip(names, mo.groups()))
    return None, None


# ------------------------------------------------------------ middlewares

def get_client_ip(req: Request) -> str | None:
    """ipUtils.ts:13-49 — CF-Connecting-IP, X-Forwarded-For (first hop),
    X-Real-IP, else the socket address the caller stamped."""
    for header in ("cf-connecting-ip", "x-forwarded-for", "x-real-ip"):
        v = req.headers.get(header)
        if v:
            return v.split(",")[0].strip()
    return req.headers.get("remote-addr")


def is_ip_allowed(ip: str | None, whitelist) -> bool:
    """ipUtils.ts:58-101 — empty whitelist allows all; unknown client IP
    denies; entries are exact IPs or CIDR ranges."""
    if not whitelist:
        return True
    if not ip:
        return False
    try:
        addr = ipaddress.ip_address(ip)
    except ValueError:
        return False
    for pattern in whitelist:
        try:
            if "/" in pattern:
                if addr in ipaddress.ip_network(pattern, strict=False):
                    return True
            elif addr == ipaddress.ip_address(pattern):
                return True
        except ValueError:
            continue
    return False


def _auth_middleware(state: ApiState, req: Request):
    """AuthMiddleware.ts:6-76; returns an (status, payload) short-circuit
    or None to continue."""
    if not state.auth_enabled:
        return None
    header = req.headers.get("authorization")
    if not header:
        return 401, {"success": False,
                     "error": "No authorization header provided"}
    parts = header.split(" ")
    if len(parts) != 2 or parts[0] != "Bearer":
        return 401, {"success": False,
                     "error": "Invalid authorization header format"}
    key = state.api_keys.get(parts[1])
    if key is None:
        return 401, {"success": False, "error": "Invalid API key"}
    if not key.is_active:
        return 401, {"success": False, "error": "API key is inactive"}
    if key.allowed_ips:
        client_ip = get_client_ip(req)
        if not is_ip_allowed(client_ip, key.allowed_ips):
            return 403, {"success": False, "error": "IP address not allowed",
                         "clientIp": client_ip or "unknown"}
    req.auth = key
    return None


def _check_credits_middleware(state: ApiState, req: Request):
    """CheckCreditsMiddleware.ts:6-67 — 402 at <=0 credits (negative
    balances are allowed to exist, just not to spend)."""
    if not (state.auth_enabled and state.credits_enabled):
        return None
    req.check_credits = True
    if req.auth is None:
        return 401, {"success": False, "error": "Authentication required"}
    if req.auth.credits <= 0:
        return 402, {"success": False, "error": "Insufficient credits",
                     "current_credits": req.auth.credits}
    return None


def _deduct_credits(state: ApiState, req: Request, status: int) -> None:
    """DeductCreditsMiddleware.ts:27-52 — on response finish, successful
    (2xx/3xx) requests with creditsUsed > 0 deduct from the key and add
    to the job row."""
    if not (state.auth_enabled and state.credits_enabled):
        return
    used = req.credits_used
    if not used or used <= 0 or not (200 <= status < 400):
        return
    if req.auth is not None:
        req.auth.credits -= used
    if req.job_id and req.job_id in state.jobs:
        state.jobs[req.job_id].credits_used += used


# ------------------------------------------------------------ the app

class App:
    """One API instance over one :class:`ApiState`."""

    def __init__(self, state: ApiState | None = None, **state_kw):
        self.state = state or ApiState(**state_kw)

    def request(self, method: str, path: str, body=None, headers=None,
                query=None) -> tuple[int, object]:
        """Dispatch exactly as index.ts mounts: /, /health and
        /v1/public before auth; everything else behind the chain."""
        path, _, qs = path.partition("?")
        query = {k: (v if isinstance(v, list) else [v])
                 for k, v in (query or {}).items()}
        if qs:
            for k, vs in urllib.parse.parse_qs(
                    qs, keep_blank_values=True).items():
                query.setdefault(k, vs)
        req = Request(method, path, body=body, headers=headers, query=query)

        if req.method == "GET" and path == "/":
            return 200, "Hello World"
        if req.method == "GET" and path == "/health":
            return 200, {"status": "ok"}

        handler, params = _match(_COMPILED_PUBLIC, req.method, path)
        if handler is None:
            for mw in (_auth_middleware, _check_credits_middleware):
                short = mw(self.state, req)
                if short is not None:
                    return short
            handler, params = _match(_COMPILED, req.method, path)
        if handler is None:
            # Express default 404 body
            return 404, f"Cannot {req.method} {path}"

        req.params = {k: urllib.parse.unquote(v)
                      for k, v in params.items()}
        try:
            result = handler(self.state, req)
        except c.ApiError as exc:
            status, payload = exc.status, exc.payload
        except Exception as exc:  # router error handler (index.ts:49-52)
            status, payload = 500, "Something broke!"
            del exc
        else:
            if isinstance(result, tuple):
                status, payload = result
            else:  # file_get returns raw bytes
                status, payload = 200, result
        _deduct_credits(self.state, req, status)
        return status, payload

    # -- optional real server (manual use + live-socket tests) -----------

    def make_server(self, port: int = 0):
        """Build (not start) the stdlib HTTP front: returns a
        ``ThreadingHTTPServer`` bound to 127.0.0.1:``port`` (0 = ephemeral,
        read the bound port from ``server.server_address``). ``serve()``
        runs it forever for interactive use; tests run it in a thread and
        drive the SDK's ``UrllibTransport`` against it."""
        import http.server

        app = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def _run(self):
                length = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(length) if length else b""
                try:
                    body = json.loads(raw) if raw else None
                except json.JSONDecodeError:
                    self._send(400, {"success": False,
                                     "error": "invalid JSON body"})
                    return
                headers = {k: v for k, v in self.headers.items()}
                headers.setdefault("remote-addr", self.client_address[0])
                status, payload = app.request(self.command, self.path,
                                              body=body, headers=headers)
                self._send(status, payload)

            def _send(self, status, payload):
                if isinstance(payload, bytes):
                    data, ctype = payload, "application/octet-stream"
                elif isinstance(payload, str):
                    data, ctype = payload.encode(), "text/plain"
                else:
                    data = json.dumps(payload).encode()
                    ctype = "application/json"
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):  # quiet
                pass

            do_GET = do_POST = do_PUT = do_PATCH = do_DELETE = _run

        return http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)

    def serve(self, port: int = 8080):  # pragma: no cover - manual tool
        """Minimal stdlib HTTP front for interactive use."""
        self.make_server(port).serve_forever()
