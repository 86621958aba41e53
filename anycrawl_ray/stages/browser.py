"""Browser-engine seam: a fake "browser" fetch stage honoring the browser
option surface so a real Playwright/Puppeteer drop-in is an import swap,
not a refactor (S4/M16/M25/M26).

Semantics reproduced (against the synthetic page table — no real browser
in this sandbox):

- **viewport** (EngineConfigurator.ts:152-165): 1920x1080 enforced once
  per page; recorded in the ``viewport`` column;
- **wait_until** (EngineConfigurator.ts:205-211 requestTimeoutHook):
  navigation wait mode, default ``domcontentloaded``; validated and
  recorded;
- **wait_for** (Base.ts:791-800): fixed post-nav delay in ms, browser-only
  — simulated (recorded in ``sim_wait_ms``, not slept: at data scale the
  simulation must not serialize on fake latency);
- **wait_for_selector** (Base.ts:741-788): string | {selector, timeout,
  state} | list thereof; each selector is "waited for" against the page
  DOM — present == resolved, absent == timeout, which the reference
  catches and logs (crawl continues). Hits recorded in ``selector_hits``;
- **ad blocking** (EngineConfigurator.ts:177-202 + AD_DOMAINS,
  packages/libs/src/constants.ts:4-18): sub-resource requests (img/script
  src in the DOM) whose URL contains an ad domain are aborted — counted in
  ``ads_blocked`` and their bytes never fetched;
- **screenshot** (ScreenshotTransformer.ts:20-139): when a screenshot
  format is requested, a deterministic fake JPEG payload is produced per
  page and exposed as the ``screenshot`` binary column with its
  ``screenshot://{md5_8(url)}`` media key (the parse stage emits the
  matching span).

The stage obeys the engine-registry contract: construct with
``(pages_or_ref, options=job_dict)``, call per Arrow batch, append
``status_code / html / content_bytes`` plus the browser columns.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .fetch import build_lookup

# packages/libs/src/constants.ts:4-18 (data table, transcribed)
AD_DOMAINS = (
    "doubleclick.net",
    "adservice.google.com",
    "googlesyndication.com",
    "googletagservices.com",
    "googletagmanager.com",
    "google-analytics.com",
    "adsystem.com",
    "adservice.com",
    "adnxs.com",
    "ads-twitter.com",
    "facebook.net",
    "fbcdn.net",
    "amazon-adsystem.com",
)

WAIT_UNTIL_MODES = ("load", "domcontentloaded", "networkidle", "commit")

VIEWPORT = (1920, 1080)


def _md5_8(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:8]


def fake_screenshot_bytes(url: str) -> bytes:
    """Deterministic stand-in for the JPEG buffer the browser would
    produce: a JPEG SOI/EOI-framed digest payload (stable per URL)."""
    digest = hashlib.md5(url.encode()).digest()
    return b"\xff\xd8\xff\xe0" + digest + b"\xff\xd9"


def normalize_wait_for_selector(value) -> list[dict]:
    """Base.ts:753-766: string | {selector, timeout?, state?} | list of
    either -> [{selector, timeout, state}] with state default 'visible';
    entries without a selector are skipped."""
    if not value:
        return []
    entries = value if isinstance(value, list) else [value]
    out: list[dict] = []
    for entry in entries:
        if isinstance(entry, str):
            out.append({"selector": entry, "timeout": None, "state": "visible"})
        elif isinstance(entry, dict) and entry.get("selector"):
            out.append({"selector": entry["selector"],
                        "timeout": entry.get("timeout"),
                        "state": entry.get("state", "visible")})
    return out


# per-worker storage cache (one LocalDirStorage per blob root per process)
_STORAGE_CACHE: dict[str, object] = {}


def persist_screenshots(batch: pa.Table, blob_dir: str, job_id: str,
                        full_page: bool = False) -> int:
    """Worker-side screenshot sink (S7): write each non-empty screenshot
    payload to the blob store under the ScreenshotTransformer key scheme.
    The binary never crosses the driver — this runs inside the fetch+parse
    worker before the parse stage drops the column. Returns blobs written."""
    from ..state.blobstore import get_storage, screenshot_key

    storage = _STORAGE_CACHE.get(blob_dir)
    if storage is None:
        if len(_STORAGE_CACHE) > 4:
            _STORAGE_CACHE.clear()
        storage = get_storage(blob_dir)
        _STORAGE_CACHE[blob_dir] = storage
    urls = batch.column("url").to_pylist()
    shots = batch.column("screenshot").to_pylist()
    n = 0
    for url, shot in zip(urls, shots):
        if shot:
            storage.upload_image(
                screenshot_key(job_id, _md5_8(url), full_page), shot)
            n += 1
    return n


class BrowserSimFetcher:
    """Registry-pluggable browser engine simulation (see module docstring).

    Actor-pool shape: the page lookup plus parsed wait options live in
    ``__init__`` (once per actor/worker); ``__call__`` is per Arrow batch.
    """

    def __init__(self, pages_or_ref, options: dict | None = None) -> None:
        import ray

        pages = (ray.get(pages_or_ref)
                 if not isinstance(pages_or_ref, pa.Table) else pages_or_ref)
        self.lookup = build_lookup(pages)
        options = options or {}
        self.wait_until = options.get("wait_until") or "domcontentloaded"
        if self.wait_until not in WAIT_UNTIL_MODES:
            raise ValueError(
                f"wait_until must be one of {WAIT_UNTIL_MODES}, "
                f"got {self.wait_until!r}")
        self.wait_for_ms = int(options.get("wait_for") or 0)
        self.selectors = normalize_wait_for_selector(
            options.get("wait_for_selector"))
        formats = options.get("formats") or []
        self.capture_screenshot = any(
            f in ("screenshot", "screenshot@fullPage") for f in formats)
        # compiled once per actor: selector matching uses the mini-DOM
        from ..functions.htmldom import parse_html

        self._parse_html = parse_html

    # -- per page ---------------------------------------------------------
    def _simulate(self, url: str) -> tuple[int, str, int, int, int, int, bytes]:
        status, html, nbytes = self.lookup.get(url, (404, "", 0))
        ads_blocked = 0
        selector_hits = 0
        wait_ms = self.wait_for_ms
        if status and html:
            root = self._parse_html(html)
            # ad blocking: sub-resource requests whose URL contains an ad
            # domain are aborted before fetch
            for node in root.select("img") + root.select("script"):
                src = node.get("src") or ""
                if any(d in src for d in AD_DOMAINS):
                    ads_blocked += 1
            for entry in self.selectors:
                found = bool(root.select(entry["selector"]))
                if entry["state"] in ("hidden", "detached"):
                    found = not found
                if found:
                    selector_hits += 1
                else:
                    # reference catches the timeout and continues; the
                    # full configured timeout elapses (explicit 0 is a
                    # real value, only None means the 30 s default)
                    t = entry["timeout"]
                    wait_ms += int(t if t is not None else 30_000)
        shot = (fake_screenshot_bytes(url)
                if self.capture_screenshot and status and html else b"")
        return status, html, nbytes, wait_ms, ads_blocked, selector_hits, shot

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        rows = [self._simulate(u) for u in urls]
        return (
            batch.append_column("status_code",
                                pa.array([r[0] for r in rows], pa.int32()))
            .append_column("html", pa.array([r[1] for r in rows], pa.string()))
            .append_column("content_bytes",
                           pa.array([r[2] for r in rows], pa.int64()))
            .append_column("sim_wait_ms",
                           pa.array([r[3] for r in rows], pa.int64()))
            .append_column("ads_blocked",
                           pa.array([r[4] for r in rows], pa.int32()))
            .append_column("selector_hits",
                           pa.array([r[5] for r in rows], pa.int32()))
            .append_column("screenshot",
                           pa.array([r[6] for r in rows], pa.binary()))
            .append_column("viewport",
                           pa.array([f"{VIEWPORT[0]}x{VIEWPORT[1]}"] * len(rows),
                                    pa.string()))
        )


def _playwright_available() -> bool:
    try:
        import playwright.sync_api  # noqa: F401

        return True
    except ImportError:
        return False


class PlaywrightFetcher:
    """Real browser transport in the BrowserSimFetcher slot (S4): same
    batch contract and output columns, driven by Playwright instead of the
    page-table simulation. Import-guarded — the class only registers when
    the playwright package is importable (never in this sandbox), so sim
    behavior is untouched.

    Semantics ported from the reference browser configuration
    (core/EngineConfigurator.ts:151-274 + engines/Playwright.ts:26-55):

    - one browser + context per actor (``__init__``), pages per URL;
    - enforced 1920x1080 viewport (configureBrowserEngine viewportHook);
    - ad blocking via ``page.route('**/*')`` aborting any request whose
      URL contains an AD_DOMAINS entry, counted per page (adBlockingHook);
    - ``goto`` timeout from options.timeout (default 30 s) and
      ``wait_until`` (default domcontentloaded) — requestTimeoutHook;
    - ``wait_for`` -> ``wait_for_timeout``; ``wait_for_selector`` entries
      honor state + per-entry timeout, a TimeoutError is swallowed and
      the full timeout elapses (EngineConfigurator wait handling, same
      rule the sim implements);
    - screenshot / screenshot@fullPage via ``page.screenshot``.
    """

    def __init__(self, _pages_or_ref=None, options: dict | None = None) -> None:
        # _pages_or_ref is accepted (registry factory signature parity)
        # and ignored: the real transport resolves over the network.
        if not _playwright_available():
            raise RuntimeError(
                "PlaywrightFetcher requires the 'playwright' package "
                "(pip install playwright && playwright install chromium); "
                "use engine='browser-sim' in environments without it")
        from playwright.sync_api import sync_playwright

        options = options or {}
        self.wait_until = options.get("wait_until") or "domcontentloaded"
        if self.wait_until not in WAIT_UNTIL_MODES:
            raise ValueError(
                f"wait_until must be one of {WAIT_UNTIL_MODES}, "
                f"got {self.wait_until!r}")
        self.timeout_ms = int(options.get("timeout") or 30_000)
        self.wait_for_ms = int(options.get("wait_for") or 0)
        self.selectors = normalize_wait_for_selector(
            options.get("wait_for_selector"))
        formats = options.get("formats") or []
        self.full_page = "screenshot@fullPage" in formats
        self.capture_screenshot = self.full_page or "screenshot" in formats
        self._pw = sync_playwright().start()
        self._browser = self._pw.chromium.launch(headless=True)
        self._context = self._browser.new_context(
            viewport={"width": VIEWPORT[0], "height": VIEWPORT[1]})

    def _fetch(self, url: str):
        from playwright.sync_api import Error as PwError
        from playwright.sync_api import TimeoutError as PwTimeout

        page = self._context.new_page()
        blocked = [0]

        def route_filter(route):
            if any(d in route.request.url for d in AD_DOMAINS):
                blocked[0] += 1
                return route.abort()
            return route.continue_()

        try:
            page.route("**/*", route_filter)
            try:
                resp = page.goto(url, timeout=self.timeout_ms,
                                 wait_until=self.wait_until)
            except (PwTimeout, PwError):
                return 0, "", 0, 0, blocked[0], 0, b""
            status = resp.status if resp is not None else 0
            if self.wait_for_ms:
                page.wait_for_timeout(self.wait_for_ms)
            wait_ms = self.wait_for_ms
            selector_hits = 0
            for entry in self.selectors:
                t = entry["timeout"]
                t_ms = int(t if t is not None else 30_000)
                try:
                    page.wait_for_selector(entry["selector"],
                                           state=entry["state"],
                                           timeout=t_ms)
                    selector_hits += 1
                except PwTimeout:
                    # reference swallows the timeout and continues
                    wait_ms += t_ms
            html = page.content()
            shot = (page.screenshot(full_page=self.full_page)
                    if self.capture_screenshot else b"")
            return (status, html, len(html.encode("utf-8")), wait_ms,
                    blocked[0], selector_hits, shot)
        finally:
            page.close()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        rows = [self._fetch(u) for u in urls]
        return (
            batch.append_column("status_code",
                                pa.array([r[0] for r in rows], pa.int32()))
            .append_column("html", pa.array([r[1] for r in rows], pa.string()))
            .append_column("content_bytes",
                           pa.array([r[2] for r in rows], pa.int64()))
            .append_column("sim_wait_ms",
                           pa.array([r[3] for r in rows], pa.int64()))
            .append_column("ads_blocked",
                           pa.array([r[4] for r in rows], pa.int32()))
            .append_column("selector_hits",
                           pa.array([r[5] for r in rows], pa.int32()))
            .append_column("screenshot",
                           pa.array([r[6] for r in rows], pa.binary()))
            .append_column("viewport",
                           pa.array([f"{VIEWPORT[0]}x{VIEWPORT[1]}"] * len(rows),
                                    pa.string()))
        )

    def close(self) -> None:
        self._context.close()
        self._browser.close()
        self._pw.stop()

    def __del__(self):  # actor teardown
        try:
            self.close()
        except Exception:
            pass
