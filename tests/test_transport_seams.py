"""Real-transport seams (VERDICT r2 #5): the Playwright engine slot is
import-guarded — in this sandbox the package is absent, so the registry
must not list it, instantiation must fail with a clear message, and the
sim engine stays the default path."""

from __future__ import annotations

import pytest


def test_playwright_unavailable_in_sandbox():
    from anycrawl_ray.stages.browser import _playwright_available

    assert _playwright_available() is False


def test_playwright_not_registered_without_package():
    from anycrawl_ray.registry import available_engines

    engines = available_engines()
    assert "browser-sim" in engines
    assert "playwright" not in engines


def test_playwright_fetcher_clear_error():
    from anycrawl_ray.stages.browser import PlaywrightFetcher

    with pytest.raises(RuntimeError, match="requires the 'playwright'"):
        PlaywrightFetcher(None, {})


def test_playwright_fetcher_contract_matches_sim():
    """The real transport must emit the same output columns as the sim so
    the parse stage is engine-agnostic (column parity pinned statically —
    the class body appends the identical column set)."""
    import inspect

    from anycrawl_ray.stages.browser import BrowserSimFetcher, PlaywrightFetcher

    sim_src = inspect.getsource(BrowserSimFetcher.__call__)
    pw_src = inspect.getsource(PlaywrightFetcher.__call__)
    for col in ("status_code", "html", "content_bytes", "sim_wait_ms",
                "ads_blocked", "selector_hits", "screenshot", "viewport"):
        assert col in sim_src and col in pw_src
