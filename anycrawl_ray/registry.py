"""Engine registry — the rebuild of ``EngineFactoryRegistry``
(packages/scrape/src/engines/EngineFactory.ts:141-170, SURVEY.md §2.10).

Engines are (fetcher_factory, description) pairs keyed by name; pipelines
resolve fetch stages through this registry so user code can plug in new
fetchers (a browser engine, an API-backed fetcher) without touching the
crawl driver — the reference's ``EngineFactoryRegistry.register`` surface.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, dict] = {}


def register_engine(name: str, fetcher_factory: Callable, *, description: str = "",
                    overwrite: bool = False) -> None:
    """Register a fetch-stage factory. ``fetcher_factory(pages_or_ref) ->
    callable(batch) -> batch`` (the map_batches contract). Registering an
    existing name without ``overwrite`` raises, like the reference's
    duplicate-registration guard."""
    if name in _REGISTRY and not overwrite:
        raise ValueError(f"engine '{name}' is already registered")
    _REGISTRY[name] = {"factory": fetcher_factory, "description": description}


def get_engine(name: str) -> Callable:
    try:
        return _REGISTRY[name]["factory"]
    except KeyError:
        raise ValueError(
            f"unknown engine '{name}' (registered: {sorted(_REGISTRY)})"
        ) from None


def available_engines() -> list[str]:
    return sorted(_REGISTRY)


def _register_defaults() -> None:
    from .stages.browser import BrowserSimFetcher
    from .stages.fetch import HttpFetcher, SyntheticFetcher

    if "cheerio" not in _REGISTRY:
        # 'cheerio' = plain HTTP + HTML parse in the reference; in-sandbox
        # the network is the synthetic page table
        register_engine("cheerio", SyntheticFetcher,
                        description="HTTP+parse engine (synthetic resolver in sandbox)")
    if "http" not in _REGISTRY:
        register_engine("http", lambda *_a, **_k: HttpFetcher(),
                        description="real-network HTTP fetcher (no network in sandbox)")
    if "browser-sim" not in _REGISTRY:
        # the Playwright/Puppeteer seam: honors wait_for / wait_until /
        # wait_for_selector / ad-block / screenshot options (S4/M16/M25/M26)
        register_engine("browser-sim", BrowserSimFetcher,
                        description="browser engine simulation (waits, ad-block, screenshots)")
    if "playwright" not in _REGISTRY:
        from .stages.browser import PlaywrightFetcher, _playwright_available

        if _playwright_available():
            # real browser transport (same batch contract as browser-sim);
            # only listed when the playwright package is importable so
            # sandbox/sim behavior is unchanged
            register_engine("playwright", PlaywrightFetcher,
                            description="Playwright browser engine (real network)")


_register_defaults()
