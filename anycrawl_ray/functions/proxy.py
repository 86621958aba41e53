"""Proxy rule matching + tier rotation (SURVEY.md M22/M23).

Reference: packages/scrape/src/managers/Proxy.ts —

- rule priority: exact URL > wildcard URL pattern > wildcard domain
  pattern (Proxy.ts:716-750);
- wildcard compilation: escape regex specials, ``*`` -> ``.*``,
  ``?`` -> ``.``, case-insensitive full match (Proxy.ts:500-524);
- mode -> tier resolution: ``auto`` = [base, stealth] (upgrade on retry),
  ``base`` = [base], ``stealth`` = [stealth, base] (downgrade on failure),
  custom URL = [url] (Proxy.ts:589-699);
- per-fetcher round-robin rotation within a tier (M23) — the counter is
  fetch-actor state.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit


def _wildcard_regex(pattern: str) -> re.Pattern:
    escaped = re.sub(r"[.+^${}()|\[\]\\]", lambda m: "\\" + m.group(0), pattern)
    escaped = escaped.replace("*", ".*").replace("?", ".")
    return re.compile(f"^{escaped}$", re.I)


@dataclass
class ProxyRule:
    proxy: str
    url: str | None = None  # exact
    pattern: str | None = None  # wildcard URL
    domain: str | None = None  # wildcard domain


@dataclass
class ProxyConfig:
    rules: list[ProxyRule] = field(default_factory=list)
    base_url: str | None = None
    stealth_url: str | None = None

    def find_proxy_for_url(self, request_url: str) -> str | None:
        """Rule matching in priority order (Proxy.ts:716-750)."""
        try:
            host = (urlsplit(request_url).hostname or "")
        except ValueError:
            return None
        for rule in self.rules:
            if rule.url and rule.url == request_url:
                return rule.proxy
        for rule in self.rules:
            if rule.pattern and _wildcard_regex(rule.pattern).match(request_url):
                return rule.proxy
        for rule in self.rules:
            if rule.domain and _wildcard_regex(rule.domain).match(host):
                return rule.proxy
        return None

    def resolve_tiers(self, proxy_value: str | None) -> list[str]:
        """mode/custom-URL -> ordered tier list (Proxy.ts:589-699)."""
        if proxy_value in (None, "", "auto"):
            tiers = [u for u in (self.base_url, self.stealth_url) if u]
            return tiers
        if proxy_value == "base":
            return [self.base_url] if self.base_url else []
        if proxy_value == "stealth":
            return [u for u in (self.stealth_url, self.base_url) if u]
        return [proxy_value]  # custom URL


class ProxyRotator:
    """Per-fetcher rotation state (M23): round-robin within a proxy list."""

    def __init__(self, proxies: list[str]) -> None:
        self.proxies = list(proxies)
        self._i = 0

    def next(self) -> str | None:
        if not self.proxies:
            return None
        p = self.proxies[self._i % len(self.proxies)]
        self._i += 1
        return p
