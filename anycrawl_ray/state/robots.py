"""robots.txt cache — north_rule component (the reference itself does not
consult robots, so ``CrawlJob.obey_robots`` defaults to False for parity;
conformance fixtures are unaffected).

Per-host robots.txt is fetched once through the same page-resolver the
fetch stage uses (``http://{host}/robots.txt``), parsed with the stdlib
``urllib.robotparser`` (RFC 9309 semantics), and cached. Deployment
shapes:

- inline (driver-side) cache for the epoch driver's admission gate — the
  driver already owns admission, so the gate adds no extra hop;
- ``make_robots_actor()`` wraps the same cache as a Ray actor for
  multi-driver topologies (one shared cache per cluster, north_star's
  "robots.txt cache actor").

Missing robots.txt (404) => allow-all; HTTP errors => allow-all (the
permissive convention for 4xx).
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

from ..functions.urls import host_of


class RobotsCache:
    def __init__(self, lookup, user_agent: str = "anycrawl") -> None:
        """``lookup``: object with ``.get(url, default) -> (status, body,
        nbytes)`` — the fetch stage's page resolver (stages/fetch.py)."""
        self.lookup = lookup
        self.user_agent = user_agent
        self._parsers: dict[str, RobotFileParser | None] = {}

    def _parser_for(self, host: str, scheme: str = "http") -> RobotFileParser | None:
        if host in self._parsers:
            return self._parsers[host]
        status, body, _ = self.lookup.get(f"{scheme}://{host}/robots.txt", (404, "", 0))
        parser: RobotFileParser | None = None
        if 200 <= status < 300 and body:
            parser = RobotFileParser()
            parser.parse(body.splitlines())
        self._parsers[host] = parser
        return parser

    def allowed(self, url: str) -> bool:
        host = host_of(url)
        if not host:
            return True
        scheme = url.split(":", 1)[0].lower() if "://" in url else "http"
        parser = self._parser_for(host, scheme)
        if parser is None:
            return True  # no robots.txt => allow all
        return parser.can_fetch(self.user_agent, url)

    def allowed_batch(self, urls: list[str]) -> list[bool]:
        return [self.allowed(u) for u in urls]

    def crawl_delay(self, host: str) -> float | None:
        parser = self._parsers.get(host) or self._parser_for(host)
        if parser is None:
            return None
        delay = parser.crawl_delay(self.user_agent)
        return float(delay) if delay is not None else None


def make_robots_actor(pages_ref, user_agent: str = "anycrawl"):
    """Shared-cluster robots cache actor over a broadcast page table."""
    import ray

    from ..stages.fetch import cached_lookup

    @ray.remote(num_cpus=0)
    class RobotsCacheActor:
        def __init__(self):
            self.cache = RobotsCache(cached_lookup(pages_ref), user_agent)

        def allowed_batch(self, urls: list[str]) -> list[bool]:
            return self.cache.allowed_batch(urls)

        def crawl_delay(self, host: str):
            return self.cache.crawl_delay(host)

    return RobotsCacheActor.remote()
