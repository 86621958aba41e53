"""Pre-navigation capture: templates declare keyed URL rules whose first
matching network response is captured for the template's custom handlers.

Port of the preNav half of the template sandbox surface:

- rule parsing (EngineConfigurator.ts:311-330): ``{key, rules: [{type:
  exact|glob|regex, pattern}]}``; regex patterns compile anchored as
  ``^(?:pattern)$`` and an invalid regex silently never matches; glob uses
  minimatch ``{dot: true}`` (functions/patterns.glob_to_regex);
- response matching + capture (:339-380): per key, the FIRST matching
  response is captured (``done`` flips, later matches ignored); multiple
  responses for different keys accumulate independently;
- the sandboxed handler API (packages/template-client/src/sandbox/
  index.ts:39-64 createPreNavApi): ``wait(key, timeout_ms)`` -> payload or
  None on timeout (never raises), ``get(key)``, ``has(key)``. In the
  epoch-synchronous rebuild all captures for a page happen before handlers
  run, so ``wait`` degenerates to ``get`` — the signature is kept so a
  streaming-browser implementation can honor the timeout.
"""

from __future__ import annotations

import re

from ..functions.patterns import glob_to_regex


class PreNavRule:
    __slots__ = ("type", "pattern", "_re")

    def __init__(self, type: str, pattern: str) -> None:
        self.type = type if type in ("exact", "glob", "regex") else "exact"
        self.pattern = str(pattern)
        self._re = None
        if self.type == "regex":
            try:
                self._re = re.compile(f"^(?:{self.pattern})$")
            except re.error:
                self._re = None  # invalid regex: never matches (:319)
        elif self.type == "glob":
            self._re = glob_to_regex(self.pattern)

    def matches(self, url: str) -> bool:
        if self.type == "exact":
            return url == self.pattern
        if self._re is None:
            return False
        return bool(self._re.match(url))


class PreNavCapture:
    """Keyed first-match response capture + the sandbox host API."""

    def __init__(self, pre_nav_cfg) -> None:
        self._keys: list[dict] = []
        for cfg in pre_nav_cfg or []:
            key = str(cfg.get("key") or "")
            rules = [PreNavRule(r.get("type"), r.get("pattern") or "")
                     for r in (cfg.get("rules") or []) if isinstance(r, dict)]
            if key and rules:
                self._keys.append({"key": key, "rules": rules, "done": False})
        self._captured: dict[str, object] = {}

    @property
    def enabled(self) -> bool:
        return bool(self._keys)

    def pending_keys(self) -> list[str]:
        return [k["key"] for k in self._keys if not k["done"]]

    def offer_response(self, url: str, payload) -> list[str]:
        """Offer one network response; returns the keys it satisfied."""
        hit = []
        for cfg in self._keys:
            if cfg["done"]:
                continue
            if any(rule.matches(url) for rule in cfg["rules"]):
                cfg["done"] = True
                self._captured[cfg["key"]] = payload
                hit.append(cfg["key"])
        return hit

    # -- sandbox host API (sandbox/index.ts:39-64) ------------------------
    def wait(self, key: str, timeout_ms: int | None = None):
        """Returns the captured payload or None on 'timeout' (never
        raises) — sandbox contract."""
        return self._captured.get(key)

    def get(self, key: str):
        return self._captured.get(key)

    def has(self, key: str) -> bool:
        return key in self._captured
