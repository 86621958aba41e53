"""Template system: option merge, access control, domain restriction
validation, and template processing — the rebuild of the reference's
template surface (T7 minus the QuickJS interpreter):

- ``merge_options_with_template`` / ``deep_merge_options_with_template``:
  apps/api/src/utils/optionMerger.ts:13-68 — request options take priority,
  template fills undefined/None holes, dict-dict merges recurse (deep
  variant), arrays replace wholesale;
- ``has_template_access``: apps/api/src/utils/templateHandler.ts:29-52 —
  no current user => allow (self-hosted); owner => allow; otherwise only
  published+approved templates;
- ``DomainValidator`` port: packages/template-client/src/validator/
  domainValidator.ts:23-253 — exact/glob restriction over a candidate set
  of URL representations (hostname, origin, with/without path slash, with
  query+hash) so every common glob shape matches;
- ``process_template``: templateHandler.ts:75-160 flow — load, access,
  type check, domain validation, option merge, engine resolution.

The reference's ``customHandlers`` run user JS inside a QuickJS/vm sandbox
(packages/template-client/src/sandbox/index.ts:22-95). The rebuild runs
handler JS for real through the interpreter + sandbox in js_interp.py /
js_sandbox.py (validator -> security patterns -> budgeted execution with
the page-proxy/preNav/console API surface); named Python callables remain
accepted as the embedding-host fast path (``execute_custom_handler``
dispatches on shape).
"""

from __future__ import annotations

from urllib.parse import urlsplit

from .patterns import glob_to_regex


def merge_options_with_template(template_options: dict,
                                request_options: dict) -> dict:
    """optionMerger.ts:13-27 — shallow; request wins unless None."""
    merged = dict(template_options or {})
    for key, value in (request_options or {}).items():
        if value is not None:
            merged[key] = value
    return merged


def deep_merge_options_with_template(request_options: dict,
                                     template_options: dict) -> dict:
    """optionMerger.ts:38-68 — recursive dict-dict merge, request wins."""
    merged = dict(template_options or {})
    for key, req_value in (request_options or {}).items():
        tpl_value = (template_options or {}).get(key)
        if req_value is None:
            continue
        if (isinstance(req_value, dict) and isinstance(tpl_value, dict)):
            merged[key] = deep_merge_options_with_template(req_value, tpl_value)
        else:
            merged[key] = req_value
    return merged


def has_template_access(template: dict, current_user_id: str | None) -> bool:
    """templateHandler.ts:29-52."""
    if not current_user_id:
        return True
    if template.get("created_by") == current_user_id:
        return True
    return (template.get("status") == "published"
            and template.get("review_status") == "approved")


# ------------------------------------------------------- domain validation


def parse_domain_restriction(allowed_domains) -> dict | None:
    """domainValidator.ts:117-204 parseDomainRestriction +
    parsePatternInput + comma-splitting normalizePatterns."""
    if isinstance(allowed_domains, str):
        parsed = {"type": "exact", "patterns": [allowed_domains]}
    elif isinstance(allowed_domains, list):
        parsed = {"type": "exact", "patterns": allowed_domains}
    elif isinstance(allowed_domains, dict) and "patterns" in allowed_domains:
        if not isinstance(allowed_domains["patterns"], list):
            return None
        parsed = {"type": allowed_domains.get("type") or "exact",
                  "patterns": allowed_domains["patterns"]}
    else:
        return None
    patterns: list[str] = []
    for pattern in parsed["patterns"]:
        if not isinstance(pattern, str):
            continue
        patterns.extend(seg.strip() for seg in pattern.split(",")
                        if seg.strip())
    if not patterns:
        return None
    return {"type": parsed["type"], "patterns": patterns}


def _normalize_url_for_comparison(parts) -> str:
    origin = f"{parts.scheme}://{parts.netloc}".lower()
    path = parts.path or "/"
    query = f"?{parts.query}" if parts.query else ""
    frag = f"#{parts.fragment}" if parts.fragment else ""
    return f"{origin}{path}{query}{frag}"


def _glob_match(candidate: str, pattern: str) -> bool:
    return bool(glob_to_regex(pattern).match(candidate))


def validate_pattern(value: str, restriction: dict | None,
                     field_name: str = "value") -> tuple[bool, str | None]:
    """domainValidator.ts:31-63 generic pattern validation."""
    if not restriction or not restriction.get("patterns"):
        return True, None
    normalized = value.lower().strip()
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        p = pattern.lower().strip()
        if restriction.get("type") == "glob":
            if _glob_match(normalized, p):
                return True, None
        elif normalized == p:
            return True, None
    return False, (f"{field_name} '{value}' is not allowed for this "
                   f"template. Allowed patterns: "
                   f"{', '.join(restriction['patterns'])}")


def validate_domain(url: str, restriction: dict | None
                    ) -> tuple[bool, str | None]:
    """domainValidator.ts:71-110 + matchesGlobPattern candidate set."""
    if not restriction or not restriction.get("patterns"):
        return True, None
    try:
        parts = urlsplit(url)
        if not parts.scheme or not parts.hostname:
            raise ValueError("not absolute")
    except ValueError as e:
        return False, f"Invalid URL format: {e}"
    target = _normalize_url_for_comparison(parts)
    hostname = (parts.hostname or "").lower()
    origin = f"{parts.scheme}://{parts.netloc}".lower()
    path = parts.path or "/"
    query = f"?{parts.query}" if parts.query else ""
    frag = f"#{parts.fragment}" if parts.fragment else ""
    path_slash = "/" if path == "/" else path.rstrip("/") + "/"
    path_noslash = "/" if path == "/" else path.rstrip("/")
    candidates = {
        target, origin,
        f"{origin}{path_slash}", f"{origin}{path_noslash}",
        f"{origin}{path_slash}{query}{frag}",
        f"{origin}{path_noslash}{query}{frag}",
        hostname,
        f"{hostname}{path_slash}", f"{hostname}{path_noslash}",
        f"{hostname}{path_slash}{query}{frag}",
        f"{hostname}{path_noslash}{query}{frag}",
    }
    if path_noslash.startswith("/") and path_noslash != "/":
        bare = path_noslash[1:]
        candidates.add(f"{hostname}/{bare}")
        candidates.add(f"{hostname}/{bare}{query}{frag}")
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        if restriction.get("type") == "exact":
            try:
                pat_parts = urlsplit(pattern)
                if pat_parts.scheme and pat_parts.hostname and \
                        _normalize_url_for_comparison(pat_parts) == target:
                    return True, None
            except ValueError:
                pass
            if hostname == pattern.lower():
                return True, None
        else:  # glob
            p = pattern.lower()
            if any(_glob_match(c, p) for c in candidates):
                return True, None
    return False, (f"URL '{target}' is not allowed for this template. "
                   f"Allowed patterns: {', '.join(restriction['patterns'])}")


# ------------------------------------------------------ template processing


def process_template(template: dict, url: str, request_options: dict,
                     template_type: str, current_user_id: str | None = None,
                     *, validate_domain_flag: bool = True,
                     merge_options: bool = True,
                     allowed_engines: tuple = ("cheerio", "playwright",
                                               "puppeteer")) -> dict:
    """templateHandler.ts:75-160 processTemplate -> {success, engine_name?,
    merged_options?, error?}. ``template`` is the template row as a dict
    (``template_type``, ``req_options``, ``allowed_domains``, ``engine``,
    access fields)."""
    if template is None:
        return {"success": False, "error": "Template not found"}
    if not has_template_access(template, current_user_id):
        return {"success": False,
                "error": "Access denied: You don't have permission to use "
                         "this template"}
    if template.get("template_type") != template_type:
        return {"success": False,
                "error": f"Template type mismatch: expected {template_type}"
                         f", got {template.get('template_type')}"}
    if validate_domain_flag:
        restriction = parse_domain_restriction(template.get("allowed_domains"))
        ok, err = validate_domain(url, restriction)
        if not ok:
            return {"success": False, "error": err}
    template_options = template.get("req_options") or {}
    merged = (deep_merge_options_with_template(request_options or {},
                                               template_options)
              if merge_options else dict(request_options or {}))
    engine = merged.get("engine") or template.get("engine") or "cheerio"
    if engine not in allowed_engines:
        return {"success": False,
                "error": f"Invalid engine: {engine}. Allowed: "
                         f"{', '.join(allowed_engines)}"}
    return {"success": True, "engine_name": engine, "merged_options": merged}


_HANDLER_VALIDATOR = None  # process-wide, like the reference's singleton


def execute_custom_handler(template: dict, handler_name: str,
                           sandbox_context: dict,
                           sandbox=None):
    """Run one of a template's ``customHandlers`` (requestHandler /
    failedRequestHandler — EngineConfigurator.ts dispatch):

    - handler absent or ``enabled: false`` -> None (not executed);
    - handler is a Python callable -> called with ``sandbox_context``
      (embedding-host seam, kept from round 2);
    - handler carries ``code.source`` JS -> validated by
      TemplateCodeValidator then executed in QuickJSSandbox; returns the
      reference envelope ``{success, result, context, ...}``.
    """
    global _HANDLER_VALIDATOR
    handlers = (template or {}).get("customHandlers") \
        or (template or {}).get("custom_handlers") or {}
    handler = handlers.get(handler_name)
    if not handler:
        return None
    if callable(handler):
        return handler(sandbox_context)
    if isinstance(handler, dict):
        if handler.get("enabled") is False:
            return None
        fn = handler.get("fn")
        if callable(fn):
            return fn(sandbox_context)
        source = ((handler.get("code") or {}).get("source")
                  if isinstance(handler.get("code"), dict) else None)
        if source:
            from .js_sandbox import QuickJSSandbox, TemplateCodeValidator

            if _HANDLER_VALIDATOR is None:
                _HANDLER_VALIDATOR = TemplateCodeValidator()
            _HANDLER_VALIDATOR.validate_code(source, template or {})
            sb = sandbox or QuickJSSandbox()
            ctx = dict(sandbox_context or {})
            ctx.setdefault("template", template or {})
            return sb.execute_code(source, ctx)
    return None


class TemplateCache:
    """In-memory TTL template cache — TemplateCache port
    (packages/template-client/src/cache/index.ts:12-100):

    - ``ttl`` ms (default 300000); ttl <= 0 DISABLES the cache entirely
      (get always misses, set stores nothing);
    - ``max_size`` (default 100): inserting into a full cache evicts the
      OLDEST entry (insertion order, like the Map-keys eviction);
    - expired entries miss and are dropped on access; the reference's
      cleanup timer becomes an explicit ``cleanup()`` (epoch-synchronous
      code has no background timers).

    ``clock`` is injectable for deterministic tests.
    """

    def __init__(self, ttl_ms: int = 300_000, max_size: int = 100,
                 clock=None) -> None:
        import time

        self.ttl_ms = ttl_ms
        self.max_size = max_size
        self.clock = clock or (lambda: time.time() * 1000.0)
        self._cache: dict[str, tuple[float, dict]] = {}

    def get(self, template_id: str):
        if self.ttl_ms <= 0:
            return None
        entry = self._cache.get(template_id)
        if entry is None:
            return None
        ts, template = entry
        if self.clock() - ts > self.ttl_ms:
            del self._cache[template_id]
            return None
        return template

    def set(self, template_id: str, template: dict) -> None:
        if self.ttl_ms <= 0:
            return
        if len(self._cache) >= self.max_size and template_id not in self._cache:
            oldest = next(iter(self._cache), None)
            if oldest is not None:
                del self._cache[oldest]
        self._cache[template_id] = (self.clock(), template)

    def invalidate(self, template_id: str) -> None:
        self._cache.pop(template_id, None)

    def clear(self) -> None:
        self._cache.clear()

    def cleanup(self) -> int:
        """Drop every expired entry; returns how many were removed."""
        now = self.clock()
        expired = [k for k, (ts, _t) in self._cache.items()
                   if now - ts > self.ttl_ms]
        for k in expired:
            del self._cache[k]
        return len(expired)

    def size(self) -> int:
        return len(self._cache)
