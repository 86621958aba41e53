"""URL/query template rendering (SURVEY.md M21).

Reference: apps/api/src/utils/urlTemplate.ts:61-101 — ``{{var|filter}}``
placeholders with dotted variable paths, filters ``raw | query | path |
host``, escaped ``\\{{`` literals, missing variables left verbatim.
``render_url_template`` activates filters; ``render_text_template``
treats every filter as ``raw`` (urlTemplate.ts:86-101).
"""

from __future__ import annotations

import json
import re
from urllib.parse import quote

_ESC = "\x00AC_ESCAPED_LEFT\x00"
_PLACEHOLDER = re.compile(r"\{\{\s*([A-Za-z0-9_.]+)(?:\s*\|\s*(raw|query|path|host))?\s*\}\}")
_HOST_BAD = re.compile(r"[^a-z0-9.-]")


def _get_by_path(obj, path: str):
    cur = obj
    for part in path.split("."):
        if cur is None:
            return None
        if isinstance(cur, dict):
            cur = cur.get(part)
        else:
            return None
    return cur


def _to_string(v) -> str:
    if v is None:
        return ""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"  # JS String(bool)
    if isinstance(v, (int, float)):
        return json.dumps(v)
    try:
        return json.dumps(v, separators=(",", ":"))
    except (TypeError, ValueError):
        return str(v)


def _apply_filter(value: str, name: str, allow_filters: bool) -> str:
    f = name if allow_filters else "raw"
    if f == "query":
        return quote(value, safe="!'()*-._~")  # encodeURIComponent charset
    if f == "path":
        return quote(value, safe="!'()*-._~/")  # encode, restore '/'
    if f == "host":
        return _HOST_BAD.sub("", value.lower())
    return value


def _render(template: str, variables: dict | None, allow_filters: bool) -> str:
    if not isinstance(template, str) or not template:
        return template
    out = template.replace("\\{{", _ESC)

    def repl(m: re.Match) -> str:
        val = _get_by_path(variables, m.group(1))
        if val is None and (variables is None or _missing(variables, m.group(1))):
            return m.group(0)  # keep original when missing
        return _apply_filter(_to_string(val), m.group(2) or "raw", allow_filters)

    out = _PLACEHOLDER.sub(repl, out)
    return out.replace(_ESC, "{{")


def _missing(variables: dict, path: str) -> bool:
    cur = variables
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return True
        cur = cur[part]
    return False


def render_url_template(template: str, variables: dict | None = None) -> str:
    """URL fields: filters active (urlTemplate.ts:86-93)."""
    return _render(template, variables, True)


def render_text_template(template: str, variables: dict | None = None) -> str:
    """Text fields (e.g. search.query): filters forced raw (ts:96-103)."""
    return _render(template, variables, False)
