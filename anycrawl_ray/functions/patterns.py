"""Glob / regex-literal pattern matching for crawl path rules.

Reproduces the reference's pattern semantics:

- strings of the form ``/body/flags`` are JS-style regex literals, tested
  with ``regex.test(url)`` (reference: packages/scrape/src/engines/
  Base.ts:344-358 for include_paths, Base.ts:475-489 for scrape_paths);
  invalid regexes fall through to glob interpretation;
- everything else is a glob matched with minimatch ``{dot: true}``
  (Base.ts:493). The subset implemented here: ``*`` (any run, not ``/``),
  ``**`` (any run incl. ``/``), ``?`` (single char, not ``/``),
  ``[...]`` char classes, ``{a,b}`` brace alternation.

Supported JS regex flags: ``i`` (ignorecase), ``m`` (multiline),
``s`` (dotall); ``g``/``u``/``y`` are accepted and ignored (they do not
change ``.test`` semantics for a single probe).
"""

from __future__ import annotations

import re
from functools import lru_cache

_REGEX_LITERAL = re.compile(r"^/(.*)/([gimsuy]*)$", re.S)

_FLAG_MAP = {"i": re.I, "m": re.M, "s": re.S}


def parse_regex_literal(pattern: str) -> re.Pattern | None:
    """``/body/flags`` -> compiled pattern, else None (also None when the
    body doesn't compile — caller falls back to glob, Base.ts:352-356)."""
    m = _REGEX_LITERAL.match(pattern)
    if not m:
        return None
    body, flags = m.group(1), m.group(2)
    f = 0
    for ch in flags:
        f |= _FLAG_MAP.get(ch, 0)
    try:
        return re.compile(body, f)
    except re.error:
        return None


@lru_cache(maxsize=4096)
def glob_to_regex(glob: str) -> re.Pattern:
    """minimatch-subset glob -> anchored regex (dot:true — no special-casing
    of leading dots, which Python fnmatch also doesn't do)."""
    out: list[str] = []
    i, n = 0, len(glob)
    while i < n:
        c = glob[i]
        if c == "*":
            if i + 1 < n and glob[i + 1] == "*":
                # '**' crosses path separators; swallow a following '/'
                i += 1
                if i + 1 < n and glob[i + 1] == "/":
                    i += 1
                    out.append("(?:.*/)?")
                else:
                    out.append(".*")
            else:
                out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = i + 1
            if j < n and glob[j] in "!^":
                j += 1
            if j < n and glob[j] == "]":
                j += 1
            while j < n and glob[j] != "]":
                j += 1
            if j < n:
                cls = glob[i + 1 : j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                out.append("[" + cls.replace("\\", "\\\\") + "]")
                i = j
            else:
                out.append(re.escape(c))
        elif c == "{":
            j = glob.find("}", i)
            if j > i:
                alts = glob[i + 1 : j].split(",")
                # glob_to_regex wraps as "(?s:BODY)\Z" — extract BODY
                out.append(
                    "(?:" + "|".join(glob_to_regex(a).pattern[4:-3] for a in alts) + ")"
                )
                i = j
            else:
                out.append(re.escape(c))
        else:
            out.append(re.escape(c))
        i += 1
    return re.compile("(?s:" + "".join(out) + ")\\Z")


def match_pattern(url: str, pattern: str) -> bool:
    """True iff ``url`` matches ``pattern`` (regex literal first, else glob)."""
    rx = parse_regex_literal(pattern)
    if rx is not None:
        return rx.search(url) is not None
    try:
        return glob_to_regex(pattern).match(url) is not None
    except re.error:
        return False


class PathRules:
    """Compiled include/exclude/scrape rule set for one crawl job.

    Semantics (Base.ts:339-365, 376-423, 465-502):

    - ``include_paths`` empty -> everything passes the include gate; else a
      link passes if it matches ANY include glob or regex;
    - ``exclude_paths`` non-empty -> the *current page's URL* is implicitly
      added to the exclude list (Base.ts:360-365); a link matching ANY
      exclude pattern is dropped. Exclusion wins over inclusion (Crawlee
      enqueueLinks applies ``exclude`` first);
    - ``scrape_paths`` empty -> every page's content is stored; else only
      matching pages are stored (links are still followed either way).
    """

    def __init__(
        self,
        include_paths: list[str] | None = None,
        exclude_paths: list[str] | None = None,
        scrape_paths: list[str] | None = None,
    ) -> None:
        self.include_paths = list(include_paths or [])
        self.exclude_paths = list(exclude_paths or [])
        self.scrape_paths = list(scrape_paths or [])

    def include_ok(self, url: str) -> bool:
        if not self.include_paths:
            return True
        return any(match_pattern(url, p) for p in self.include_paths)

    def exclude_hit(self, url: str, current_url: str | None = None) -> bool:
        if not self.exclude_paths:
            return False
        if current_url is not None and url == current_url:
            return True
        return any(match_pattern(url, p) for p in self.exclude_paths)

    def should_follow(self, url: str, current_url: str | None = None) -> bool:
        return self.include_ok(url) and not self.exclude_hit(url, current_url)

    def should_scrape(self, url: str) -> bool:
        if not self.scrape_paths:
            return True
        return any(match_pattern(url, p) for p in self.scrape_paths)
