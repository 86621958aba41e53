"""SERP engines: URL builders + response parsers (SURVEY.md M17-M20).

Re-expresses the reference's pluggable search engines
(packages/search/src/engines/) as pure functions suitable for a
``map_batches`` parse stage:

- **google**: URL builder with hl/lr/cr/num/tbs/safe params and the
  ``arc_id`` async param (Google.ts:72-169) — the random arc id is seeded
  deterministically here (SURVEY.md §7.5#6 bans nondeterminism in the data
  path); parser selects ``div[jscontroller="SC7lYd"]`` blocks, title from
  ``a h3``, url from the h3's parent anchor href, content from
  ``div[data-sncf="1"]`` minus scripts (Google.ts:201-257);
- **searxng**: category/time/safesearch param mapping and JSON parsing
  with web/images/news discrimination + ``"1000×1500"`` resolution regex
  (Searxng.ts:38-179);
- **ac-engine**: limit inference (``page * 10``) and passthrough JSON
  parsing (ACEngine.ts:23-117).

The FULL ``GoogleParameters`` locale map (packages/libs/src/data/Google.ts,
186 domains / 132 languages / 260 regions) is transcribed in
``serp/google_data.py``; unknown locales fall back to
``en``/``US``/www.google.com like the reference does.
"""

from __future__ import annotations

import json
import re
from urllib.parse import urlencode

from ..functions.htmldom import parse_html

# full locale tables from packages/libs/src/data/Google.ts (186 domains /
# 132 languages / 260 regions, file order preserved — the region fallback
# scans in insertion order like Object.entries)
from .google_data import (
    LANGUAGES as GOOGLE_LANGUAGES,
    REGIONS as GOOGLE_REGIONS,
    SUPPORTED_DOMAINS as GOOGLE_DOMAINS,
)

# engines/Google.ts:35-57 — countries whose dominant language makes the
# lang-country pairing unhelpful for result quality; skipped in both the
# explicit pairing and the fallback scan
GOOGLE_SKIP_COUNTRIES = frozenset((
    "AL", "AZ", "BD", "BN", "BT", "ET", "GE", "GL", "KH", "LA", "LK",
    "ME", "MK", "MM", "MN", "MV", "MY", "NP", "TJ", "TM", "UZ",
))
_TIME_RANGE = {"day": "d", "week": "w", "month": "m", "year": "y"}
_SAFE = {0: "off", 1: "medium", 2: "high"}
_ARC_CHARS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-"


def _seeded_arc_id(query: str, start: int) -> str:
    """Deterministic stand-in for Google.ts:153-169's random arc id."""
    from ..functions.urls import xxh64

    state = xxh64(f"{query}|{start}")
    chars = []
    for _ in range(23):
        chars.append(_ARC_CHARS[state % 64])
        state = (state * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
    return f"srp_{''.join(chars)}_1{start:02d}"


def google_url(query: str, page: int = 1, offset: int = 0, lang: str | None = None,
               country: str | None = None, limit: int | None = None,
               time_range: str | None = None, safe_search: int | None = None) -> str:
    eng_lang = GOOGLE_LANGUAGES.get(lang or "", "en")
    lang_code = eng_lang.split("_")[1] if "_" in eng_lang else eng_lang
    region = None
    if lang and country and country not in GOOGLE_SKIP_COUNTRIES:
        region = GOOGLE_REGIONS.get(f"{lang}-{country}")
    if not region and lang:
        # first lang-* region whose country is not skipped (Google.ts:95-103)
        region = next(
            (v for k, v in GOOGLE_REGIONS.items()
             if k.startswith(f"{lang}-")
             and v.upper() not in GOOGLE_SKIP_COUNTRIES), None
        )
    region = region or "US"
    per_page = min(max(limit, 1), 100) if limit else 10
    start = offset + (page - 1) * per_page
    domain = GOOGLE_DOMAINS.get(region.upper(), "www.google.com")
    params = [
        ("q", query), ("start", str(start)), ("hl", f"{lang_code}-{region}"),
        ("lr", eng_lang), ("cr", f"country{region}"), ("ie", "utf8"),
        ("oe", "utf8"), ("filter", "0"), ("asearch", "arc"),
        ("async", f"arc_id:{_seeded_arc_id(query, start)},use_ac:true,_fmt:prog"),
    ]
    if limit:
        params.append(("num", str(per_page)))
    if time_range and time_range in _TIME_RANGE:
        params.append(("tbs", f"qdr:{_TIME_RANGE[time_range]}"))
    if safe_search is not None:
        params.append(("safe", _SAFE.get(safe_search, "medium")))
    return f"https://{domain}/search?{urlencode(params)}"


def google_parse(body: str) -> list[dict]:
    """Google.ts:201-257 selector-for-selector."""
    root = parse_html(body)
    results = []
    for block in root.select('div[jscontroller=SC7lYd]'):
        h3 = block.select_one("a h3")
        if h3 is None:
            continue
        title = h3.text_content().strip()
        parent = h3.parent
        url = (parent.get("href") or "") if parent is not None else ""
        if not url:
            continue
        content_parts = []
        for cn in block.select('div[data-sncf=1]'):
            cn.remove_all("script")
            content_parts.append(cn.text_content())
        content = "".join(content_parts).strip()
        if not content:
            continue
        results.append(
            {"category": "web", "title": title, "url": url,
             "description": content, "source": "Google Search Result"}
        )
    return results


def searxng_url(base_url: str, query: str, page: int = 1, lang: str | None = None,
                sources: str | None = None, categories: str | None = None,
                time_range: str | None = None, safe_search: int | None = None) -> str:
    params = [("q", query), ("format", "json"), ("pageno", str(page))]
    if lang:
        params.append(("language", lang))
    if sources:
        cat = {"web": "general", "images": "images", "news": "news"}.get(sources)
        if cat:
            params.append(("categories", cat))
    elif categories:
        params.append(("categories", categories))
    if time_range:
        params.append(("time_range", time_range))
    if safe_search is not None:
        params.append(("safesearch", str(safe_search)))
    return f"{base_url}/search?{urlencode(params)}"


_RESOLUTION = re.compile(r"(\d+)\s*[×x]\s*(\d+)")


def searxng_parse(body: str | dict) -> list[dict]:
    try:
        data = json.loads(body) if isinstance(body, str) else body
    except (json.JSONDecodeError, TypeError):
        return []
    results = []
    for item in data.get("results") or []:
        if not item.get("url"):
            continue
        category = item.get("category") or "web"
        desc = item.get("content") or item.get("snippet") or ""
        source = f"SearXNG ({item.get('engine') or 'unknown'})"
        if category == "images":
            w = h = None
            if item.get("resolution"):
                m = _RESOLUTION.search(item["resolution"])
                if m:
                    w, h = int(m.group(1)), int(m.group(2))
            positions = item.get("positions")
            results.append(
                {"category": "images", "title": item.get("title") or "",
                 "url": item["url"], "description": desc, "source": source,
                 "imageUrl": item.get("img_src"), "imageWidth": w, "imageHeight": h,
                 "position": positions[0] if isinstance(positions, list) and positions else None,
                 "thumbnail_src": item.get("thumbnail_src"),
                 "img_format": item.get("img_format"), "filesize": item.get("filesize")}
            )
        elif category == "news":
            results.append(
                {"category": "news", "title": item.get("title") or "",
                 "url": item["url"], "description": desc, "source": source,
                 "snippet": desc, "date": item.get("publishedDate") or item.get("pubdate"),
                 "imageUrl": item.get("thumbnail") or None}
            )
        else:
            results.append(
                {"category": "web", "title": item.get("title") or "",
                 "url": item["url"], "description": desc, "source": source}
            )
    return results


def ac_engine_url(base_url: str, query: str, page: int | None = None,
                  offset: int = 0, limit: int | None = None,
                  lang: str | None = None, country: str | None = None,
                  time_range: str | None = None, safe_search: int | None = None,
                  sources: str | None = None) -> str:
    params = []
    if query:
        params.append(("q", query))
    params.append(("start", str(offset)))
    effective = None
    if isinstance(limit, int) and limit > 0:
        effective = limit
    elif isinstance(page, int) and page > 0:
        effective = page * 10  # limit inference (ACEngine.ts:29-37)
    if effective is not None:
        params.append(("limit", str(effective)))
    for key, val in (("lang", lang), ("country", country), ("timeRange", time_range),
                     ("safe_search", safe_search), ("sources", sources)):
        if val is not None:
            params.append((key, str(val)))
    return f"{base_url.rstrip('/')}/search?{urlencode(params)}"


def ac_engine_parse(body: str | dict) -> list[dict]:
    try:
        data = json.loads(body) if isinstance(body, str) else body
    except (json.JSONDecodeError, TypeError):
        return []
    items = data.get("results") if isinstance(data, dict) else None
    results = []
    for item in items or []:
        if not item.get("url"):
            continue
        category = item.get("category") or "web"
        desc = item.get("description") or item.get("snippet") or ""
        base = {"category": category, "title": item.get("title") or "",
                "url": item["url"], "description": desc,
                "source": item.get("source") or "AC-Engine"}
        if category == "images":
            base.update({k: item.get(k) for k in
                         ("imageUrl", "imageWidth", "imageHeight", "position",
                          "thumbnail_src", "img_format", "filesize")})
        elif category == "news":
            base.update({"snippet": item.get("snippet"), "date": item.get("date"),
                         "imageUrl": item.get("imageUrl")})
        results.append(base)
    return results


ENGINE_REGISTRY = {
    "google": {"parse": google_parse, "supports_direct_limit": False},
    "searxng": {"parse": searxng_parse, "supports_direct_limit": False},
    "ac-engine": {"parse": ac_engine_parse, "supports_direct_limit": True},
}


def build_search_url(engine: str, query: str, base_url: str = "http://searx.local",
                     **kw) -> str:
    entry = ENGINE_REGISTRY.get(engine)
    if entry and entry.get("build_url"):
        return entry["build_url"](base_url=base_url, query=query, **kw)
    if engine == "google":
        return google_url(query, **kw)
    if engine == "searxng":
        return searxng_url(base_url, query, **kw)
    if engine == "ac-engine":
        return ac_engine_url(base_url, query, **kw)
    raise ValueError(f"unknown search engine: {engine}")


def parse_serp_batch(batch, engine_col: str = "engine", body_col: str = "body",
                     registry=None):
    """map_batches fn: fetched SERP bodies -> flat result rows
    (SERP_RESULTS schema + per-page position).

    ``registry`` lets callers ship the DRIVER's engine registry into Ray
    workers (the module-level dict is per-process: a worker's fresh import
    only has the builtins, so a custom engine registered on the driver
    would otherwise KeyError there)."""
    import pyarrow as pa

    registry = registry if registry is not None else ENGINE_REGISTRY
    engines = batch.column(engine_col).to_pylist()
    bodies = batch.column(body_col).to_pylist()
    queries = batch.column("query").to_pylist()
    pages = batch.column("page").to_pylist()
    out = {k: [] for k in ("engine", "query", "page", "position", "category",
                           "title", "url", "description", "source")}
    for engine, body, query, page in zip(engines, bodies, queries, pages):
        parse = registry[engine]["parse"]
        for pos, r in enumerate(parse(body)):
            out["engine"].append(engine)
            out["query"].append(query)
            out["page"].append(page)
            out["position"].append(pos)
            out["category"].append(r["category"])
            out["title"].append(r["title"])
            out["url"].append(r["url"])
            out["description"].append(r["description"])
            out["source"].append(r["source"])
    return pa.table(
        {
            "engine": pa.array(out["engine"], pa.string()),
            "query": pa.array(out["query"], pa.string()),
            "page": pa.array(out["page"], pa.int32()),
            "position": pa.array(out["position"], pa.int32()),
            "category": pa.array(out["category"], pa.string()),
            "title": pa.array(out["title"], pa.string()),
            "url": pa.array(out["url"], pa.string()),
            "description": pa.array(out["description"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
        }
    )


def register_search_engine(name: str, parse, *, build_url=None,
                           supports_direct_limit: bool = False,
                           overwrite: bool = False) -> None:
    """Pluggable search engines (SearchService.ts:115-133): register a
    parser (``parse(body) -> list[dict]``) and optional URL builder
    (``build_url(base_url=..., query=..., **kw) -> str``) under an engine
    name; duplicate registration without ``overwrite`` raises like the
    engine registry."""
    if name in ENGINE_REGISTRY and not overwrite:
        raise ValueError(f"search engine '{name}' is already registered")
    ENGINE_REGISTRY[name] = {"parse": parse, "build_url": build_url,
                             "supports_direct_limit": supports_direct_limit}
