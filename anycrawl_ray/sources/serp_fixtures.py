"""Deterministic SERP fixture bodies (FIXTURES.md F5).

Builds Google result-page HTML and SearXNG / AC-Engine JSON from the
``documents`` table, with result fields that are pure SQL expressions of
``doc_id`` / ``n_chars`` so the DuckDB oracle can reconstruct the expected
parse output exactly (pipelines/queries.py serp oracles):

    title       = 'Doc {doc_id} result'
    url         = 'http://result.test/d/{doc_id}'
    description = 'about doc {doc_id} ({n_chars} chars)'
    category    = web | images | news by doc_id % 3  (searxng/ac only)
    resolution  = '{(doc_id%5+1)*100}×{(doc_id%4+1)*100}' for images

Google fixtures embed the exact selectors the parser targets
(div[jscontroller=SC7lYd] / a h3 / div[data-sncf=1], Google.ts:201-257)
plus decoy blocks that must be skipped.
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq

PER_PAGE = 10


def _fields(doc_id: int, n_chars: int) -> tuple[str, str, str]:
    return (
        f"Doc {doc_id} result",
        f"http://result.test/d/{doc_id}",
        f"about doc {doc_id} ({n_chars} chars)",
    )


def google_serp_html(rows: list[tuple[int, int]]) -> str:
    """rows: [(doc_id, n_chars)] for one page."""
    blocks = []
    for doc_id, n_chars in rows:
        title, url, desc = _fields(doc_id, n_chars)
        blocks.append(
            f'<div jscontroller="SC7lYd"><div><a href="{url}"><h3>{title}</h3></a></div>'
            f'<div data-sncf="1"><script>track();</script>{desc}</div></div>'
        )
    # decoys: missing h3 / missing url / missing content — parser must skip
    decoys = (
        '<div jscontroller="SC7lYd"><a href="http://no-title.test"></a>'
        '<div data-sncf="1">desc</div></div>'
        '<div jscontroller="SC7lYd"><a><h3>No url</h3></a>'
        '<div data-sncf="1">desc</div></div>'
        '<div jscontroller="SC7lYd"><a href="http://no-content.test">'
        "<h3>No content</h3></a></div>"
        '<div jscontroller="other"><a href="http://x.test"><h3>Not a result</h3></a></div>'
    )
    return (
        "<html><head><title>q - Google Search</title></head><body>"
        f"<div id=\"search\">{''.join(blocks)}{decoys}</div></body></html>"
    )


def _category(doc_id: int) -> str:
    return ("web", "images", "news")[doc_id % 3]


def searxng_serp_json(rows: list[tuple[int, int]]) -> str:
    results = []
    for doc_id, n_chars in rows:
        title, url, desc = _fields(doc_id, n_chars)
        cat = _category(doc_id)
        item = {"title": title, "url": url, "content": desc,
                "category": cat, "engine": "fixture"}
        if cat == "images":
            item["img_src"] = url + "/img.jpg"
            item["resolution"] = f"{(doc_id % 5 + 1) * 100}×{(doc_id % 4 + 1) * 100}"
            item["positions"] = [doc_id % PER_PAGE + 1]
        elif cat == "news":
            item["publishedDate"] = "2024-01-01"
        results.append(item)
    # a url-less suggestion entry the parser must skip (Searxng.ts:112-115)
    results.append({"title": "suggestion only", "category": "web"})
    return json.dumps({"results": results})


def ac_serp_json(rows: list[tuple[int, int]]) -> str:
    results = []
    for doc_id, n_chars in rows:
        title, url, desc = _fields(doc_id, n_chars)
        results.append(
            {"title": title, "url": url, "description": desc,
             "category": _category(doc_id), "source": "AC-Engine"}
        )
    return json.dumps({"results": results})


def build_serp_pages(documents_path: str, engine: str, query: str = "q",
                     limit: int = 100) -> list[dict]:
    """-> [{engine, query, page, body}] covering ceil(limit/10) pages in
    doc_id order (the reference's sequential per-page loop,
    SearchService.ts:262-285)."""
    docs = pq.read_table(documents_path, columns=["doc_id", "n_chars"])
    pairs = sorted(zip(docs.column("doc_id").to_pylist(),
                       docs.column("n_chars").to_pylist()))[:limit]
    builder = {"google": google_serp_html, "searxng": searxng_serp_json,
               "ac-engine": ac_serp_json}[engine]
    if engine == "ac-engine":
        # direct-limit engine: one response carrying all `limit` results
        return [{"engine": engine, "query": query, "page": 1, "body": builder(pairs)}]
    pages = []
    for p in range(0, (len(pairs) + PER_PAGE - 1) // PER_PAGE):
        rows = pairs[p * PER_PAGE : (p + 1) * PER_PAGE]
        pages.append({"engine": engine, "query": query, "page": p + 1,
                      "body": builder(rows)})
    return pages
