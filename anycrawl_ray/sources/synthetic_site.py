"""Deterministic synthetic web graph — the sandbox's network substitute.

The reference end-to-end tests hit live sites (apps/api/src/__tests__/
scrape.test.ts:18-115); the rebuild replaces that with a seeded synthetic
site (FIXTURES.md F2) derived from the driver-provided ``documents``
parquet table, so correctness is checkable both by pytest goldens and by a
DuckDB recursive-CTE oracle.

Graph rule (SQL-replicable; see pipelines/queries.py crawl oracles):
page ``i`` of ``N`` links, in DOM order, to

1. ``2*i + 1``      (if < N)    — binary-tree child
2. ``2*i + 2``      (if < N)    — binary-tree child
3. ``(7*i + 3) % N`` (if i % 3 == 0) — cross link

All pages respond 200 (error paths are covered by hand-built fixtures in
tests). Page HTML exercises the parse kernel: <title>, <meta> tags,
nav/footer/ads/script noise (clean-HTML selector list), relative hrefs,
one malformed ``http:/`` link on every 11th page, an <img srcset> on every
7th page, and body text from the documents table.

URLs: ``http://site{i % num_hosts}.test/p/{i:06d}`` — one graph spans
``num_hosts`` hosts so 'all' strategy crawls everything while
'same-hostname' prunes (both covered by tests).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

NUM_HOSTS = 4


def page_url(i: int, num_hosts: int = NUM_HOSTS) -> str:
    return f"http://site{i % num_hosts}.test/p/{i:06d}"


def page_links(i: int, n: int) -> list[int]:
    """Out-neighbor page indices in DOM order. Keep in sync with the
    ONE SQL twin: pipelines/queries.py::_EDGES_CTE_BODY (interpolated
    into every graph-replaying oracle) — and with
    stages/graph.py::synthetic_degrees / site_edges."""
    out = []
    if 2 * i + 1 < n:
        out.append(2 * i + 1)
    if 2 * i + 2 < n:
        out.append(2 * i + 2)
    if i % 3 == 0:
        out.append((7 * i + 3) % n)
    return out


def page_html(i: int, n: int, text: str, num_hosts: int = NUM_HOSTS,
              repeat: int = 1) -> str:
    """Deterministic page body for doc ``i`` with text from the documents
    table. Link hrefs are relative (exercising URL resolution) except the
    malformed absolute on every 11th page. ``repeat`` multiplies the body
    paragraphs to simulate realistic page sizes (bench uses ~20 for
    ~30 KB pages; correctness fixtures keep 1)."""
    links = page_links(i, n)
    anchors = []
    for j in links:
        if i % 11 == 0 and j == links[-1]:
            # malformed scheme absolute link (HTMLTransformer.ts:366-374 path)
            anchors.append(f'<a href="http:/site{j % num_hosts}.test/p/{j:06d}">L{j}</a>')
        elif j % num_hosts == i % num_hosts:
            anchors.append(f'<a href="/p/{j:06d}">L{j}</a>')
        else:
            anchors.append(f'<a href="http://site{j % num_hosts}.test/p/{j:06d}">L{j}</a>')
    img = ""
    if i % 7 == 0:
        img = (
            f'<img src="/img/{i}.jpg" srcset="/img/{i}-s.jpg 1x, /img/{i}-l.jpg 2x" '
            f'alt="figure {i}">'
        )
    words = text.split()
    para1 = " ".join(words[: len(words) // 2])
    para2 = " ".join(words[len(words) // 2 :])
    body = f"<p>{para1}</p><p>{para2}</p>" * max(1, repeat)
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>Doc {i}</title>"
        f'<meta name="description" content="synthetic page {i}">'
        f'<meta property="og:type" content="article">'
        "<script>var tracker=1;</script>"
        "</head><body>"
        '<header class="header"><nav>site nav</nav></header>'
        '<div class="ad">buy things</div>'
        f"<main><h1>Doc {i}</h1>"
        f"{body}"
        f"{img}"
        f'<div class="linkbox">{"".join(anchors)}</div>'
        "</main>"
        "<!-- comment node -->"
        '<footer id="footer">footer text</footer>'
        "</body></html>"
    )


def build_site_table(documents_path: str, num_hosts: int = NUM_HOSTS,
                     max_pages: int | None = None, repeat: int = 1,
                     total_pages: int | None = None) -> pa.Table:
    """documents.parquet -> SITE_PAGES-shaped Arrow table (FIXTURES.md F2).

    ``total_pages`` grows the graph beyond the documents row count by
    cycling texts deterministically (page i uses text[i % n_docs]) — used
    by the bench to exercise wave sizes closer to production scale."""
    docs = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    order = sorted(range(len(ids)), key=lambda k: ids[k])
    texts = [texts[k] for k in order]
    if total_pages is not None:
        texts = [texts[i % len(texts)] for i in range(total_pages)]
    if max_pages is not None:
        texts = texts[:max_pages]
    n = len(texts)
    urls, hosts, htmls, links_col, nbytes = [], [], [], [], []
    for pos, (i, text) in enumerate(zip(range(n), texts)):
        html = page_html(i, n, text, num_hosts, repeat)
        urls.append(page_url(i, num_hosts))
        hosts.append(f"site{i % num_hosts}.test")
        htmls.append(html)
        links_col.append([page_url(j, num_hosts) for j in page_links(i, n)])
        nbytes.append(len(html))
    return pa.table(
        {
            "url": urls,
            "host": hosts,
            "status_code": pa.array([200] * n, pa.int32()),
            "html": htmls,
            "links": pa.array(links_col, pa.list_(pa.string())),
            "content_bytes": pa.array(nbytes, pa.int64()),
        }
    )


def site_table_from_rows(rows: list[dict]) -> pa.Table:
    """Hand-built fixture pages (tests) -> SITE_PAGES table."""
    return pa.table(
        {
            "url": [r["url"] for r in rows],
            "host": [r.get("host", r["url"].split("/")[2]) for r in rows],
            "status_code": pa.array([r.get("status_code", 200) for r in rows], pa.int32()),
            "html": [r.get("html", "") for r in rows],
            "links": pa.array([r.get("links", []) for r in rows], pa.list_(pa.string())),
            "content_bytes": pa.array(
                [r.get("content_bytes", len(r.get("html", ""))) for r in rows], pa.int64()
            ),
        }
    )
