"""Parse/extract stage: fetched page -> interleaved span document + links.

This is the rebuild's ``DataExtractor.extractData`` (packages/scrape/src/
core/DataExtractor.ts:230-341) plus the link-discovery half of
``handleCrawlLogic`` (Base.ts:314-457), expressed as one stateless
``map_batches`` function over Arrow batches: all format extraction for one
page happens in a single DOM-parse pass.

Span-sequence layout (the BASELINE.json per-row invariant) follows the
reference's output key order (assembleData, DataExtractor.ts:210-225 —
JS object insertion order):

    title, rawHtml?, metadata*, html?, markdown*, text?, media*,
    screenshot?, json?

- ``metadata``: one span per <meta> entry, ``text = "name=content"``;
- ``markdown``: one span per block (split on blank lines), document order;
- ``media``: one span per <img> of the *transformed* (absolute-URL) DOM,
  ``media_ref`` = absolute src, ``text`` = alt;
- ``screenshot``: synthetic ``media_ref = screenshot://{md5_8(url)}``
  (ScreenshotTransformer.ts:104-110 key scheme) — capture itself is a
  browser-actor concern, stubbed in-sandbox;
- ``json``: deterministic extraction stub (no LLM in sandbox): canonical
  JSON of {url, title, first metadata}; the real LLM extractor slots in as
  an actor-pool stage (SURVEY.md T4).

Candidate links are filtered here by strategy scope (vs the current page,
Crawlee semantics), include/exclude path rules and the depth gate
(Base.ts:339-365, 395-401); dedup + limit live in the frontier.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from ..functions.cleaner import (
    clean_tree,
    extract_clean_html,
    extract_page_from_tree,
    transform_relative_urls,
)
from ..functions.htmldom import Node, parse_html
from ..functions.markdown import html_to_markdown, markdown_from_tree
from ..functions.patterns import PathRules
from ..functions.textconv import html_to_text_tree
from ..functions.urls import canonicalize, host_of, same_scope, xxh64
from ..schemas import SPAN


def _imgs_of(root: Node) -> list[dict]:
    return [
        {"src": img.get("src") or "", "alt": (img.get("alt") or "").strip()}
        for img in root.select("img")
        if img.get("src")
    ]

DEFAULT_FORMATS = ["markdown"]

PARSED_EXTRA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN)),
        ("status", pa.string()),
        ("should_scrape", pa.bool_()),
        ("candidates", pa.list_(pa.string())),
        # canonical form + xxh64 key per candidate, computed IN THE WORKER
        # so the driver's admission gate does no per-URL string work
        # (round-1 driver-serial chokepoint)
        ("cand_canon", pa.list_(pa.string())),
        ("cand_key", pa.list_(pa.uint64())),
        ("cand_host", pa.list_(pa.string())),
        ("title", pa.string()),
    ]
)


def _md5_8(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:8]


def _is_success(status: int) -> bool:
    return 200 <= status < 300


class PageParser:
    """Per-job parse kernel; one instance per map_batches task/actor.

    ``job`` is a plain dict of the crawl/scrape options (CrawlSchema.ts
    fields). Stateless across batches — safe as a task stage; pattern
    regexes are compiled lazily and cached inside PathRules."""

    def __init__(self, job: dict) -> None:
        self.job = job
        self.formats = job.get("formats") or list(DEFAULT_FORMATS)
        self.rules = PathRules(
            job.get("include_paths"), job.get("exclude_paths"), job.get("scrape_paths")
        )
        self.strategy = job.get("strategy", "same-domain")
        self.max_depth = job.get("max_depth", 10)
        self.include_tags = job.get("include_tags")
        self.exclude_tags = job.get("exclude_tags")
        self.job_id = job.get("job_id", "job")

    # -- single page ------------------------------------------------------
    def parse_page(self, url: str, html: str, status: int, depth: int,
                   seq: int, job_id: str | None = None
                   ) -> tuple[str, list[dict], bool, list[str], str]:
        """-> (doc_id, spans, should_scrape, candidate_links, title)."""
        doc_id = f"{job_id or self.job_id}_{seq:08d}"
        if not _is_success(status):
            return doc_id, [], False, [], ""
        # ONE DOM parse shared by extraction (read-only) and transformation
        # (mutating) — the serialized result is identical to a fresh parse
        # because parsing is deterministic
        root = parse_html(html)
        page = extract_page_from_tree(root, url)
        spans: list[dict] = []

        def add(kind: str, text: str = "", media_ref: str = "") -> None:
            spans.append(
                {"kind": kind, "text": text, "media_ref": media_ref,
                 "offset": len(spans)}
            )

        add("title", page.title)
        if "rawHtml" in self.formats:
            add("rawHtml", html)
        for m in page.metadata:
            add("metadata", f"{m['name']}={m['content']}")

        # text conversion reads the RAW tree (DataExtractor.ts:276 converts
        # rawHtml) — compute before the mutating transform, emit in order
        text_out: str | None = None
        if "text" in self.formats:
            text_out = html_to_text_tree(root)

        transformed: str | None = None
        markdown: str | None = None
        media_imgs: list[dict] = page.images
        need_md = "markdown" in self.formats or "json" in self.formats
        if any(f in self.formats for f in ("html", "markdown", "json")):
            transform_relative_urls(root, url)
            if self.include_tags:
                # include_tags builds a collected fragment — string path
                transformed = extract_clean_html(root, self.include_tags,
                                                 self.exclude_tags)
                media_root = parse_html(transformed)
                media_imgs = _imgs_of(media_root)
                if need_md:
                    markdown = html_to_markdown(transformed)
            else:
                clean_tree(root, self.exclude_tags)
                transformed = root.to_html() if "html" in self.formats else None
                media_imgs = _imgs_of(root)
                if need_md:
                    # tree path: equals html_to_markdown(root.to_html())
                    # (the serializer encodes NBSP as &nbsp;, so the string
                    # pre-pass never collapses it — cheerio-faithful);
                    # pinned by tests; mutates root LAST
                    markdown = markdown_from_tree(root)
        if "html" in self.formats:
            add("html", transformed or "")
        if "markdown" in self.formats and markdown is not None:
            for block in markdown.split("\n\n"):
                if block.strip():
                    add("markdown", block)
        if "text" in self.formats and text_out is not None:
            add("text", text_out)
        for img in media_imgs:
            add("media", img["alt"], img["src"])
        if "screenshot" in self.formats or "screenshot@fullPage" in self.formats:
            kind = "screenshot@fullPage" if "screenshot@fullPage" in self.formats else "screenshot"
            add(kind, "", f"screenshot://{_md5_8(url)}")
        if "json" in self.formats:
            payload = {
                "url": url,
                "title": page.title,
                "description": next(
                    (m["content"] for m in page.metadata if m["name"] == "description"), ""
                ),
            }
            add("json", json.dumps(payload, sort_keys=True, separators=(",", ":")))

        # candidate links: scope + path rules + depth gate, DOM order
        candidates: list[str] = []
        if depth + 1 <= self.max_depth:
            for link in page.links:
                if not same_scope(self.strategy, url, link):
                    continue
                if not self.rules.should_follow(link, current_url=url):
                    continue
                candidates.append(link)
        return doc_id, spans, self.rules.should_scrape(url), candidates, page.title

    # -- batch ------------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        statuses = batch.column("status_code").to_pylist()
        depths = batch.column("depth").to_pylist()
        seqs = batch.column("discovered_seq").to_pylist()
        if "job_id" in batch.schema.names:
            job_ids = batch.column("job_id").to_pylist()
        else:
            job_ids = [self.job_id] * batch.num_rows
        doc_ids, spans_col, status_col, scrape_col, cand_col, title_col = (
            [], [], [], [], [], []
        )
        for url, html, status, depth, seq, jid in zip(
            urls, htmls, statuses, depths, seqs, job_ids
        ):
            doc_id, spans, should_scrape, candidates, title = self.parse_page(
                url, html, status, depth, seq, jid
            )
            doc_ids.append(doc_id)
            spans_col.append(spans)
            status_col.append("completed" if _is_success(status) else "failed")
            scrape_col.append(should_scrape)
            cand_col.append(candidates)
            title_col.append(title)
        # canonicalize + hash candidates here (worker side): the frontier's
        # admission gate then only does O(1) dict/set work per candidate
        canon_col = [[canonicalize(u) for u in cands] for cands in cand_col]
        key_col = [[xxh64(c) for c in cs] for cs in canon_col]
        host_col = [[host_of(c) for c in cs] for cs in canon_col]
        # don't carry page bodies forward; the browser engine's screenshot
        # binary is likewise consumed here (a real deployment's blob sink
        # writes it worker-side before this stage) — only the span's
        # media_ref key remains
        drop = ["html"] + (["screenshot"] if "screenshot" in batch.schema.names
                           else [])
        batch = batch.drop_columns(drop)
        return (
            batch.append_column("doc_id", pa.array(doc_ids, pa.string()))
            .append_column("spans", pa.array(spans_col, pa.list_(SPAN)))
            .append_column("status", pa.array(status_col, pa.string()))
            .append_column("should_scrape", pa.array(scrape_col, pa.bool_()))
            .append_column("candidates", pa.array(cand_col, pa.list_(pa.string())))
            .append_column("cand_canon", pa.array(canon_col, pa.list_(pa.string())))
            .append_column("cand_key", pa.array(key_col, pa.list_(pa.uint64())))
            .append_column("cand_host", pa.array(host_col, pa.list_(pa.string())))
            .append_column("title", pa.array(title_col, pa.string()))
        )
