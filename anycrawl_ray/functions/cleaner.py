"""HTML cleaning + URL-rewrite transforms (per-record pure functions).

Reproduces ``HTMLTransformer`` from the reference
(packages/scrape/src/core/transformers/HTMLTransformer.ts):

- ``EXCLUDE_NON_MAIN_TAGS`` replicated verbatim (ts:21-66);
- clean-HTML extraction with ``include_tags`` / ``exclude_tags`` and
  comment removal (ts:105-144);
- relative->absolute rewrite of ``a[href]``, ``img[src]``, ``img[srcset]``
  with malformed ``http:/`` fixups (ts:215-384);
- srcset best-image promotion: parse ``2x`` / ``800w`` descriptors, sort by
  size descending, promote the largest to ``src`` (ts:235-318).

Also the page-level extractors from ``DataExtractor``:
- title = ``$('title').text().trim()`` (DataExtractor.ts:159-166);
- metadata = every ``<meta>`` with (name|property) + content
  (DataExtractor.ts:175-198);
- link discovery in DOM order (Base.ts:376-423 walks anchors in document
  order via Crawlee ``enqueueLinks``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .htmldom import Node, parse_html
from .urls import resolve_url

# Verbatim from HTMLTransformer.ts:21-66
EXCLUDE_NON_MAIN_TAGS: list[str] = [
    "header", "footer", "nav", "aside",
    ".header", ".top", ".navbar", "#header",
    ".footer", ".bottom", "#footer",
    ".sidebar", ".side", ".aside", "#sidebar",
    ".modal", ".popup", "#modal", ".overlay",
    ".ad", ".ads", ".advert", "#ad",
    ".lang-selector", ".language", "#language-selector",
    ".social", ".social-media", ".social-links", "#social",
    ".menu", ".navigation", "#nav",
    ".breadcrumbs", "#breadcrumbs",
    ".share", "#share",
    ".widget", "#widget",
    ".cookie", "#cookie",
    "script", "style", "noscript",
]

_NON_MAIN_SELECTOR = ", ".join(EXCLUDE_NON_MAIN_TAGS)

# set-form of the same list (derived, not transcribed): one O(1) check per
# element instead of 44 compiled-selector probes — the hot path of cleaning
_NM_TAGS = frozenset(s for s in EXCLUDE_NON_MAIN_TAGS if not s.startswith((".", "#")))
_NM_IDS = frozenset(s[1:] for s in EXCLUDE_NON_MAIN_TAGS if s.startswith("#"))
_NM_CLASSES = frozenset(s[1:] for s in EXCLUDE_NON_MAIN_TAGS if s.startswith("."))


def _prune_non_main_and_comments(node: Node) -> None:
    """Single recursive pass removing non-main elements (tag/id/class set
    membership — semantics identical to the selector list, asserted by
    tests) and comment nodes."""
    kept = []
    for child in node.children:
        if child.kind == "comment":
            child.parent = None
            continue
        if child.kind == "element":
            if child.tag in _NM_TAGS or child.attrs.get("id") in _NM_IDS:
                child.parent = None
                continue
            cls = child.attrs.get("class")
            if cls and not _NM_CLASSES.isdisjoint(cls.split()):
                child.parent = None
                continue
            _prune_non_main_and_comments(child)
        kept.append(child)
    node.children = kept


@dataclass
class PageExtract:
    """Everything one parse of a page yields (single DOM walk per concern)."""

    url: str
    title: str = ""
    metadata: list[dict] = field(default_factory=list)  # {name, content, property?}
    links: list[str] = field(default_factory=list)  # absolute, DOM order
    images: list[dict] = field(default_factory=list)  # {src, alt} absolute, DOM order


def remove_comments(root: Node) -> None:
    for n in list(root.iter()):
        if n.kind == "comment":
            n.detach()


def transform_relative_urls(root: Node, base_url: str) -> None:
    """Absolute-ize img srcset, img src, a href (HTMLTransformer.ts:215-360).

    Order matters: srcset handling may promote the largest source into
    ``src`` *before* the plain src pass would have resolved it — the
    reference runs all three "concurrently" on distinct attributes but
    srcset writes ``src`` last-wins; we apply srcset first then src resolve
    is a no-op on already-absolute values.
    """
    # ONE document-order walk (was three full-tree selects): per node the
    # srcset promotion runs before the src resolve, exactly the pass order
    # of the separate loops (operations are per-node independent)
    for node in root.elements():
        if node.tag == "img":
            if node.get("srcset"):
                _transform_srcset(node, base_url)
            src = node.get("src")
            if src:
                node.attrs["src"] = resolve_url(base_url, src)
        elif node.tag == "a":
            href = node.get("href")
            if href:
                node.attrs["href"] = resolve_url(base_url, href)


def _parse_srcset_entry(entry: str) -> tuple[str, float, bool]:
    """-> (url, size, is_pixel_density); default descriptor '1x'
    (HTMLTransformer.ts:247-278)."""
    parts = entry.split()
    if not parts:
        return "", 1.0, True
    url = parts[0]
    descriptor = parts[1] if len(parts) > 1 else "1x"
    size, is_px = 1.0, True
    if descriptor.endswith("x"):
        try:
            size = float(descriptor[:-1])
        except ValueError:
            pass
    elif descriptor.endswith("w"):
        try:
            size = int(descriptor[:-1])
            is_px = False
        except ValueError:
            pass
    return url, size, is_px


def _transform_srcset(img: Node, base_url: str) -> None:
    srcset = img.get("srcset")
    if not srcset:
        return
    entries = [e.strip() for e in srcset.split(",")]
    sources: list[tuple[str, float, bool]] = []
    for entry in entries:
        if not entry:
            continue
        url, size, is_px = _parse_srcset_entry(entry)
        sources.append((resolve_url(base_url, url), size, is_px))
    # all pixel-density -> consider the existing src as a 1x candidate
    if sources and all(s[2] for s in sources):
        src = img.get("src")
        if src:
            sources.append((resolve_url(base_url, src), 1.0, True))
    # stable sort by size desc; promote the largest to src
    sources.sort(key=lambda s: -s[1])
    if sources:
        img.attrs["src"] = sources[0][0]
    # rebuild srcset with absolute URLs, preserving descriptors
    rebuilt = []
    for entry in entries:
        parts = entry.split()
        if not parts:
            rebuilt.append(entry)
            continue
        absolute = resolve_url(base_url, parts[0])
        rebuilt.append(f"{absolute} {parts[1]}" if len(parts) > 1 else absolute)
    img.attrs["srcset"] = ", ".join(rebuilt)


def extract_clean_html(
    root: Node,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
) -> str:
    """Clean-HTML extraction (HTMLTransformer.ts:105-144). Mutates ``root``.

    include_tags non-empty -> concatenation of matching elements' HTML
    wrapped semantics of ``$root.html()`` (inner html of the collector div);
    else remove non-main selectors, then exclude_tags, then comments, and
    serialize the full document.
    """
    if include_tags:
        buf: list[str] = []
        for selector in include_tags:
            for el in root.select(selector):
                buf.append(el.to_html())
        return "".join(buf)
    clean_tree(root, exclude_tags)
    return root.to_html()


def clean_tree(root: Node, exclude_tags: list[str] | None = None) -> None:
    """In-place standard cleaning: non-main selectors, exclude_tags,
    comments (the mutation half of ``extract_clean_html``)."""
    _prune_non_main_and_comments(root)
    if exclude_tags:
        for selector in exclude_tags:
            root.remove_all(selector)


def transform_html(
    html: str,
    base_url: str,
    include_tags: list[str] | None = None,
    exclude_tags: list[str] | None = None,
    transform_relative: bool = True,
) -> str:
    """Full ``transformHtml`` (HTMLTransformer.ts:77-88): parse a fresh tree,
    rewrite relative URLs, then clean/extract."""
    root = parse_html(html)
    if transform_relative:
        transform_relative_urls(root, base_url)
    return extract_clean_html(root, include_tags, exclude_tags)


_WS = re.compile(r"\s+")


def extract_page(html: str, url: str) -> PageExtract:
    """One-pass page extract: title, metadata, absolute links and images in
    DOM order (DataExtractor.ts:136-198 + Base.ts link walk)."""
    return extract_page_from_tree(parse_html(html), url)


def extract_page_from_tree(root: Node, url: str) -> PageExtract:
    """Read-only extraction from an already-parsed tree — lets the parse
    stage share ONE DOM parse between extraction and transformation
    (the extraction never mutates; callers may mutate afterwards)."""
    out = PageExtract(url=url)
    # ONE document-order walk collecting title/meta/links/images (was four
    # full-tree selects); per-kind collection order equals the separate
    # selects since both are document order
    title_done = False
    for node in root.elements():
        tag = node.tag
        if tag == "title" and not title_done:
            out.title = node.text_content().strip()
            title_done = True
        elif tag == "meta":
            name = node.get("name")
            prop = node.get("property")
            content = node.get("content")
            if (name or prop) and content:
                entry = {"name": name or prop, "content": content.strip()}
                if prop:
                    entry["property"] = prop
                out.metadata.append(entry)
        elif tag == "a":
            href = (node.get("href") or "").strip()
            if href and not href.startswith(("#", "javascript:", "mailto:",
                                             "tel:")):
                out.links.append(resolve_url(url, href))
        elif tag == "img":
            src = node.get("src")
            if src:
                out.images.append(
                    {"src": resolve_url(url, src),
                     "alt": (node.get("alt") or "").strip()})
    return out
