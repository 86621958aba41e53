"""URL canonicalization, resolution and hashing.

Reproduces the observable URL semantics of the reference crawler:

- malformed-scheme fixups ``http:/x`` -> ``http://x`` before resolution
  (reference: packages/scrape/src/core/transformers/HTMLTransformer.ts:366-384);
- per-job unique keys ``{job_id}-{canonical_url}`` used for frontier dedup
  (reference: packages/scrape/src/engines/Base.ts:412-420 — Crawlee
  ``Request.computeUniqueKey`` with fragment stripping and case
  normalization).

The canonicalizer is pinned by an explicit documented rule set (SURVEY.md
§7.5#2) rather than byte-matching the Crawlee dependency:

1. scheme and host lowercased;
2. fragment stripped;
3. default ports (80/http, 443/https) stripped;
4. empty path -> "/";
5. query string preserved verbatim including parameter order;
6. surrounding whitespace trimmed.

``url_key`` is the 64-bit xxHash (XXH64, seed 0) of the canonical URL —
the partition/dedup key for the seen-set (north_rule: "canonicalized-URL
xxhash keys"). Implemented in pure Python (no xxhash wheel in the sandbox);
vectorized batch hashing loops per-row but only runs on candidate-link
batches, never on document payloads.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urljoin

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes | str, seed: int = 0) -> int:
    """XXH64 of ``data`` (standard algorithm, seed 0 by default)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while idx <= limit:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while idx + 8 <= n:
        h ^= _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        idx += 8
    if idx + 4 <= n:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        idx += 4
    while idx < n:
        h ^= (data[idx] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        idx += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def fix_malformed_scheme(url: str) -> str:
    """``http:/x`` -> ``http://x`` (HTMLTransformer.ts:366-374 semantics)."""
    if url.startswith("http:/") and not url.startswith("http://"):
        return "http://" + url[6:]
    if url.startswith("https:/") and not url.startswith("https://"):
        return "https://" + url[7:]
    return url


def resolve_url(base_url: str, relative_url: str) -> str:
    """Resolve ``relative_url`` against ``base_url`` with malformed fixups.

    On failure returns the original string (HTMLTransformer.ts:379-383).
    """
    fixed = fix_malformed_scheme(relative_url)
    try:
        return urljoin(base_url, fixed)
    except ValueError:
        return relative_url


def canonicalize(url: str) -> str:
    """Canonical form used for the URL-seen set (rule set in module docstring)."""
    url = fix_malformed_scheme(url.strip())
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if "@" in netloc:
        userinfo, _, hostport = netloc.rpartition("@")
        userinfo += "@"
    else:
        userinfo, hostport = "", netloc
    if scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    elif scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    path = parts.path or "/"
    out = f"{scheme}://{userinfo}{hostport}{path}"
    if parts.query:
        out += "?" + parts.query
    return out


def url_key(url: str) -> int:
    """64-bit seen-set / partition key of a URL (xxh64 of its canonical form)."""
    return xxh64(canonicalize(url))


def unique_key(job_id: str, url: str) -> str:
    """Per-job dedup key, mirroring ```${jobId}-${computeUniqueKey(...)}```
    (Base.ts:412-420)."""
    return f"{job_id}-{canonicalize(url)}"


def host_of(url: str) -> str:
    """Lowercased host (no port) of a URL; '' when unparseable."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def _domain_of(host: str) -> str:
    """Registrable-domain approximation: last two labels (suffix-list-free).

    Matches how the reference's 'same-domain' strategy groups hosts for the
    hostnames used in tests/fixtures (no multi-part public suffixes there).
    """
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


def origin_of(url: str) -> str:
    try:
        p = urlsplit(url)
        return f"{p.scheme.lower()}://{(p.netloc or '').lower()}"
    except ValueError:
        return ""


def same_scope(strategy: str, seed_url: str, link_url: str) -> bool:
    """Crawl scope predicate: ``all | same-domain | same-hostname | same-origin``
    (Crawlee EnqueueStrategy semantics; reference Base.ts:380-389 passes the
    strategy straight through to ``enqueueLinks``).
    """
    if strategy == "all":
        return link_url.split(":", 1)[0].lower() in ("http", "https")
    seed_host, link_host = host_of(seed_url), host_of(link_url)
    if not seed_host or not link_host:
        return False
    if strategy == "same-hostname":
        return seed_host == link_host
    if strategy == "same-origin":
        return origin_of(seed_url) == origin_of(link_url)
    # default: same-domain (www. is stripped by Crawlee's same-domain too)
    return _domain_of(seed_host.removeprefix("www.")) == _domain_of(
        link_host.removeprefix("www.")
    )


def crawl_data_kv_key(job_id: str, url: str) -> str:
    """Per-page KV summary key: ``crawl-data-{jobId}-{base64(url)}``
    (Base.ts:507-516 storeCrawlData). Standard base64 with padding, like
    Buffer.toString('base64')."""
    import base64

    return f"crawl-data-{job_id}-{base64.b64encode(url.encode()).decode()}"
