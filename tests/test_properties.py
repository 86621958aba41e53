"""Property-based tests (hypothesis) for the pure kernels."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_ray.functions.htmldom import parse_html
from anycrawl_ray.functions.markdown import html_to_markdown, markdown_from_tree
from anycrawl_ray.functions.urls import canonicalize, resolve_url, url_key, xxh64
from anycrawl_ray.stages.llm_extract import split_text_into_chunks

_URLS = st.builds(
    lambda scheme, host, path, q, frag: f"{scheme}://{host}{path}{q}{frag}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.from_regex(r"[a-zA-Z0-9]{1,10}(\.[a-zA-Z]{2,5}){1,2}(:[0-9]{2,4})?", fullmatch=True),
    st.from_regex(r"(/[a-zA-Z0-9._~-]{0,8}){0,4}", fullmatch=True),
    st.sampled_from(["", "?a=1", "?b=2&a=1", "?x=%20y"]),
    st.sampled_from(["", "#frag", "#a/b"]),
)


@settings(max_examples=200)
@given(_URLS)
def test_canonicalize_idempotent(url):
    c = canonicalize(url)
    assert canonicalize(c) == c
    assert url_key(url) == xxh64(c)
    assert "#" not in c.split("?")[0] or "#" not in c


@settings(max_examples=100)
@given(_URLS, st.from_regex(r"[a-zA-Z0-9./_-]{0,20}", fullmatch=True))
def test_resolve_never_raises(base, rel):
    out = resolve_url(base, rel)
    assert isinstance(out, str)


_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=300,
)


@settings(max_examples=150)
@given(_TEXT)
def test_parse_html_total(text):
    # parser never raises, serialization round-trips to a parseable doc
    root = parse_html(text)
    html = root.to_html()
    parse_html(html)


_SIMPLE_HTML = st.recursive(
    st.sampled_from(["hello", "a b  c", "x [y]", "*z*", ""]),
    lambda inner: st.builds(
        lambda tag, body: f"<{tag}>{body}</{tag}>",
        st.sampled_from(["p", "div", "span", "em", "strong", "h1", "ul", "li",
                         "blockquote", "figure"]),
        inner,
    ),
    max_leaves=8,
)


@settings(max_examples=150)
@given(_SIMPLE_HTML)
def test_markdown_tree_path_equivalence(html):
    # the optimized tree path must equal the string-prepass path
    assert markdown_from_tree(parse_html(html)) == html_to_markdown(html)


@settings(max_examples=100)
@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=40), max_size=30),
       st.integers(min_value=5, max_value=50), st.integers(min_value=0, max_value=10))
def test_chunker_covers_all_content(lines, max_tokens, overlap):
    text = "\n".join(lines)
    chunks = split_text_into_chunks(text, max_tokens, overlap)
    joined = "\n".join(c["chunk"] for c in chunks)
    for line in lines:
        if line.strip():
            assert line.strip() in joined or line in joined
    for c in chunks:
        # Reference quirk (TextChunker.ts:36-41): a chunk built solely from
        # whitespace lines is pushed as "" after trim; any content line in the
        # chunk's range must make the chunk non-empty.
        if not c["chunk"].strip():
            assert all(not ln.strip()
                       for ln in lines[c["start_index"]:c["end_index"] + 1])


# ---------------------------------------------------------- round-2 props
@st.composite
def json_schemas(draw, depth=0):
    prim = st.sampled_from(["string", "number", "integer", "boolean"])
    if depth >= 2:
        t = draw(prim)
        out = {"type": t}
    else:
        t = draw(st.sampled_from(["string", "number", "integer", "boolean",
                                  "array", "object"]))
        if t == "array":
            out = {"type": "array", "items": draw(json_schemas(depth=depth + 1))}
        elif t == "object":
            keys = draw(st.lists(st.text(alphabet="abcdef", min_size=1,
                                         max_size=4), max_size=3, unique=True))
            out = {"type": "object",
                   "properties": {k: draw(json_schemas(depth=depth + 1))
                                  for k in keys}}
        else:
            out = {"type": t}
    if draw(st.booleans()):
        out["default"] = "x"
    if draw(st.booleans()):
        out["description"] = draw(st.text(max_size=8))
    return out


@given(json_schemas())
@settings(max_examples=60, deadline=None)
def test_normalize_schema_idempotent_and_default_free(schema):
    from anycrawl_ray.functions.json_schema import normalize_schema

    once = normalize_schema(schema)
    assert normalize_schema(once) == once  # idempotent

    def no_defaults(node):
        if isinstance(node, dict):
            assert "default" not in node
            for v in node.values():
                no_defaults(v)
        elif isinstance(node, list):
            for v in node:
                no_defaults(v)

    no_defaults(once)

    def objects_closed(node):
        if isinstance(node, dict):
            if node.get("type") == "object":
                assert node.get("additionalProperties") is False
            for v in node.values():
                objects_closed(v)

    objects_closed(once)


@given(st.lists(st.text(alphabet="abc \n\t", max_size=20), min_size=1,
                max_size=5),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=60, deadline=None)
def test_schema_stub_always_validates(texts, n_extra):
    """Whatever the input text, the stub extractor's merged output always
    conforms to its own normalized schema (the generateObject guarantee)."""
    from anycrawl_ray.stages.llm_extract import SchemaStubExtractor

    opts = {"schema": {"type": "object",
                       "properties": {"s": {"type": "string"},
                                      "n": {"type": "integer"},
                                      "ks": {"type": "array",
                                             "items": {"type": "string"}},
                                      "m": {"type": "object",
                                            "properties": {"b": {"type": "boolean"}}}},
                       "required": ["s"]}}
    ex = SchemaStubExtractor(opts, max_input_tokens=32, overlap_tokens=4)
    for t in texts:
        merged, _n, valid = ex.extract_document(t)
        if merged is not None:
            assert valid


@given(st.integers(min_value=0, max_value=59),
       st.integers(min_value=0, max_value=23))
@settings(max_examples=40, deadline=None)
def test_cron_next_always_matches(minute, hour):
    from datetime import datetime, timezone

    from anycrawl_ray.state.scheduler import Cron

    c = Cron(f"{minute} {hour} * * *")
    nxt = c.next_after(datetime(2026, 3, 14, 15, 9, tzinfo=timezone.utc))
    assert c.matches(nxt)
    assert nxt.minute == minute and nxt.hour == hour
    # strictly in the future AND minimal: the slot one period earlier is
    # not after the probe (i.e. next_after returned the FIRST valid slot)
    from datetime import timedelta

    probe = datetime(2026, 3, 14, 15, 9, tzinfo=timezone.utc)
    assert nxt > probe
    assert nxt - timedelta(days=1) <= probe


# ---- shared window/dedup bucket kernels (pure numpy) ----

import numpy as np

from anycrawl_ray.stages.dedup import _segment_pair_counts, winnow_fingerprints
from anycrawl_ray.stages.window import _segment_cumsum


@settings(max_examples=150)
@given(st.lists(st.tuples(st.integers(0, 5),
                          st.integers(-100, 100)), max_size=60))
def test_segment_cumsum_matches_per_segment_loop(rows):
    rows.sort(key=lambda r: r[0])
    seg = np.asarray([r[0] for r in rows], dtype=np.int64)
    vals = np.asarray([r[1] for r in rows], dtype=np.int64)
    boundary = np.concatenate(([True], seg[1:] != seg[:-1])) \
        if seg.size else np.zeros(0, dtype=bool)
    got = _segment_cumsum(boundary, vals)
    want, acc, prev = [], 0, None
    for s, v in rows:
        acc = v if s != prev else acc + v
        prev = s
        want.append(acc)
    assert got.tolist() == want


@settings(max_examples=150)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 9)),
                max_size=50))
def test_segment_pair_counts_matches_bruteforce(rows):
    # distinct (segment, doc) rows sorted by (segment, doc) — the kernel's
    # input contract (per-doc-distinct fingerprints / grams)
    rows = sorted(set(rows))
    keys = np.asarray([r[0] for r in rows], dtype=np.int64)
    docs = np.asarray([r[1] for r in rows], dtype=np.int64)
    got = _segment_pair_counts(keys, docs)
    from collections import Counter
    want: Counter = Counter()
    by_seg: dict[int, list[int]] = {}
    for s, d in rows:
        by_seg.setdefault(s, []).append(d)
    for ds_ in by_seg.values():
        ds_ = sorted(ds_)
        for i in range(len(ds_)):
            for j in range(i + 1, len(ds_)):
                want[(ds_[i], ds_[j])] += 1
    got_map = dict(zip(zip(got["a"].tolist(), got["b"].tolist()),
                       got["cnt"].tolist()))
    assert got_map == dict(want)


@settings(max_examples=80)
@given(st.integers(0, 2**32), st.integers(0, 2**32),
       st.integers(6, 12))
def test_winnow_guarantee_property(seed_a, seed_b, run_len):
    """Random docs sharing a token run of >= w+k-1 tokens ALWAYS share a
    winnowing fingerprint (the SIGMOD'03 guarantee), for k=3, w=4."""
    rng_a = np.random.default_rng(seed_a)
    rng_b = np.random.default_rng(seed_b)
    shared = " ".join(f"s{i}" for i in range(run_len))  # >= w+k-1 = 6
    a = " ".join(f"a{x}" for x in rng_a.integers(0, 50, 10)) + " " + shared \
        + " " + " ".join(f"a{x}" for x in rng_a.integers(0, 50, 10))
    b = " ".join(f"b{x}" for x in rng_b.integers(0, 50, 10)) + " " + shared \
        + " " + " ".join(f"b{x}" for x in rng_b.integers(0, 50, 10))
    fa = set(winnow_fingerprints(a, 3, 4).tolist())
    fb = set(winnow_fingerprints(b, 3, 4).tolist())
    assert fa & fb


@settings(max_examples=150)
@given(st.binary(min_size=0, max_size=64), st.binary(min_size=0, max_size=64))
def test_phash_deterministic_and_mean_bit_rule(p1, p2):
    import numpy as np

    from anycrawl_ray.stages.media import (_grids_from_seeds,
                                           fnv1a_bytes_bulk,
                                           phash64_from_payloads)

    h = phash64_from_payloads([p1, p2, p1])
    assert h[0] == h[2]  # pure function of payload bytes
    if p1 != p2:
        # avalanche grids: distinct payloads virtually never collide
        assert h[0] != h[1] or p1 == p2
    # bit i == (cell_i * 64 > sum) against a naive recompute
    seeds = np.array(fnv1a_bytes_bulk([p1]), dtype=np.uint64)
    grid = _grids_from_seeds(seeds).reshape(64).astype(np.int64)
    tot = int(grid.sum())
    want = 0
    for i in range(64):
        if grid[i] * 64 > tot:
            want |= 1 << i
    assert int(h[0]) == want


@settings(max_examples=200)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1),
       st.lists(st.integers(min_value=0, max_value=63), min_size=0,
                max_size=3, unique=True))
def test_band_explode_pigeonhole_guarantee(sig, flip_bits):
    """Any two signatures within Hamming distance 3 share at least one
    of the 4 16-bit band keys — the property the blocking correctness
    rests on."""
    import numpy as np
    import pyarrow as pa

    from anycrawl_ray.stages.dedup import _band_explode

    a = np.uint64(sig)
    b = a
    for bit in flip_bits:
        b = b ^ np.uint64(1 << bit)
    t = _band_explode(pa.array([0, 1], pa.int64()),
                      np.array([a, b], dtype=np.uint64))
    df = t.to_pandas()
    keys_a = set(map(tuple, df[df["doc_id"] == 0][["band_id", "band_key"]].values))
    keys_b = set(map(tuple, df[df["doc_id"] == 1][["band_id", "band_key"]].values))
    assert keys_a & keys_b  # pigeonhole: <=3 flipped bits, 4 bands


@settings(max_examples=200)
@given(st.lists(st.booleans(), max_size=40))
def test_greedy_merge_positions_match_sequential_scan(mask):
    """The run-parity closed form equals the sequential greedy scan."""
    import numpy as np

    from anycrawl_ray.stages.text_analysis import _greedy_merge_positions

    idx = np.flatnonzero(np.asarray(mask, dtype=bool))
    kept, last = [], -2
    for i in idx.tolist():
        if i > last + 1:
            kept.append(i)
            last = i
    assert _greedy_merge_positions(idx).tolist() == kept


@settings(max_examples=100)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 9)),
                max_size=40))
def test_segment_pair_counts_weighted_sum(rows):
    """With per-row weights (constant within a key segment), wsum must
    equal the brute-force sum of shared-key weights per pair."""
    from collections import Counter

    from anycrawl_ray.stages.dedup import _segment_pair_counts

    rows = sorted(set(rows))
    keys = np.asarray([r[0] for r in rows], dtype=np.int64)
    docs = np.asarray([r[1] for r in rows], dtype=np.int64)
    w_of_key = {k: (k * 13 + 7) for k in set(keys.tolist())}
    weights = np.asarray([w_of_key[k] for k in keys.tolist()],
                         dtype=np.int64)
    got = _segment_pair_counts(keys, docs, weights=weights)
    want: Counter = Counter()
    by_seg: dict[int, list[int]] = {}
    for s, d in rows:
        by_seg.setdefault(s, []).append(d)
    for s, ds_ in by_seg.items():
        ds_ = sorted(ds_)
        for i in range(len(ds_)):
            for j in range(i + 1, len(ds_)):
                want[(ds_[i], ds_[j])] += w_of_key[s]
    got_map = dict(zip(zip(got["a"].tolist(), got["b"].tolist()),
                       got["wsum"].tolist()))
    assert got_map == dict(want)


def _leb128_len(v: int) -> int:
    n = 1
    while v >= 128:
        v >>= 7
        n += 1
    return n


@settings(max_examples=200)
@given(st.integers(1, 2**62))
def test_varint_width_matches_leb128(gap):
    """The digitize-based varint width == the length of an actual
    LEB128 encoding for every positive gap."""
    from anycrawl_ray.stages.text_analysis import _VARINT_EDGES

    got = 1 + int(np.digitize(np.asarray([gap], dtype=np.int64),
                              _VARINT_EDGES, right=False)[0])
    assert got == _leb128_len(gap)


@settings(max_examples=200)
@given(st.integers(0, 5 * 10**9), st.integers(1, 3 * 10**9),
       st.integers(2, 10**9))
def test_hits_normalization_decomposition_exact(s, total, scale):
    """(s//A)*scale + ((s%A)*scale)//A == s*scale//A (Python bigints as
    the oracle) — the overflow-free form hits_int normalizes with."""
    lhs = (s // total) * scale + ((s % total) * scale) // total
    assert lhs == (s * scale) // total


def test_sql_xxh64_matches_python_on_short_strings():
    """The oracle kernel's XXH64 CTE replica is bit-exact vs the Python
    implementation for every input length 0..31 (all three tail paths)."""
    import duckdb

    from anycrawl_ray.pipelines import oracle_kernels as ok

    con = duckdb.connect()
    con.execute(ok.U64_PRELUDE)
    con.execute(ok.XXH_MACROS)
    cases = [""]
    # cover every length with mixed bytes, plus URL-shaped strings
    for n in range(1, 32):
        cases.append("".join(chr(33 + (i * 7) % 90) for i in range(n)))
    cases += ["site0.test", "site3.test", "http://site1.test/p/004242"]
    vals = ", ".join(f"('{c}')" for c in cases)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(u)")
    got = dict(con.execute(
        f"WITH {ok.xxh64_ctes('t', 'u')} SELECT u, xh FROM xdone"
    ).fetchall())
    for c in cases:
        assert got[c] == xxh64(c), f"mismatch for {c!r}"
    # >= 32 bytes: loud NULL, never a wrong hash
    con.execute("CREATE TABLE t2 AS SELECT repeat('a', 40) AS u")
    assert con.execute(
        f"WITH {ok.xxh64_ctes('t2', 'u')} SELECT xh FROM xdone"
    ).fetchone()[0] is None
