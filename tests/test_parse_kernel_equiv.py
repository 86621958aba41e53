"""Property tests pinning the parse-kernel fast paths (VERDICT r3 #8 —
allocation diet) to their reference implementations:

- markdown._escape_text (single-pass fused regex) == the sequential
  13-pattern chain;
- markdown._Converter.convert_children (piece-list accumulator) == the
  naive ``_join`` fold;
- textconv._collapse_strip == ``re.sub(r"\\s+", " ", x).strip()``
  (including the ``str.split`` vs ``\\s`` alphabet identity over the BMP);
- textconv._wrap (one regex scan) == the greedy word-packing loop /
  textwrap on the collapsed single-space domain it is called on;
- htmldom.Node.remove_tags (one traversal) == remove_all per tag.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_ray.functions import markdown as M
from anycrawl_ray.functions import textconv as T
from anycrawl_ray.functions.htmldom import parse_html

MD_ALPHABET = "ab \n\\*`[]_~#>=+-0123."


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet=MD_ALPHABET, max_size=60))
def test_escape_text_matches_sequential_chain(text):
    assert M._escape_text(text) == M._escape_text_sequential(text)


def test_escape_text_goldens():
    cases = [
        "- item", "\\-", "1. x", "12. y", "=== z", "## h", "###### h",
        "####### no", "~~~code", "> quote", "*b*", "[l](u)", "a_b",
        "\\*", "*-", "-*", "+ add", "+add", "10.5", "2.\n3. x",
    ]
    for c in cases:
        assert M._escape_text(c) == M._escape_text_sequential(c), c


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet="ax\n ", max_size=8), max_size=8))
def test_convert_children_matches_join_fold(chunks):
    class FakeNode:
        kind = "document"

        def __init__(self, children):
            self.children = children

    class ChunkConv(M._Converter):
        def convert_node(self, node):  # type: ignore[override]
            return node  # chunks ARE the strings

    folded = ""
    for c in chunks:
        folded = M._join(folded, c)
    assert ChunkConv().convert_children(FakeNode(chunks)) == folded


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="a b\tc\nd\r\x0b\x0c\xa0 e", max_size=40))
def test_collapse_strip_matches_regex(text):
    assert T._collapse_strip(text) == re.sub(r"\s+", " ", text).strip()


def test_split_isspace_equals_regex_ws_over_bmp():
    ws_re = re.compile(r"\s")
    diff = [cp for cp in range(0x10000)
            if bool(ws_re.match(chr(cp))) != chr(cp).isspace()]
    assert diff == []


def _wrap_reference(text: str) -> str:
    """The pre-optimization greedy loop (old textconv._wrap)."""
    import textwrap
    if len(text) <= T._WRAP:
        return text
    if "-" in text:
        return "\n".join(textwrap.wrap(text, T._WRAP))
    lines, cur, cur_len = [], [], 0
    for w in text.split(" "):
        wl = len(w)
        if wl > T._WRAP:
            return "\n".join(textwrap.wrap(text, T._WRAP))
        add = wl + (1 if cur else 0)
        if cur_len + add > T._WRAP:
            lines.append(" ".join(cur))
            cur, cur_len = [w], wl
        else:
            cur.append(w)
            cur_len += add
    if cur:
        lines.append(" ".join(cur))
    return "\n".join(lines)


@settings(max_examples=400, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh-", min_size=1, max_size=95),
                min_size=1, max_size=12))
def test_wrap_matches_greedy_on_collapsed_domain(words):
    # _wrap is only called on _collapse_strip output: single-space
    # separated, non-empty words, no newlines
    text = " ".join(words)
    assert T._wrap(text) == _wrap_reference(text)


def test_wrap_exact_boundaries():
    for n in (79, 80, 81, 160, 161):
        text = " ".join(["abcd"] * 40)[:n].rstrip()
        assert T._wrap(text) == _wrap_reference(text)
    one = "x" * 80
    assert T._wrap(one) == one
    assert T._wrap("x" * 81) == _wrap_reference("x" * 81)
    assert T._wrap(("y" * 81) + " z") == _wrap_reference(("y" * 81) + " z")


_TAG_POOL = ["div", "p", "script", "style", "span", "meta", "link",
             "noscript", "b"]


@st.composite
def html_docs(draw):
    n = draw(st.integers(1, 14))
    parts = []
    depth = 0
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        tag = draw(st.sampled_from(_TAG_POOL))
        if kind == 0:
            parts.append(f"<{tag}>")
            depth += 1
        elif kind == 1 and depth:
            parts.append(f"</{tag}>")
            depth -= 1
        elif kind == 2:
            parts.append(draw(st.text(alphabet="ab c", max_size=6)))
        else:
            parts.append(f"<{tag}/>")
    return "".join(parts)


@settings(max_examples=200, deadline=None)
@given(html_docs())
def test_remove_tags_matches_remove_all(doc):
    a = parse_html(doc)
    b = parse_html(doc)
    for t in M._REMOVE_TAGS:
        a.remove_all(t)
    b.remove_tags(M._REMOVE_TAGS_SET)
    assert a.to_html() == b.to_html()


def _stdlib_parse(html):
    from anycrawl_ray.functions.htmldom import _TreeBuilder
    b = _TreeBuilder()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass
    return b.root


def _tree_sig(n, out):
    out.append((n.kind, n.tag, dict(n.attrs) if n.attrs else {}, n.text))
    for c in n.children:
        _tree_sig(c, out)
    out.append(("E",))
    return out


_SOUP_PIECES = [
    "<div>", "</div>", "<p>", "<P>", "</ p >", "<p/>", "<div/>", "<td/>",
    "<a href=\"/a?x=1&amp;y=2\" title=\"T 'q'\">", "<a href=/plain/path>",
    "<img src='i.png' alt=\"A&B\" />", "<input disabled>", "<br >",
    "text &amp; more", "x &lt;y&gt; &nbsp;&#65;&#x42;", "plain",
    "<!-- a comment -->", "<!-- tricky -- >", "<!DOCTYPE html>",
    "<?php echo ?>", "<script>var a='</scriptx>'+1;</script>",
    "<script>if(a<b){}</script>", "<style>.c{color:red}</style>",
    "<SCRIPT>X</SCRIPT>", "a < b", "<a href='x y'>", "<td x=1 y=2 z='3'>",
    "<a data-v=''>", "<ul><li/></ul>", "</table>", "<li>",
]


@settings(max_examples=500, deadline=None)
@given(st.lists(st.sampled_from(_SOUP_PIECES), min_size=1, max_size=12))
def test_fast_parse_matches_stdlib_or_bails(parts):
    from anycrawl_ray.functions.htmldom import _fast_parse
    doc = "".join(parts)
    fast = _fast_parse(doc)
    if fast is None:  # outside the strict subset: stdlib path used
        return
    assert _tree_sig(fast, []) == _tree_sig(_stdlib_parse(doc), [])


def test_fast_parse_covers_synthetic_corpus():
    """Every synthetic-site page must take the fast path AND match the
    stdlib tree node-for-node (kinds, tags, attrs, text)."""
    from anycrawl_ray.functions.htmldom import _fast_parse
    from anycrawl_ray.sources.synthetic_site import build_site_table

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    for h in pages.column("html").to_pylist()[:200]:
        fast = _fast_parse(h)
        assert fast is not None
        assert _tree_sig(fast, []) == _tree_sig(_stdlib_parse(h), [])
