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
        assert c["chunk"].strip()
