"""SERP engine tests: URL builders + parsers (SURVEY.md M17-M20)."""

from __future__ import annotations

import json

from anycrawl_ray.serp.engines import (
    ac_engine_parse,
    ac_engine_url,
    build_search_url,
    google_parse,
    google_url,
    searxng_parse,
    searxng_url,
)
from anycrawl_ray.sources.serp_fixtures import build_serp_pages
from anycrawl_ray.pipelines.search import run_search

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_google_url_params():
    url = google_url("hello world", page=2, lang="fr", country="FR", limit=20,
                     time_range="week", safe_search=2)
    assert url.startswith("https://www.google.fr/search?")
    assert "q=hello+world" in url
    assert "start=20" in url  # (page-1) * per_page
    assert "hl=fr-FR" in url and "cr=countryFR" in url and "lr=lang_fr" in url
    assert "num=20" in url and "tbs=qdr%3Aw" in url and "safe=high" in url
    assert "arc_id%3Asrp_" in url
    # deterministic: same inputs -> same arc id
    assert url == google_url("hello world", page=2, lang="fr", country="FR",
                             limit=20, time_range="week", safe_search=2)


def test_google_parser_selectors_and_decoys():
    pages = build_serp_pages(DOCS, "google", limit=10)
    results = google_parse(pages[0]["body"])
    assert len(results) == 10  # decoys skipped
    assert results[0]["title"] == "Doc 0 result"
    assert results[0]["url"] == "http://result.test/d/0"
    assert "track();" not in results[0]["description"]  # script removed
    assert results[0]["source"] == "Google Search Result"


def test_searxng_url_and_parser():
    url = searxng_url("http://sx.local", "q", page=3, lang="de", sources="news",
                      time_range="month", safe_search=1)
    assert "pageno=3" in url and "language=de" in url
    assert "categories=news" in url and "time_range=month" in url and "safesearch=1" in url
    body = json.dumps({"results": [
        {"title": "t", "url": "http://u", "content": "c", "category": "images",
         "engine": "bing", "img_src": "http://i", "resolution": "1000×1500",
         "positions": [3], "img_format": "jpeg"},
        {"title": "no url entry"},
        {"title": "n", "url": "http://n", "content": "s", "category": "news",
         "publishedDate": "2024-02-02", "thumbnail": "http://th"},
    ]})
    out = searxng_parse(body)
    assert len(out) == 2
    assert out[0]["imageWidth"] == 1000 and out[0]["imageHeight"] == 1500
    assert out[0]["position"] == 3
    assert out[0]["source"] == "SearXNG (bing)"
    assert out[1]["date"] == "2024-02-02" and out[1]["imageUrl"] == "http://th"
    assert searxng_parse("not json") == []


def test_ac_engine_url_limit_inference():
    # limit wins; else page * 10 (ACEngine.ts:29-37)
    assert "limit=25" in ac_engine_url("http://ac", "q", limit=25, page=9)
    assert "limit=30" in ac_engine_url("http://ac", "q", page=3)
    assert "limit=" not in ac_engine_url("http://ac", "q")
    out = ac_engine_parse(json.dumps({"results": [
        {"title": "a", "url": "http://a", "description": "d", "category": "news",
         "date": "2024-03-03"}]}))
    assert out[0]["category"] == "news" and out[0]["source"] == "AC-Engine"


def test_search_pipeline_limit_and_order():
    pages = build_serp_pages(DOCS, "google", limit=35)
    res = run_search(pages, limit=35)
    assert res.num_rows == 35
    # ordered by (page, position)
    assert res.column("page").to_pylist() == [p // 10 + 1 for p in range(35)]
    assert res.column("position").to_pylist() == [p % 10 for p in range(35)]


def test_search_enrichment_join():
    from anycrawl_ray.sources.synthetic_site import build_site_table, page_url

    site = build_site_table(DOCS)
    # craft serp results whose URLs are site pages (+ one miss)
    hit0, hit1 = page_url(1), page_url(2)
    body = json.dumps({"results": [
        {"title": "A", "url": hit0, "content": "x"},
        {"title": "B", "url": "http://missing.test/", "content": "y"},
        {"title": "C", "url": hit1, "content": "z"},
    ]})
    res = run_search([{"engine": "searxng", "query": "q", "page": 1, "body": body}],
                     limit=10, scrape_pages=site, scrape_formats=["markdown"])
    spans = res.column("spans").to_pylist()
    assert spans[0] is not None and spans[0][0]["kind"] == "title"
    assert spans[1] is None  # left-outer: unmatched passes through
    assert spans[2] is not None


def test_build_search_url_dispatch():
    assert build_search_url("google", "x").startswith("https://www.google.com")
    assert "/search?q=x" in build_search_url("ac-engine", "x", base_url="http://ac")
    try:
        build_search_url("nope", "x")
        raise AssertionError("should raise")
    except ValueError:
        pass


def test_google_locale_tables_complete():
    """Full GoogleParameters port (packages/libs/src/data/Google.ts):
    table sizes + spot rows from each section."""
    from anycrawl_ray.serp.google_data import (
        LANGUAGES,
        REGIONS,
        SUPPORTED_DOMAINS,
    )

    assert len(SUPPORTED_DOMAINS) == 186
    assert len(LANGUAGES) == 132
    assert len(REGIONS) == 260
    # quirky rows transcribed exactly
    assert SUPPORTED_DOMAINS["CN"] == "www.google.com.hk"  # mainland -> HK
    assert SUPPORTED_DOMAINS["CAT"] == "www.google.cat"
    assert LANGUAGES["zh"] == "lang_zh-CN"
    assert LANGUAGES["zh_Hant"] == "lang_zh-TW"
    assert LANGUAGES["en"] == "lang_en"
    assert REGIONS["en-US"] == "US"
    assert REGIONS["pt-BR"] == "BR"


def test_google_url_every_locale_row():
    """Table-driven: for EVERY region row, the built URL uses the mapped
    domain (or the www.google.com fallback), hl = lang_code-REGION,
    lr = the language table entry, cr = countryREGION."""
    from urllib.parse import parse_qs, urlparse

    from anycrawl_ray.serp.engines import (
        GOOGLE_SKIP_COUNTRIES,
        google_url,
    )
    from anycrawl_ray.serp.google_data import (
        LANGUAGES,
        REGIONS,
        SUPPORTED_DOMAINS,
    )

    for locale, region in REGIONS.items():
        lang, _, country = locale.partition("-")
        url = google_url("q", lang=lang, country=country)
        parsed = urlparse(url)
        qs = parse_qs(parsed.query)
        eng_lang = LANGUAGES.get(lang, "en")
        lang_code = eng_lang.split("_")[1] if "_" in eng_lang else eng_lang
        if country in GOOGLE_SKIP_COUNTRIES:
            # pairing skipped -> fallback region for the bare language
            expect_region = next(
                (v for k, v in REGIONS.items()
                 if k.startswith(f"{lang}-")
                 and v.upper() not in GOOGLE_SKIP_COUNTRIES), "US")
        else:
            expect_region = region
        assert parsed.netloc == SUPPORTED_DOMAINS.get(
            expect_region.upper(), "www.google.com"), locale
        assert qs["hl"][0] == f"{lang_code}-{expect_region}", locale
        assert qs["lr"][0] == eng_lang, locale
        assert qs["cr"][0] == f"country{expect_region}", locale


def test_google_url_unknown_locale_falls_back_to_us():
    from urllib.parse import parse_qs, urlparse

    from anycrawl_ray.serp.engines import google_url

    url = google_url("q", lang="xx", country="YY")
    parsed = urlparse(url)
    qs = parse_qs(parsed.query)
    assert parsed.netloc == "www.google.com"
    assert qs["hl"][0] == "en-US"
    assert qs["cr"][0] == "countryUS"
