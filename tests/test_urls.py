"""URL canonicalization / hashing / scope predicate vectors."""

from anycrawl_ray.functions.urls import (
    canonicalize,
    fix_malformed_scheme,
    host_of,
    resolve_url,
    same_scope,
    unique_key,
    url_key,
    xxh64,
)


def test_xxh64_reference_vectors():
    # standard XXH64 test vectors (seed 0)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1
    assert xxh64("Nobody inspects the spammish repetition") == 0xFBCEA83C8A378BF1


def test_xxh64_lengths():
    # exercise every tail-length code path
    for n in range(0, 70):
        v = xxh64(bytes(range(n % 256))[:n] * 1)
        assert 0 <= v < 1 << 64


def test_canonicalize_rules():
    assert canonicalize("HTTP://Example.COM:80/a/b?x=1&y=2#frag") == (
        "http://example.com/a/b?x=1&y=2"
    )
    assert canonicalize("https://a.test:443/") == "https://a.test/"
    assert canonicalize("https://a.test:8443/p") == "https://a.test:8443/p"
    assert canonicalize("http://a.test") == "http://a.test/"
    assert canonicalize("  http://a.test/x  ") == "http://a.test/x"
    # query order preserved
    assert canonicalize("http://a.test/?b=2&a=1") == "http://a.test/?b=2&a=1"


def test_malformed_scheme_fixups():
    # HTMLTransformer.ts:366-374
    assert fix_malformed_scheme("http:/example.com") == "http://example.com"
    assert fix_malformed_scheme("https:/example.com") == "https://example.com"
    assert fix_malformed_scheme("http://ok.com") == "http://ok.com"


def test_resolve_url():
    assert resolve_url("http://a.test/x/", "y") == "http://a.test/x/y"
    assert resolve_url("http://a.test/x/", "/abs") == "http://a.test/abs"
    assert resolve_url("http://a.test/x/", "http:/b.test/c") == "http://b.test/c"
    assert resolve_url("http://a.test/", "//cdn.test/i.png") == "http://cdn.test/i.png"


def test_unique_key_is_job_scoped():
    # Base.ts:412-420 — `${jobId}-${computeUniqueKey(url)}`
    assert unique_key("j1", "http://A.test/#frag") == "j1-http://a.test/"
    assert unique_key("j1", "http://a.test/") != unique_key("j2", "http://a.test/")


def test_url_key_fragment_insensitive():
    assert url_key("http://a.test/p#x") == url_key("http://A.TEST/p")


def test_scope_strategies():
    seed = "http://www.a.test/start"
    assert same_scope("all", seed, "http://anything.example/x")
    assert not same_scope("all", seed, "ftp://a.test/x")
    assert same_scope("same-domain", seed, "http://sub.a.test/p")
    assert not same_scope("same-domain", seed, "http://b.test/p")
    assert same_scope("same-hostname", seed, "http://www.a.test/p")
    assert not same_scope("same-hostname", seed, "http://a.test/p")
    assert same_scope("same-origin", seed, "http://www.a.test/p")
    assert not same_scope("same-origin", seed, "https://www.a.test/p")


def test_host_of():
    assert host_of("http://A.Test:8080/p") == "a.test"
    assert host_of("not a url") == ""


def test_crawl_data_kv_key():
    # Base.ts:509: crawl-data-${jobId}-${Buffer.from(url).toString('base64')}
    from anycrawl_ray.functions.urls import crawl_data_kv_key

    assert crawl_data_kv_key("j1", "http://a.test/p") == \
        "crawl-data-j1-aHR0cDovL2EudGVzdC9w"
    # padding preserved (Buffer emits padded standard base64)
    assert crawl_data_kv_key("j", "x").endswith("-eA==")
