"""DuckDB SQL replicas of the dedup/fingerprint hash kernels.

The Ray-side kernels (stages/text_analysis.py, stages/dedup.py) are pure
uint64 arithmetic — FNV-1a over UTF-8 bytes, a splitmix64 finalizer, Horner
polynomial combines, xor-salt-multiply MinHash permutations, bit-vote
SimHash — so they are *exactly* expressible in ANSI-ish SQL once uint64
wraparound multiply exists. DuckDB has no u64 multiply that wraps (HUGEINT
is int128, and a u64×u64 product overflows it), so ``u64mul`` decomposes
into hi/lo 32-bit halves:

    a*b mod 2^64 = (a_lo*b + ((a_hi*b) mod 2^32)*2^32) mod 2^64

with every intermediate < 2^97, safely inside HUGEINT. Everything else is
UBIGINT xor/shift/bit_count, which DuckDB evaluates natively.

These oracles turn formerly rows-only queries into full value-hash-checked
driver rows: ``docs_fingerprint``, ``docs_minhash_pairs``,
``docs_simhash_pairs``, and the composed ``training_pipeline`` (BFS crawl
order -> markdown reconstruction -> quality/lang/exact-dedup -> MinHash
near-dup removal). The SQL recomputes signatures, band keys, bucket
admission (2..max_bucket) and exact verification from raw text — no recall
assumption, bit-identical arithmetic.

Exactness invariants mirrored from the Python side:
- tokenization is ``\\S+`` (ASCII whitespace; the synthetic corpus contains
  no unicode whitespace — already relied on by the ngram-jaccard oracle);
- token hash = mix64(fnv1a(token)), computed once per DISTINCT token and
  joined back (the SQL mirror of the per-process FNV memo);
- Horner folds use ``list_reduce`` whose first element is the fold init —
  identical to ``sum(h[i]*B^(n-1-i)) mod 2^64``;
- MinHash signature = min over shingles of ``(s ^ salt_p) * MULT``; the 64
  permutation salts are splitmix64 constants embedded as literals (computed
  from the same expression as ``dedup._PERM_SALTS``);
- empty-token docs keep the all-zeros signature / fingerprint 0 and two
  empty docs have Jaccard 1.0, matching ``dedup.jaccard``;
- the jaccard >= 0.5 admission threshold is the exact integer form
  ``2*i >= union``; the reported score is ``ROUND(i/union*1e6)`` — the same
  float64 division as numpy, with tie-rounding differences impossible at
  integer microscale (validated across sf0.001/0.01/0.1);
- float-score scaling elsewhere uses ``round_even(x, 0)`` = banker's
  rounding = ``np.rint`` bit-parity on identical float64 inputs.
"""

from __future__ import annotations

import numpy as np


def _perm_salts(n: int = 64) -> list[int]:
    # same derivation as stages.dedup._PERM_SALTS (splitmix64 stream)
    x = np.arange(1, n + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    with np.errstate(over="ignore"):
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return [int(v) for v in x]


_MOD64 = "18446744073709551616"  # 2^64
_FNV_PRIME = "1099511628211"  # also the Horner BASE
_FNV_INIT = "14695981039346656037"  # 0xCBF29CE484222325
_MINHASH_MULT = "18397679294719823053"  # 0xFF51AFD7ED558CCD
_MIX_C1 = "13787848793156543929"  # 0xBF58476D1CE4E5B9
_MIX_C2 = "10723151780598845931"  # 0x94D049BB133111EB

# Macros are single expressions (no scalar subqueries) so DuckDB can fully
# vectorize them; mix64 textually expands its argument ~32x, so it is only
# ever applied to a materialized column, never to a nested expression.
U64_PRELUDE = f"""
CREATE OR REPLACE MACRO u64mul(a, b) AS (
  CAST( ( (CAST(a AS HUGEINT) % 4294967296) * CAST(b AS HUGEINT)
        + (((CAST(a AS HUGEINT) // 4294967296) * CAST(b AS HUGEINT)) % 4294967296) * 4294967296
        ) % {_MOD64} AS UBIGINT) );
CREATE OR REPLACE MACRO u64add(a, b) AS (
  CAST((CAST(a AS HUGEINT) + CAST(b AS HUGEINT)) % {_MOD64} AS UBIGINT) );
CREATE OR REPLACE MACRO xshift(x, k) AS (
  xor(CAST(x AS UBIGINT), CAST(x AS UBIGINT) >> k) );
CREATE OR REPLACE MACRO mix64(x) AS (
  xshift(u64mul(xshift(u64mul(xshift(x, 30), {_MIX_C1}::UBIGINT), 27),
                {_MIX_C2}::UBIGINT), 31) );
CREATE OR REPLACE MACRO str_bytes(s) AS (
  list_transform(range(1, octet_length(encode(s)) + 1),
    i -> CAST(strpos('123456789ABCDEF', substr(hex(encode(s)), 2*i-1, 1)) * 16
            + strpos('123456789ABCDEF', substr(hex(encode(s)), 2*i, 1)) AS UBIGINT)) );
CREATE OR REPLACE MACRO fnv1a(s) AS (
  list_reduce(list_prepend({_FNV_INIT}::UBIGINT, str_bytes(s)),
              (h, b) -> u64mul(xor(h, b), {_FNV_PRIME}::UBIGINT)) );
"""


# XXH64 (seed 0) replica for inputs < 32 bytes — the frontier's seen-set /
# host-shard key (functions/urls.py::xxh64). Constants are the standard
# XXH64 primes; rotl64 builds OR from disjoint add (u64mul wraps, >> can't
# overflow). Inputs >= 32 bytes take the 4-lane path the macros don't
# implement — xxh64_ctes yields NULL there so misuse mismatches loudly.
_XXP1 = "11400714785074694791"
_XXP2 = "14029467366897019727"
_XXP3 = "1609587929392839161"
_XXP4 = "9650029242287828579"
_XXP5 = "2870177450012600261"

XXH_MACROS = f"""
CREATE OR REPLACE MACRO rotl64(x, r) AS (
  u64add(u64mul(x, (1::UBIGINT << r)), CAST(x AS UBIGINT) >> (64 - r)) );
CREATE OR REPLACE MACRO xxround0(w) AS (
  u64mul(rotl64(u64mul(w, {_XXP2}::UBIGINT), 31), {_XXP1}::UBIGINT) );
CREATE OR REPLACE MACRO xxh8w(h, w) AS (
  u64add(u64mul(rotl64(xor(h, xxround0(w)), 27), {_XXP1}::UBIGINT),
         {_XXP4}::UBIGINT) );
CREATE OR REPLACE MACRO xxh4w(h, w) AS (
  u64add(u64mul(rotl64(xor(h, u64mul(w, {_XXP1}::UBIGINT)), 23),
                {_XXP2}::UBIGINT), {_XXP3}::UBIGINT) );
CREATE OR REPLACE MACRO xxh1b(h, b) AS (
  u64mul(rotl64(xor(h, u64mul(b, {_XXP5}::UBIGINT)), 11), {_XXP1}::UBIGINT) );
CREATE OR REPLACE MACRO xxava(h0) AS (
  xshift(u64mul(xshift(u64mul(xshift(h0, 33), {_XXP2}::UBIGINT), 29),
                {_XXP3}::UBIGINT), 32) );
"""

_LE_MULT = ["1", "256", "65536", "16777216", "4294967296", "1099511627776",
            "281474976710656", "72057594037927936"]


def _le_word(start: str, nb: int) -> str:
    """Little-endian UBIGINT word from bs[start + j], j in [0, nb)."""
    return " + ".join(f"bs[{start} + {j}] * {_LE_MULT[j]}::UBIGINT"
                      for j in range(nb))


def xxh64_ctes(src: str, col: str, p: str = "x") -> str:
    """CTE chain computing XXH64(seed 0) of string column ``col`` of
    ``src`` (< 32-byte inputs; other columns carried through), ending in
    ``{p}done`` with the hash in column ``xh``. Stepwise CTEs — a single
    mega-macro exceeds DuckDB's 128-level binder recursion. Requires
    U64_PRELUDE + XXH_MACROS installed."""
    return f"""
{p}b AS (SELECT *, str_bytes({col}) AS bs,
                octet_length(encode({col})) AS n FROM {src}),
{p}w AS (SELECT * EXCLUDE (bs), bs,
  list_reduce(list_prepend(
    u64add({_XXP5}::UBIGINT, CAST(n AS UBIGINT)),
    list_transform(range(0, n // 8), i -> {_le_word("8*i + 1", 8)})),
    (h, w) -> xxh8w(h, w)) AS h8 FROM {p}b),
{p}w4 AS (SELECT * EXCLUDE (h8),
  CASE WHEN n % 8 >= 4 THEN xxh4w(h8, {_le_word("8*(n//8) + 1", 4)})
       ELSE h8 END AS h4 FROM {p}w),
{p}tl AS (SELECT * EXCLUDE (bs, h4),
  list_reduce(list_prepend(h4,
    list_transform(range(8*(n//8) + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END,
                         n), i -> bs[i + 1])),
    (h, b) -> xxh1b(h, b)) AS ht FROM {p}w4),
{p}done AS (SELECT * EXCLUDE (n, ht),
  CASE WHEN n < 32 THEN xxava(ht) END AS xh FROM {p}tl)"""


def _token_hash_ctes(src: str = "documents", p: str = "") -> str:
    """doc_id -> ordered token-hash CTE chain over ``src`` (needs columns
    doc_id, text), hashing each DISTINCT token once. ``p`` prefixes CTE
    names so two chains can coexist in one statement. fnv1a lands in a
    materialized column BEFORE mix64 touches it (mix64's textual expansion
    would otherwise re-run the byte fold ~32x)."""
    return f"""
{p}toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM {src}),
{p}tok AS (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM {p}toks, UNNEST(range(1, len(toks) + 1)) AS u(i)),
{p}vocab_f AS MATERIALIZED (
  SELECT tok, fnv1a(tok) AS f FROM (SELECT DISTINCT tok FROM {p}tok)),
{p}vocab AS MATERIALIZED (
  SELECT tok, mix64(f) AS h FROM {p}vocab_f),
{p}hm AS MATERIALIZED (
  SELECT t.doc_id, t.pos, v.h FROM {p}tok t JOIN {p}vocab v USING (tok))"""


def fingerprint_sql() -> str:
    """Rolling polynomial fingerprint: Horner fold acc = acc*B + h[i]
    (== sum h[i]*B^(n-1-i) mod 2^64); 0 for token-less docs."""
    return f"""{U64_PRELUDE}
WITH {_token_hash_ctes()},
fp AS (
  SELECT doc_id,
         list_reduce(list(h ORDER BY pos),
                     (acc, x) -> u64add(u64mul(acc, {_FNV_PRIME}::UBIGINT), x)) AS fingerprint
  FROM hm GROUP BY doc_id)
SELECT d.doc_id, coalesce(fp.fingerprint, 0::UBIGINT) AS fingerprint
FROM documents d LEFT JOIN fp USING (doc_id)
ORDER BY doc_id
"""


def _shingle_ctes(src: str = "documents", p: str = "", k: int = 3) -> str:
    """doc_id -> distinct w-shingle hash CTE chain over ``src``, ending in
    ``{p}sh(doc_id, s)``. Shared by the MinHash and OPH kernels so the
    shingle space is bit-identical across signature schemes."""
    return f"""{_token_hash_ctes(src, p)},
{p}harr AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs FROM {p}hm GROUP BY doc_id),
-- w-shingles: Horner over k consecutive token hashes; < k tokens keeps the
-- raw token hashes (shingle_hashes parity); DISTINCT == np.unique
{p}sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           CASE WHEN len(hs) >= {k} THEN
             list_transform(range(1, len(hs) - {k - 2}),
               i -> u64add(u64mul(u64add(u64mul(hs[i], {_FNV_PRIME}::UBIGINT),
                                         hs[i+1]), {_FNV_PRIME}::UBIGINT), hs[i+2]))
           ELSE hs END AS sarr
    FROM {p}harr),
  UNNEST(sarr) AS u(s))"""


def _minhash_ctes(src: str = "documents", p: str = "", num_perm: int = 64,
                  bands: int = 16, k: int = 3, max_bucket: int = 200) -> str:
    """The full MinHash-LSH CTE chain over ``src`` (doc_id, text): shingles
    -> num_perm signatures -> band keys -> collision buckets
    (2..max_bucket) -> candidate pairs -> exact-Jaccard counts. Ends with
    ``{p}scored(a, b, i, u)``; admission at threshold t is
    ``u = 0 OR i/u >= t`` (integer form for t=0.5: ``2*i >= u``).

    Replicates stages.dedup.minhash_lsh_pairs exactly; grouping is on
    (band_id, band_key) where the Ray path groups on the combined 64-bit
    ``bucket`` key — indistinguishable unless a 64-bit mix collision merges
    two true buckets, which verification then discards anyway."""
    rows_per_band = num_perm // bands
    salts = ", ".join(
        f"({i}, {s}::UBIGINT)" for i, s in enumerate(_perm_salts(num_perm)))
    return f"""{_shingle_ctes(src, p, k)},
{p}salts(perm, salt) AS (VALUES {salts}),
-- signature: min over shingles of (s ^ salt_p) * MULT; all-zeros for
-- empty-shingle docs (minhash_signature parity)
{p}sig AS (
  SELECT doc_id, perm,
         min(u64mul(xor(s, salt), {_MINHASH_MULT}::UBIGINT)) AS sig
  FROM {p}sh CROSS JOIN {p}salts GROUP BY doc_id, perm),
{p}sigfull AS MATERIALIZED (
  SELECT d.doc_id, s.perm, coalesce(sig.sig, 0::UBIGINT) AS sig
  FROM (SELECT DISTINCT doc_id FROM {src}) d
  CROSS JOIN {p}salts s
  LEFT JOIN {p}sig sig ON sig.doc_id = d.doc_id AND sig.perm = s.perm),
{p}sigm AS MATERIALIZED (
  SELECT doc_id, perm, mix64(sig) AS m FROM {p}sigfull),
{p}bk AS MATERIALIZED (
  SELECT doc_id, perm // {rows_per_band} AS band_id,
         CAST(SUM(CAST(m AS HUGEINT)) % {_MOD64} AS UBIGINT) AS band_key
  FROM {p}sigm GROUP BY doc_id, perm // {rows_per_band}),
{p}bsize AS (
  SELECT band_id, band_key, count(*) AS n
  FROM {p}bk GROUP BY band_id, band_key),
{p}cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM {p}bk a
  JOIN {p}bk b ON a.band_id = b.band_id AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  JOIN {p}bsize s ON s.band_id = a.band_id AND s.band_key = a.band_key
  WHERE s.n BETWEEN 2 AND {max_bucket}),
{p}ssize AS (SELECT doc_id, count(*) AS n FROM {p}sh GROUP BY doc_id),
{p}inter AS (
  SELECT c.a, c.b, count(sb.s) AS i
  FROM {p}cand c
  LEFT JOIN {p}sh sa ON sa.doc_id = c.a
  LEFT JOIN {p}sh sb ON sb.doc_id = c.b AND sb.s = sa.s
  GROUP BY c.a, c.b),
{p}scored AS (
  SELECT i0.a, i0.b, i0.i,
         coalesce(sa.n, 0) + coalesce(sb.n, 0) - i0.i AS u
  FROM {p}inter i0
  LEFT JOIN {p}ssize sa ON sa.doc_id = i0.a
  LEFT JOIN {p}ssize sb ON sb.doc_id = i0.b)"""


def minhash_pairs_sql(num_perm: int = 64, bands: int = 16, k: int = 3,
                      max_bucket: int = 200, scale: int = 1_000_000) -> str:
    """Verified MinHash near-dup pairs at Jaccard >= 0.5 with the scaled
    score column (see _minhash_ctes for the exactness argument)."""
    return f"""{U64_PRELUDE}
WITH {_minhash_ctes(num_perm=num_perm, bands=bands, k=k, max_bucket=max_bucket)}
SELECT a, b,
       CASE WHEN u = 0 THEN {scale}
            ELSE CAST(ROUND(CAST(i AS DOUBLE) / u * {scale}) AS BIGINT) END AS jaccard
FROM scored
WHERE (u = 0) OR (2 * i >= u)
ORDER BY a, b
"""


def oph_pairs_sql(nbins: int = 32, bands: int = 8, k: int = 3,
                  max_bucket: int = 200) -> str:
    """One-permutation-hashing near-dup pairs: shingles bin by ``s %
    nbins`` (ONE hash pass), per-bin minima densify empty bins by cyclic
    rotation with offset ``t * GOLDEN`` (Shrivastava & Li 2014), bands
    collide exactly like the MinHash kernel, and admitted pairs carry the
    exact matched-bin count (gate: matched/nbins >= 1/2). Replicates
    stages.dedup.oph_pairs bit-for-bit."""
    rows_per_band = nbins // bands
    return f"""{U64_PRELUDE}
WITH {_shingle_ctes(k=k)},
bins0 AS MATERIALIZED (
  SELECT doc_id, CAST(s % {nbins} AS BIGINT) AS bin, MIN(s) AS v
  FROM sh GROUP BY doc_id, CAST(s % {nbins} AS BIGINT)),
grid AS (
  SELECT d.doc_id, CAST(g.b AS BIGINT) AS bin
  FROM (SELECT DISTINCT doc_id FROM documents) d,
       UNNEST(range(0, {nbins})) AS g(b)),
-- rotation densification: empty bin j borrows from the cyclically
-- nearest filled bin to the right, offset by t * GOLDEN (t = distance)
fill AS (
  SELECT g.doc_id, g.bin,
         u64add(b.v, u64mul(CAST((b.bin - g.bin + {nbins}) % {nbins}
                                 AS UBIGINT), {_GOLDEN}::UBIGINT)) AS v,
         row_number() OVER (PARTITION BY g.doc_id, g.bin
             ORDER BY (b.bin - g.bin + {nbins}) % {nbins}) AS rn
  FROM grid g JOIN bins0 b ON b.doc_id = g.doc_id),
sigfull AS MATERIALIZED (
  SELECT g.doc_id, g.bin, coalesce(f.v, 0::UBIGINT) AS v
  FROM grid g LEFT JOIN (SELECT * FROM fill WHERE rn = 1) f
    ON f.doc_id = g.doc_id AND f.bin = g.bin),
sigm AS MATERIALIZED (SELECT doc_id, bin, mix64(v) AS m FROM sigfull),
bk AS MATERIALIZED (
  SELECT doc_id, bin // {rows_per_band} AS band_id,
         CAST(SUM(CAST(m AS HUGEINT)) % {_MOD64} AS UBIGINT) AS band_key
  FROM sigm GROUP BY doc_id, bin // {rows_per_band}),
bsize AS (
  SELECT band_id, band_key, count(*) AS n
  FROM bk GROUP BY band_id, band_key),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bk a
  JOIN bk b ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band_id = a.band_id AND s.band_key = a.band_key
  WHERE s.n BETWEEN 2 AND {max_bucket}),
m AS (
  SELECT c.a, c.b, SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) AS matched
  FROM cand c
  JOIN sigfull sa ON sa.doc_id = c.a
  JOIN sigfull sb ON sb.doc_id = c.b AND sb.bin = sa.bin
  GROUP BY c.a, c.b)
SELECT a, b, CAST(matched AS BIGINT) AS matched
FROM m WHERE 2 * matched >= {nbins}
ORDER BY a, b
"""


def simhash_pairs_sql(max_hamming: int = 3, max_bucket: int = 200) -> str:
    """SimHash near-dup pairs in SQL: 64-bit bit-vote signature, 4x16-bit
    band blocking with the 2..max_bucket bucket gate, Hamming <= max_hamming
    via bit_count(xor). Replicates stages.dedup.simhash_pairs."""
    bit_rows = ", ".join(f"({b}, {1 << b}::UBIGINT)" for b in range(64))
    band_rows = ", ".join(f"({b}, {16 * b})" for b in range(4))
    return f"""{U64_PRELUDE}
WITH {_token_hash_ctes()},
bits(b, pw) AS (VALUES {bit_rows}),
-- vote_b = 2*count(bit set) - n  (duplicate tokens vote repeatedly)
votes AS (
  SELECT hm.doc_id, bits.b, bits.pw,
         SUM(CASE WHEN (hm.h >> bits.b) & 1::UBIGINT = 1::UBIGINT
                  THEN 1 ELSE -1 END) AS vote
  FROM hm CROSS JOIN bits GROUP BY hm.doc_id, bits.b, bits.pw),
sig0 AS (
  SELECT doc_id,
         CAST(coalesce(SUM(CASE WHEN vote > 0 THEN CAST(pw AS HUGEINT) END),
                       0) AS UBIGINT) AS sig
  FROM votes GROUP BY doc_id),
sig AS MATERIALIZED (
  SELECT d.doc_id, coalesce(s.sig, 0::UBIGINT) AS sig
  FROM documents d LEFT JOIN sig0 s USING (doc_id)),
bdef(band_id, shift) AS (VALUES {band_rows}),
bk AS MATERIALIZED (
  SELECT doc_id, band_id, (sig >> shift) & 65535::UBIGINT AS band_key, sig
  FROM sig CROSS JOIN bdef),
bsize AS (
  SELECT band_id, band_key, count(*) AS n FROM bk GROUP BY band_id, band_key),
pairs AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b, a.sig AS sa, b.sig AS sb
  FROM bk a
  JOIN bk b ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band_id = a.band_id AND s.band_key = a.band_key
  WHERE s.n BETWEEN 2 AND {max_bucket})
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM pairs
WHERE bit_count(xor(sa, sb)) <= {max_hamming}
ORDER BY a, b
"""


def _bfs_order_ctes(max_depth: int = 20, hosts: int = 4) -> str:
    """Crawl admission order in SQL: the frontier's BFS waves unrolled to
    ``max_depth`` steps (CrawlJob(max_depth=20) bounds the recursion
    statically, so no recursive CTE ranking is needed). Wave k admits the
    not-yet-seen link targets of wave k-1, first-sight-wins per target by
    (parent_seq, link_pos) — the same stable ordering the frontier's
    vectorized sequencer assigns — and seq continues densely from the
    running seen-count. Ends with ``ord(id, seq)``.

    The edges arms mirror sources/synthetic_site.page_links (keep in sync
    with _CRAWL_REACHABLE_SQL); pos is the DOM link position."""
    parts = [f"""
docs_base AS MATERIALIZED (SELECT doc_id, text FROM documents),
n AS (SELECT count(*) AS c FROM docs_base),
edges AS MATERIALIZED (
  SELECT d.doc_id AS src, 2 * d.doc_id + 1 AS dst, 0 AS pos
  FROM docs_base d, n WHERE 2 * d.doc_id + 1 < n.c
  UNION ALL
  SELECT d.doc_id, 2 * d.doc_id + 2, 1 FROM docs_base d, n
  WHERE 2 * d.doc_id + 2 < n.c
  UNION ALL
  SELECT d.doc_id, (7 * d.doc_id + 3) % n.c, 2 FROM docs_base d, n
  WHERE d.doc_id % 3 = 0),
w0(id, seq) AS (SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
seen0 AS MATERIALIZED (SELECT id FROM w0)"""]
    for k in range(1, max_depth + 1):
        parts.append(f"""
c{k} AS (
  SELECT e.dst AS id, p.seq AS pseq, e.pos
  FROM w{k - 1} p JOIN edges e ON e.src = p.id
  WHERE e.dst NOT IN (SELECT id FROM seen{k - 1})),
f{k} AS (
  SELECT id, pseq, pos FROM c{k}
  QUALIFY row_number() OVER (PARTITION BY id ORDER BY pseq, pos) = 1),
w{k} AS MATERIALIZED (
  SELECT id, row_number() OVER (ORDER BY pseq, pos) - 1
             + (SELECT count(*) FROM seen{k - 1}) AS seq
  FROM f{k}),
seen{k} AS MATERIALIZED (
  SELECT id FROM seen{k - 1} UNION ALL SELECT id FROM w{k})""")
    union = "\n  UNION ALL ".join(
        f"SELECT id, seq FROM w{k}" for k in range(max_depth + 1))
    parts.append(f"\nord AS (\n  {union})")
    return ",".join(parts)


def training_pipeline_sql(max_depth: int = 20, hosts: int = 4) -> str:
    """The composed training-data curation chain as ONE oracle: BFS crawl
    order (doc_id = 'tp_' || seq), markdown text reconstructed from the
    synthetic page template (title span + setext H1 + two half-split
    paragraphs + image/link line — validated string-equal against the real
    crawl), quality score + >0.3 filter, lang-ID, exact dedup (min seq per
    identical text, n_copies), then MinHash near-dup removal dropping the
    later pair member. Scaled quality uses round_even = np.rint parity."""
    return f"""{U64_PRELUDE}
WITH {_bfs_order_ctes(max_depth, hosts)},
links_md AS (
  SELECT src, string_agg(
           '[L' || dst || '](http://site' || (dst % {hosts}) || '.test/p/' ||
           lpad(CAST(dst AS VARCHAR), 6, '0') || ')', '' ORDER BY pos) AS lm
  FROM edges GROUP BY src),
tails AS (
  SELECT d.doc_id AS id,
         CASE WHEN d.doc_id % 7 = 0 THEN
           '![figure ' || d.doc_id || '](http://site' || (d.doc_id % {hosts}) ||
           '.test/img/' || d.doc_id || '-l.jpg)'
         ELSE '' END || coalesce(l.lm, '') AS tail
  FROM docs_base d LEFT JOIN links_md l ON l.src = d.doc_id),
paras AS (
  SELECT d.doc_id AS id,
         list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> '') AS w
  FROM docs_base d),
corpus0 AS (
  SELECT o.seq, p.id,
    'Doc ' || p.id || chr(10) || chr(10) ||
    'Doc ' || p.id || chr(10) || repeat('=', 4 + length(CAST(p.id AS VARCHAR)))
    || CASE WHEN len(w) // 2 >= 1
            THEN chr(10) || chr(10) || array_to_string(w[1 : len(w) // 2], ' ')
            ELSE '' END
    || CASE WHEN len(w) - len(w) // 2 >= 1
            THEN chr(10) || chr(10) ||
                 array_to_string(w[len(w) // 2 + 1 : len(w)], ' ')
            ELSE '' END
    || CASE WHEN t.tail <> '' THEN chr(10) || chr(10) || t.tail ELSE '' END
      AS text
  FROM ord o JOIN paras p ON p.id = o.id JOIN tails t ON t.id = o.id),
-- text stats + quality (same float64 ops as stages.text_analysis)
stats AS (
  SELECT seq, id, text,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM corpus0),
quald AS (
  SELECT seq, id, text, len(toks) AS n_tokens,
         LEAST(1.0, len(toks) / 64.0) *
         (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
                ELSE len(list_filter(toks,
                         x -> x IN ('the','a','and','of','to','in')))
                     * 1.0 / len(toks) END) AS quality
  FROM stats),
qfilt AS (SELECT * FROM quald WHERE quality > 0.3),
-- lang-ID marker argmax (same fragment as the docs_lang_guess oracle)
ltoks AS (
  SELECT seq,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '')[1:200]) AS lt,
         text
  FROM qfilt),
lhits AS (
  SELECT seq,
    len(list_intersect(lt, ['the','and','of','is','with'])) AS en,
    len(list_intersect(lt, ['der','die','und','ist','mit'])) AS de,
    len(list_intersect(lt, ['le','la','et','est','avec'])) AS fr,
    len(list_intersect(lt, ['el','la','y','es','con'])) AS es,
    text
  FROM ltoks),
langed AS (
  SELECT q.seq, q.n_tokens, q.quality, q.text, CASE
    WHEN regexp_matches(h.text, '[\\x{{4E00}}-\\x{{9FFF}}]') THEN 'zh'
    WHEN de > en AND de >= fr AND de >= es THEN 'de'
    WHEN fr > en AND fr > de AND fr >= es THEN 'fr'
    WHEN es > en AND es > de AND es > fr THEN 'es'
    ELSE 'en' END AS lang_guess
  FROM qfilt q JOIN lhits h ON h.seq = q.seq),
-- exact dedup: min seq per identical text ('tp_%08d' string min == seq min)
surv AS (
  SELECT min(seq) AS seq, count(*) AS n_copies FROM langed GROUP BY text),
kept0 AS MATERIALIZED (
  SELECT s.seq, s.n_copies, l.n_tokens, l.quality, l.lang_guess, l.text
  FROM surv s JOIN langed l ON l.seq = s.seq),
mh_src AS (SELECT seq AS doc_id, text FROM kept0),
{_minhash_ctes(src="mh_src", p="mh_")},
dropped AS (SELECT DISTINCT b FROM mh_scored WHERE (u = 0) OR (2 * i >= u))
SELECT 'tp_' || lpad(CAST(seq AS VARCHAR), 8, '0') AS doc_id,
       lang_guess, n_tokens,
       CAST(round_even(quality * 1000000, 0) AS BIGINT) AS quality,
       n_copies
FROM kept0
WHERE seq NOT IN (SELECT b FROM dropped)
ORDER BY doc_id
"""

_GOLDEN = "11400714819323198485"  # 0x9E3779B97F4A7C15


def winnow_pairs_sql(k: int = 3, w: int = 4, min_shared: int = 2,
                     max_bucket: int = 200) -> str:
    """Winnowing (SIGMOD'03) replay: ordered Horner k-gram hashes with
    positions, per-window rightmost-minimum selection (row_number ORDER BY
    gh ASC, p DESC), distinct selected hashes per doc, stop-gram df cap,
    pair counts. Short docs (< w grams) winnow one window over all grams —
    same q-range formula LEAST(w, gn)..gn on both sides."""
    horner = "hs[i]"
    for j in range(1, k):
        horner = f"u64add(u64mul({horner}, {_FNV_PRIME}::UBIGINT), hs[i+{j}])"
    return f"""{U64_PRELUDE}
WITH {_token_hash_ctes()},
harr AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs FROM hm GROUP BY doc_id),
garr AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {k}
              THEN list_transform(range(1, len(hs) - {k - 2}), i -> {horner})
              ELSE hs END AS gs
  FROM harr),
g AS MATERIALIZED (
  SELECT doc_id, i AS p, gs[i] AS gh
  FROM garr, UNNEST(range(1, len(gs) + 1)) AS u(i)),
gsize AS (SELECT doc_id, count(*) AS gn FROM g GROUP BY doc_id),
wins AS (
  SELECT doc_id, q FROM gsize,
  UNNEST(range(LEAST({w}, gn), gn + 1)) AS u(q)),
selpos AS (
  SELECT wi.doc_id, wi.q, g.p, g.gh
  FROM wins wi JOIN g ON g.doc_id = wi.doc_id
       AND g.p BETWEEN GREATEST(1, wi.q - {w} + 1) AND wi.q
  QUALIFY row_number() OVER (PARTITION BY wi.doc_id, wi.q
                             ORDER BY g.gh ASC, g.p DESC) = 1),
fp AS MATERIALIZED (SELECT DISTINCT doc_id, gh FROM selpos),
df AS (SELECT gh, count(*) AS c FROM fp GROUP BY gh),
ok AS (
  SELECT fp.doc_id, fp.gh FROM fp JOIN df USING (gh)
  WHERE df.c BETWEEN 2 AND {max_bucket})
SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS shared
FROM ok a JOIN ok b ON a.gh = b.gh AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {min_shared}
ORDER BY a, b
"""


def _media_cells_ctes(n_cells: int = 64) -> str:
    """Stub-codec grid replay over ``documents``: seed = fnv1a(text bytes)
    (media payload IS the utf-8 text), cell i = mix64(seed ^ (i+1)*GOLDEN)
    & 0xFF — mirrors stages.media._grids_from_seeds exactly. Ends with
    ``cells(media_id, i, v)`` (v INTEGER 0..255, i row-major: row=i//8,
    col=i%8) plus ``seed(media_id, doc_id, h, width, height)``."""
    return f"""
m AS (
  SELECT 'm' || doc_id AS media_id, doc_id, text,
         CAST((doc_id % 16 + 1) * 64 AS INTEGER) AS width,
         CAST((doc_id % 9 + 1) * 64 AS INTEGER) AS height
  FROM documents),
seed AS MATERIALIZED (
  SELECT media_id, doc_id, fnv1a(text) AS h, width, height FROM m),
idx(i) AS (SELECT UNNEST(range(0, {n_cells}))),
cellseed AS MATERIALIZED (
  SELECT media_id, i,
         xor(h, u64mul(CAST(i + 1 AS UBIGINT), {_GOLDEN}::UBIGINT)) AS s
  FROM seed CROSS JOIN idx),
cells AS MATERIALIZED (
  SELECT media_id, i, CAST(mix64(s) & 255::UBIGINT AS INTEGER) AS v
  FROM cellseed)"""


def media_features_sql() -> str:
    """MediaFeatureExtractor replay: feature_j = column-mean of the grid
    (SUM/8.0 is exact — integer over a binary scale — /255.0 is the single
    f64 rounding, CAST AS REAL the single f32 rounding; identical op order
    to fake_feature), reported as the round_even-scaled BIGINT the Ray
    query emits. payload_hash = the FNV seed itself."""
    def f(j: int) -> str:
        return (f"CAST(round_even(CAST(CAST(SUM(CASE WHEN i % 8 = {j} THEN v END)"
                f" / 8.0 / 255.0 AS REAL) AS DOUBLE) * 1000000, 0) AS BIGINT) AS f{j}")
    cols = ",\n         ".join(f(j) for j in range(8))
    return f"""{U64_PRELUDE}
WITH {_media_cells_ctes()},
feat AS (
  SELECT media_id, {cols}
  FROM cells GROUP BY media_id)
SELECT s.media_id, s.h AS payload_hash,
       f.f0, f.f1, f.f2, f.f3, f.f4, f.f5, f.f6, f.f7
FROM seed s JOIN feat f USING (media_id)
ORDER BY s.media_id
"""


def media_resize_sql(target: int = 4) -> str:
    """ImageResizer replay: NEAREST index map for 8->4 is row/col 2k+1, so
    the resized payload's bytes are the odd-row/odd-col cells in row-major
    order; resize_fp = FNV-1a over those 16 bytes."""
    return f"""{U64_PRELUDE}
WITH {_media_cells_ctes()},
sel AS (
  SELECT media_id, i, v FROM cells
  WHERE (i // 8) % 2 = 1 AND (i % 8) % 2 = 1),
fp AS (
  SELECT media_id,
         list_reduce(list_prepend({_FNV_INIT}::UBIGINT,
                                  list(CAST(v AS UBIGINT) ORDER BY i)),
                     (a, b) -> u64mul(xor(a, b), {_FNV_PRIME}::UBIGINT)) AS resize_fp
  FROM sel GROUP BY media_id)
SELECT media_id, CAST({target} AS INTEGER) AS width,
       CAST({target} AS INTEGER) AS height, resize_fp
FROM fp ORDER BY media_id
"""


def media_frames_sql(every_ms: int = 1000) -> str:
    """FrameSampler replay: duration = (doc_id % 5) * 1000 ->
    frames k = 0..doc_id%5; the frame seed continues the payload FNV fold
    over the 8 little-endian ts bytes (ts <= 4000 so bytes 2..7 are 0);
    frame_fp = FNV-1a over the frame grid's 64 bytes."""
    return f"""{U64_PRELUDE}
WITH {_media_cells_ctes()},
frames AS (
  SELECT media_id, h, CAST(k AS INTEGER) AS frame_idx,
         CAST(k * {every_ms} AS INTEGER) AS ts_ms
  FROM seed, UNNEST(range(0, (doc_id % 5) + 1)) AS u(k)),
fseed AS MATERIALIZED (
  SELECT media_id, frame_idx, ts_ms,
         list_reduce(list_prepend(h, [
             CAST(ts_ms % 256 AS UBIGINT),
             CAST((ts_ms // 256) % 256 AS UBIGINT),
             0::UBIGINT, 0::UBIGINT, 0::UBIGINT,
             0::UBIGINT, 0::UBIGINT, 0::UBIGINT]),
                     (a, b) -> u64mul(xor(a, b), {_FNV_PRIME}::UBIGINT)) AS fh
  FROM frames),
fcseed AS MATERIALIZED (
  SELECT media_id, frame_idx, ts_ms,
         xor(fh, u64mul(CAST(i + 1 AS UBIGINT), {_GOLDEN}::UBIGINT)) AS s,
         i
  FROM fseed CROSS JOIN idx),
fcells AS MATERIALIZED (
  SELECT media_id, frame_idx, ts_ms, i,
         CAST(mix64(s) & 255::UBIGINT AS UBIGINT) AS v
  FROM fcseed),
ffp AS (
  SELECT media_id, frame_idx, ts_ms,
         list_reduce(list_prepend({_FNV_INIT}::UBIGINT, list(v ORDER BY i)),
                     (a, b) -> u64mul(xor(a, b), {_FNV_PRIME}::UBIGINT)) AS frame_fp
  FROM fcells GROUP BY media_id, frame_idx, ts_ms)
SELECT media_id, frame_idx, ts_ms, frame_fp
FROM ffp ORDER BY media_id, frame_idx
"""


def embedding_lsh_pairs_sql(threshold: float = 0.4, num_planes: int = 16,
                            bands: int = 8, seed: int = 7, dim: int = 64,
                            max_bucket: int = 500) -> str:
    """Random-hyperplane LSH near-dup pairs in SQL: the plane matrix is a
    deterministic constant (default_rng(seed).standard_normal), so its
    num_planes x dim float64 values embed as literals; sign bits, band keys
    (little-endian packbits), the 2..max_bucket bucket gate and the exact
    cosine verification then replay relationally.

    Sign-bit robustness: summation order differs between numpy's blocked
    dot and SQL SUM, but the smallest |dot| across all sf corpora is
    3.5e-05 (measured) vs ~1e-14 accumulated error — no flip is possible.
    The cosine >= threshold compare reuses list_cosine_similarity with the
    same corpus margin the brute-force oracle relies on."""
    planes = np.random.default_rng(seed).standard_normal((num_planes, dim))
    rows_per = num_planes // bands
    vals = ", ".join(
        f"({p}, {j}, {planes[p, j]!r})"
        for p in range(num_planes) for j in range(dim))
    return f"""
WITH planes(p, j, w) AS (VALUES {vals}),
vecs AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
ev AS (
  SELECT vec_id, i - 1 AS j, CAST(embedding[i] AS DOUBLE) AS x
  FROM vecs, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
dots AS (
  SELECT e.vec_id, pl.p, SUM(e.x * pl.w) AS dot
  FROM ev e JOIN planes pl ON pl.j = e.j GROUP BY e.vec_id, pl.p),
-- little-endian packbits over each band's sign bits
bk AS MATERIALIZED (
  SELECT vec_id, p // {rows_per} AS band_id,
         SUM(CASE WHEN dot > 0 THEN (1 << (p % {rows_per})) ELSE 0 END) AS band_key
  FROM dots GROUP BY vec_id, p // {rows_per}),
bsize AS (
  SELECT band_id, band_key, count(*) AS n FROM bk GROUP BY band_id, band_key),
cand AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
  FROM bk a
  JOIN bk b ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.vec_id < b.vec_id
  JOIN bsize s ON s.band_id = a.band_id AND s.band_key = a.band_key
  WHERE s.n BETWEEN 2 AND {max_bucket})
SELECT c.a, c.b
FROM cand c
JOIN vecs va ON va.vec_id = c.a
JOIN vecs vb ON vb.vec_id = c.b
WHERE list_cosine_similarity(va.embedding, vb.embedding) >= {threshold}
ORDER BY c.a, c.b
"""
