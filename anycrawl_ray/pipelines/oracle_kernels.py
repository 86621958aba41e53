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

These oracles turn the formerly rows-only near-dup queries
(``docs_fingerprint``, ``docs_minhash_pairs``, ``docs_simhash_pairs``) into
full value-hash-checked driver rows: the SQL recomputes signatures, band
keys, bucket admission (2..max_bucket) and exact verification from the raw
``documents.text`` — no recall assumption, bit-identical arithmetic.

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
  integer microscale (validated across sf0.001/0.01/0.1).
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

# doc_id -> ordered token-hash list, hashing each DISTINCT token once.
# tok_hash applies fnv1a into a materialized column BEFORE mix64 touches it
# (mix64's textual expansion would otherwise re-run the byte fold ~32x).
_TOKEN_HASH_CTES = """
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM toks, UNNEST(range(1, len(toks) + 1)) AS u(i)),
vocab_f AS MATERIALIZED (
  SELECT tok, fnv1a(tok) AS f FROM (SELECT DISTINCT tok FROM tok)),
vocab AS MATERIALIZED (
  SELECT tok, mix64(f) AS h FROM vocab_f),
hm AS MATERIALIZED (
  SELECT t.doc_id, t.pos, v.h FROM tok t JOIN vocab v USING (tok))
"""


def fingerprint_sql() -> str:
    """Rolling polynomial fingerprint: Horner fold acc = acc*B + h[i]
    (== sum h[i]*B^(n-1-i) mod 2^64); 0 for token-less docs."""
    return f"""{U64_PRELUDE}
WITH {_TOKEN_HASH_CTES},
fp AS (
  SELECT doc_id,
         list_reduce(list(h ORDER BY pos),
                     (acc, x) -> u64add(u64mul(acc, {_FNV_PRIME}::UBIGINT), x)) AS fingerprint
  FROM hm GROUP BY doc_id)
SELECT d.doc_id, coalesce(fp.fingerprint, 0::UBIGINT) AS fingerprint
FROM documents d LEFT JOIN fp USING (doc_id)
ORDER BY doc_id
"""


def minhash_pairs_sql(num_perm: int = 64, bands: int = 16, k: int = 3,
                      max_bucket: int = 200, scale: int = 1_000_000) -> str:
    """Full MinHash-LSH pipeline in SQL: shingles -> 64-perm signatures ->
    16 band keys -> collision buckets (2..max_bucket) -> candidate pairs ->
    exact-Jaccard verification at threshold 0.5 (integer form 2*i >= union).

    Replicates stages.dedup.minhash_lsh_pairs exactly; grouping is on
    (band_id, band_key) where the Ray path groups on the combined 64-bit
    ``bucket`` key — indistinguishable unless a 64-bit mix collision merges
    two true buckets, which verification then discards anyway."""
    rows_per_band = num_perm // bands
    salts = ", ".join(
        f"({p}, {s}::UBIGINT)" for p, s in enumerate(_perm_salts(num_perm)))
    return f"""{U64_PRELUDE}
WITH {_TOKEN_HASH_CTES},
harr AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs FROM hm GROUP BY doc_id),
-- w-shingles: Horner over k consecutive token hashes; < k tokens keeps the
-- raw token hashes (shingle_hashes parity); DISTINCT == np.unique
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s
  FROM (
    SELECT doc_id,
           CASE WHEN len(hs) >= {k} THEN
             list_transform(range(1, len(hs) - {k - 2}),
               i -> u64add(u64mul(u64add(u64mul(hs[i], {_FNV_PRIME}::UBIGINT),
                                         hs[i+1]), {_FNV_PRIME}::UBIGINT), hs[i+2]))
           ELSE hs END AS sarr
    FROM harr),
  UNNEST(sarr) AS u(s)),
salts(p, salt) AS (VALUES {salts}),
-- signature: min over shingles of (s ^ salt_p) * MULT; all-zeros for
-- empty-shingle docs (minhash_signature parity)
sig AS (
  SELECT doc_id, p, min(u64mul(xor(s, salt), {_MINHASH_MULT}::UBIGINT)) AS sig
  FROM sh CROSS JOIN salts GROUP BY doc_id, p),
sigfull AS MATERIALIZED (
  SELECT d.doc_id, s.p, coalesce(sig.sig, 0::UBIGINT) AS sig
  FROM (SELECT DISTINCT doc_id FROM documents) d
  CROSS JOIN salts s
  LEFT JOIN sig ON sig.doc_id = d.doc_id AND sig.p = s.p),
sigm AS MATERIALIZED (
  SELECT doc_id, p, mix64(sig) AS m FROM sigfull),
bk AS MATERIALIZED (
  SELECT doc_id, p // {rows_per_band} AS band_id,
         CAST(SUM(CAST(m AS HUGEINT)) % {_MOD64} AS UBIGINT) AS band_key
  FROM sigm GROUP BY doc_id, p // {rows_per_band}),
bsize AS (
  SELECT band_id, band_key, count(*) AS n FROM bk GROUP BY band_id, band_key),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bk a
  JOIN bk b ON a.band_id = b.band_id AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band_id = a.band_id AND s.band_key = a.band_key
  WHERE s.n BETWEEN 2 AND {max_bucket}),
ssize AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(sb.s) AS i
  FROM cand c
  LEFT JOIN sh sa ON sa.doc_id = c.a
  LEFT JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
  GROUP BY c.a, c.b),
scored AS (
  SELECT inter.a, inter.b, inter.i,
         coalesce(sa.n, 0) + coalesce(sb.n, 0) - inter.i AS u
  FROM inter
  LEFT JOIN ssize sa ON sa.doc_id = inter.a
  LEFT JOIN ssize sb ON sb.doc_id = inter.b)
SELECT a, b,
       CASE WHEN u = 0 THEN {scale}
            ELSE CAST(ROUND(CAST(i AS DOUBLE) / u * {scale}) AS BIGINT) END AS jaccard
FROM scored
WHERE (u = 0) OR (2 * i >= u)
ORDER BY a, b
"""


def simhash_pairs_sql(max_hamming: int = 3, max_bucket: int = 200) -> str:
    """SimHash near-dup pairs in SQL: 64-bit bit-vote signature, 4x16-bit
    band blocking with the 2..max_bucket bucket gate, Hamming <= max_hamming
    via bit_count(xor). Replicates stages.dedup.simhash_pairs."""
    bit_rows = ", ".join(f"({b}, {1 << b}::UBIGINT)" for b in range(64))
    band_rows = ", ".join(f"({b}, {16 * b})" for b in range(4))
    return f"""{U64_PRELUDE}
WITH {_TOKEN_HASH_CTES},
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
