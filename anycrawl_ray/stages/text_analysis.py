"""Text-analysis stages for training-data pipelines (first-class additions
beyond the reference's operator set, per the build brief): language ID,
quality scoring, token counting, document fingerprinting.

All are stateless vectorized ``map_batches`` functions over Arrow batches
of the ``documents`` table; the heavier tokenizing paths use compiled
regexes held in a callable class (actor-pool-friendly). The arithmetic is
kept SQL-replicable so the DuckDB oracle can verify exactly
(pipelines/queries.py::docs_text_stats).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# whole-word stopword set; synthetic corpus is lowercase space-separated
STOPWORDS = ("the", "a", "and", "of", "to", "in")
_TOKEN_RE = re.compile(r"\S+")

# marker-word tables for the n-gram-free language heuristic; unknown -> 'en'
_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "with"},
    "de": {"der", "die", "und", "ist", "mit"},
    "fr": {"le", "la", "et", "est", "avec"},
    "es": {"el", "la", "y", "es", "con"},
    "zh": set(),  # han-script detection below
}
_HAN = re.compile(r"[一-鿿]")


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized stats: chars, tokens, stopword hits, punct chars, quality.

    quality = min(1, tokens/64) * (1 - stop_ratio) — a length/stopword
    heuristic in the spirit of Gopher/C4 quality rules, chosen to be exactly
    expressible in SQL for the oracle."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, r"\S+")
    stop_pat = r"\b(?:" + "|".join(STOPWORDS) + r")\b"
    stop_hits = pc.count_substring_regex(text, stop_pat)
    punct_hits = pc.count_substring_regex(text, r"[^\w\s]")
    tok = n_tokens.to_numpy(zero_copy_only=False).astype("float64")
    stop = stop_hits.to_numpy(zero_copy_only=False).astype("float64")
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(tok > 0, stop / tok, 0.0)
    quality = np.minimum(1.0, tok / 64.0) * (1.0 - stop_ratio)
    return (
        batch.append_column("n_chars_calc", pc.cast(n_chars, pa.int64()))
        .append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
        .append_column("stop_hits", pc.cast(stop_hits, pa.int64()))
        .append_column("punct_hits", pc.cast(punct_hits, pa.int64()))
        .append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))
        .append_column("quality", pa.array(quality, pa.float64()))
    )


class LangId:
    """Marker-word + script language guesser (n-gram-heuristic class of
    detectors; a real model would slot into the same actor-pool stage)."""

    def __init__(self) -> None:
        self.token_re = _TOKEN_RE
        self.markers = {k: v for k, v in _LANG_MARKERS.items() if v}

    def guess(self, text: str) -> str:
        if _HAN.search(text):
            return "zh"
        toks = set(self.token_re.findall(text.lower())[:200])
        best, best_hits = "en", 0
        for lang, markers in self.markers.items():
            hits = len(toks & markers)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        guesses = [self.guess(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_guess", pa.array(guesses, pa.string()))


def _mix64_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def token_hashes(text: str) -> np.ndarray:
    """Per-token 64-bit hashes (FNV-1a seed then splitmix finalize) —
    shared by fingerprinting / simhash / minhash shingling.

    Zipf: a corpus's working vocabulary is tiny relative to its token
    count, so hashes memoize per process; cache misses batch through the
    vectorized padded-matrix FNV instead of the per-byte Python loop."""
    toks = _TOKEN_RE.findall(text)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    c = _FNV_CACHE
    missing = [t for t in dict.fromkeys(toks) if t not in c]
    if missing:
        if len(c) + len(missing) > _FNV_CACHE_CAP:
            # wholesale reset keeps a long-lived actor's heap flat; vocab
            # rarely approaches the cap between resets so refill amortizes
            c.clear()
        for t, h in zip(missing, _fnv1a_bulk(missing)):
            c[t] = h
    h = np.fromiter((c[t] for t in toks), count=len(toks), dtype=np.uint64)
    return _mix64_np(h)


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & ((1 << 64) - 1)
    return h


_FNV_CACHE: dict[str, int] = {}
_FNV_CACHE_CAP = 1 << 20
_FNV_BULK_MAXLEN = 64


def _fnv1a_bulk(tokens: list[str]) -> list[int]:
    """Vectorized FNV-1a over a token list: rows scatter into one padded
    (N, maxlen) uint8 matrix, then one masked xor-multiply pass per byte
    position (<= maxlen numpy ops total, no per-token Python). Tokens
    longer than _FNV_BULK_MAXLEN bytes (rare: URLs, blobs) take the scalar
    loop so a single huge token can't inflate the pass count."""
    enc = [t.encode() for t in tokens]
    lens = np.fromiter((len(b) for b in enc), count=len(enc), dtype=np.int64)
    out: list[int] = [0] * len(tokens)
    big = lens > _FNV_BULK_MAXLEN
    for i in np.flatnonzero(big).tolist():
        out[i] = _fnv1a(tokens[i])
    small = np.flatnonzero(~big)
    if small.size:
        enc_s = [enc[i] for i in small.tolist()]
        lens_s = lens[small]
        n, width = small.size, int(lens_s.max(initial=1))
        mat = np.zeros((n, width), dtype=np.uint8)
        flat = np.frombuffer(b"".join(enc_s), dtype=np.uint8)
        row = np.repeat(np.arange(n), lens_s)
        starts = np.concatenate(([0], np.cumsum(lens_s)[:-1]))
        col = np.arange(flat.size) - np.repeat(starts, lens_s)
        mat[row, col] = flat
        h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        with np.errstate(over="ignore"):
            for j in range(width):
                m = lens_s > j
                h[m] = (h[m] ^ mat[m, j]) * prime
        for i, v in zip(small.tolist(), h.tolist()):
            out[i] = v
    return out


def _ws_explode(texts) -> tuple[np.ndarray, pa.Array]:
    """THE Arrow-native whitespace-split explode: texts (StringArray /
    ChunkedArray) -> (parent_row int64 np, tokens StringArray), exact
    ``str.split()`` parity — ``pc.utf8_split_whitespace`` splits on the
    same Unicode whitespace set (incl. \\x1c-\\x1f, \\x85, \\xa0,
    \\u2009, \\u3000; verified against CPython) and leading/trailing
    runs yield empty strings which are filtered here. No per-row
    Python; the flatten and filter are Arrow kernels."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = pc.utf8_split_whitespace(texts)
    flat = pc.list_flatten(lst)
    parent = pc.list_parent_indices(lst).to_numpy(
        zero_copy_only=False).astype(np.int64)
    nonempty = pc.greater(pc.binary_length(flat), 0)
    if len(flat) and not pc.all(nonempty).as_py():
        mask = nonempty.to_numpy(zero_copy_only=False)
        flat = flat.filter(nonempty)
        parent = parent[mask]
    return parent, flat


def _join_word_grams(parent: np.ndarray, flat: pa.Array,
                     n: int) -> tuple[np.ndarray, pa.Array]:
    """(parent, word) rows -> (parent, n-gram) rows: grams are the
    within-row length-n windows joined with a single space — exact
    ``dedup._word_ngrams`` string parity (repeats kept; dedup is the
    caller's job). Window membership is index arithmetic; the join is
    one ``pc.binary_join_element_wise`` over n shifted slices."""
    m = len(flat) - (n - 1)
    if m <= 0:
        return (np.empty(0, dtype=np.int64),
                pa.array([], type=pa.string()))
    valid = parent[:m] == parent[n - 1:]
    parts = [flat.slice(j, m) for j in range(n)]
    grams = pc.binary_join_element_wise(
        *parts, pa.scalar(" ", type=flat.type))
    grams = grams.filter(pa.array(valid))
    return parent[:m][valid], grams


def _dict_fnv1a(de: pa.DictionaryArray,
                codes: np.ndarray) -> np.ndarray:
    """Per-row FNV-1a(+nothing — raw FNV, the pinned `_fnv1a` value) of a
    dictionary-encoded string column: hash only the (Zipf-small) batch
    dictionary once, gather through the codes. Returns uint64 per row."""
    dict_h = np.asarray(_fnv1a_bulk(de.dictionary.to_pylist()),
                        dtype=np.uint64)
    return dict_h[codes]


def _explode_distinct_grams(batch: pa.Table, id_col: str, text_col: str,
                            gram_n: int = 1):
    """Arrow-native DISTINCT word-n-gram explode — the shared kernel for
    the tfidf/ngram/vocab family (replaces the per-doc Python
    ``set(t.split())`` loops; same string semantics as
    ``dedup._word_ngrams``). Returns a dict of aligned columns:
    ``doc`` (id_col values, Arrow), ``gram`` (StringArray), ``hash``
    (uint64 np, pinned FNV-1a of the gram), ``parent`` (batch row index
    int64 np, ascending), ``n_grams`` (per-row distinct-gram count of
    the row's doc, int64 np). Distinctness is exact string equality via
    per-batch dictionary encoding (no hash-collision exposure); the
    dedup itself is one numpy lexsort + boundary scan."""
    parent, toks = _ws_explode(batch.column(text_col))
    if gram_n > 1:
        parent, toks = _join_word_grams(parent, toks, gram_n)
    if len(toks) == 0:
        return {"doc": batch.column(id_col).slice(0, 0).combine_chunks()
                if isinstance(batch.column(id_col), pa.ChunkedArray)
                else batch.column(id_col).slice(0, 0),
                "gram": pa.array([], pa.string()),
                "hash": np.empty(0, dtype=np.uint64),
                "parent": np.empty(0, dtype=np.int64),
                "n_grams": np.empty(0, dtype=np.int64)}
    de = toks.dictionary_encode()
    codes = np.asarray(de.indices, dtype=np.int64)
    order = np.lexsort((codes, parent))
    ps, cs = parent[order], codes[order]
    first = np.concatenate(([True],
                            (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])))
    parent_sel, codes_sel = ps[first], cs[first]
    # per-doc distinct-gram counts (parent_sel is sorted ascending)
    db = np.concatenate(([True], parent_sel[1:] != parent_sel[:-1]))
    starts = np.flatnonzero(db)
    sizes = np.diff(np.append(starts, parent_sel.size))
    n_grams = np.repeat(sizes, sizes)
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return {"doc": ids.take(pa.array(parent_sel)),
            "gram": de.dictionary.take(pa.array(codes_sel)),
            "hash": _dict_fnv1a(de, codes_sel),
            "parent": parent_sel,
            "n_grams": n_grams}


def _term_tf_rows(batch: pa.Table, id_col: str, text_col: str,
                  terms: list[str]):
    """Arrow-native query-term-restricted term-frequency rows — the
    shared inverted-index kernel for keyword_topk / bm25_topk (replaces
    per-doc Python ``dict`` counting): ws-explode, ``pc.is_in`` term
    filter, and one lexsort boundary scan for per-(doc, term) counts.
    Returns (parent int64 np — batch row index per emitted row, term
    StringArray, tf int64 np, dl int64 np — per-BATCH-ROW token count,
    length == batch.num_rows)."""
    parent, flat = _ws_explode(batch.column(text_col))
    dl = np.bincount(parent, minlength=batch.num_rows).astype(np.int64)
    empty = (np.empty(0, dtype=np.int64), pa.array([], pa.string()),
             np.empty(0, dtype=np.int64), dl)
    if len(flat) == 0:
        return empty
    mask = pc.is_in(flat, value_set=pa.array(terms, pa.string()))
    keep = mask.to_numpy(zero_copy_only=False)
    if not keep.any():
        return empty
    p2 = parent[keep]
    de = flat.filter(mask).dictionary_encode()
    codes = np.asarray(de.indices, dtype=np.int64)
    order = np.lexsort((codes, p2))
    ps, cs = p2[order], codes[order]
    bound = np.concatenate(([True],
                            (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])))
    starts = np.flatnonzero(bound)
    tf = np.diff(np.append(starts, ps.size)).astype(np.int64)
    return (ps[bound], de.dictionary.take(pa.array(cs[bound])), tf, dl)


def _segment_all_pairs(seg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment index pairs (i < j) of a sorted segment-id
    array, by pure index arithmetic (np.repeat + within-row arange) —
    the PMI per-doc pair-emission kernel. Returns (a_idx, b_idx) global
    row indices; a row in a segment of size s emits s-1-local pairs."""
    n = seg.size
    if n == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    boundary = np.concatenate(([True], seg[1:] != seg[:-1]))
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, n))
    seg_id = np.cumsum(boundary) - 1
    local = np.arange(n, dtype=np.int64) - starts[seg_id]
    out_per_row = sizes[seg_id] - 1 - local
    total = int(out_per_row.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    a_idx = np.repeat(np.arange(n, dtype=np.int64), out_per_row)
    cum = np.concatenate(([0], np.cumsum(out_per_row)[:-1]))
    k = np.arange(total, dtype=np.int64) - np.repeat(cum, out_per_row)
    return a_idx, a_idx + 1 + k


class Fingerprinter:
    """Rolling-hash document fingerprint (polynomial over token hashes) —
    order-sensitive, whitespace-insensitive; uint64 per doc."""

    BASE = np.uint64(1099511628211)

    def fingerprint(self, text: str) -> int:
        h = token_hashes(text)
        if h.size == 0:
            return 0
        # polynomial hash sum(h[i] * BASE^(n-1-i)) with uint64 wraparound,
        # fully vectorized (np uint64 arithmetic wraps mod 2^64)
        with np.errstate(over="ignore"):
            powers = np.full(h.size, self.BASE, dtype=np.uint64)
            powers[0] = 1
            powers = np.cumprod(powers)[::-1]
            return int((h * powers).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))


def analyze_documents(ds, include_lang: bool = True):
    """documents Dataset -> stats (+ lang_guess) Dataset. Vectorized stats as
    a task stage; lang-id as an actor pool (compiled state per actor)."""
    out = ds.map_batches(text_stats_batch, batch_format="pyarrow")
    if include_lang:
        from ..util import pool_concurrency

        out = out.map_batches(LangId, batch_format="pyarrow",
                              concurrency=pool_concurrency(), num_cpus=0.5,
                              max_restarts=0)
    return out


def pack_sequences(ds, budget: int = 512, bucket_size: int = 256,
                   id_col: str = "doc_id", text_col: str = "text",
                   driver_limit: int = 1 << 22) -> "pa.Table":
    """Greedy sequence packing for pre-training batches: walking docs in
    id order, doc d goes to bin ``floor(tokens_before_d / budget)`` —
    i.e. a new bin opens whenever the running token total crosses the
    budget. Returns the packing manifest ``(bin, n_docs, sum_tokens)``.

    Distributed-prefix-sum shape (the same block-partials + tiny-offsets
    pattern as the frontier's admission sequencer, ARCHITECTURE.md §2):

    1. one ``map_batches`` pass computes per-doc token counts and each
       doc's id-range bucket (``doc_id // bucket_size`` — ids are dense);
    2. a vectorized ``groupby(bucket).Sum`` yields per-bucket totals —
       O(N / bucket_size) rows; the driver exclusive-cumsums them (tiny)
       and broadcasts the offset array;
    3. ``groupby(bucket).map_groups`` sorts each bucket by id, local
       exclusive cumsum + the bucket's global offset = exact
       tokens-before-doc, then bins reduce via one more vectorized
       groupby. No step materializes per-doc data on the driver.
    """
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Sum

    from .dedup import _cached_get

    def tokens(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        parent, _flat = _ws_explode(batch.column(text_col))
        n_tok = np.bincount(parent, minlength=len(ids)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "n_tokens": pa.array(n_tok),
            "bucket": pa.array((ids // bucket_size).astype(np.int64)),
        })

    tok = ds.map_batches(tokens, batch_format="pyarrow").materialize()

    if tok.count() <= driver_limit:
        # per-doc rows are 3 int64 columns — under the guard (32 MB at
        # the default) the manifest folds on the driver in numpy; the
        # distributed prefix-sum below (pinned equal by the
        # driver_limit=0 test) is the >4M-doc shape
        df = tok.to_pandas()
        order = np.argsort(df["doc_id"].to_numpy(), kind="stable")
        n = df["n_tokens"].to_numpy()[order]
        before = np.concatenate(([0], np.cumsum(n)[:-1]))
        bins = before // budget
        uniq, n_docs = np.unique(bins, return_counts=True)
        sums = np.bincount(
            np.searchsorted(uniq, bins), weights=n).astype(np.int64)
        return pa.table({
            "bin": pa.array(uniq.astype(np.int64)),
            "n_docs": pa.array(n_docs.astype(np.int64)),
            "sum_tokens": pa.array(sums),
        })

    bucket_sums = tok.groupby("bucket").aggregate(
        Sum("n_tokens", alias_name="total")).to_pandas()
    bucket_sums = bucket_sums.sort_values("bucket")
    b_ids = bucket_sums["bucket"].to_numpy()
    if len(b_ids) and int(b_ids.min()) < 0:
        raise ValueError("pack_sequences requires non-negative ids "
                         f"(got bucket {int(b_ids.min())})")
    # dict-keyed offsets: safe for sparse id spaces (a dense array sized
    # by max bucket id would OOM on hash-derived ids)
    totals = bucket_sums["total"].to_numpy()
    excl = np.concatenate(([0], np.cumsum(totals)[:-1]))
    offsets = dict(zip((int(x) for x in b_ids), (int(x) for x in excl)))
    off_ref = ray.put(offsets)

    def assign_bins(group: pd.DataFrame) -> pd.DataFrame:
        offs = _cached_get(off_ref)
        g = group.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        before = offs[int(g["bucket"].iloc[0])] + \
            np.concatenate(([0], np.cumsum(n)[:-1]))
        return pd.DataFrame({"bin": before // budget,
                             "n_tokens": n})

    out = (tok.groupby("bucket").map_groups(assign_bins,
                                            batch_format="pandas")
           .groupby("bin").aggregate(
               Count(alias_name="n_docs"),
               Sum("n_tokens", alias_name="sum_tokens")).to_pandas())
    out = out.sort_values("bin").reset_index(drop=True)
    return pa.table({
        "bin": pa.array(out["bin"].astype("int64")),
        "n_docs": pa.array(out["n_docs"].astype("int64")),
        "sum_tokens": pa.array(out["sum_tokens"].astype("int64")),
    })


def keyword_topk(ds, terms: list[str], k: int = 10,
                 id_col: str = "doc_id", text_col: str = "text") -> "pa.Table":
    """Keyword-relevance top-k with an integer-quantized IDF — the IR
    scoring class (tf-idf/BM25 shape) kept oracle-exact by avoiding float
    logs: ``score(doc) = sum_t tf(t, doc) * (N // df(t))`` over the query
    terms, all int64 arithmetic, ties broken by doc_id.

    Scale shape: ONE corpus pass emits the query-term-restricted inverted
    index (doc, term, tf) — O(docs x |terms|) narrow rows; term document
    frequencies are a tiny aggregate OVER THAT TABLE (no second corpus
    scan); weighted scores reduce per doc and the top-k is per-block
    local top-k + driver merge (never a global sort). Terms absent from
    the corpus contribute nothing (their df rows simply don't exist).

    Tokenization is ``str.split()`` — THE pinned convention shared with
    ``_word_ngrams`` and every gram oracle (== DuckDB
    ``regexp_split_to_array(text, '\\s+')`` on this corpus, which
    contains no unicode whitespace; see oracle_kernels.py invariants)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Sum

    def tf_rows(batch: pa.Table) -> pa.Table:
        p_sel, term_arr, tf, _dl = _term_tf_rows(batch, id_col, text_col,
                                                 terms)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(pa.array(p_sel)),
                         "term": term_arr,
                         "tf": pa.array(tf, pa.int64())})

    n_docs = ds.count()
    tf_m = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    df = tf_m.groupby("term").aggregate(Count(alias_name="df")).to_pandas()
    if len(df) == 0:  # no query term occurs anywhere: typed empty result
        id_type = {f.name: f.type for f in ds.schema().base_schema}[id_col]
        return pa.table({"doc_id": pa.array([], id_type),
                         "score": pa.array([], pa.int64())})
    weights = {t: n_docs // int(c) for t, c in zip(df["term"], df["df"])}
    w_ref = ray.put(weights)

    def weighted(batch: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        tf = np.asarray(batch.column("tf"), dtype=np.int64)
        wt = np.fromiter((w[t] for t in batch.column("term").to_pylist()),
                         count=len(batch), dtype=np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "part": pa.array(tf * wt, pa.int64())})

    scores = (tf_m.map_batches(weighted, batch_format="pyarrow")
              .groupby("doc_id").aggregate(Sum("part", alias_name="score")))

    def local_topk(batch: pa.Table) -> pa.Table:
        d = batch.to_pandas()
        d = d.sort_values(["score", "doc_id"], ascending=[False, True])
        return pa.Table.from_pandas(d.head(k), preserve_index=False)

    parts = pa.concat_tables(
        scores.map_batches(local_topk, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    merged = parts.to_pandas().sort_values(["score", "doc_id"],
                                           ascending=[False, True]).head(k)
    return pa.table({
        "doc_id": pa.array(merged["doc_id"].tolist()),
        "score": pa.array(merged["score"].astype("int64"), pa.int64()),
    })


def repetition_scores_batch(batch: pa.Table, n: int = 3,
                            scale: int = 1_000_000,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> pa.Table:
    """Within-document repetition score — the Gopher-style repeated-n-gram
    quality filter (Rae et al. 2021 §A1.1): fraction of a doc's word
    n-grams that are repeats of an earlier gram, as integer fixed-point
    ``(total - distinct) * scale // total``. Pure map-side (no shuffle);
    docs with fewer than ``n`` tokens emit nothing (no grams to score —
    the SQL oracle's empty-UNNEST behavior). Tokenization is THE pinned
    kernel: ``str.split()`` == DuckDB regexp_split ``\\s+`` (see
    dedup._word_ngrams). Arrow/numpy all the way: one ws-explode +
    n-gram window pass for totals, one dictionary-dedup pass for
    distincts — no per-doc Python."""
    parent, toks = _ws_explode(batch.column(text_col))
    parent, grams = _join_word_grams(parent, toks, n)
    n_rows = batch.num_rows
    if len(grams) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "rep_scaled": pa.array([], pa.int64())})
    total = np.bincount(parent, minlength=n_rows)
    de = grams.dictionary_encode()
    codes = np.asarray(de.indices, dtype=np.int64)
    order = np.lexsort((codes, parent))
    ps, cs = parent[order], codes[order]
    first = np.concatenate(([True],
                            (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])))
    distinct = np.bincount(ps[first], minlength=n_rows)
    keep = np.flatnonzero(total > 0)
    rep = (total[keep] - distinct[keep]) * scale // total[keep]
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({id_col: ids.take(pa.array(keep)),
                     "rep_scaled": pa.array(rep, pa.int64())})


def bm25_topk(ds, terms: list[str], k: int = 10, scale: int = 1_000_000,
              id_col: str = "doc_id", text_col: str = "text") -> "pa.Table":
    """BM25 top-k with EXACT integer arithmetic (k1 = 1.2, b = 0.75) — the
    full Robertson-Sparck Jones ranking function, kept oracle-exact by
    clearing denominators instead of evaluating floats:

        term = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    with avgdl = TL/N (TL = corpus token count); multiplying num and den
    by 10*TL and substituting k1, b gives the all-integer form

        term_scaled = idf * 22*tf*TL * scale // (10*TL*tf + 3*TL + 9*dl*N)

    with idf = N // df (the pinned integer-idf convention of
    ``keyword_topk``). Python bigints carry the products, so no int64
    overflow at any corpus size; the DuckDB oracle computes the identical
    expression in HUGEINT.

    Scale shape: ONE corpus pass emits a per-doc sentinel row (doc length
    — the corpus stats feed) plus the query-term-restricted (doc, term,
    tf, dl) inverted index; N/TL/df reduce from that table (no second
    corpus scan); scoring runs over the narrow index rows with broadcast
    globals; top-k is per-block local + driver merge."""
    import ray
    from ray.data.aggregate import Count, Sum

    def index_rows(batch: pa.Table) -> pa.Table:
        # sentinel row per doc (term "" carries dl) + term-filtered
        # (doc, term, tf, dl) rows — one Arrow kernel pass, no per-doc
        # Python dict counting. Row order (sentinels first) differs
        # from the old interleaving; every consumer below is a
        # groupby/filter, so order is immaterial.
        p_sel, term_arr, tf, dl = _term_tf_rows(batch, id_col, text_col,
                                                terms)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        doc_col = pa.concat_arrays([ids, ids.take(pa.array(p_sel))])
        term_col = pa.concat_arrays([
            pa.array([""] * n, pa.string()), term_arr])
        tf_col = np.concatenate([np.zeros(n, dtype=np.int64), tf])
        dl_col = np.concatenate([dl, dl[p_sel]])
        return pa.table({"doc_id": doc_col,
                         "term": term_col,
                         "tf": pa.array(tf_col, pa.int64()),
                         "dl": pa.array(dl_col, pa.int64())})

    idx = ds.map_batches(index_rows, batch_format="pyarrow").materialize()
    stats = idx.filter(expr="term == ''") \
        .aggregate(Count(alias_name="n"), Sum("dl", alias_name="tl"))
    n_docs, tl = int(stats["n"]), int(stats["tl"])
    hits = idx.filter(expr="term != ''").materialize()
    df = hits.groupby("term").aggregate(Count(alias_name="df")).to_pandas()
    if len(df) == 0 or tl == 0:
        id_type = {f.name: f.type for f in ds.schema().base_schema}[id_col]
        return pa.table({"doc_id": pa.array([], id_type),
                         "score": pa.array([], pa.int64())})
    idf = {t: n_docs // int(c) for t, c in zip(df["term"], df["df"])}
    g_ref = ray.put((idf, n_docs, tl))

    def score_rows(batch: pa.Table) -> pa.Table:
        idf_m, n, tl_ = ray.get(g_ref)
        out_id, out_s = [], []
        for d, term, tf, dl in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("term").to_pylist(),
                                   batch.column("tf").to_pylist(),
                                   batch.column("dl").to_pylist()):
            # Python bigints: products exceed int64 at large TL by design
            s = idf_m[term] * 22 * tf * tl_ * scale \
                // (10 * tl_ * tf + 3 * tl_ + 9 * dl * n)
            out_id.append(d)
            out_s.append(s)
        return pa.table({"doc_id": pa.array(out_id),
                         "part": pa.array(out_s, pa.int64())})

    scores = (hits.map_batches(score_rows, batch_format="pyarrow")
              .groupby("doc_id").aggregate(Sum("part", alias_name="score")))

    def local_topk(batch: pa.Table) -> pa.Table:
        d = batch.to_pandas()
        d = d.sort_values(["score", "doc_id"], ascending=[False, True])
        return pa.Table.from_pandas(d.head(k), preserve_index=False)

    parts = pa.concat_tables(
        scores.map_batches(local_topk, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    merged = parts.to_pandas().sort_values(["score", "doc_id"],
                                           ascending=[False, True]).head(k)
    return pa.table({
        "doc_id": pa.array(merged["doc_id"].tolist()),
        "score": pa.array(merged["score"].astype("int64"), pa.int64()),
    })


_EMAIL_RX = None


def redact_pii_batch(batch: pa.Table, id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """PII scrub — the pre-training redaction stage: replace email
    addresses with ``[EMAIL]`` and count redactions per doc. Pure
    map-side; the pattern is RE2-compatible (no backrefs/lookaround) so
    DuckDB ``regexp_replace(..., 'g')`` replays it exactly."""
    import re

    global _EMAIL_RX
    if _EMAIL_RX is None:  # compile once per worker process
        _EMAIL_RX = re.compile(
            r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    ids, texts, counts = [], [], []
    for d, t in zip(batch.column(id_col).to_pylist(),
                    batch.column(text_col).to_pylist()):
        clean, n = _EMAIL_RX.subn("[EMAIL]", t)
        ids.append(d)
        texts.append(clean)
        counts.append(n)
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "clean_text": pa.array(texts, pa.string()),
                     "n_redactions": pa.array(counts, pa.int64())})


def chunk_overlap_batch(batch: pa.Table, size: int = 64, stride: int = 48,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """Overlapping token chunking — the RAG/packing prep stage: emit
    chunks of ``size`` tokens every ``stride`` tokens (chunk starts =
    0, stride, 2*stride, ... while start < n_tokens). Map-side explode;
    tokenization is the pinned ``str.split()`` kernel, so the DuckDB
    oracle replays via list slicing + ``range(0, n, stride)``."""
    ids, idxs, lens, texts = [], [], [], []
    for d, t in zip(batch.column(id_col).to_pylist(),
                    batch.column(text_col).to_pylist()):
        toks = t.split()
        for ci, start in enumerate(range(0, len(toks), stride)):
            chunk = toks[start:start + size]
            ids.append(d)
            idxs.append(ci)
            lens.append(len(chunk))
            texts.append(" ".join(chunk))
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "chunk_idx": pa.array(idxs, pa.int64()),
                     "n_tokens": pa.array(lens, pa.int64()),
                     "chunk_text": pa.array(texts, pa.string())})


def unigram_surprise(ds, id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int | None = None,
                     as_dataset: bool = False,
                     score_scale: int = 1) -> pa.Table:
    """Corpus-trained unigram LM scoring (the CCNet perplexity-bucketing
    shape, integer-exact): train unigram counts over the corpus itself,
    then score every doc by its mean per-token *surprise*
    ``T // count(tok)`` (T = total corpus tokens) — rare-token-heavy docs
    score high, boilerplate scores low. Integer division keeps it exactly
    SQL-replayable (float log-probs drift between libm builds).

    Fully distributed, NO vocab broadcast: (doc, token-hash) rows bucket
    by ``hash % nb``, so a bucket holds EVERY occurrence of its tokens
    and the global count is an in-bucket lexsort + segment size; the
    per-occurrence surprise reduces to per-(doc, bucket) partials and one
    slim groupby-Sum finishes per doc. T is a scalar from a pruned
    counting pass. Nothing vocabulary- or corpus-sized ever sits on the
    driver — the usual CCNet design broadcasts the LM, this one co-locates
    it with its occurrences instead.

    ``as_dataset=True`` returns the per-doc score stream as a Ray
    Dataset (columns doc / n_tokens / mean_surprise) instead of a
    driver-side Table — the input for downstream distributed consumers
    like ``perplexity_buckets`` (empty corpora still return an empty
    driver Table; callers must accept either). ``score_scale`` raises
    the fixed-point resolution of the mean (ssum * scale // n_tokens);
    the default 1 is the original integer mean."""
    import pandas as pd
    import ray

    nb = n_buckets or max(16, min(256,
                                  int(ray.cluster_resources().get("CPU", 8)) * 2))

    def tok_count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column(text_col), r"\S+")
        return pa.table({"n": pa.array(
            [int(pc.sum(n).as_py() or 0)], pa.int64())})

    total = int(ds.map_batches(tok_count, batch_format="pyarrow")
                .sum("n") or 0)
    if total == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "mean_surprise": pa.array([], pa.int64())})

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        th_all, d_all = [], []
        for d, t in zip(ids, texts):
            th = token_hashes(t)
            if th.size == 0:
                continue
            th_all.append(th.view(np.int64))
            d_all.append(np.full(th.size, d, dtype=np.int64))
        if not th_all:
            z = pa.array([], pa.int64())
            return pa.table({"doc": z, "th": z, "_kb": z})
        th_c = np.concatenate(th_all)
        d_c = np.concatenate(d_all)
        kb = (th_c.view(np.uint64) % np.uint64(nb)).astype(np.int64)
        return pa.table({"doc": pa.array(d_c, pa.int64()),
                         "th": pa.array(th_c, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_partials(group: pd.DataFrame) -> pd.DataFrame:
        th = group["th"].to_numpy(dtype=np.int64)
        doc = group["doc"].to_numpy(dtype=np.int64)
        order = np.lexsort((doc, th))
        th, doc = th[order], doc[order]
        boundary = np.concatenate(([True], th[1:] != th[:-1]))
        seg_id = np.cumsum(boundary) - 1
        sizes = np.diff(np.append(np.flatnonzero(boundary), th.size))
        surprise = total // sizes[seg_id]          # per occurrence
        # reduce to per-doc partials inside the bucket
        dorder = np.argsort(doc, kind="stable")
        doc, surprise = doc[dorder], surprise[dorder]
        dstart = np.concatenate(([True], doc[1:] != doc[:-1]))
        idx = np.flatnonzero(dstart)
        return pd.DataFrame({
            "doc": doc[idx],
            "ssum": np.add.reduceat(surprise, idx).astype(np.int64),
            "n": np.diff(np.append(idx, doc.size)).astype(np.int64)})

    def rebucket(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch.column("doc"), dtype=np.int64)
        db = (_mix64_np(doc.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return batch.append_column("_db", pa.array(db, pa.int64()))

    def doc_totals(group: pd.DataFrame) -> pd.DataFrame:
        doc = group["doc"].to_numpy(dtype=np.int64)
        s = group["ssum"].to_numpy(dtype=np.int64)
        n = group["n"].to_numpy(dtype=np.int64)
        order = np.argsort(doc, kind="stable")
        doc, s, n = doc[order], s[order], n[order]
        start = np.concatenate(([True], doc[1:] != doc[:-1]))
        idx = np.flatnonzero(start)
        ssum = np.add.reduceat(s, idx).astype(np.int64)
        ntok = np.add.reduceat(n, idx).astype(np.int64)
        return pd.DataFrame({"doc": doc[idx], "n_tokens": ntok,
                             "mean_surprise": ssum * score_scale // ntok})

    # second fat-bucket shuffle finishes the per-doc sums — Ray's
    # sort-based groupby over the natural doc key measured 12.9 s on 91k
    # partial rows vs ~1 s for the bucketed kernel (the map_groups
    # per-natural-key overhead anti-pattern, same fix as window.py)
    scores = (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("_kb").map_groups(bucket_partials,
                                         batch_format="pandas")
              .map_batches(rebucket, batch_format="pyarrow")
              .groupby("_db").map_groups(doc_totals,
                                         batch_format="pandas"))
    if as_dataset:
        return scores
    parts = scores.to_pandas()
    if len(parts) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "mean_surprise": pa.array([], pa.int64())})
    parts = parts.sort_values("doc").reset_index(drop=True)
    return pa.table({id_col: pa.array(parts["doc"], pa.int64()),
                     "n_tokens": pa.array(parts["n_tokens"].to_numpy(
                         dtype=np.int64), pa.int64()),
                     "mean_surprise": pa.array(parts["mean_surprise"]
                                               .to_numpy(dtype=np.int64),
                                               pa.int64())})


def quality_rules_batch(batch: pa.Table, id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """Gopher-style rule-table quality filter (Rae et al. 2021 §A1.1 class
    of rules, scaled-integer arithmetic so the SQL oracle is exact):

    - ``rule_len``:     >= 30 tokens
    - ``rule_wordlen``: mean token length in [4.0, 10.0] (x10 fixed-point)
    - ``rule_symbol``:  <= 0.1 symbol (non-word, non-space) chars per token
    - ``rule_stop``:    >= 1 whole-word stopword hit
    - ``keep``:         every rule passes

    Pure vectorized map-side stage (pyarrow regex kernels, no shuffle) —
    at 100 TB this runs embarrassingly parallel at the read."""
    text = batch.column(text_col)
    n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    n_sym_chars = pc.cast(pc.count_substring_regex(text, r"\S"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.int64())
    stop_pat = r"\b(?:" + "|".join(STOPWORDS) + r")\b"
    stop_hits = pc.cast(pc.count_substring_regex(text, stop_pat), pa.int64())

    nt = np.asarray(n_tok, dtype=np.int64)
    nsc = np.asarray(n_sym_chars, dtype=np.int64)
    npt = np.asarray(n_punct, dtype=np.int64)
    sh = np.asarray(stop_hits, dtype=np.int64)
    safe_nt = np.maximum(nt, 1)
    wlen10 = nsc * 10 // safe_nt
    r_len = (nt >= 30).astype(np.int64)
    r_wordlen = ((wlen10 >= 40) & (wlen10 <= 100)).astype(np.int64)
    r_symbol = (npt * 10 <= nt).astype(np.int64)
    r_stop = (sh >= 1).astype(np.int64)
    keep = r_len * r_wordlen * r_symbol * r_stop
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens": n_tok,
        "mean_wlen_x10": pa.array(wlen10, pa.int64()),
        "rule_len": pa.array(r_len, pa.int64()),
        "rule_wordlen": pa.array(r_wordlen, pa.int64()),
        "rule_symbol": pa.array(r_symbol, pa.int64()),
        "rule_stop": pa.array(r_stop, pa.int64()),
        "keep": pa.array(keep, pa.int64()),
    })


def _greedy_merge_positions(idx: np.ndarray) -> np.ndarray:
    """Greedy left-to-right non-overlapping match selection over sorted
    match positions: within each maximal run of CONSECUTIVE positions,
    every other one is kept (a kept match at i consumes i+1, so the run's
    parity decides) — the closed form of the sequential scan, and exactly
    what a (i - run_start) % 2 = 0 filter computes in SQL."""
    if idx.size == 0:
        return idx
    starts = np.concatenate(([True], np.diff(idx) > 1))
    run_start = idx[starts][np.cumsum(starts) - 1]
    return idx[((idx - run_start) % 2) == 0]


def bpe_merges(ds, n_merges: int = 3, n_buckets: int = 64,
               id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """BPE merge training (Sennrich et al. 2016 top-pair recurrence) over
    the corpus token stream: each round counts all adjacent symbol pairs
    (overlapping occurrences included, the classic Counter-over-zip), the
    winner is the (count DESC, p1 ASC, p2 ASC) argmax, and every sequence
    rewrites by greedy left-to-right non-overlapping replacement of the
    winning pair with a fresh symbol ``p1*FNV_PRIME + p2`` (uint64 wrap —
    the shingle Horner combine, so the merge table is SQL-replayable).

    Scale shape per round: ONE map_batches emits per-batch deduplicated
    (p1, p2, count) partials bucketed by a pair hash, an n_buckets-group
    kernel sums and keeps its local argmax, and the driver reduces
    n_buckets candidate rows — the global pair-count table never
    materializes anywhere. The rewrite is map-side with the winner
    broadcast. Rounds iterate on a materialized symbol-sequence dataset
    (same convention as kmeans_int's fit passes).

    Stops early if no adjacent pair exists. Returns the merge table
    (round, p1, p2, merged, cnt) — k rows, sorted by round."""
    merges, _ = _bpe_train_loop(_bpe_seed(ds, id_col, text_col),
                                n_merges, n_buckets)
    return pa.table({
        "round": pa.array([m[0] for m in merges], pa.int64()),
        "p1": pa.array([m[1] for m in merges], pa.uint64()),
        "p2": pa.array([m[2] for m in merges], pa.uint64()),
        "merged": pa.array([m[3] for m in merges], pa.uint64()),
        "cnt": pa.array([m[4] for m in merges], pa.int64()),
    })


def bpe_token_counts(ds, n_merges: int = 3, n_buckets: int = 64,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Apply ``n_merges`` rounds of BPE training to the corpus itself and
    report per-document token counts before/after — the compression view
    a tokenizer owner monitors (merge quality = corpus length shrink).
    Same training recurrence as bpe_merges (shared loop); the before
    count rides the sequence rows so no join is needed. Returns (doc_id,
    n_before, n_after) sorted by doc_id."""
    _, seq = _bpe_train_loop(_bpe_seed(ds, id_col, text_col),
                             n_merges, n_buckets)

    def lengths(batch: pa.Table) -> pa.Table:
        hs = batch.column("hs")
        n_after = pc.list_value_length(hs).cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_before": batch.column("n0"),
                         "n_after": n_after})

    out = (seq.map_batches(lengths, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return pa.table({c: pa.array(out[c].to_numpy(np.int64), pa.int64())
                     for c in ("doc_id", "n_before", "n_after")})


def _bpe_seed(ds, id_col: str, text_col: str):
    def seed(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = [token_hashes(t).tolist()
              for t in batch.column(text_col).to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "hs": pa.array(hs, pa.list_(pa.uint64())),
                         "n0": pa.array([len(h) for h in hs],
                                        pa.int64())})

    return ds.map_batches(seed, batch_format="pyarrow").materialize()


def _bpe_train_loop(seq, n_merges: int, n_buckets: int):
    """The shared bpe_merges/bpe_token_counts round loop over a seeded
    (doc_id, hs, n0) sequence dataset. Returns (merge tuples, final
    sequence dataset)."""
    import pandas as pd

    prime = np.uint64(1099511628211)
    nb = n_buckets

    def _flat_hs(batch: pa.Table):
        """hs list<uint64> -> (flat values, parent row index) — one
        Arrow flatten, no per-doc loop."""
        col = batch.column("hs")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(pc.list_flatten(col), dtype=np.uint64)
        parent = pc.list_parent_indices(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return flat, parent

    def pair_partials(batch: pa.Table) -> pa.Table:
        h, parent = _flat_hs(batch)
        m = (parent[:-1] == parent[1:]) if h.size >= 2 else \
            np.zeros(0, dtype=bool)
        p1, p2 = h[:-1][m], h[1:][m]
        if p1.size == 0:
            u = pa.array([], pa.uint64())
            z = pa.array([], pa.int64())
            return pa.table({"p1": u, "p2": u, "c": z, "_kb": z})
        order = np.lexsort((p2, p1))
        p1, p2 = p1[order], p2[order]
        b = np.concatenate(([True],
                            (p1[1:] != p1[:-1]) | (p2[1:] != p2[:-1])))
        idx = np.flatnonzero(b)
        c = np.diff(np.append(idx, p1.size)).astype(np.int64)
        p1u, p2u = p1[idx], p2[idx]
        kb = (_mix64_np(p1u ^ _mix64_np(p2u)) % np.uint64(nb)
              ).astype(np.int64)
        return pa.table({"p1": pa.array(p1u, pa.uint64()),
                         "p2": pa.array(p2u, pa.uint64()),
                         "c": pa.array(c, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_best(df: pd.DataFrame) -> pd.DataFrame:
        p1 = df["p1"].to_numpy(dtype=np.uint64)
        p2 = df["p2"].to_numpy(dtype=np.uint64)
        c = df["c"].to_numpy(dtype=np.int64)
        order = np.lexsort((p2, p1))
        p1, p2, c = p1[order], p2[order], c[order]
        b = np.concatenate(([True],
                            (p1[1:] != p1[:-1]) | (p2[1:] != p2[:-1])))
        idx = np.flatnonzero(b)
        cs = np.add.reduceat(c, idx).astype(np.int64)
        p1u, p2u = p1[idx], p2[idx]
        best = np.lexsort((p2u, p1u, -cs))[0]
        return pd.DataFrame({"p1": [p1u[best]], "p2": [p2u[best]],
                             "c": [cs[best]]})

    merges: list[tuple[int, int, int, int, int]] = []
    for r in range(1, n_merges + 1):
        cand = (seq.map_batches(pair_partials, batch_format="pyarrow")
                .groupby("_kb").map_groups(bucket_best,
                                           batch_format="pandas")
                .to_pandas())
        if len(cand) == 0:
            break
        cand = cand.sort_values(
            ["c", "p1", "p2"], ascending=[False, True, True])
        p1 = np.uint64(cand["p1"].iloc[0])
        p2 = np.uint64(cand["p2"].iloc[0])
        cnt = int(cand["c"].iloc[0])
        with np.errstate(over="ignore"):
            merged = np.uint64(p1 * prime + p2)
        merges.append((r, int(p1), int(p2), int(merged), cnt))

        def rewrite(batch: pa.Table, a=p1, b=p2, m=merged) -> pa.Table:
            # flat greedy replace: a hit needs both symbols in ONE doc,
            # so hit runs never span docs and the global
            # _greedy_merge_positions == the per-doc scan
            h, parent = _flat_hs(batch)
            if h.size >= 2:
                hitm = (h[:-1] == a) & (h[1:] == b) \
                    & (parent[:-1] == parent[1:])
                kept = _greedy_merge_positions(np.flatnonzero(hitm))
            else:
                kept = np.empty(0, dtype=np.int64)
            if kept.size:
                h = h.copy()
                h[kept] = m
                dropm = np.zeros(h.size, dtype=bool)
                dropm[kept + 1] = True
                h, parent = h[~dropm], parent[~dropm]
            counts = np.bincount(parent, minlength=batch.num_rows)
            offsets = np.concatenate(([0], np.cumsum(counts)))
            lists = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(h, pa.uint64()))
            return pa.table({"doc_id": batch.column("doc_id"),
                             "hs": lists,
                             "n0": batch.column("n0")})

        seq = seq.map_batches(rewrite, batch_format="pyarrow").materialize()

    return merges, seq


def dsir_weights(ds, target_langs: tuple[str, ...] = ("en",),
                 n_buckets: int = 4096, scale: int = 1_000_000,
                 id_col: str = "doc_id", text_col: str = "text",
                 lang_col: str = "lang") -> pa.Table:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    every document by the likelihood ratio of its hashed-bigram features
    under a target distribution vs the raw corpus — the data-selection
    weight that upsamples target-like text. Target here = the corpus's
    ``target_langs`` slice (DSIR's target is any trusted subset).

    Integer-exact variant: per-bucket score
    ``s(b) = scale*(ct+1)*(Tr+B) // ((cr+1)*(Tt+B))`` (Laplace-smoothed
    count ratio; ct/cr = target/raw bucket counts, Tt/Tr their totals,
    B = n_buckets) and per-doc weight = mean bucket score
    ``sum(s) // n_grams`` — Python-int exact, so the whole weight table
    replays in SQL (float log-ratios would drift between libm builds).
    target ⊆ raw keeps every score <= scale * Tr/Tt, far inside int64.

    Features are DSIR's hashed bigrams: consecutive token-hash pairs
    Horner-combined (``h[i]*FNV_PRIME + h[i+1]``, the shingle kernel with
    k=2) mod a FIXED n_buckets. Scale shape: the feature table is
    O(n_buckets) by construction, so pass 1 emits one (raw, tgt) count
    array per batch and reduces driver-side (the sketch-combine shape —
    #blocks * 32 KiB, never corpus-sized), the LUT broadcast is 32 KiB,
    and pass 2 is pure map-side. Docs with < 2 tokens get weight 0.

    Returns (doc_id, n_grams, weight_ppm) sorted by doc_id."""
    prime = np.uint64(1099511628211)
    nb = n_buckets
    tset = set(target_langs)

    def bigram_buckets(text: str) -> np.ndarray:
        th = token_hashes(text)
        if th.size < 2:
            return np.empty(0, dtype=np.int64)
        with np.errstate(over="ignore"):
            bg = th[:-1] * prime + th[1:]
        return (bg % np.uint64(nb)).astype(np.int64)

    def count_partials(batch: pa.Table) -> pa.Table:
        raw = np.zeros(nb, dtype=np.int64)
        tgt = np.zeros(nb, dtype=np.int64)
        for t, lg in zip(batch.column(text_col).to_pylist(),
                         batch.column(lang_col).to_pylist()):
            b = bigram_buckets(t)
            if b.size == 0:
                continue
            cnt = np.bincount(b, minlength=nb)
            raw += cnt
            if lg in tset:
                tgt += cnt
        return pa.table({"raw": pa.array([raw.tolist()],
                                         pa.list_(pa.int64())),
                         "tgt": pa.array([tgt.tolist()],
                                         pa.list_(pa.int64()))})

    parts = (ds.map_batches(count_partials, batch_format="pyarrow")
             .to_pandas())
    raw = np.sum(np.stack(parts["raw"].to_numpy()), axis=0,
                 dtype=np.int64) if len(parts) else np.zeros(nb, np.int64)
    tgt = np.sum(np.stack(parts["tgt"].to_numpy()), axis=0,
                 dtype=np.int64) if len(parts) else np.zeros(nb, np.int64)
    tr, tt = int(raw.sum()), int(tgt.sum())
    lut = np.fromiter(
        ((scale * (int(ct) + 1) * (tr + nb))
         // ((int(cr) + 1) * (tt + nb))
         for cr, ct in zip(raw.tolist(), tgt.tolist())),
        count=nb, dtype=np.int64)

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        n_out = np.empty(len(ids), dtype=np.int64)
        w_out = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            b = bigram_buckets(t)
            n_out[i] = b.size
            w_out[i] = int(lut[b].sum()) // b.size if b.size else 0
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(n_out, pa.int64()),
                         "weight_ppm": pa.array(w_out, pa.int64())})

    out = (ds.map_batches(score, batch_format="pyarrow")
           .to_pandas().sort_values(id_col).reset_index(drop=True))
    return pa.table({id_col: pa.array(out[id_col].astype("int64"),
                                      pa.int64()),
                     "n_grams": pa.array(out["n_grams"].to_numpy(np.int64),
                                         pa.int64()),
                     "weight_ppm": pa.array(out["weight_ppm"]
                                            .to_numpy(np.int64),
                                            pa.int64())})


def cooccurrence_pmi(ds, max_tokens: int = 32, min_cooc: int = 3,
                     top_k: int = 50, id_col: str = "doc_id",
                     text_col: str = "text", n_buckets: int | None = None,
                     broadcast_limit: int = 2_000_000) -> pa.Table:
    """Token co-occurrence with integer PMI-ratio scoring: for every
    unordered token pair sharing a document (each document contributes
    its first ``max_tokens`` DISTINCT tokens, by position), count
    co-occurring documents, drop pairs below ``min_cooc``, and score
    survivors with the exact integer

        score = (cooc * n_docs * 1000) // (df_a * df_b)

    — a monotone transform of the PMI ratio P(a,b)/(P(a)P(b)) with no
    float log (libm log would drift between engines). Returns the
    ``top_k`` pairs by (score desc, tok_a, tok_b).

    Scale shape: pairs explode WITHIN the tokenize batch (a doc's
    <= C(max_tokens,2) pairs never cross blocks, so no doc-keyed
    shuffle); pair counting and the min_cooc gate run inside pair-hash
    fat buckets (a bucket holds every copy of its pair strings — the
    ngram_jaccard_pairs routing argument); document frequencies count
    inside token-hash buckets the same way; survivors (already gated,
    tiny) attach their two df values via hash joins — or, when the
    vocabulary df table fits under ``broadcast_limit`` rows, via one
    broadcast dict lookup (two join-actor spawns measured ~2 s of fixed
    cost at small scale; pass 0 to force the join path) — and the
    driver merges per-block top-k lists only."""
    import ray

    import pandas as pd

    n_docs = ds.count()
    nb = n_buckets or max(16, min(256, int(
        ray.cluster_resources().get("CPU", 8)) * 2))

    # one tokenize pass feeds both sides: tag rows so a single
    # map_batches output carries tokens (for df) and pairs. Fully
    # Arrow/numpy: ws-split explode, appearance-order distinct cap via
    # one lexsort over (parent, code, pos), per-doc lexicographic token
    # order via a sorted-dictionary rank gather, and pair emission by
    # the _segment_all_pairs index kernel — the per-doc Python loop and
    # the O(pairs) Python string joins are gone. Pair bucket ids mix
    # the two token FNVs (routing only; counting inside a bucket groups
    # by the actual strings, so any deterministic mix is sound).
    def emit_tagged(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "tok_a": pa.array([], pa.string()),
            "tok_b": pa.array([], pa.string()),
            "is_pair": pa.array([], pa.int8()),
            "_kb": pa.array([], pa.int64())})
        parent, flat = _ws_explode(batch.column(text_col))
        if len(flat) == 0:
            return empty
        de = flat.dictionary_encode()
        codes = np.asarray(de.indices, dtype=np.int64)
        pos = np.arange(codes.size, dtype=np.int64)
        # first occurrence of each (doc, token); stable on position
        order = np.lexsort((pos, codes, parent))
        ps, cs = parent[order], codes[order]
        first = np.concatenate(([True],
                                (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])))
        sel = order[first]
        p_f, c_f = parent[sel], codes[sel]
        # appearance rank within doc; keep the first max_tokens distinct
        # (== the reference loop's break-after-add cap semantics)
        order2 = np.lexsort((sel, p_f))
        p2, c2 = p_f[order2], c_f[order2]
        b2 = np.concatenate(([True], p2[1:] != p2[:-1]))
        rank = np.arange(p2.size, dtype=np.int64) \
            - np.flatnonzero(b2)[np.cumsum(b2) - 1]
        p3, c3 = p2[rank < max_tokens], c2[rank < max_tokens]
        if p3.size == 0:
            return empty
        # lexicographic order within doc: UTF-8 byte order (Arrow sort)
        # == codepoint order (Python sorted) for valid UTF-8
        d = de.dictionary
        lexrank = np.empty(len(d), dtype=np.int64)
        lexrank[np.asarray(pc.sort_indices(d), dtype=np.int64)] = \
            np.arange(len(d), dtype=np.int64)
        order3 = np.lexsort((lexrank[c3], p3))
        p4, c4 = p3[order3], c3[order3]
        tok_str = d.take(pa.array(c4))
        dict_h = np.asarray(_fnv1a_bulk(d.to_pylist()), dtype=np.uint64)
        th = dict_h[c4]
        a_idx, b_idx = _segment_all_pairs(p4)
        ca, cb = c4[a_idx], c4[b_idx]
        with np.errstate(over="ignore"):
            ph = _mix64_np(dict_h[ca]) \
                + dict_h[cb] * np.uint64(0x9E3779B97F4A7C15)
        n_tok = c4.size
        tok_a = pa.concat_arrays([tok_str, d.take(pa.array(ca))])
        tok_b = pa.concat_arrays([
            pc.utf8_slice_codeunits(tok_str, 0, 0),  # "" per token row
            d.take(pa.array(cb))])
        kb = np.concatenate([th, ph]) % np.uint64(nb)
        return pa.table({
            "tok_a": tok_a,
            "tok_b": tok_b,
            "is_pair": pa.array(np.concatenate(
                [np.zeros(n_tok, np.int8),
                 np.ones(ca.size, np.int8)]), pa.int8()),
            "_kb": pa.array(kb.astype(np.int64), pa.int64()),
        })

    tagged = ds.map_batches(emit_tagged, batch_format="pyarrow")

    def count_bucket(group: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for flag in (0, 1):
            g = group[group["is_pair"] == flag]
            if len(g) == 0:
                continue
            c = (g.groupby(["tok_a", "tok_b"], as_index=False, sort=False)
                 .size().rename(columns={"size": "cnt"}))
            if flag == 1:
                c = c[c["cnt"] >= min_cooc]
            c["is_pair"] = np.int8(flag)
            frames.append(c)
        if not frames:
            return pd.DataFrame({"tok_a": pd.Series([], dtype=object),
                                 "tok_b": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64),
                                 "is_pair": pd.Series([], dtype=np.int8)})
        out = pd.concat(frames, ignore_index=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[["tok_a", "tok_b", "cnt", "is_pair"]]

    counted = (tagged.groupby("_kb")
               .map_groups(count_bucket, batch_format="pandas")
               .materialize())
    pairs = counted.filter(expr="is_pair == 1") \
        .select_columns(["tok_a", "tok_b", "cnt"])
    df_tbl = counted.filter(expr="is_pair == 0") \
        .select_columns(["tok_a", "cnt"])

    if df_tbl.count() <= broadcast_limit:
        df_map: dict = {}
        for b in df_tbl.iter_batches(batch_size=1 << 18,
                                     batch_format="pyarrow"):
            df_map.update(zip(b.column("tok_a").to_pylist(),
                              b.column("cnt").to_pylist()))
        df_ref = ray.put(df_map)

        from .dedup import _cached_get

        def attach_bcast(batch: pa.Table) -> pa.Table:
            lut = _cached_get(df_ref)
            df = batch.to_pandas()
            df["df_a"] = np.asarray([lut[t] for t in df["tok_a"]],
                                    dtype=np.int64)
            df["df_b"] = np.asarray([lut[t] for t in df["tok_b"]],
                                    dtype=np.int64)
            return pa.Table.from_pandas(df, preserve_index=False)

        with_ab = pairs.map_batches(attach_bcast, batch_format="pyarrow")
    else:
        def df_key_a(batch: pa.Table) -> pa.Table:
            return pa.table({"tok_a": batch.column("tok_a"),
                             "df_a": batch.column("cnt")})

        from ..util import join_parts

        n_parts = join_parts()
        with_a = pairs.join(df_tbl.map_batches(df_key_a,
                                               batch_format="pyarrow"),
                            "inner", n_parts, on=("tok_a",))

        def df_key_b(batch: pa.Table) -> pa.Table:
            return pa.table({"tok_b": batch.column("tok_a"),
                             "df_b": batch.column("cnt")})

        with_ab = with_a.join(df_tbl.map_batches(df_key_b,
                                                 batch_format="pyarrow"),
                              "inner", n_parts, on=("tok_b",))

    def score_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        score = (df["cnt"].to_numpy(np.int64) * n_docs * 1000
                 // (df["df_a"].to_numpy(np.int64)
                     * df["df_b"].to_numpy(np.int64)))
        df["score"] = score
        df = df.sort_values(["score", "tok_a", "tok_b"],
                            ascending=[False, True, True]).head(top_k)
        return pa.Table.from_pandas(
            df[["tok_a", "tok_b", "cnt", "score"]], preserve_index=False)

    tops = with_ab.map_batches(score_top, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    if len(tops) == 0:
        return pa.table({"tok_a": pa.array([], pa.string()),
                         "tok_b": pa.array([], pa.string()),
                         "cooc": pa.array([], pa.int64()),
                         "score": pa.array([], pa.int64())})
    fin = tops.sort_values(["score", "tok_a", "tok_b"],
                           ascending=[False, True, True]).head(top_k)
    return pa.table({
        "tok_a": pa.array(fin["tok_a"], pa.string()),
        "tok_b": pa.array(fin["tok_b"], pa.string()),
        "cooc": pa.array(fin["cnt"].astype("int64"), pa.int64()),
        "score": pa.array(fin["score"].astype("int64"), pa.int64()),
    })


def bigram_surprise(ds, id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int | None = None) -> pa.Table:
    """Corpus-trained BIGRAM conditional-LM scoring, integer-exact: every
    transition (w1 -> w2) scores ``count(w1 as context) // count(w1, w2)``
    (high = the continuation is surprising given its context — the
    KenLM-filter shape with integer division instead of log-probs so the
    SQL replay is bit-exact), and a doc's score is the mean over its
    transitions.

    Same zero-broadcast plan as ``unigram_surprise`` one order higher:
    transition rows (doc, h1, h2) bucket by ``h1 % nb``, so a bucket
    holds EVERY transition of its contexts — both the context count and
    the pair count are in-bucket segment sizes off ONE lexsort, and the
    per-occurrence surprise reduces to per-(doc, bucket) partials. A
    second fat-bucket shuffle on the doc id finishes the mean. The LM is
    never materialized anywhere; it is co-located with its occurrences."""
    import pandas as pd
    import ray

    nb = n_buckets or max(16, min(256,
                                  int(ray.cluster_resources().get("CPU", 8)) * 2))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        h1_all, h2_all, d_all = [], [], []
        for d, t in zip(ids, texts):
            th = token_hashes(t)
            if th.size < 2:
                continue
            h1_all.append(th[:-1].view(np.int64))
            h2_all.append(th[1:].view(np.int64))
            d_all.append(np.full(th.size - 1, d, dtype=np.int64))
        if not h1_all:
            z = pa.array([], pa.int64())
            return pa.table({"doc": z, "h1": z, "h2": z, "_kb": z})
        h1 = np.concatenate(h1_all)
        kb = (h1.view(np.uint64) % np.uint64(nb)).astype(np.int64)
        return pa.table({"doc": pa.array(np.concatenate(d_all), pa.int64()),
                         "h1": pa.array(h1, pa.int64()),
                         "h2": pa.array(np.concatenate(h2_all), pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_partials(group: pd.DataFrame) -> pd.DataFrame:
        h1 = group["h1"].to_numpy(dtype=np.int64)
        h2 = group["h2"].to_numpy(dtype=np.int64)
        doc = group["doc"].to_numpy(dtype=np.int64)
        order = np.lexsort((doc, h2, h1))
        h1, h2, doc = h1[order], h2[order], doc[order]
        ctx_b = np.concatenate(([True], h1[1:] != h1[:-1]))
        ctx_id = np.cumsum(ctx_b) - 1
        ctx_sz = np.diff(np.append(np.flatnonzero(ctx_b), h1.size))
        pair_b = ctx_b | np.concatenate(([True], h2[1:] != h2[:-1]))
        pair_id = np.cumsum(pair_b) - 1
        pair_sz = np.diff(np.append(np.flatnonzero(pair_b), h1.size))
        surprise = ctx_sz[ctx_id] // pair_sz[pair_id]
        dorder = np.argsort(doc, kind="stable")
        doc, surprise = doc[dorder], surprise[dorder]
        dstart = np.concatenate(([True], doc[1:] != doc[:-1]))
        idx = np.flatnonzero(dstart)
        return pd.DataFrame({
            "doc": doc[idx],
            "ssum": np.add.reduceat(surprise, idx).astype(np.int64),
            "n": np.diff(np.append(idx, doc.size)).astype(np.int64)})

    def rebucket(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch.column("doc"), dtype=np.int64)
        db = (_mix64_np(doc.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return batch.append_column("_db", pa.array(db, pa.int64()))

    def doc_totals(group: pd.DataFrame) -> pd.DataFrame:
        doc = group["doc"].to_numpy(dtype=np.int64)
        s = group["ssum"].to_numpy(dtype=np.int64)
        n = group["n"].to_numpy(dtype=np.int64)
        order = np.argsort(doc, kind="stable")
        doc, s, n = doc[order], s[order], n[order]
        start = np.concatenate(([True], doc[1:] != doc[:-1]))
        idx = np.flatnonzero(start)
        ssum = np.add.reduceat(s, idx).astype(np.int64)
        ntr = np.add.reduceat(n, idx).astype(np.int64)
        return pd.DataFrame({"doc": doc[idx], "n_transitions": ntr,
                             "mean_surprise": ssum // ntr})

    parts = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("_kb").map_groups(bucket_partials,
                                        batch_format="pandas")
             .map_batches(rebucket, batch_format="pyarrow")
             .groupby("_db").map_groups(doc_totals, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_transitions": pa.array([], pa.int64()),
                         "mean_surprise": pa.array([], pa.int64())})
    parts = parts.sort_values("doc").reset_index(drop=True)
    return pa.table({id_col: pa.array(parts["doc"], pa.int64()),
                     "n_transitions": pa.array(
                         parts["n_transitions"].to_numpy(np.int64),
                         pa.int64()),
                     "mean_surprise": pa.array(
                         parts["mean_surprise"].to_numpy(np.int64),
                         pa.int64())})


def _edit_distance_le1(a: str, b: str) -> bool:
    """Exact 'is edit distance <= 1' check (substitution / single
    insert-delete / equality) — O(len) without the full DP matrix."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter by 1: one skip allowed in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_pairs(words_ds, word_col: str = "w",
                n_buckets: int | None = None,
                max_group: int | None = None) -> pa.Table:
    """All edit-distance-1 pairs over a vocabulary — SymSpell deletion-
    neighborhood blocking (Garbe's symmetric delete algorithm): every
    ED<=1 pair shares an entry of {word} ∪ {delete-one variants}, so
    candidates come from ONE equality join on variant keys instead of an
    all-pairs scan, and an exact in-bucket verify removes the false
    candidates (including 64-bit variant-hash collisions, which the
    verify makes harmless — only the HASH of a variant is ever shuffled,
    never the variant strings).

    Dataflow: (1) distinct words via word-hash fat buckets; (2) each
    word emits (variant_hash, word) rows — L+1 per word — bucketed by
    variant hash; (3) per-bucket: sort by variant hash, expand per-group
    candidate pairs with index arithmetic (``max_group`` is an OPT-IN
    stop-variant cap — truncated groups are logged; the default is
    exact, same policy as the ngram df cap), verify ED<=1 exactly; (4)
    one last shuffle on
    the pair hash dedups pairs found through multiple shared variants.
    Nothing vocabulary-sized touches the driver."""
    import logging

    import pandas as pd

    from .window import _default_buckets

    nb = n_buckets or _default_buckets()

    def word_hash_bucket(batch: pa.Table) -> pa.Table:
        w = batch.column(word_col).to_pylist()
        h = np.array(_fnv1a_bulk(w), dtype=np.uint64)
        kb = (h % np.uint64(nb)).astype(np.int64)
        return pa.table({"w": pa.array(w, pa.string()),
                         "_kb": pa.array(kb, pa.int64())})

    def uniq_words(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"w": pd.unique(g["w"])})

    vocab = (words_ds.map_batches(word_hash_bucket, batch_format="pyarrow")
             .groupby("_kb").map_groups(uniq_words, batch_format="pandas"))

    def emit_variants(batch: pa.Table) -> pa.Table:
        ws, vs = [], []
        for w in batch.column("w").to_pylist():
            vs.append(w)
            ws.append(w)
            for i in range(len(w)):
                vs.append(w[:i] + w[i + 1:])
                ws.append(w)
        h = np.array(_fnv1a_bulk(vs), dtype=np.uint64).view(np.int64)
        kb = (h.view(np.uint64) % np.uint64(nb)).astype(np.int64)
        return pa.table({"vh": pa.array(h, pa.int64()),
                         "w": pa.array(ws, pa.string()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        vh = g["vh"].to_numpy(dtype=np.int64)
        w = g["w"].to_numpy()
        order = np.lexsort((w, vh))
        vh, w = vh[order], w[order]
        start = np.concatenate(([True], vh[1:] != vh[:-1]))
        idx = np.flatnonzero(start)
        sizes = np.diff(np.append(idx, vh.size))
        # cap is OPT-IN: the default stays exact so the op matches an
        # uncapped SQL replay; pass max_group only with a mirrored cap
        if max_group is None:
            clipped = sizes
        else:
            clipped = np.minimum(sizes, max_group)
            if np.any(sizes > max_group):
                logging.getLogger(__name__).warning(
                    "edit1_pairs: %d variant groups over max_group=%d "
                    "truncated", int((sizes > max_group).sum()), max_group)
        a_parts, b_parts = [], []
        for s, size in zip(idx, clipped):
            if size < 2:
                continue
            seg = w[s:s + size]
            # a variant group can repeat a word (same word through its
            # own key and a collision) — pair distinct words only
            seg = pd.unique(seg)
            if seg.size < 2:
                continue
            ii, jj = np.triu_indices(seg.size, k=1)
            a_parts.append(seg[ii])
            b_parts.append(seg[jj])
        if not a_parts:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object)})
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = np.fromiter((_edit_distance_le1(x, y)
                            for x, y in zip(lo, hi)),
                           count=lo.size, dtype=bool)
        return pd.DataFrame({"w1": lo[keep], "w2": hi[keep]})

    def pair_bucket(batch: pa.Table) -> pa.Table:
        w1 = batch.column("w1").to_pylist()
        w2 = batch.column("w2").to_pylist()
        h = np.array(_fnv1a_bulk([a + "\x00" + b for a, b in zip(w1, w2)]),
                     dtype=np.uint64)
        kb = (h % np.uint64(nb)).astype(np.int64)
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string()),
                         "_pb": pa.array(kb, pa.int64())})

    def uniq_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["w1", "w2"])[["w1", "w2"]]

    out = (vocab.map_batches(emit_variants, batch_format="pyarrow")
           .groupby("_kb").map_groups(bucket_pairs, batch_format="pandas")
           .map_batches(pair_bucket, batch_format="pyarrow")
           .groupby("_pb").map_groups(uniq_pairs, batch_format="pandas")
           .to_pandas())
    if len(out) == 0:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string())})
    out = out.sort_values(["w1", "w2"]).reset_index(drop=True)
    return pa.table({"w1": pa.array(out["w1"], pa.string()),
                     "w2": pa.array(out["w2"], pa.string())})


def shuffle_shards(ds, id_col: str = "doc_id", n_shards: int = 32,
                   seed: int = 0) -> pa.Table:
    """Deterministic epoch shuffle for training-data ordering: every doc
    gets a pseudorandom 64-bit key ``mix64(id XOR seed)``; the key's
    residue picks the shard and the key's rank inside the shard is the
    read position. A new seed is a fresh full-corpus permutation, with
    no ``random_shuffle`` all-to-all and no RNG state — resumable and
    bit-replayable anywhere.

    ONE shuffle: the shard id IS the group key (at training scale shards
    number in the thousands — natural fat groups); inside a shard one
    lexsort on (key, id) — UNSIGNED key order — assigns positions.
    Output (id, shard, pos) sorted by id."""
    import pandas as pd

    s = np.uint64(seed)

    def key(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch.column(id_col), dtype=np.int64)
        h = _mix64_np(i.view(np.uint64) ^ s)
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        return pa.table({id_col: pa.array(i, pa.int64()),
                         "h": pa.array(h.view(np.int64), pa.int64()),
                         "shard": pa.array(shard, pa.int64())})

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        i = g[id_col].to_numpy(np.int64)
        h = g["h"].to_numpy(np.int64).view(np.uint64)
        order = np.lexsort((i, h))
        pos = np.empty(i.size, dtype=np.int64)
        pos[order] = np.arange(i.size)
        return pd.DataFrame({id_col: i, "shard": g["shard"].to_numpy(),
                             "pos": pos})

    out = (ds.map_batches(key, batch_format="pyarrow")
           .groupby("shard").map_groups(rank, batch_format="pandas")
           .to_pandas())
    if len(out) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "shard": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    out = out.sort_values(id_col).reset_index(drop=True)
    return pa.table({id_col: pa.array(out[id_col], pa.int64()),
                     "shard": pa.array(out["shard"].astype("int64"),
                                       pa.int64()),
                     "pos": pa.array(out["pos"].astype("int64"),
                                     pa.int64())})


def perplexity_buckets(ds, id_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020 §4.3)
    on the integer unigram-surprise score: exact tercile thresholds over
    the whole corpus, then one fold per bucket (doc count, token sum,
    score min/max). Integer ranks — threshold k = value at 1-indexed
    rank ceil(k*n/3) computed as (k*n + 2) // 3 — keep both sides of the
    oracle bit-exact (no float percentile boundary).

    Scale shape: the per-doc score stream stays a Dataset
    (``unigram_surprise(as_dataset=True)``); blocks collapse to
    (score -> count, token-sum) HISTOGRAM partials, one slim groupby
    merges them, and the driver folds a histogram whose size is bounded
    by the number of DISTINCT integer scores (value-range-bounded,
    corpus-size-independent) — never the corpus. Thresholds and the
    bucket aggregates all read off the same histogram; no second corpus
    pass."""
    import pandas as pd
    from ray.data.aggregate import Sum

    scores = unigram_surprise(ds, id_col=id_col, text_col=text_col,
                              as_dataset=True, score_scale=1000)
    empty = pa.table({"bucket": pa.array([], pa.int64()),
                      "n_docs": pa.array([], pa.int64()),
                      "sum_tokens": pa.array([], pa.int64()),
                      "min_score": pa.array([], pa.int64()),
                      "max_score": pa.array([], pa.int64())})
    if isinstance(scores, pa.Table):  # empty-corpus fallback
        return empty

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column("mean_surprise"), dtype=np.int64)
        t = np.asarray(batch.column("n_tokens"), dtype=np.int64)
        uv, inv, cnt = np.unique(v, return_inverse=True,
                                 return_counts=True)
        toks = np.zeros(uv.size, dtype=np.int64)
        np.add.at(toks, inv, t)
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64()),
                         "toks": pa.array(toks, pa.int64())})

    hist = (scores.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("v").aggregate(Sum("c", alias_name="c"),
                                    Sum("toks", alias_name="toks"))
            .to_pandas().sort_values("v").reset_index(drop=True))
    if len(hist) == 0:
        return empty
    v = hist["v"].to_numpy(np.int64)
    c = hist["c"].to_numpy(np.int64)
    toks = hist["toks"].to_numpy(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)
    # value at 1-indexed rank r in the sorted score multiset
    t1 = v[np.searchsorted(cum, (n + 2) // 3)]
    t2 = v[np.searchsorted(cum, (2 * n + 2) // 3)]
    bucket = np.where(v <= t1, 0, np.where(v <= t2, 1, 2)).astype(np.int64)
    rows = []
    for bk in range(3):
        m = bucket == bk
        if not m.any():
            continue
        rows.append((bk, int(c[m].sum()), int(toks[m].sum()),
                     int(v[m].min()), int(v[m].max())))
    fin = pd.DataFrame(rows, columns=["bucket", "n_docs", "sum_tokens",
                                      "min_score", "max_score"])
    return pa.table({k: pa.array(fin[k].astype("int64"), pa.int64())
                     for k in fin.columns})


class TextIndex:
    """Persistent inverted text index with REAL partition pruning — the
    text mirror of ``similarity.IVFIndex``. ``build`` runs ONE corpus
    pass emitting (term, doc, tf) postings and hive-partitions them by
    ``bucket = term_hash % n_buckets`` (the resumable layout: a failed
    build reruns only missing buckets, a lookup reads only its terms'
    bucket directories). No separate stats table: df(term) is exact from
    the pruned postings themselves (one row per (doc, term)), and the
    corpus doc count rides a tiny meta file.

    ``lookup`` scores ``sum(tf * (N // df))`` per doc — the pinned
    integer-idf convention of ``keyword_topk`` — over ONLY the needed
    buckets: per-block score partials rebucket by doc hash, each bucket
    keeps a local top-k, the driver merges n_buckets * k candidate rows,
    never the postings."""

    def __init__(self, index_dir: str, n_docs: int,
                 n_buckets: int) -> None:
        self.index_dir = index_dir
        self.n_docs = n_docs
        self.n_buckets = n_buckets

    @staticmethod
    def _term_buckets(terms: list[str], n_buckets: int) -> np.ndarray:
        h = _mix64_np(np.array(_fnv1a_bulk(terms), dtype=np.uint64))
        return (h % np.uint64(n_buckets)).astype(np.int64)

    @classmethod
    def build(cls, ds, index_dir: str, n_buckets: int = 32,
              id_col: str = "doc_id",
              text_col: str = "text") -> "TextIndex":
        import json
        import os

        def postings(batch: pa.Table) -> pa.Table:
            # Arrow explode + dictionary counts; bucket ids come from
            # dictionary-level FNV+mix64 (hash each distinct term once
            # per batch) — same values as _term_buckets on the strings,
            # so query-side bucket lookups stay consistent
            parent, flat = _ws_explode(batch.column(text_col))
            if len(flat) == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 id_col: pa.array([], pa.int64()),
                                 "tf": pa.array([], pa.int64()),
                                 "bucket": pa.array([], pa.int64())})
            de = flat.dictionary_encode()
            codes = np.asarray(de.indices, dtype=np.int64)
            order = np.lexsort((codes, parent))
            ps, cs = parent[order], codes[order]
            bound = np.concatenate(([True],
                                    (ps[1:] != ps[:-1])
                                    | (cs[1:] != cs[:-1])))
            starts = np.flatnonzero(bound)
            tf = np.diff(np.append(starts, ps.size)).astype(np.int64)
            p_sel, c_sel = ps[bound], cs[bound]
            dict_h = _mix64_np(np.asarray(
                _fnv1a_bulk(de.dictionary.to_pylist()), dtype=np.uint64))
            bucket = (dict_h[c_sel] % np.uint64(n_buckets)).astype(np.int64)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return pa.table({"term": de.dictionary.take(pa.array(c_sel)),
                             id_col: ids.take(pa.array(p_sel)),
                             "tf": pa.array(tf, pa.int64()),
                             "bucket": pa.array(bucket, pa.int64())})

        os.makedirs(index_dir, exist_ok=True)
        n_docs = ds.count()
        ds.map_batches(postings, batch_format="pyarrow").write_parquet(
            index_dir, partition_cols=["bucket"])
        with open(os.path.join(index_dir, "meta.json"), "w") as fh:
            json.dump({"n_docs": n_docs, "n_buckets": n_buckets}, fh)
        return cls(index_dir, n_docs, n_buckets)

    @classmethod
    def load(cls, index_dir: str) -> "TextIndex":
        import json
        import os

        with open(os.path.join(index_dir, "meta.json")) as fh:
            meta = json.load(fh)
        return cls(index_dir, meta["n_docs"], meta["n_buckets"])

    def pruned_paths(self, terms: list[str]) -> list[str]:
        import os

        needed = sorted(set(self._term_buckets(list(terms),
                                               self.n_buckets).tolist()))
        paths = []
        for bk in needed:
            bdir = os.path.join(self.index_dir, f"bucket={bk}")
            if os.path.isdir(bdir):
                paths.extend(os.path.join(bdir, f)
                             for f in sorted(os.listdir(bdir))
                             if f.endswith(".parquet"))
        return paths

    def lookup(self, terms: list[str], k: int = 10,
               id_col: str = "doc_id") -> pa.Table:
        import pandas as pd
        import ray.data as rd

        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "score": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
        paths = self.pruned_paths(terms)
        if not paths:
            return empty
        term_arr = pa.array(sorted(set(terms)), pa.string())
        from ..util import sized_read_parquet

        sub = sized_read_parquet(paths, columns=["term", id_col, "tf"])

        def only_terms(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("term"),
                                         value_set=term_arr))

        hits = sub.map_batches(only_terms,
                               batch_format="pyarrow").materialize()

        # exact df per query term from the pruned postings (one row per
        # (doc, term)); the fold is |terms|-sized
        def df_partial(batch: pa.Table) -> pa.Table:
            t = batch.column("term").to_pylist()
            u, c = np.unique(np.asarray(t, dtype=object),
                             return_counts=True)
            return pa.table({"term": pa.array(list(u), pa.string()),
                             "df": pa.array(c.astype(np.int64))})

        dfp = hits.map_batches(df_partial, batch_format="pyarrow") \
            .to_pandas()
        if len(dfp) == 0:
            return empty
        df_map = dfp.groupby("term")["df"].sum().to_dict()
        idf = {t: self.n_docs // int(d) for t, d in df_map.items()}
        nb = min(64, max(8, self.n_buckets))

        def score_partial(batch: pa.Table) -> pa.Table:
            t = batch.column("term").to_pylist()
            d = np.asarray(batch.column(id_col), dtype=np.int64)
            tf = np.asarray(batch.column("tf"), dtype=np.int64)
            w = np.fromiter((idf[x] for x in t), count=len(t),
                            dtype=np.int64)
            part = tf * w
            ud, inv = np.unique(d, return_inverse=True)
            s = np.zeros(ud.size, dtype=np.int64)
            np.add.at(s, inv, part)
            kb = (_mix64_np(ud.view(np.uint64)) % np.uint64(nb)).astype(
                np.int64)
            return pa.table({id_col: pa.array(ud, pa.int64()),
                             "s": pa.array(s, pa.int64()),
                             "_kb": pa.array(kb, pa.int64())})

        def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
            d = g[id_col].to_numpy(np.int64)
            s = g["s"].to_numpy(np.int64)
            order = np.argsort(d, kind="stable")
            d, s = d[order], s[order]
            start = np.concatenate(([True], d[1:] != d[:-1]))
            idx = np.flatnonzero(start)
            ud = d[idx]
            tot = np.add.reduceat(s, idx).astype(np.int64)
            top = np.lexsort((ud, -tot))[:k]
            return pd.DataFrame({id_col: ud[top], "score": tot[top]})

        cand = (hits.map_batches(score_partial, batch_format="pyarrow")
                .groupby("_kb").map_groups(bucket_topk,
                                           batch_format="pandas")
                .to_pandas())
        if len(cand) == 0:
            return empty
        cand = cand.sort_values(["score", id_col],
                                ascending=[False, True]).head(k)
        cand = cand.reset_index(drop=True)
        return pa.table({id_col: pa.array(cand[id_col].astype("int64"),
                                          pa.int64()),
                         "score": pa.array(cand["score"].astype("int64"),
                                           pa.int64()),
                         "rank": pa.array(
                             np.arange(1, len(cand) + 1, dtype=np.int64),
                             pa.int64())})


# 2^63-1 (max positive gap) varint-encodes in 9 bytes: 8 edges suffice
_VARINT_EDGES = np.array([1 << (7 * i) for i in range(1, 9)],
                         dtype=np.int64)


def postings_size_topk(ds, k: int = 10, id_col: str = "doc_id",
                       text_col: str = "text",
                       n_buckets: int | None = None) -> pa.Table:
    """Inverted-index size estimation: per term, the LEB128/varint byte
    cost of its delta-gap-encoded postings list (sorted doc ids; first
    gap = doc_id + 1 so id 0 still costs one byte) — the standard
    index-compression model (Zobel & Moffat 2006). Returns the top-k
    terms by (bytes desc, term asc) with df and bytes: the terms that
    dominate index storage.

    Scale shape: postings hash into term FAT buckets (a bucket holds
    every posting of its terms, so gaps and df are bucket-computable);
    per bucket one lexsort + vectorized segment diffs + np.digitize
    against the varint thresholds; each bucket emits its local top-k
    term rows only, the driver merges O(k x buckets)."""
    import ray

    import pandas as pd

    nb = n_buckets or max(16, min(256, int(
        ray.cluster_resources().get("CPU", 8)) * 2))

    def explode(batch: pa.Table) -> pa.Table:
        out = _explode_distinct_grams(batch, id_col, text_col, 1)
        return pa.table({
            "doc": out["doc"],
            "tok": out["gram"],
            "_kb": pa.array((out["hash"] % np.uint64(nb)).astype(np.int64),
                            pa.int64())})

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        tok = group["tok"].to_numpy()
        doc = group["doc"].to_numpy(dtype=np.int64)
        if tok.size == 0:
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64),
                                 "bytes": pd.Series([], dtype=np.int64)})
        order = np.lexsort((doc, tok))
        tok, doc = tok[order], doc[order]
        starts = np.concatenate(([True], tok[1:] != tok[:-1]))
        seg_id = np.cumsum(starts) - 1
        prev = np.empty(doc.size, dtype=np.int64)
        prev[0] = -1
        prev[1:] = np.where(starts[1:], -1, doc[:-1])
        gaps = doc - prev
        nbytes = 1 + np.digitize(gaps, _VARINT_EDGES, right=False)
        n_terms = int(seg_id[-1]) + 1
        df = np.bincount(seg_id, minlength=n_terms)
        total = np.bincount(seg_id, weights=nbytes,
                            minlength=n_terms).astype(np.int64)
        terms = tok[np.flatnonzero(starts)]
        out = pd.DataFrame({"term": terms, "df": df.astype(np.int64),
                            "bytes": total})
        return (out.sort_values(["bytes", "term"],
                                ascending=[False, True]).head(k))

    parts = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64()),
                         "bytes": pa.array([], pa.int64())})
    fin = (parts.sort_values(["bytes", "term"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return pa.table({
        "term": pa.array(fin["term"], pa.string()),
        "df": pa.array(fin["df"].astype("int64"), pa.int64()),
        "bytes": pa.array(fin["bytes"].astype("int64"), pa.int64())})
