"""Text-analysis kernels for training-data pipelines — all vectorized
(pyarrow.compute / numpy), designed to run inside map_batches over the
``documents`` table or the code corpus ``content`` column.

Capabilities (first-class engine features; the reference has only
whitespace tokenization at ``models/drain.py:27,32``):
- token counting (``\\S+`` regex — whitespace tokens)
- quality scoring (length / punctuation / stopword / uppercase ratios)
- language ID (character n-gram + stopword heuristic; no external models)
- document fingerprinting (rolling-hash content fingerprint)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\S+"
_PUNCT_RE = r"[!-/:-@\[-`{-~]"  # ASCII punctuation

# tiny per-language stopword inventories (public knowledge); ties broken by
# character-frequency profile below
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "y", "es", "no", "una", "por", "con", "que"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text", out_col: str = "n_tokens") -> pa.Table:
    cnt = pc.count_substring_regex(batch[text_col], _TOKEN_RE)
    return batch.append_column(out_col, pc.cast(cnt, pa.int64()))


# BPE-style pretokenizer (GPT-2 family shape, lookahead-free so it runs
# on RE2 — Arrow and DuckDB both): letter runs, digit runs, punctuation
# runs (each with optional leading space), residual whitespace runs.
BPE_TOKEN_RE = r" ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text", out_col: str = "n_bpe_tokens") -> pa.Table:
    """Subword-style token count: a lookahead-free GPT-2-shaped
    pretokenizer regex counts letter/digit/punctuation segments — the
    cheap token-budget estimator for LLM training pipelines (a real BPE
    merges these further; segment count upper-bounds and tracks it)."""
    cnt = pc.count_substring_regex(pc.coalesce(batch[text_col], ""), BPE_TOKEN_RE)
    return batch.append_column(out_col, pc.cast(cnt, pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars_q, n_tokens, punct_ratio, upper_ratio, mean_token_len."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_tokens = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.float64())
    n_upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.float64())
    safe = pc.max_element_wise(n_chars, 1.0)
    safe_tok = pc.max_element_wise(n_tokens, 1.0)
    batch = batch.append_column("n_chars_q", pc.cast(n_chars, pa.int64()))
    batch = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    batch = batch.append_column("n_punct", pc.cast(n_punct, pa.int64()))
    batch = batch.append_column("n_upper", pc.cast(n_upper, pa.int64()))
    batch = batch.append_column("punct_ratio", pc.divide(n_punct, safe))
    batch = batch.append_column("upper_ratio", pc.divide(n_upper, safe))
    # mean token length: (chars - whitespace) / tokens
    n_ws = pc.cast(pc.count_substring_regex(text, r"\s"), pa.float64())
    batch = batch.append_column("mean_token_len", pc.divide(pc.subtract(n_chars, n_ws), safe_tok))
    return batch


_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_pattern_counts_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc counts of email / URL / IPv4-shaped substrings — the
    PII-surface scan a training-data pipeline runs before redaction.
    Three RE2 kernels per batch (Arrow and DuckDB both use RE2, so the
    oracle matches byte-exactly)."""
    text = pc.coalesce(batch[text_col], "")
    batch = batch.append_column("n_emails", pc.cast(pc.count_substring_regex(text, _EMAIL_RE), pa.int64()))
    batch = batch.append_column("n_urls", pc.cast(pc.count_substring_regex(text, _URL_RE), pa.int64()))
    return batch.append_column("n_ips", pc.cast(pc.count_substring_regex(text, _IP_RE), pa.int64()))


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Repetition quality signals: distinct-token ratio and the most
    frequent token's share — low distinct ratio / high top share mark
    boilerplate and degenerate generations. One polars tokenize +
    grouped count per batch."""
    import polars as pl

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    toks = (
        pl.DataFrame({"i": np.arange(n, dtype=np.int64), "t": pl.Series(col).fill_null("")})
        .with_columns(pl.col("t").str.extract_all(_TOKEN_RE))
        .explode("t")
        .drop_nulls("t")
    )
    n_tok = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    top = np.zeros(n, dtype=np.int64)
    if toks.height:
        agg = (
            toks.group_by(["i", "t"])
            .len()
            .group_by("i")
            .agg(
                n_tok=pl.col("len").sum(),
                n_distinct=pl.len(),
                top=pl.col("len").max(),
            )
        )
        idx = agg["i"].to_numpy()
        n_tok[idx] = agg["n_tok"].to_numpy()
        n_distinct[idx] = agg["n_distinct"].to_numpy()
        top[idx] = agg["top"].to_numpy()
    safe = np.maximum(n_tok, 1).astype(np.float64)
    batch = batch.append_column("n_tokens_r", pa.array(n_tok))
    batch = batch.append_column("n_distinct_tokens", pa.array(n_distinct))
    batch = batch.append_column("distinct_ratio", pa.array(n_distinct / safe))
    return batch.append_column("top_token_share", pa.array(top / safe))


class LangIdModel:
    """Stateful actor stage: stopword tables + char-profile built once per
    actor (`__init__`), scored per batch (`__call__`) — the actor-pool
    pattern of the reference's lazily-loaded CodeBERT
    (``models/feature_extraction.py:37-43``)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred", emit_evidence: bool = False):
        self.text_col, self.out_col = text_col, out_col
        self.langs = sorted(_STOPWORDS)
        self.tables = [frozenset(_STOPWORDS[l]) for l in self.langs]
        # evidence columns (round-4 verdict #6): the deterministic inputs
        # the heuristic decides on — per-language stopword hit counts +
        # the CJK flag — so a SQL oracle can recompute BOTH the evidence
        # and the label (argmax with alphabetical tie-break is pure SQL)
        self.emit_evidence = emit_evidence

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized scoring: one polars tokenize/explode + one grouped
        is_in sum per language table; CJK detection is one RE2 scan over
        the first 200 chars. No Python row loop."""
        import polars as pl

        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        is_null = pc.is_null(col).to_numpy(zero_copy_only=False)
        head = pc.utf8_slice_codeunits(pc.coalesce(col, ""), 0, 200)
        has_cjk = pc.greater(pc.count_substring_regex(head, r"[一-鿿]"), 0).to_numpy(
            zero_copy_only=False
        )
        toks = (
            pl.DataFrame(
                {"i": np.arange(n, dtype=np.int64), "t": pl.Series(pc.coalesce(col, ""))}
            )
            .with_columns(pl.col("t").str.to_lowercase().str.extract_all(r"\S+"))
            .explode("t")
            .drop_nulls("t")
        )
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if toks.height:
            agg = toks.group_by("i").agg(
                [
                    pl.col("t").is_in(sorted(tab)).sum().alias(lang)
                    for lang, tab in zip(self.langs, self.tables)
                ]
            )
            rows = agg["i"].to_numpy()
            for j, lang in enumerate(self.langs):
                scores[rows, j] = agg[lang].to_numpy()
        best = scores.argmax(axis=1)
        pred = np.array(self.langs, dtype=object)[best]
        pred[scores.max(axis=1) <= 0] = "en"
        pred[has_cjk] = "zh"
        pred[is_null] = None
        if self.emit_evidence:
            for j, lang in enumerate(self.langs):
                batch = batch.append_column(f"hits_{lang}", pa.array(scores[:, j], type=pa.int64()))
            batch = batch.append_column("has_cjk", pa.array(has_cjk & ~is_null))
        return batch.append_column(self.out_col, pa.array(pred, type=pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    """64-hex content fingerprint (sha256 of NFC-ish normalized text).

    Used for the per-row invariant too: sha256(content) equality against
    the input is the north-rule contract (BASELINE.json input_hint).
    """
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    out = [
        None if t is None else hashlib.sha256(t.encode("utf-8", "surrogatepass")).hexdigest()
        for t in texts
    ]
    return batch.append_column(out_col, pa.array(out, type=pa.string()))


def sha256_hex_batch(batch: pa.Table, col: str, out_col: str) -> pa.Table:
    return fingerprint_batch(batch, text_col=col, out_col=out_col)


# winnowing (Schleimer/Wilkerson/Aiken 2003, the MOSS scheme): Rabin-Karp
# rolling hash over byte k-grams, then the RIGHTMOST minimum of every
# w-hash window is selected. Guarantee: two documents sharing any
# substring of length >= w + k - 1 share at least one fingerprint —
# substring/containment detection that whole-document hashes and
# set-Jaccard MinHash both miss.
_WIN_BASE = np.uint64(1099511628211)  # FNV prime as the polynomial base
_WIN_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def kgram_hashes(b: np.ndarray, k: int) -> np.ndarray:
    """Stride-1 Rabin-Karp k-gram hashes of a byte sequence: position ``i``
    holds the mixed 64-bit hash of ``b[i : i+k]`` (``len(b) - k + 1``
    values; empty for inputs shorter than ``k``).

    O(n) time AND memory via the telescoping prefix form: with descending
    powers ``P[j] = base^(n-1-j)`` and ``S = cumsum(b * P)`` (both mod
    2^64 — uint64 wrap-around IS the modulus), the window hash is
    ``(S[i+k] - S[i]) * base^-(n-i-k)``; the FNV base is odd, so its
    inverse mod 2^64 exists and both power ladders are a single
    ``multiply.accumulate``. Bit-identical to the naive windows@powers
    product (asserted in tests/test_substrings.py) but O(n) instead of
    O(n*k) — the sliding-window matmul measured 48 s on a 2 MB doc at
    k=40 vs 64 ms for this form. Shared by winnowing fingerprints and
    the stride-1 duplicated-substring ops (dedup/substrings.py)."""
    n = len(b)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    base, modulus = int(_WIN_BASE), 1 << 64
    inv = pow(base, -1, modulus)
    desc = np.empty(n, dtype=np.uint64)
    desc[0] = pow(base, n - 1, modulus)
    if n > 1:
        desc[1:] = np.uint64(inv)
        np.multiply.accumulate(desc, out=desc)
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(b.astype(np.uint64) * desc, out=prefix[1:])
    scale = np.empty(n - k + 1, dtype=np.uint64)
    scale[0] = pow(inv, n - k, modulus)
    if len(scale) > 1:
        scale[1:] = _WIN_BASE
        np.multiply.accumulate(scale, out=scale)
    h = (prefix[k:] - prefix[: n - k + 1]) * scale
    # bit-mix so low-entropy byte windows spread over the hash space
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return h


def _winnow_one(b: np.ndarray, k: int, w: int) -> np.ndarray:
    """Sorted unique winnowed fingerprints of one byte sequence (uint64)."""
    h = kgram_hashes(b, k)
    if not len(h):
        return h
    if len(h) <= w:
        return np.unique(h[np.flatnonzero(h == h.min())[-1] :][:1])
    hw = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimum per window (robust winnowing): argmin on the
    # reversed axis finds the LAST position holding the min
    rev_arg = hw[:, ::-1].argmin(axis=1)
    pos = np.arange(len(hw)) + (w - 1 - rev_arg)
    return np.unique(h[np.unique(pos)])


def winnow_fingerprints_batch(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str = "fingerprints",
    k: int = 8,
    w: int = 16,
) -> pa.Table:
    """Per-document winnowed rolling-hash fingerprint set as a
    ``list<uint64>`` column (sorted unique; null text → null, text
    shorter than ``k`` bytes → empty list). Feeds containment detection:
    explode + group-by-fingerprint pairs documents sharing any run of
    ``w + k - 1`` bytes, however different their overall token sets."""
    texts = batch[text_col].to_numpy(zero_copy_only=False)
    fps = [
        None
        if t is None
        else _winnow_one(np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8), k, w)
        for t in texts
    ]
    return batch.append_column(out_col, pa.array(fps, type=pa.list_(pa.uint64())))


def winnow_containment_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 16,
    min_shared: int = 2,
    max_bucket: int = 200,
):
    """Distributed containment/overlap detection: distinct (a < b, shared)
    document pairs sharing ≥ ``min_shared`` winnowed fingerprints — i.e.
    pairs sharing literal byte runs of ≥ w+k-1, regardless of how
    different the rest of the documents are (the case Jaccard-threshold
    MinHash dedup misses by construction).

    Plan (same shape as the LSH pair miner, `dedup/neardup.py:851`):
    winnow map → explode to (id, fp) → co-partition by fp → per-group
    pair emission → co-partition by (a, b) → count + filter. Fingerprint
    groups larger than ``max_bucket`` are dropped as boilerplate (license
    headers, generated banners) — the same hot-bucket cap LSH banding
    uses; raise it if recall on pervasive substrings matters more than
    the quadratic pair blowup."""
    import pyarrow.compute as pc  # noqa: F401  (explode dependency)

    from .shuffle import local_group_map, select_if_needed
    from .vector import explode_list_column

    fp_ds = select_if_needed(ds, [id_col, text_col]).map_batches(
        lambda tb: winnow_fingerprints_batch(tb, text_col=text_col, k=k, w=w).drop_columns(
            [text_col]
        ),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
    exploded = explode_list_column(fp_ds, "fingerprints", value_col="fp", index_col=None)

    # the pair columns MIRROR the input id type (round-5 review: a
    # hardcoded int64 schema crashed on string-id corpora mid-shuffle and
    # silently coerced numeric-string ids) — integer ids widen to int64,
    # string ids stay strings (numpy lexsort/minimum handle both)
    from .shuffle import arrow_schema

    id_type = arrow_schema(ds).field(id_col).type
    if pa.types.is_integer(id_type):
        pair_type = pa.int64()
    elif pa.types.is_string(id_type) or pa.types.is_large_string(id_type):
        pair_type = pa.string()
    else:
        raise ValueError(
            f"winnow_containment_pairs: unsupported id column type {id_type} "
            f"for {id_col!r} (integer or string required)"
        )
    pair_schema = pa.schema([("a", pair_type), ("b", pair_type)])

    def gen_pairs(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({"a": [], "b": []}, schema=pair_schema)
        fp = tb["fp"].to_numpy(zero_copy_only=False)
        ids = tb[id_col].to_numpy(zero_copy_only=False)
        if pa.types.is_integer(id_type):
            ids = ids.astype(np.int64)
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        bounds = np.flatnonzero(np.concatenate([[True], fp[1:] != fp[:-1], [True]]))
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2 or m > max_bucket:
                continue
            g = ids[s:e]
            iu = np.triu_indices(m, 1)
            out_a.append(g[iu[0]])
            out_b.append(g[iu[1]])
        if not out_a:
            return pa.Table.from_pydict({"a": [], "b": []}, schema=pair_schema)
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pa.Table.from_pydict(
            {
                "a": pa.array(np.minimum(a, b), type=pair_type),
                "b": pa.array(np.maximum(a, b), type=pair_type),
            },
            schema=pair_schema,
        )

    pairs = local_group_map(exploded, ["fp"], gen_pairs, keys_non_null=True)

    out_schema = pa.schema([("a", pair_type), ("b", pair_type), ("shared", pa.int64())])

    def count_filter(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        a = tb["a"].to_numpy(zero_copy_only=False)
        b = tb["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(a)))
        keep = counts >= min_shared
        return pa.Table.from_pydict(
            {
                "a": pa.array(a[starts][keep], type=pair_type),
                "b": pa.array(b[starts][keep], type=pair_type),
                "shared": pa.array(counts[keep].astype(np.int64)),
            },
            schema=out_schema,
        )

    return local_group_map(pairs, ["a", "b"], count_filter, keys_non_null=True)


def content_hash128_batch(batch: pa.Table, col: str, out_cols: tuple[str, str] = ("h1", "h2")) -> pa.Table:
    """Vectorized 128-bit content hash: two independent 64-bit polars
    xxhashes (different seeds). For dedup grouping this replaces the
    per-row Python sha256 (~100× faster on content columns) at 2^-128
    collision odds; the sha256 path remains ONLY where the hex digest is
    the contract (the violation-row invariant, ``sha256_hex_batch``)."""
    import polars as pl

    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    s = pl.Series(c)
    h1 = s.hash(seed=0).to_numpy().view(np.int64)
    h2 = s.hash(seed=0x9E3779B9).to_numpy().view(np.int64)
    batch = batch.append_column(out_cols[0], pa.array(h1, type=pa.int64()))
    return batch.append_column(out_cols[1], pa.array(h2, type=pa.int64()))


def term_doc_stats(docs_ds, text_col: str = "text", ngram: int = 1):
    """Corpus (term, cnt, df) statistics in ONE narrow shuffle: per term,
    the total occurrence count and the DOCUMENT FREQUENCY (number of
    distinct documents containing it) — the inputs TF-IDF needs.

    The distributed df trick: each document's text lives wholly in one
    row, so a per-batch (doc, term) group counts each document at most
    once per term; summing the per-batch "docs containing term" partials
    across blocks is therefore the exact global distinct-doc count — NO
    global (doc, term) distinct shuffle is ever needed. Only (term, cnt,
    df) triples cross the wire.

    ``ngram=2`` builds word bigrams (within-row shift, same construction
    as the bigram query) instead of unigrams.
    """
    import polars as pl

    from .shuffle import local_group_map, select_if_needed

    if ngram not in (1, 2):
        raise ValueError("ngram must be 1 or 2")
    out_schema = pa.schema([("term", pa.string()), ("cnt", pa.int64()), ("df", pa.int64())])

    def partial(tb: pa.Table) -> pa.Table:
        col = tb[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        df = (
            pl.DataFrame({"i": np.arange(n, dtype=np.int64), "t": pl.Series(col).fill_null("")})
            .with_columns(pl.col("t").str.extract_all(r"\S+"))
            .explode("t")
            .drop_nulls("t")
        )
        if ngram == 2:
            df = df.with_columns(term=pl.col("t") + " " + pl.col("t").shift(-1).over("i")).drop_nulls("term")
        else:
            df = df.rename({"t": "term"})
        g = (
            df.group_by(["i", "term"])
            .agg(pl.len().alias("tf"))
            .group_by("term")
            .agg(pl.col("tf").sum().alias("cnt"), pl.len().alias("df"))
        )
        return g.to_arrow().cast(out_schema)

    def merge(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb.cast(out_schema)
        g = pl.from_arrow(tb).group_by("term").agg(pl.col("cnt").sum(), pl.col("df").sum())
        return g.to_arrow().cast(out_schema)

    parts = select_if_needed(docs_ds, [text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return local_group_map(parts, ["term"], merge, keys_non_null=True)


def tfidf_top_terms(
    docs_ds,
    n_docs: int,
    text_col: str = "text",
    k: int = 25,
    ngram: int = 1,
    order: str = "tfidf",
) -> pa.Table:
    """Top-k corpus terms with TF-IDF scores (`tfidf = cnt * LN(n_docs /
    df)`, the classic raw-count x inverse-document-frequency corpus
    salience measure): ranked by ``order`` ('tfidf' or 'cnt') descending
    with the term as tie-break. Pass ``n_docs`` from a metadata count
    (``ds.count()`` on a parquet read is free) — it must be the document
    count of ``docs_ds``.

    Post-shuffle each block holds its terms' EXACT totals, so a
    per-block partial top-k is lossless and only (blocks x k) rows reach
    the driver — the full vocabulary never does. The score is rounded to
    6 digits BEFORE ranking so the ordering matches a SQL oracle that
    ranks the rounded alias."""
    import polars as pl

    if order not in ("tfidf", "cnt"):
        raise ValueError("order must be 'tfidf' or 'cnt'")
    stats = term_doc_stats(docs_ds, text_col=text_col, ngram=ngram)
    out_schema = pa.schema(
        [("term", pa.string()), ("cnt", pa.int64()), ("df", pa.int64()), ("tfidf", pa.float64())]
    )

    def score_topk(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb.append_column("tfidf", pa.array([], type=pa.float64())).cast(out_schema)
        df = pl.from_arrow(tb).with_columns(
            tfidf=(pl.col("cnt") * (float(n_docs) / pl.col("df")).log()).round(6)
        )
        return (
            df.sort([order, "term"], descending=[True, False]).head(k).to_arrow().cast(out_schema)
        )

    parts = [
        t
        for t in stats.map_batches(
            score_topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    merged = pa.concat_tables(parts or [out_schema.empty_table()], promote_options="default")
    top = pl.from_arrow(merged).sort([order, "term"], descending=[True, False]).head(k)
    return top.to_arrow().cast(out_schema)


# ---------------------------------------------------------------------------
# BM25 relevance scoring / retrieval (Robertson et al., Okapi TREC-3 1994)
# ---------------------------------------------------------------------------


def bm25_corpus_stats(docs_ds, query_terms: list[str], text_col: str = "text"):
    """Corpus statistics BM25 needs for a fixed term query, in ONE
    streaming pass: ``(n_docs, avgdl, {term: df})``. Per block the
    partial is just ``len(query) + 2`` numbers (doc count, token-count
    sum, per-query-term distinct-doc counts — the same each-doc-lives-in-
    one-row trick as :func:`term_doc_stats`), so the reduce is
    driver-free-tier regardless of corpus size."""
    import polars as pl

    from .shuffle import select_if_needed

    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    def partial(tb: pa.Table) -> pa.Table:
        col = tb[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dl = pc.count_substring_regex(pc.coalesce(col, ""), _TOKEN_RE)
        n = len(col)
        toks = (
            pl.DataFrame({"i": np.arange(n, dtype=np.int64), "t": pl.Series(col).fill_null("")})
            .with_columns(pl.col("t").str.extract_all(_TOKEN_RE))
            .explode("t")
            .filter(pl.col("t").is_in(terms))
            .unique(["i", "t"])
            .group_by("t")
            .agg(pl.len().alias("df"))
        )
        dfm = dict(zip(toks["t"].to_list(), toks["df"].to_list()))
        return pa.Table.from_pydict(
            {
                "n_docs": pa.array([n], type=pa.int64()),
                "sum_dl": pa.array([int(pc.sum(dl).as_py() or 0)], type=pa.int64()),
                **{f"df__{t}": pa.array([int(dfm.get(t, 0))], type=pa.int64()) for t in terms},
            }
        )

    rows = select_if_needed(docs_ds, [text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    agg = pa.concat_tables(
        list(rows.iter_batches(batch_format="pyarrow", batch_size=None)),
        promote_options="default",
    )
    n_docs = int(pc.sum(agg["n_docs"]).as_py() or 0)
    sum_dl = int(pc.sum(agg["sum_dl"]).as_py() or 0)
    df = {t: int(pc.sum(agg[f"df__{t}"]).as_py() or 0) for t in terms}
    avgdl = (sum_dl / n_docs) if n_docs else 0.0
    return n_docs, avgdl, df


def bm25_score_batch(
    batch: pa.Table,
    idf: dict[str, float],
    avgdl: float,
    text_col: str = "text",
    out_col: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Append the Okapi BM25 score of each row against the fixed query:
    ``sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1-b+b*dl/avgdl))``. Pure
    polars/Arrow kernels: one tokenize + is_in filter + grouped count per
    batch; rows containing no query term score exactly 0."""
    import polars as pl

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    dl = pc.cast(pc.count_substring_regex(pc.coalesce(col, ""), _TOKEN_RE), pa.float64()).to_numpy(
        zero_copy_only=False
    )
    scores = np.zeros(n, dtype=np.float64)
    if n:
        tf = (
            pl.DataFrame({"i": np.arange(n, dtype=np.int64), "t": pl.Series(col).fill_null("")})
            .with_columns(pl.col("t").str.extract_all(_TOKEN_RE))
            .explode("t")
            .filter(pl.col("t").is_in(list(idf)))
            .group_by(["i", "t"])
            .agg(pl.len().alias("tf"))
        )
        if tf.height:
            i = tf["i"].to_numpy()
            tfv = tf["tf"].to_numpy().astype(np.float64)
            idfv = np.array([idf[t] for t in tf["t"].to_list()], dtype=np.float64)
            denom = tfv + k1 * (1.0 - b + (b * dl[i] / avgdl if avgdl > 0 else 0.0))
            np.add.at(scores, i, idfv * tfv * (k1 + 1.0) / denom)
    return batch.append_column(out_col, pa.array(scores, type=pa.float64()))


def bm25_scores(
    docs_ds,
    query_terms: list[str],
    text_col: str = "text",
    out_col: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
    corpus_stats: tuple[int, float, dict[str, int]] | None = None,
):
    """Okapi BM25 relevance of every document to a fixed term query, as a
    streaming column append (the retrieval scorer LLM-data pipelines use
    for quality-by-query filtering and search-index parity checks; the
    reference's nearest analog is the frequency semi-join
    ``models/preprocessing.py:7-10`` — term-frequency as signal).

    Plan: ONE cheap stats pass (:func:`bm25_corpus_stats` — constant-size
    partials, no shuffle) unless ``corpus_stats`` is passed, then ONE
    scoring scan. idf is the Lucene/Robertson variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — non-negative for all df."""
    terms = list(dict.fromkeys(query_terms))
    n_docs, avgdl, df = corpus_stats or bm25_corpus_stats(docs_ds, terms, text_col)
    idf = {
        t: float(np.log(1.0 + (n_docs - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5))) for t in terms
    }
    return docs_ds.map_batches(
        lambda tb: bm25_score_batch(tb, idf, avgdl, text_col, out_col, k1, b),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def bm25_topk(
    docs_ds,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Top-k BM25 retrieval: score every document (:func:`bm25_scores`),
    then a lossless per-block partial top-k — only ``blocks x k`` (id,
    score) rows reach the driver, never the corpus. Scores round to 6
    digits BEFORE ranking (same discipline as :func:`tfidf_top_terms`) so
    ordering matches a SQL oracle ranking the rounded alias; (score desc,
    id asc) tie-break is deterministic."""
    import polars as pl

    from .shuffle import select_if_needed

    if k <= 0:
        raise ValueError("k must be positive")
    scored = bm25_scores(
        select_if_needed(docs_ds, [id_col, text_col]), query_terms, text_col, "bm25", k1, b
    )
    out_schema = pa.schema([(id_col, pa.int64()), ("bm25", pa.float64())])

    def topk_block(tb: pa.Table) -> pa.Table:
        d = pl.from_arrow(tb.select([id_col, "bm25"])).with_columns(pl.col("bm25").round(6))
        return d.sort(["bm25", id_col], descending=[True, False]).head(k).to_arrow().cast(out_schema)

    parts = [
        t
        for t in scored.map_batches(
            topk_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    merged = pa.concat_tables(parts or [out_schema.empty_table()], promote_options="default")
    top = pl.from_arrow(merged).sort(["bm25", id_col], descending=[True, False]).head(k)
    return top.to_arrow().cast(out_schema)


# ---------------------------------------------------------------------------
# Character-trigram language model (CCNet-style LM quality scoring)
# ---------------------------------------------------------------------------


def _pack_trigram_windows(texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorize char trigrams over a whole batch of strings at once.

    The batch's texts are joined with a ``\\x00`` separator, decoded to a
    single uint32 codepoint array (one ``str.encode('utf-32-le')`` — no
    per-character Python), and every length-3 window is packed into one
    uint64 as ``cp0<<42 | cp1<<21 | cp2`` (codepoints < 2^21, so the pack
    is a bijection with the trigram string). Windows touching a separator
    (or an empty/None text) are masked out. Returns ``(packed, doc_idx,
    mask)`` over all windows; ``doc_idx`` maps each window to its row.
    """
    safe = ["" if t is None else t for t in texts]
    joined = "\x00".join(safe)
    # surrogatepass: damaged-encoding corpora (lone surrogates) are an
    # expected input to every text kernel in this engine
    cp = np.frombuffer(joined.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    if len(cp) < 3:
        e = np.array([], dtype=np.uint64)
        return e, np.array([], dtype=np.int64), np.array([], dtype=bool)
    a, b, c = cp[:-2], cp[1:-1], cp[2:]
    mask = (a != 0) & (b != 0) & (c != 0)
    packed = (a.astype(np.uint64) << np.uint64(42)) | (b.astype(np.uint64) << np.uint64(21)) | c.astype(np.uint64)
    # row index of each window start: cumulative (len + 1) offsets
    lens = np.fromiter((len(t) for t in safe), dtype=np.int64, count=len(safe))
    starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]
    doc_idx = np.searchsorted(starts, np.arange(len(a), dtype=np.int64), side="right") - 1
    return packed, doc_idx, mask


class CharTrigramLM:
    """Corpus character-trigram unigram LM: ``P(t) = count(t) / total``.

    ``logprob(texts)`` scores each text as the MEAN natural-log
    probability of its trigrams — the CCNet-shaped "does this look like
    the corpus" quality signal (low = gibberish / boilerplate outliers).
    Unseen trigrams floor at count ``unseen_count`` (default 1) so
    scoring never produces -inf on out-of-corpus text. Texts with < 3
    chars get NaN (no trigram evidence).

    The model is two parallel numpy arrays (sorted packed trigrams +
    counts) — broadcast it once with ``ray.put`` and look it up inside
    ``map_batches``; vocabulary is bounded by charset^3, not corpus rows.
    """

    def __init__(self, vocab: np.ndarray, counts: np.ndarray, unseen_count: float = 1.0):
        self.vocab = vocab
        self.counts = counts.astype(np.float64)
        self.total = float(self.counts.sum())
        self.unseen = float(unseen_count)

    def logprob(self, texts: list) -> np.ndarray:
        packed, doc_idx, mask = _pack_trigram_windows(texts)
        packed, doc_idx = packed[mask], doc_idx[mask]
        out = np.full(len(texts), np.nan)
        if not len(packed) or not self.total:
            return out
        idx = np.searchsorted(self.vocab, packed)
        idx_c = np.minimum(idx, len(self.vocab) - 1)
        found = self.vocab[idx_c] == packed
        cnt = np.where(found, self.counts[idx_c], self.unseen)
        lp = np.log(cnt / self.total)
        sums = np.bincount(doc_idx, weights=lp, minlength=len(texts))
        npos = np.bincount(doc_idx, minlength=len(texts))
        has = npos > 0
        out[has] = sums[has] / npos[has]
        return out


def char_trigram_lm(docs_ds, text_col: str = "text", min_count: int = 1) -> CharTrigramLM:
    """Fit :class:`CharTrigramLM` on a corpus with ONE distributed pass:
    per-block packed-trigram ``np.unique`` partials (tiny (uint64, cnt)
    rows — the text never re-shuffles) → ``grouped_sum`` hash shuffle →
    driver gather of the VOCABULARY ONLY (bounded by charset^3; pass
    ``min_count`` > 1 to prune the heavy tail on huge charsets — pruned
    trigrams score as unseen)."""
    from .shuffle import grouped_sum, select_if_needed

    def partials(tb: pa.Table) -> pa.Table:
        col = tb[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        packed, _, mask = _pack_trigram_windows(col.to_pylist())
        u, c = np.unique(packed[mask], return_counts=True)
        return pa.table(
            {"tri": pa.array(u, pa.uint64()), "cnt_partial": pa.array(c, pa.int64())}
        )

    partial_ds = select_if_needed(docs_ds, [text_col]).map_batches(
        partials, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    counts = grouped_sum(partial_ds, ["tri"], "cnt_partial", "cnt")
    tbs = [
        t
        for t in counts.iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not tbs:
        return CharTrigramLM(np.array([], dtype=np.uint64), np.array([], dtype=np.int64))
    tb = pa.concat_tables(tbs)
    vocab = tb["tri"].to_numpy(zero_copy_only=False).astype(np.uint64)
    cnt = tb["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    if min_count > 1:
        keep = cnt >= min_count
        vocab, cnt = vocab[keep], cnt[keep]
    order = np.argsort(vocab)
    return CharTrigramLM(vocab[order], cnt[order])


def lm_logprob_batch(model: CharTrigramLM, batch: pa.Table, text_col: str = "text", out_col: str = "lm_logprob") -> pa.Table:
    """Append the per-row mean trigram log-probability (NaN→null for
    texts with < 3 chars)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lp = model.logprob(col.to_pylist())
    arr = pa.array(lp, pa.float64(), from_pandas=True)  # NaN -> null
    return batch.append_column(out_col, arr)


def _token_ngram_hashes(texts: pa.Array | pa.ChunkedArray, n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, hash) pairs for every whitespace-token n-gram of every
    text, fully vectorized: polars extract_all → explode → n−1
    within-row shifts joined with '\\x1f' → one 64-bit hash kernel.
    Rows with fewer than n tokens contribute nothing."""
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    df = (
        pl.DataFrame(
            {"i": np.arange(len(texts), dtype=np.int64), "t": pl.Series(texts).fill_null("")}
        )
        .with_columns(pl.col("t").str.extract_all(r"\S+"))
        .explode("t")
        .drop_nulls("t")
    )
    gram = pl.col("t")
    for j in range(1, n):
        gram = gram + "\x1f" + pl.col("t").shift(-j).over("i")
    df = df.with_columns(gram.alias("g")).drop_nulls("g")
    if df.height == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    return df["i"].to_numpy(), df["g"].hash(seed=seed).to_numpy()


def decontaminate(
    ds,
    text_col: str,
    bench_ds,
    bench_text_col: str | None = None,
    n: int = 13,
    flag_col: str | None = None,
    max_bench_ngrams: int = 50_000_000,
    seed: int = 17,
    mode: str = "exact",
    fp_rate: float = 1e-6,
):
    """Benchmark DECONTAMINATION: drop (or flag) every document sharing
    at least one whitespace-token ``n``-gram with an evaluation/benchmark
    set — the published test-set-overlap filter LLM training corpora run
    (13-gram overlap in Brown et al. 2020 §C/appendix; the same shape as
    The Pile / Llama decontamination).

    Plan, Ray-Data-first:

    1. BENCH SET — one ``map_batches`` over ``bench_ds`` emits per-block
       DISTINCT n-gram hashes (uint64); the driver merges them with one
       ``np.unique``. The contract is that benchmark sets are
       small-bounded (MBs of text, not corpus-scale) — ``max_bench_ngrams``
       enforces it loudly (8 B/hash ⇒ the default caps the broadcast at
       ~400 MB; for a genuinely corpus-sized quarantine set use the
       MinHash/winnowing pair path in ``dedup/`` instead, which never
       gathers).
    2. SCAN — the sorted hash array ships ONCE (``ray.put``); every
       corpus batch builds its own n-gram hashes with the SAME vectorized
       construction (:func:`_token_ngram_hashes`) and probes via
       ``np.searchsorted`` — contaminated = any probe hit.

    ``flag_col=None`` (default) FILTERS contaminated docs out;
    ``flag_col='contaminated'`` keeps every row and appends an int32 0/1
    flag instead (for audits/reporting). Documents with fewer than ``n``
    tokens are clean by construction. False positives are limited to
    64-bit hash collisions (~1e-19 per pair).

    ``mode="bloom"`` is the LARGE-bench scale path: instead of the exact
    sorted hash array (8 B per distinct n-gram), the bench set is
    summarized into ONE mergeable Bloom filter (sketches/bloom.py) sized
    for ``fp_rate`` — ~ln(1/fp)/ln²2 bits per n-gram (≈ 3.6 B at the
    1e-6 default, and the rate is tunable down to whatever broadcast
    budget the cluster has). Per-block Bloom partials OR together on the
    driver (fixed bytes per block, never O(bench) rows), and the
    corpus scan probes the bit array vectorized. One-sided error in the
    SAFE direction for eval integrity: every true overlap is still
    caught (Blooms have no false negatives); a false positive drops a
    clean doc with probability ≈ n-grams-per-doc × fp_rate —
    over-quarantine, never leakage. ``max_bench_ngrams`` still bounds
    the CAPACITY estimate so a corpus-sized "bench" set fails loudly."""
    import ray

    from .shuffle import select_if_needed

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if mode not in ("exact", "bloom"):
        raise ValueError(f"mode must be 'exact' or 'bloom', got {mode!r}")
    bcol = bench_text_col or text_col
    bench_proj = select_if_needed(bench_ds, [bcol])

    def bench_partial(tb: pa.Table) -> pa.Table:
        _, h = _token_ngram_hashes(tb[bcol], n, seed)
        return pa.table({"h": pa.array(np.unique(h), type=pa.uint64())})

    if mode == "bloom":
        from ..sketches.bloom import BloomFilter

        # the filters need their capacity BEFORE population, but the
        # expensive work (tokenize + n-gram hash + unique) must not run
        # twice: materialize the per-block DISTINCT HASHES once (cheap
        # uint64 rows in the object store, bounded by the bench contract),
        # read the capacity upper bound = Σ per-block distinct counts from
        # its metadata (over-sizing only lowers the realized fp rate),
        # then build the blooms FROM the cached hashes
        bench_hashed = bench_proj.map_batches(
            bench_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).materialize()
        cap = bench_hashed.count()
        if cap > max_bench_ngrams:
            raise ValueError(
                f"benchmark set has up to {cap:,} distinct {n}-grams > max_bench_ngrams="
                f"{max_bench_ngrams:,}; for a corpus-sized quarantine set use the "
                "dedup/ shuffle paths instead"
            )
        capacity = max(1, cap)

        def bloom_partial(tb: pa.Table) -> pa.Table:
            h = tb["h"].to_numpy(zero_copy_only=False)
            bf = BloomFilter(capacity, fp_rate).update(h)
            return pa.table({"b": pa.array([bf.to_bytes()], type=pa.binary())})

        merged = BloomFilter(capacity, fp_rate)
        for t in bench_hashed.map_batches(
            bloom_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            for raw in t["b"].to_pylist():
                merged.merge(BloomFilter.from_bytes(raw))
        bref = ray.put(merged.to_bytes())

        def probe(h: np.ndarray, payload) -> np.ndarray:
            # zero-copy view over the plasma-shared payload per batch
            return BloomFilter.view_bytes(payload).contains(h)

        empty_bench = cap == 0
    else:
        parts = [
            t["h"].to_numpy(zero_copy_only=False)
            for t in bench_proj.map_batches(
                bench_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        bench = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
        if len(bench) > max_bench_ngrams:
            raise ValueError(
                f"benchmark set has {len(bench):,} distinct {n}-grams > max_bench_ngrams="
                f"{max_bench_ngrams:,}; decontaminate() broadcasts the bench set — for a "
                "corpus-sized quarantine set use the dedup/ shuffle paths instead"
            )
        bref = ray.put(bench)

        def probe(h: np.ndarray, payload) -> np.ndarray:
            if not len(payload):
                return np.zeros(len(h), dtype=bool)
            pos = np.searchsorted(payload, h)
            return (pos < len(payload)) & (payload[np.minimum(pos, len(payload) - 1)] == h)

        empty_bench = len(bench) == 0

    def scan(tb: pa.Table) -> pa.Table:
        idx, h = _token_ngram_hashes(tb[text_col], n, seed)
        bad = np.zeros(tb.num_rows, dtype=bool)
        if len(h) and not empty_bench:
            hit = probe(h, ray.get(bref))
            bad[np.unique(idx[hit])] = True
        if flag_col is None:
            return tb.filter(pa.array(~bad))
        return tb.append_column(flag_col, pa.array(bad.astype(np.int32), type=pa.int32()))

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def chunk_documents(
    ds,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 0,
    out_col: str = "chunk",
    chunk_id_col: str = "chunk_id",
):
    """Split every document into ~``max_tokens``-token pieces — the
    context-window preparation stage an LLM training pipeline runs after
    curation (chunking long docs instead of truncating them). Windows
    advance by ``max_tokens − overlap`` whitespace tokens, so consecutive
    chunks share ``overlap`` tokens of context.

    Pure streaming map (no shuffle, no state), and the whole batch stays
    in vectorized kernels: polars ``extract_all`` explodes tokens with
    their row index, every token's window id is integer arithmetic on its
    within-row position (one extra shifted assignment materializes the
    overlap region), and chunks reassemble with ONE ``group_by(row,
    window).agg(str.join)`` — no per-document Python. Output: one row per
    chunk — ``(id_col, chunk_id_col, out_col, n_chunk_tokens)`` with
    chunk_id 0-based in document order. Docs with no tokens (empty/null
    text) emit no rows, SQL-unnest style; reconstruction invariant:
    with overlap=0, ``str_join(chunks, ' ')`` == whitespace-normalized
    input."""
    import polars as pl

    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got overlap={overlap}")
    stride = max_tokens - overlap

    def chunk(tb: pa.Table) -> pa.Table:
        id_type = tb.schema.field(id_col).type
        out_schema = pa.schema(
            [
                (id_col, id_type),
                (chunk_id_col, pa.int64()),
                (out_col, pa.string()),
                ("n_chunk_tokens", pa.int64()),
            ]
        )
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        df = (
            pl.DataFrame(
                {
                    "i": pl.from_arrow(tb[id_col].combine_chunks() if isinstance(tb[id_col], pa.ChunkedArray) else tb[id_col]),
                    "t": pl.Series(tb[text_col].combine_chunks() if isinstance(tb[text_col], pa.ChunkedArray) else tb[text_col]).fill_null(""),
                }
            )
            .with_columns(pl.col("t").str.extract_all(r"\S+"))
            .explode("t")
            .drop_nulls("t")
            .with_columns(pos=pl.int_range(pl.len()).over("i"))
        )
        if df.height == 0:
            return pa.Table.from_pydict({f.name: [] for f in out_schema}, schema=out_schema)
        # window w holds tokens [w·stride, w·stride + max_tokens): a token
        # belongs to up to ceil(max_tokens/stride) windows — one shifted
        # assignment per lag r, each a pure vector expression
        import math

        parts = []
        for r in range(math.ceil(max_tokens / stride)):
            w = pl.col("pos") // stride - r
            parts.append(
                df.with_columns(w=w).filter(
                    (pl.col("w") >= 0) & (pl.col("pos") - pl.col("w") * stride < max_tokens)
                )
            )
        allt = pl.concat(parts)
        g = (
            allt.sort(["i", "w", "pos"])
            .group_by(["i", "w"], maintain_order=True)
            .agg(
                chunk=pl.col("t").str.join(" "),
                n=pl.col("t").len().cast(pl.Int64),
            )
        )
        g = g.rename({"i": id_col, "w": chunk_id_col, "chunk": out_col, "n": "n_chunk_tokens"})
        return g.to_arrow().cast(out_schema)

    from .shuffle import select_if_needed

    return select_if_needed(ds, [id_col, text_col]).map_batches(
        chunk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (Data Selection via Importance Resampling,
# Xie et al. 2023): hashed n-gram bag-of-words LM ratio per document
# ---------------------------------------------------------------------------


def _token_gram_frame(texts: pa.Array | pa.ChunkedArray, sizes: tuple[int, ...]):
    """polars frame (i, g): every whitespace-token n-gram (one row per
    size in ``sizes``) of every text, '\\x1f'-joined — the same gram
    construction as :func:`_token_ngram_hashes`, returned as STRINGS so
    callers pick the hash (fast polars vs SQL-reproducible md5)."""
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    base = (
        pl.DataFrame(
            {"i": np.arange(len(texts), dtype=np.int64), "t": pl.Series(texts).fill_null("")}
        )
        .with_columns(pl.col("t").str.extract_all(r"\S+"))
        .explode("t")
        .drop_nulls("t")
    )
    frames = []
    for n in sorted(set(sizes)):
        gram = pl.col("t")
        for j in range(1, n):
            gram = gram + "\x1f" + pl.col("t").shift(-j).over("i")
        frames.append(base.with_columns(gram.alias("g")).drop_nulls("g").select("i", "g"))
    return pl.concat(frames)


def hashed_ngram_buckets(
    texts: pa.Array | pa.ChunkedArray,
    sizes: tuple[int, ...] = (1, 2),
    n_buckets: int = 8192,
    token_hash: str = "fast",
    seed: int = 17,
) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, bucket) pairs for every token n-gram: the DSIR feature
    map. ``token_hash="fast"`` uses the vectorized 64-bit polars hash;
    ``"md5"`` matches DuckDB ``md5_number_lower(g) % n_buckets`` exactly
    (each DISTINCT gram hashed once — vocabulary is zipf-bounded)."""
    df = _token_gram_frame(texts, sizes)
    if df.height == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if token_hash == "md5":
        from ..sketches.simhash import _md5_token_hash

        uniq = df["g"].unique().to_list()
        lut = {g: int(_md5_token_hash(g) % np.uint64(n_buckets)) for g in uniq}
        b = np.fromiter((lut[g] for g in df["g"]), dtype=np.int64, count=df.height)
    else:
        b = (df["g"].hash(seed=seed).to_numpy() % np.uint64(n_buckets)).astype(np.int64)
    return df["i"].to_numpy(), b


def dsir_bucket_counts(
    ds,
    text_col: str = "text",
    sizes: tuple[int, ...] = (1, 2),
    n_buckets: int = 8192,
    token_hash: str = "fast",
    seed: int = 17,
) -> np.ndarray:
    """(n_buckets,) int64 hashed-n-gram counts of a corpus: per-block
    ``np.bincount`` partials (one fixed 8·n_buckets-byte vector per block,
    regardless of corpus size), n-ary driver sum — no shuffle, never
    O(rows) on the driver."""
    from .shuffle import select_if_needed

    def partial(tb: pa.Table) -> pa.Table:
        _, b = hashed_ngram_buckets(tb[text_col], sizes, n_buckets, token_hash, seed)
        cnt = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.Table.from_pydict({"c": [cnt.tobytes()]})

    total = np.zeros(n_buckets, dtype=np.int64)
    for blk in (
        select_if_needed(ds, [text_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for raw in blk["c"].to_pylist():
            total += np.frombuffer(raw, dtype=np.int64)
    return total


def dsir_logratio_vector(
    target_counts: np.ndarray, raw_counts: np.ndarray, alpha: float = 1.0
) -> np.ndarray:
    """Per-bucket ``ln p_target(b) − ln p_raw(b)`` under add-``alpha``
    smoothed multinomials — the DSIR importance log-weight of one
    feature occurrence."""
    if target_counts.shape != raw_counts.shape:
        raise ValueError("target and raw count vectors must share a bucket count")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (unsmoothed ratios are undefined on empty buckets)")
    B = len(raw_counts)
    pt = (target_counts + alpha) / (target_counts.sum() + alpha * B)
    pr = (raw_counts + alpha) / (raw_counts.sum() + alpha * B)
    return np.log(pt) - np.log(pr)


class _DsirScorer:
    """Actor-pool batch scorer: the (n_buckets,) log-ratio vector ships
    ONCE via ``ray.put``; each batch is one vectorized gram pass + one
    weighted bincount."""

    def __init__(self, text_col, lr_ref, sizes, n_buckets, token_hash, seed, out_col):
        import ray

        self.text_col, self.out_col = text_col, out_col
        self.sizes, self.n_buckets, self.token_hash, self.seed = sizes, n_buckets, token_hash, seed
        self.lr = ray.get(lr_ref)

    def __call__(self, tb: pa.Table) -> pa.Table:
        i, b = hashed_ngram_buckets(tb[self.text_col], self.sizes, self.n_buckets, self.token_hash, self.seed)
        w = np.bincount(i, weights=self.lr[b], minlength=tb.num_rows)
        return tb.append_column(self.out_col, pa.array(w, type=pa.float64()))


def dsir_weights(
    ds,
    text_col: str,
    target_ds,
    target_text_col: str | None = None,
    sizes: tuple[int, ...] = (1, 2),
    n_buckets: int = 8192,
    alpha: float = 1.0,
    token_hash: str = "fast",
    seed: int = 17,
    out_col: str = "dsir_logratio",
):
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    ``ln p_target(x) − ln p_raw(x)`` under hashed-n-gram bag-of-words
    models of a TARGET corpus (the distribution you want more of) and the
    RAW corpus itself. High scores = looks like the target. The published
    recipe for domain-matched pretraining selection; resample
    proportional-to-weight with :func:`dsir_resample`.

    Plan: two fixed-size count passes (8·n_buckets B per block, driver
    n-ary sum — the model, not the data, crosses the wire), one
    ``ray.put`` of the (n_buckets,) log-ratio vector, then one streaming
    actor-pool scoring pass appending ``out_col``. Nothing is ever
    O(corpus) on the driver. ``token_hash="md5"`` makes every score
    DuckDB-reproducible (oracle-checked in ``doc_scalar_functions``)."""
    import ray

    from .shuffle import sized_actor_concurrency

    raw = dsir_bucket_counts(ds, text_col, sizes, n_buckets, token_hash, seed)
    tgt = dsir_bucket_counts(
        target_ds, target_text_col or text_col, sizes, n_buckets, token_hash, seed
    )
    lr_ref = ray.put(dsir_logratio_vector(tgt, raw, alpha))
    return ds.map_batches(
        _DsirScorer,
        fn_constructor_args=(text_col, lr_ref, sizes, n_buckets, token_hash, seed, out_col),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        concurrency=sized_actor_concurrency(ds),
    )


def dsir_resample(
    ds,
    id_col: str,
    text_col: str,
    target_ds,
    n: int,
    target_text_col: str | None = None,
    seed: int = 42,
    **weight_kwargs,
):
    """DSIR selection: sample exactly ``n`` documents WITHOUT replacement
    with inclusion probability proportional to the importance weight
    ``exp(dsir_logratio)`` (the paper's Gumbel-top-k step, here via the
    deterministic Efraimidis–Spirakis sampler the engine already has —
    the two are equivalent). Log-weights re-center by their global max
    before exponentiation (selection is scale-invariant; re-centering
    only prevents overflow on extreme corpora). Returns a pyarrow Table
    of the selected rows (n is small by contract — it is a sample).

    Scale shape: only the NARROW (id, log-weight) projection — 16 B/row
    — is ever materialized (the scoring pass runs once and the wide text
    column is dropped before the object store holds anything); the max,
    the weighted sample and the final broadcast-id recovery of the n
    picked rows all touch id-sized data."""
    import polars as pl

    from .relational import broadcast_value_filter
    from .split import weighted_fixed_count_sample

    out_col = weight_kwargs.get("out_col", "dsir_logratio")
    scored = dsir_weights(ds, text_col, target_ds, target_text_col, **weight_kwargs)
    narrow = scored.select_columns([id_col, out_col]).materialize()
    mx = narrow.max(out_col)

    def to_w(tb: pa.Table) -> pa.Table:
        lw = tb[out_col].to_numpy(zero_copy_only=False)
        return tb.append_column("__dsir_w", pa.array(np.exp(lw - mx), type=pa.float64()))

    weighted = narrow.map_batches(to_w, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    picked = weighted_fixed_count_sample(weighted, id_col, "__dsir_w", n, seed=seed)
    if picked is None:
        return None
    # recover the n picked rows' full columns with a broadcast id filter
    # over the ORIGINAL dataset, then stitch the score back on (n is
    # small by contract — this join is driver-side over n rows)
    ids = picked[id_col].combine_chunks()
    rows_ds = broadcast_value_filter(ds, id_col, np.asarray(ids), keep=True)
    rows = pa.concat_tables(
        [t for t in rows_ds.iter_batches(batch_format="pyarrow", batch_size=None) if t.num_rows]
    )
    out = (
        pl.from_arrow(rows)
        .join(pl.from_arrow(picked.select([id_col, out_col])), on=id_col, how="inner")
        .sort(id_col)
        .to_arrow()
    )
    return out


# ---------------------------------------------------------------------------
# Sequence packing: fill fixed token-budget training sequences
# ---------------------------------------------------------------------------


def pack_sequences(
    ds,
    id_col: str,
    tokens_col: str,
    budget: int,
    sort_within_block: bool = False,
    allow_oversize: bool = False,
    seq_col: str = "seq_id",
    pos_col: str = "seq_pos",
    seq_tokens_col: str = "seq_tokens",
):
    """Pack rows (documents or :func:`chunk_documents` chunks) into
    training sequences of at most ``budget`` tokens — the sample-packing
    step an LLM pretraining pipeline runs between tokenization and
    batching (Raffel et al. 2020 §2.2's "packing"; GPT-3 appendix B).

    Packing is BLOCK-LOCAL, the same contract real shard-local packers
    use: sequences never span input blocks, so the operator is one
    embarrassingly-parallel ``map_batches`` with no shuffle and its
    output depends on the block layout (like any packer's output depends
    on its shard layout). Within a block the plan is next-fit in row
    order (``sort_within_block=True`` first orders rows by descending
    token count — sorted next-fit, tighter fill on skewed lengths):
    ONE cumulative sum, then one ``np.searchsorted`` per emitted
    sequence — O(sequences · log rows), never a Python loop over rows.

    Appends three columns: ``seq_col`` — the sequence key, defined as
    the FIRST member row's ``id_col`` value (rows partition into
    disjoint bins, so first-member ids are globally unique across
    blocks); ``pos_col`` — the row's 0-based position in its sequence;
    ``seq_tokens_col`` — the sequence's total token count (= fill, for
    efficiency audits). Rows with ``tokens_col`` null raise; a single
    row exceeding ``budget`` raises unless ``allow_oversize=True``, in
    which case it becomes its own (overflowing) sequence — chunk first
    with :func:`chunk_documents` if that is not what you want."""
    if budget < 1:
        raise ValueError("budget must be >= 1 token")

    def pack(tb: pa.Table) -> pa.Table:
        n = tb.num_rows
        if n == 0:
            return (
                tb.append_column(seq_col, pa.array([], type=tb.schema.field(id_col).type))
                .append_column(pos_col, pa.array([], type=pa.int64()))
                .append_column(seq_tokens_col, pa.array([], type=pa.int64()))
            )
        col = tb[tokens_col]
        if col.null_count:
            raise ValueError(f"pack_sequences: {tokens_col!r} contains nulls")
        toks = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        if (toks < 0).any():
            raise ValueError(f"pack_sequences: {tokens_col!r} contains negative counts")
        if not allow_oversize and (toks > budget).any():
            worst = int(toks.max())
            raise ValueError(
                f"pack_sequences: a row has {worst} tokens > budget {budget}; "
                "chunk first (chunk_documents) or pass allow_oversize=True"
            )
        order = np.argsort(-toks, kind="stable") if sort_within_block else np.arange(n)
        t = toks[order]
        cs = np.cumsum(t)
        ends, s, base = [], 0, 0
        while s < n:
            j = int(np.searchsorted(cs, base + budget, side="right"))
            if j <= s:  # single oversize row (allow_oversize): own sequence
                j = s + 1
            ends.append(j)
            base = int(cs[j - 1])
            s = j
        ends = np.asarray(ends, dtype=np.int64)
        starts = np.concatenate(([0], ends[:-1]))
        bin_of = np.searchsorted(ends, np.arange(n), side="right")
        pos = np.arange(n) - starts[bin_of]
        fills = np.add.reduceat(t, starts)
        ids = tb[id_col].combine_chunks() if isinstance(tb[id_col], pa.ChunkedArray) else tb[id_col]
        ids_ordered = ids.take(pa.array(order))
        seq_key = ids_ordered.take(pa.array(starts[bin_of]))
        packed = (
            tb.take(pa.array(order))
            .append_column(seq_col, seq_key)
            .append_column(pos_col, pa.array(pos, type=pa.int64()))
            .append_column(seq_tokens_col, pa.array(fills[bin_of], type=pa.int64()))
        )
        return packed

    return ds.map_batches(pack, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)



# ---------------------------------------------------------------------------
# Text normalization / markup stripping / encoding-damage detection
# ---------------------------------------------------------------------------

# Common UTF-8-read-as-cp1252/latin-1 artifacts (mojibake). Keys are built
# programmatically: encode the true char to UTF-8, decode it wrongly as
# cp1252 AND as latin-1 - exactly the damage each wrong decode produces,
# with no raw control bytes in this source file. Both families are fixed
# (real corpora contain both; latin-1 artifacts carry C1 control chars).
_MOJIBAKE_CHARS = (
    "\u00e9\u00e8\u00e0\u00e2\u00ea\u00ee\u00f4\u00fb\u00e7\u00fc\u00f6\u00e4"
    "\u00df\u00f1\u00ed\u00f3\u00fa\u00e1\u2019\u2018\u201c\u201d\u2013\u2014\u2026"
)


def _mojibake_fixes() -> list[tuple[str, str]]:
    fixes = []
    for c in _MOJIBAKE_CHARS:
        raw = c.encode("utf-8")
        for enc in ("cp1252", "latin-1"):
            try:
                k = raw.decode(enc)
            except UnicodeDecodeError:
                continue
            if (k, c) not in fixes:
                fixes.append((k, c))
    return fixes


_MOJIBAKE_FIXES = _mojibake_fixes()
# detector: A-tilde / a-circumflex artifact prefixes plus U+FFFD itself
_MOJIBAKE_RE = "\u00c3[\u0080-\u00ff]|\u00e2[\u0080-\u00bf\u20ac]|\ufffd"

_HTML_TAG_RE = r"<[^>]*>"
_HTML_ENTITIES = [
    # &amp; decodes LAST: decoding it first turns escaped-escaped markup
    # ('&amp;lt;b&amp;gt;', common in code samples) into '&lt;' which the
    # later passes would then wrongly decode again to '<'
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),
]
_CONTROL_RE = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"


def strip_markup_batch(batch: pa.Table, text_col: str = "text", out_col: str = "text") -> pa.Table:
    """Remove HTML/XML tags and decode the common named entities - the
    boilerplate-stripping pre-pass of web-corpus curation. Pure RE2 +
    literal-replace Arrow kernels; tags collapse to a single space so
    token boundaries survive ``<br>``-style separators."""
    t = pc.coalesce(batch[text_col], "")
    t = pc.replace_substring_regex(t, _HTML_TAG_RE, " ")
    for ent, rep in _HTML_ENTITIES:
        t = pc.replace_substring(t, ent, rep)
    idx = batch.schema.get_field_index(out_col)
    if idx >= 0:
        return batch.set_column(idx, out_col, t)
    return batch.append_column(out_col, t)


def normalize_text_batch(
    batch: pa.Table,
    text_col: str = "text",
    out_col: str = "text",
    form: str = "NFC",
    fix_mojibake: bool = True,
    collapse_whitespace: bool = True,
) -> pa.Table:
    """Canonical text normalization: repair the common UTF-8-as-cp1252
    mojibake artifacts (fixed literal-replace table), strip control
    characters, Unicode-normalize (NFC default), and collapse whitespace
    runs to single spaces with ends trimmed. Every step is a vectorized
    kernel (Arrow replace/trim; polars for the normalization itself —
    this pyarrow's ``utf8_normalize`` never COMPOSES, NFC comes back
    decomposed); nulls pass through as empty strings."""
    import polars as pl

    t = pc.coalesce(batch[text_col], "")
    if fix_mojibake:
        for bad, good in _MOJIBAKE_FIXES:
            t = pc.replace_substring(t, bad, good)
    t = pc.replace_substring_regex(t, _CONTROL_RE, "")
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    t = pl.Series(t).str.normalize(form).to_arrow().cast(pa.string())
    if collapse_whitespace:
        t = pc.utf8_trim_whitespace(pc.replace_substring_regex(t, "\\s+", " "))
    idx = batch.schema.get_field_index(out_col)
    if idx >= 0:
        return batch.set_column(idx, out_col, t)
    return batch.append_column(out_col, t)


def encoding_damage_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "mojibake_ppm"
) -> pa.Table:
    """Per-doc encoding-damage score: suspicious-sequence hits (mojibake
    artifact prefixes + U+FFFD replacement chars) per million chars -
    the curation signal for dropping or re-decoding damaged documents.
    One RE2 count + one division per batch."""
    t = pc.coalesce(batch[text_col], "")
    hits = pc.cast(pc.count_substring_regex(t, _MOJIBAKE_RE), pa.float64())
    safe = pc.max_element_wise(pc.cast(pc.utf8_length(t), pa.float64()), 1.0)
    ppm = pc.cast(pc.floor(pc.divide(pc.multiply(hits, 1e6), safe)), pa.int64())
    return batch.append_column(out_col, ppm)


# ---------------------------------------------------------------------------
# Corpus lexical diversity + Zipf statistics (round 5)
# ---------------------------------------------------------------------------


def grouped_lexical_diversity(
    docs_ds,
    group_col: str | None = "lang",
    text_col: str = "text",
    hll_p: int = 12,
    zipf_top_n: int | None = None,
):
    """Per-group lexical-diversity profile of a corpus: total token
    count, EXACT distinct unigram and bigram counts, type-token ratio,
    plus a no-shuffle HyperLogLog estimate of the unigram vocabulary —
    the corpus-health metrics (vocabulary growth, repetitiveness)
    pretraining-data reports track per language/domain.
    ``group_col=None`` profiles the whole corpus as one group (output
    column ``group`` holds ``'__all__'``). ``zipf_top_n`` additionally
    computes, per group FROM THE SAME shuffled term counts (no extra
    scan), the Zipf-law slope ``regr_slope(ln cnt, ln rank)`` over the
    top-n tokens (count-desc, term-asc deterministic ranking) — natural
    corpora sit near -1; a slope far from it flags template-generated
    or boilerplate-heavy data — plus ``zipf_top_token``,
    ``zipf_top_count`` and ``zipf_n_ranks`` columns.

    Scale shape: ONE corpus scan produces per-block PRE-AGGREGATED
    ``(group, kind, term, c)`` rows (kind 'u'/'b'), so only each block's
    vocabulary — never raw tokens — exists downstream. Those partials
    materialize once (narrow: two short strings + int per distinct term
    per block) and feed two branches: (a) the exact branch hash-shuffles
    the partials by term and counts globally-unique rows per (group,
    kind) via per-block partials + a driver sum; (b) the sketch branch
    never shuffles — one ~4 KB HLL per (group, block) streams to a
    driver register-max merge. At 100 TB branch (b) is the cheap rung
    and branch (a)'s exchange is bounded by the global vocabulary, not
    the corpus. Tokenizer is the same DuckDB-paritied ``\\S+`` used by
    :func:`term_doc_stats`.

    Returns pandas: ``group_col, tokens_total, distinct_tokens,
    distinct_bigrams, ttr, hll_distinct_est``.
    """
    import pandas as pd
    import polars as pl

    from ..sketches.hll import HyperLogLog, hash64_arrow
    from .shuffle import local_group_map, select_if_needed

    gname = group_col if group_col is not None else "group"
    pair_schema = pa.schema(
        [
            (gname, pa.string()),
            ("kind", pa.string()),
            ("term", pa.string()),
            ("c", pa.int64()),
        ]
    )

    def partial(tb: pa.Table) -> pa.Table:
        col = tb[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if group_col is None:
            gvals = pl.Series([_ALL_GROUP] * n)
        else:
            g = tb[group_col]
            if isinstance(g, pa.ChunkedArray):
                g = g.combine_chunks()
            gvals = pl.Series(g)
        base = (
            pl.DataFrame(
                {
                    "i": np.arange(n, dtype=np.int64),
                    gname: gvals,
                    "t": pl.Series(col).fill_null(""),
                }
            )
            .with_columns(pl.col("t").str.extract_all(r"\S+"))
            .explode("t")
            .drop_nulls("t")
        )
        uni = base.group_by([gname, "t"]).len().rename({"t": "term", "len": "c"})
        big = (
            base.with_columns(term=pl.col("t") + " " + pl.col("t").shift(-1).over("i"))
            .drop_nulls("term")
            .group_by([gname, "term"])
            .len()
            .rename({"len": "c"})
        )
        out = pl.concat(
            [
                uni.with_columns(kind=pl.lit("u")).select([gname, "kind", "term", "c"]),
                big.with_columns(kind=pl.lit("b")).select([gname, "kind", "term", "c"]),
            ]
        )
        return out.to_arrow().cast(pair_schema)

    need = [text_col] if group_col is None else [group_col, text_col]
    partials = (
        select_if_needed(docs_ds, need)
        .map_batches(partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .materialize()
    )

    # sketch branch: one HLL per (group, block) over unigram terms, no shuffle
    hll_schema = pa.schema([(gname, pa.string()), ("hll", pa.binary())])

    def hll_partial(tb: pa.Table) -> pa.Table:
        d = pl.from_arrow(tb).filter(pl.col("kind") == "u")
        groups, blobs = [], []
        for key, sub in d.group_by([gname]):
            sk = HyperLogLog(hll_p)
            sk.update_hashed(hash64_arrow(sub["term"].to_arrow()))
            groups.append(key[0])
            blobs.append(sk.to_bytes())
        return pa.table({gname: groups, "hll": blobs}, schema=hll_schema)

    hll_rows = [
        t
        for t in partials.map_batches(
            hll_partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    hll_est: dict = {}
    if hll_rows:
        merged = pa.concat_tables(hll_rows)
        for key, sub in pl.from_arrow(merged).group_by([gname]):
            hll_est[key[0]] = HyperLogLog.merge_many_bytes(sub["hll"].to_list()).estimate()

    # exact branch: shuffle partials by term -> globally-unique rows ->
    # per-block (group, kind, n_terms, total) partials -> driver sum
    def merge(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb.cast(pair_schema)
        out = pl.from_arrow(tb).group_by([gname, "kind", "term"]).agg(pl.col("c").sum())
        return out.to_arrow().cast(pair_schema)

    uniq = local_group_map(partials, [gname, "kind", "term"], merge)
    if zipf_top_n is not None:
        # the zipf ranking reuses the SAME shuffled exact counts — no
        # extra corpus scan, no second vocabulary exchange
        uniq = uniq.materialize()

    red_schema = pa.schema(
        [(gname, pa.string()), ("kind", pa.string()), ("n_terms", pa.int64()), ("total", pa.int64())]
    )

    def reduce_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in red_schema}, schema=red_schema)
        out = (
            pl.from_arrow(tb)
            .group_by([gname, "kind"])
            .agg(n_terms=pl.len().cast(pl.Int64), total=pl.col("c").sum())
        )
        return out.to_arrow().cast(red_schema)

    parts = [
        t
        for t in uniq.map_batches(
            reduce_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    base_cols = [gname, "tokens_total", "distinct_tokens", "distinct_bigrams", "ttr", "hll_distinct_est"]
    zipf_cols = ["zipf_slope", "zipf_top_token", "zipf_top_count", "zipf_n_ranks"]
    if not parts:
        return pd.DataFrame(columns=base_cols + (zipf_cols if zipf_top_n is not None else []))
    agg = (
        pl.from_arrow(pa.concat_tables(parts))
        .group_by([gname, "kind"])
        .agg(pl.col("n_terms").sum(), pl.col("total").sum())
        .to_pandas()
    )
    u = agg[agg["kind"] == "u"].set_index(gname)
    b = agg[agg["kind"] == "b"].set_index(gname)
    out = pd.DataFrame(
        {
            "tokens_total": u["total"],
            "distinct_tokens": u["n_terms"],
            "distinct_bigrams": b["n_terms"].reindex(u.index).fillna(0).astype("int64"),
        }
    )
    out["ttr"] = (out["distinct_tokens"] / out["tokens_total"]).round(6)
    out["hll_distinct_est"] = [float(hll_est.get(gv, 0.0)) for gv in out.index]
    if zipf_top_n is not None:
        zdf = _zipf_from_counts(uniq, gname, zipf_top_n).set_index(gname)
        out = out.join(zdf)
        out["zipf_n_ranks"] = out["zipf_n_ranks"].fillna(0).astype("int64")
        out["zipf_top_count"] = out["zipf_top_count"].fillna(0).astype("int64")
    return (
        out.reset_index()
        .rename(columns={"index": gname})
        .sort_values(gname)
        .reset_index(drop=True)
    )


_ALL_GROUP = "__all__"


def _zipf_from_counts(uniq_ds, gname: str, top_n: int):
    """Per-group Zipf slope from already-shuffled exact (group, kind,
    term, c) rows: per-block lossless partial top-n per group (kind
    'u'), driver final ranking, closed-form regr_slope(ln c, ln rank).
    Returns pandas ``gname, zipf_slope, zipf_top_token, zipf_top_count,
    zipf_n_ranks``."""
    import pandas as pd
    import polars as pl

    def topk_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb
        return (
            pl.from_arrow(tb)
            .filter(pl.col("kind") == "u")
            .sort(["c", "term"], descending=[True, False])
            .group_by([gname], maintain_order=True)
            .head(top_n)
            .to_arrow()
            .cast(tb.schema)
        )

    parts = [
        t
        for t in uniq_ds.map_batches(
            topk_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    rows = []
    if parts:
        top = (
            pl.from_arrow(pa.concat_tables(parts))
            .sort(["c", "term"], descending=[True, False])
            .group_by([gname], maintain_order=True)
            .head(top_n)
        )
        for key, sub in top.group_by([gname], maintain_order=True):
            cnt = sub["c"].to_numpy().astype(np.float64)
            n = len(cnt)
            if n < 2:
                slope = None
            else:
                x = np.log(np.arange(1, n + 1, dtype=np.float64))
                y = np.log(cnt)
                dx = x - x.mean()
                slope = round(float((dx * (y - y.mean())).sum() / (dx * dx).sum()), 6)
            rows.append(
                {
                    gname: key[0],
                    "zipf_slope": slope,
                    "zipf_top_token": sub["term"][0],
                    "zipf_top_count": int(cnt[0]),
                    "zipf_n_ranks": int(n),
                }
            )
    return pd.DataFrame(
        rows, columns=[gname, "zipf_slope", "zipf_top_token", "zipf_top_count", "zipf_n_ranks"]
    )


def token_zipf_slope(docs_ds, text_col: str = "text", top_n: int = 200) -> dict:
    """Zipf-law slope of the corpus token frequency distribution:
    ``regr_slope(ln(count), ln(rank))`` over the top ``top_n`` tokens
    (count-desc, term-asc tiebreak — deterministic under ties). Natural
    corpora sit near -1; a slope far from it flags template-generated or
    boilerplate-heavy data. Built on :func:`term_doc_stats` (one narrow
    (term, cnt, df) vocabulary shuffle); post-shuffle blocks hold exact
    totals, so per-block partial top-n is lossless and only
    blocks × top_n rows reach the driver."""
    import polars as pl

    stats = term_doc_stats(docs_ds, text_col=text_col)

    def topk_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb
        return (
            pl.from_arrow(tb)
            .sort(["cnt", "term"], descending=[True, False])
            .head(top_n)
            .to_arrow()
            .cast(tb.schema)
        )

    parts = [
        t
        for t in stats.map_batches(
            topk_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    if not parts:
        return {"zipf_slope": None, "top_token": None, "top_count": 0, "n_ranks": 0}
    top = (
        pl.from_arrow(pa.concat_tables(parts))
        .sort(["cnt", "term"], descending=[True, False])
        .head(top_n)
    )
    cnt = top["cnt"].to_numpy().astype(np.float64)
    n = len(cnt)
    if n < 2:
        slope = None
    else:
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(cnt)
        dx = x - x.mean()
        slope = round(float((dx * (y - y.mean())).sum() / (dx * dx).sum()), 6)
    return {
        "zipf_slope": slope,
        "top_token": top["term"][0],
        "top_count": int(cnt[0]),
        "n_ranks": int(n),
    }
