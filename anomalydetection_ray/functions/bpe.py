"""Distributed BPE tokenizer training + streaming encode.

The scalable shape (how production tokenizer trainers actually run, and
the only one that works at 100 TB): the CORPUS-SIZED work is a single
distributed (word, count) reduction — distinct words are
vocabulary-bounded (Heaps' law), not corpus-bounded — and the iterative
merge learning (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") runs driver-side over that small count
table with an incremental pair index. Encoding is a stateless streaming
``map_batches`` stage that builds the merge-rank table once per actor
and caches per-distinct-word encodings.

Reference analog: the reference only pretokenizes (HF tokenizer loaded
inside `models/feature_extraction.py:37-43`); training a tokenizer over
the corpus is the training-data-pipeline op this engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EOW = "▁"  # end-of-word marker appended to each word's last symbol

# distinct-word safety cap for the driver gather: the (word, cnt) table is
# vocabulary-bounded by contract; a corpus that exceeds this (e.g. random
# hex blobs tokenizing to unbounded "words") must fail loudly, not OOM.
DEFAULT_MAX_WORDS = 2_000_000


def word_counts(docs_ds, text_col: str = "text"):
    """Distributed distinct-word counts: per-block polars tokenize +
    grouped count partials, one narrow (word, cnt) hash shuffle. Only
    8-byte counts + the distinct words themselves cross the wire."""
    import polars as pl

    from .shuffle import local_group_map, select_if_needed

    out_schema = pa.schema([("word", pa.string()), ("cnt", pa.int64())])

    def partial(tb: pa.Table) -> pa.Table:
        col = tb[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        g = (
            # the EOW marker char is RESERVED (sentencepiece's own
            # convention: U+2581 encodes a word boundary) — literal
            # occurrences in the corpus (e.g. re-tokenized HF output)
            # become separators here, or an in-word marked symbol would
            # be indistinguishable from a merged content symbol and
            # conflate pair statistics (round-5 review)
            pl.DataFrame({"t": pl.Series(col).fill_null("")})
            .with_columns(pl.col("t").str.replace_all(_EOW, " ", literal=True))
            .with_columns(pl.col("t").str.extract_all(r"\S+"))
            .explode("t")
            .drop_nulls("t")
            .group_by("t")
            .agg(pl.len().alias("cnt"))
            .rename({"t": "word"})
        )
        return g.to_arrow().cast(out_schema)

    def merge(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return tb.cast(out_schema)
        g = pl.from_arrow(tb).group_by("word").agg(pl.col("cnt").sum())
        return g.to_arrow().cast(out_schema)

    parts = select_if_needed(docs_ds, [text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return local_group_map(parts, ["word"], merge, keys_non_null=True)


def _learn_merges(words: list[str], counts: list[int], n_merges: int) -> list[tuple[str, str]]:
    """Sennrich BPE over a (word, count) table with an incremental pair
    index: pair counts update only for the words a merge touches, so the
    loop is O(touched symbols), not O(vocab) per merge. Deterministic:
    ties break on the lexicographically smallest pair."""
    syms: list[list[str]] = [list(w[:-1]) + [w[-1] + _EOW] for w in words if w]
    freqs = [c for w, c in zip(words, counts) if w]

    import heapq

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (s, f) in enumerate(zip(syms, freqs)):
        for a, b in zip(s, s[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(wi)

    # max-heap with lazy invalidation: (-count, pair) pops the highest
    # count with the lexicographically-smallest pair on ties (the same
    # deterministic rule as a full scan). A full-dict argmax per merge is
    # O(n_merges × distinct_pairs) — hours at a 2M-word vocabulary; the
    # heap makes each selection O(log P) with one push per touched pair.
    heap: list[tuple[int, tuple[str, str]]] = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg, best = heapq.heappop(heap)
        if pair_counts.get(best) != -neg:
            continue  # stale entry: the pair's count changed since push
        merges.append(best)
        joined = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for wi in list(pair_words.get(best, ())):
            s, f = syms[wi], freqs[wi]
            # remove this word's old pair contributions
            for a, b in zip(s, s[1:]):
                p = (a, b)
                pair_counts[p] -= f
                touched.add(p)
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                    pair_words.pop(p, None)
                else:
                    ws = pair_words.get(p)
                    if ws is not None:
                        ws.discard(wi)
            # apply the merge within the word
            ns: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    ns.append(joined)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[wi] = ns
            # add the new contributions
            for a, b in zip(ns, ns[1:]):
                p = (a, b)
                pair_counts[p] = pair_counts.get(p, 0) + f
                touched.add(p)
                pair_words.setdefault(p, set()).add(wi)
        # ONE fresh heap entry per net-changed pair per merge (not per
        # intermediate decrement) keeps heap growth bounded by touched work
        for p in touched:
            c = pair_counts.get(p)
            if c is not None and c > 0:
                heapq.heappush(heap, (-c, p))
    return merges


def bpe_train(
    docs_ds,
    n_merges: int,
    text_col: str = "text",
    max_words: int = DEFAULT_MAX_WORDS,
) -> list[tuple[str, str]]:
    """Train BPE merges over a document corpus. ONE distributed pass
    (:func:`word_counts`) reduces the corpus to its vocabulary-bounded
    (word, cnt) table; the merge loop runs driver-side on it. Returns
    the ranked merge list (rank = list position) for
    :func:`bpe_encode`. Raises if the distinct-word table exceeds
    ``max_words`` — the driver gather is bounded by contract."""
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    # materialize FIRST and read the distinct-word count from block
    # metadata, so an unbounded vocabulary (random blobs) fails the guard
    # before any (word, cnt) rows are gathered onto the driver — gating
    # after the gather would OOM exactly where the guard claims to protect
    wc = word_counts(docs_ds, text_col).materialize()
    n_words = wc.count()
    if n_words > max_words:
        raise ValueError(
            f"distinct-word table has {n_words} rows > max_words={max_words}; "
            "the driver-side merge loop is vocabulary-bounded by contract — raise "
            "max_words only if the vocabulary is genuinely this large"
        )
    parts = list(wc.iter_batches(batch_format="pyarrow", batch_size=None))
    tb = pa.concat_tables(
        [p for p in parts if p.num_rows]
        or [pa.schema([("word", pa.string()), ("cnt", pa.int64())]).empty_table()],
        promote_options="default",
    )
    # deterministic learning regardless of shuffle arrival order
    order = pa.compute.sort_indices(
        tb, sort_keys=[("cnt", "descending"), ("word", "ascending")]
    )
    tb = tb.take(order)
    return _learn_merges(tb["word"].to_pylist(), tb["cnt"].to_pylist(), n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    s = list(word[:-1]) + [word[-1] + _EOW]
    while len(s) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


class BpeEncoderStage:
    """Actor-pool ``map_batches`` stage: whitespace-tokenize each row and
    BPE-encode with the trained merges. The rank table builds ONCE per
    actor (T2 contract); per-distinct-word encodings cache across batches
    so hot words (Zipf) encode once per actor, not once per occurrence."""

    def __init__(
        self,
        merges: list[tuple[str, str]],
        text_col: str = "text",
        out_col: str = "bpe_tokens",
        count_col: str | None = "n_bpe_merged",
        cache_max: int = 1 << 20,
    ):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col, self.out_col, self.count_col = text_col, out_col, count_col
        self.cache: dict[str, list[str]] = {}
        self.cache_max = cache_max

    def __call__(self, tb: pa.Table) -> pa.Table:
        import polars as pl

        col = tb[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        toks = (
            # same reserved-marker replacement as word_counts: encode must
            # tokenize exactly like training did
            pl.DataFrame({"i": np.arange(n, dtype=np.int64), "t": pl.Series(col).fill_null("")})
            .with_columns(pl.col("t").str.replace_all(_EOW, " ", literal=True))
            .with_columns(pl.col("t").str.extract_all(r"\S+"))
            .explode("t")
            .drop_nulls("t")
        )
        words = toks["t"].to_list()
        rows = toks["i"].to_numpy()
        out: list[list[str]] = [[] for _ in range(n)]
        cache = self.cache
        for w, i in zip(words, rows):
            enc = cache.get(w)
            if enc is None:
                enc = _encode_word(w, self.ranks)
                if len(cache) < self.cache_max:
                    cache[w] = enc
            out[i].extend(enc)
        tb = tb.append_column(self.out_col, pa.array(out, type=pa.list_(pa.string())))
        if self.count_col:
            tb = tb.append_column(
                self.count_col, pa.array([len(x) for x in out], type=pa.int64())
            )
        return tb


def bpe_encode(
    docs_ds,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    count_col: str | None = "n_bpe_merged",
    concurrency: int | None = None,
):
    """Streaming BPE encode as an actor-pool stage (rank table + word
    cache built once per actor)."""
    from .shuffle import default_actor_concurrency

    return docs_ds.map_batches(
        BpeEncoderStage,
        fn_constructor_kwargs={
            "merges": merges,
            "text_col": text_col,
            "out_col": out_col,
            "count_col": count_col,
        },
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        concurrency=concurrency or default_actor_concurrency(),
    )
