"""Text-function unit tests + a planted-PII curation-gate equivalence test.

The synthetic corpus contains zero email/URL/IP hits by construction, so the
curation pipeline's PII gate is vacuous at driver-test scale; here we plant
PII and degenerate-repetition docs into a scratch corpus and assert both the
batch kernels and the full curation pipeline (Ray vs its own DuckDB oracle)
react to them.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomalydetection_ray.functions.text import (
    pii_pattern_counts_batch,
    repetition_batch,
)


def test_pii_pattern_counts_planted():
    batch = pa.Table.from_pydict(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "contact me at alice@example.com or bob.smith+x@sub.domain.org",
                "see https://example.com/path?q=1 and http://foo.bar",
                "server at 10.0.0.1 and 192.168.1.255 responded",
                "perfectly clean text with no personal identifiers at all",
            ],
        }
    )
    out = pii_pattern_counts_batch(batch)
    assert out["n_emails"].to_pylist() == [2, 0, 0, 0]
    assert out["n_urls"].to_pylist() == [0, 2, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 0, 2, 0]


def test_repetition_batch_degenerate():
    batch = pa.Table.from_pydict(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "spam " * 40,  # 40 tokens, 1 distinct
                " ".join(f"w{i}" for i in range(40)),  # all distinct
                None,
            ],
        }
    )
    out = repetition_batch(batch)
    ratios = out["distinct_ratio"].to_pylist()
    assert ratios[0] == pytest.approx(1 / 40)
    assert ratios[1] == 1.0
    assert out["n_tokens_r"].to_pylist()[2] == 0
    assert out["top_token_share"].to_pylist()[0] == 1.0


def test_curation_gate_drops_pii_and_repetition(ray_session, tmp_path):
    """Plant PII-bearing and repetitive docs; the curation pipeline must
    drop them, and the Ray result must still match its composed DuckDB
    oracle on the planted corpus (the gate has real effect here, unlike
    on the synthetic testdata where PII is vacuously absent)."""
    from anomalydetection_ray.pipelines.queries import registry

    fn, sql = registry()["curation_pipeline_docs"]

    clean = " ".join(f"tok{i}" for i in range(30))
    bench_text = " ".join(f"bench{i}" for i in range(30))
    # doc 128 sits on the doc_id % 64 == 0 benchmark slice: it and any doc
    # sharing an 8-token n-gram with it must fall to decontamination
    leak = " ".join(f"bench{i}" for i in range(10, 20)) + " " + " ".join(
        f"other{i}" for i in range(16)
    )
    rows = pd.DataFrame(
        {
            "doc_id": [100, 101, 102, 103, 104, 128, 105],
            "text": [
                clean,  # kept
                clean + " email hit alice@example.com now",  # PII -> dropped
                "dup " * 40,  # distinct_ratio 1/40 -> dropped
                "short text",  # < 24 tokens -> dropped
                clean + " extra",  # near-dup of doc 100 (J ~ 0.97) -> collapses
                bench_text,  # benchmark slice doc: self-contaminated -> dropped
                leak,  # shares a 10-token run with the bench doc -> dropped
            ],
            "lang": ["en"] * 7,
        }
    )
    pq.write_table(pa.Table.from_pandas(rows), str(tmp_path / "documents.parquet"))

    res = fn(str(tmp_path))
    got = res.to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)

    # PII doc, repetitive doc, short doc all gone; the bench doc and its
    # n-gram leak fall to decontamination; doc 104 collapses into 100
    assert got["doc_id"].tolist() == [100]
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype(str), want[sorted(want.columns)].astype(str)
    )


# ---------------------------------------------------------------------------
# Winnowing rolling-hash fingerprints (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def test_winnow_guarantee_shared_substring():
    """Two texts sharing any substring of length >= w + k - 1 must share
    at least one fingerprint — the winnowing guarantee, 50 random cases."""
    import numpy as np

    from anomalydetection_ray.functions.text import _winnow_one

    k, w = 8, 16
    rng = np.random.default_rng(11)
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    for _ in range(50):
        shared = rng.choice(letters, w + k - 1)
        t1 = np.concatenate([rng.choice(letters, rng.integers(0, 80)), shared,
                             rng.choice(letters, rng.integers(0, 80))])
        t2 = np.concatenate([rng.choice(letters, rng.integers(0, 80)), shared,
                             rng.choice(letters, rng.integers(0, 80))])
        f1, f2 = _winnow_one(t1, k, w), _winnow_one(t2, k, w)
        assert len(np.intersect1d(f1, f2)) >= 1


def test_winnow_disjoint_alphabets_share_nothing():
    import numpy as np

    from anomalydetection_ray.functions.text import _winnow_one

    a = np.frombuffer(b"aaabbbcccdddeeefffggghhhiiijjjkkklllmmm" * 3, dtype=np.uint8)
    b = np.frombuffer(b"AAABBBCCCDDDEEEFFFGGGHHHIIIJJJKKKLLLMMM" * 3, dtype=np.uint8)
    assert len(np.intersect1d(_winnow_one(a, 8, 16), _winnow_one(b, 8, 16))) == 0


def test_winnow_batch_nulls_and_short_text():
    from anomalydetection_ray.functions.text import winnow_fingerprints_batch

    tb = pa.table({"text": pa.array([None, "short", "x" * 100], type=pa.string())})
    out = winnow_fingerprints_batch(tb, k=8, w=16)
    col = out["fingerprints"].to_pylist()
    assert col[0] is None
    assert col[1] == []  # 5 bytes < k
    assert len(col[2]) >= 1
    # deterministic across calls
    again = winnow_fingerprints_batch(tb, k=8, w=16)["fingerprints"].to_pylist()
    assert col == again


@pytest.mark.parametrize("nblocks", [1, 5])
def test_winnow_containment_pairs_end_to_end(ray_session, nblocks):
    import ray.data as rd

    from anomalydetection_ray.functions.text import winnow_containment_pairs
    from anomalydetection_ray.pipelines.queries import as_table

    chunk = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                # disjoint 8-gram vocabularies outside the planted chunk, so
                # the ONLY shared fingerprints come from the chunk itself
                # (any shared k-gram may legitimately fire a fingerprint —
                # that is what min_shared filters in real corpora)
                "0123456789012345678901234567890123456789 " + chunk,
                "TOTALLY DIFFERENT CONTENT ABOUT DATABASES AND QUERY PLANNERS",
                chunk + " ~!~@~#~$~%~^~&~*~(~)~_~+~{~}~|~:~<~>~?~",
                None,
            ],
        }
    )
    ds = rd.from_arrow(docs).repartition(nblocks)
    got = as_table(winnow_containment_pairs(ds, min_shared=1)).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert pairs == {(1, 3)}
    assert (got["shared"] >= 1).all()


def test_term_doc_stats_and_tfidf_topk(ray_session):
    import duckdb
    import numpy as np
    import ray.data as rd

    from anomalydetection_ray.functions.text import term_doc_stats, tfidf_top_terms
    from anomalydetection_ray.pipelines.queries import as_table

    docs = pa.table(
        {
            "text": pa.array(
                ["a b a", "b c", None, "", "a a a a", "c c b", "x y", "y x y"]
            )
        }
    )
    for parts in (1, 5):
        ds = rd.from_arrow(docs).repartition(parts)
        got = (
            as_table(term_doc_stats(ds))
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )
        # hand-check: a appears 2+4=6 times in 2 docs; b 1+1+1=3 in 3 docs
        want = {
            "a": (6, 2), "b": (3, 3), "c": (3, 2), "x": (2, 2), "y": (3, 2),
        }
        assert {r.term: (r.cnt, r.df) for r in got.itertuples()} == want

    top = tfidf_top_terms(rd.from_arrow(docs).repartition(3), n_docs=docs.num_rows, k=3)
    con = duckdb.connect()
    con.register("d", docs)
    want_df = con.execute(
        r"""
        WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM d),
        toks AS (SELECT ROW_NUMBER() OVER () AS i, unnest(regexp_extract_all(COALESCE(text,''), '\S+')) AS tok FROM d),
        s AS (SELECT tok AS term, COUNT(*) AS cnt, COUNT(DISTINCT i) AS df FROM toks GROUP BY tok)
        SELECT term, cnt, df, ROUND(cnt * LN(nd / df), 6) AS tfidf FROM s, n
        ORDER BY tfidf DESC, term LIMIT 3
        """
    ).df()
    got_df = top.to_pandas()
    assert got_df["term"].tolist() == want_df["term"].tolist()
    np.testing.assert_allclose(got_df["tfidf"], want_df["tfidf"], rtol=0, atol=1e-9)

    with pytest.raises(ValueError, match="ngram"):
        term_doc_stats(rd.from_arrow(docs), ngram=3)
    with pytest.raises(ValueError, match="order"):
        tfidf_top_terms(rd.from_arrow(docs), n_docs=8, order="df")


def test_bm25_scores_match_python_reference(ray_session):
    """BM25 (Okapi, Lucene idf): exact parity with a per-doc Python
    reference at any block layout; zero score for docs with no query
    term; top-k equals the scores sort; corpus-stats reuse; guards."""
    import math

    import numpy as np
    import ray.data as rd

    from anomalydetection_ray.functions.text import (
        bm25_corpus_stats,
        bm25_scores,
        bm25_topk,
    )
    from anomalydetection_ray.pipelines.queries import as_table

    texts = [
        "hash join fast",
        "join join join slow",
        None,
        "",
        "scan scan hash scan table",
        "the quick brown fox",
        "fast fast",
    ]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    q = ["hash", "join", "scan", "fast"]
    k1, b = 1.2, 0.75

    # Python reference
    toklists = [(t or "").split() for t in texts]
    N = len(texts)
    dls = [len(t) for t in toklists]
    avgdl_ref = sum(dls) / N
    df_ref = {t: sum(1 for toks in toklists if t in toks) for t in q}
    idf = {t: math.log(1.0 + (N - df_ref[t] + 0.5) / (df_ref[t] + 0.5)) for t in q}

    def ref_score(toks):
        dl = len(toks)
        s = 0.0
        for t in q:
            tf = toks.count(t)
            if tf:
                s += idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl_ref))
        return s

    want = [ref_score(t) for t in toklists]

    for parts in (1, 4):
        ds = rd.from_arrow(docs).repartition(parts)
        n_docs, avgdl, df = bm25_corpus_stats(ds, q)
        assert (n_docs, df) == (N, df_ref) and abs(avgdl - avgdl_ref) < 1e-12
        got = (
            as_table(bm25_scores(ds, q)).to_pandas().sort_values("doc_id")["bm25"].to_numpy()
        )
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)

    # docs with no query term score exactly 0 (None, "", "the quick...")
    assert want[2] == want[3] == want[5] == 0.0 and got[2] == got[3] == got[5] == 0.0

    # top-k == scores sort (rounded-6, id tie-break), stats reusable
    top = bm25_topk(rd.from_arrow(docs).repartition(3), q, k=3)
    order = sorted(range(N), key=lambda i: (-round(want[i], 6), i))[:3]
    assert top["doc_id"].to_pylist() == order
    reused = as_table(
        bm25_scores(rd.from_arrow(docs), q, corpus_stats=(N, avgdl_ref, df_ref))
    ).to_pandas().sort_values("doc_id")["bm25"].to_numpy()
    np.testing.assert_allclose(reused, want, rtol=0, atol=1e-12)

    with pytest.raises(ValueError, match="non-empty"):
        bm25_corpus_stats(rd.from_arrow(docs), [])
    with pytest.raises(ValueError, match="positive"):
        bm25_topk(rd.from_arrow(docs), q, k=0)


def test_char_trigram_lm_fit_score_unseen_and_layout(ray_session):
    """CharTrigramLM: layout-invariant fit, exact hand-checked probabilities,
    unseen-trigram floor (never -inf), <3-char texts -> null, unicode safe."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from anomalydetection_ray.functions.text import CharTrigramLM, char_trigram_lm

    corpus = pd.DataFrame({"text": ["abcabc", "bca", "日本語のテキスト", None, "xy"]})
    # trigram multiset: abcabc -> abc,bca,cab,abc ; bca -> bca ;
    # 日本語のテキスト -> 6 windows ; None/xy -> none. total = 11
    models = [
        char_trigram_lm(rd.from_pandas(corpus).repartition(nb)) for nb in (1, 2, 5)
    ]
    m0 = models[0]
    assert m0.total == 11.0
    for m in models[1:]:
        assert np.array_equal(m.vocab, m0.vocab) and np.array_equal(m.counts, m0.counts)

    lp = m0.logprob(["abc", "bca", "zzz", "ab", "", None, "日本語"])
    assert abs(lp[0] - math.log(2 / 11)) < 1e-12      # abc seen twice
    assert abs(lp[1] - math.log(2 / 11)) < 1e-12      # bca seen twice
    assert abs(lp[2] - math.log(1 / 11)) < 1e-12      # unseen floors at count 1
    assert np.isnan(lp[3]) and np.isnan(lp[4]) and np.isnan(lp[5])
    assert np.isfinite(lp[6])

    # min_count pruning: trigrams below the floor score as unseen
    pruned = char_trigram_lm(rd.from_pandas(corpus), min_count=2)
    assert pruned.vocab.size == 2  # only abc and bca survive
    lp2 = pruned.logprob(["cab"])
    assert abs(lp2[0] - math.log(1 / pruned.total)) < 1e-12

    # empty corpus
    empty = char_trigram_lm(rd.from_pandas(pd.DataFrame({"text": ["ab", None]})))
    assert np.isnan(empty.logprob(["abcdef"])[0])


def test_decontaminate_filters_ngram_overlap(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import decontaminate

    corpus = pa.table(
        {
            "doc_id": pa.array(list(range(5)), type=pa.int64()),
            "text": [
                "the quick brown fox jumps over the lazy dog",  # shares 4-gram with bench
                "completely unrelated text about ray data engines",
                "short one",  # < n tokens -> clean
                "quick brown fox jumps",  # exactly the bench 4-gram
                "the quick brown wolf jumps over nothing",  # no shared 4-gram
            ],
        }
    )
    bench = pa.table({"text": ["we saw the quick brown fox jumps today", "evaluation prompt xyz"]})
    for parts in (1, 3):
        ds = rd.from_arrow(corpus).repartition(parts)
        out = (
            decontaminate(ds, "text", rd.from_arrow(bench), n=4)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["doc_id"].tolist() == [1, 2, 4]
        flagged = (
            decontaminate(ds, "text", rd.from_arrow(bench), n=4, flag_col="contaminated")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert flagged["contaminated"].tolist() == [1, 0, 0, 1, 0]
    # n larger than every doc -> everything clean
    out2 = decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(bench), n=50).to_pandas()
    assert len(out2) == 5
    # bench-size contract enforced loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bench_ngrams"):
        decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(bench), n=2, max_bench_ngrams=1).to_pandas()
    with _pytest.raises(ValueError):
        decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(bench), n=0)


def test_decontaminate_matches_python_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import decontaminate

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 40))) for _ in range(200)]
    bench = [" ".join(rng.choice(vocab, size=rng.integers(5, 25))) for _ in range(20)]
    n = 3

    def grams(s):
        t = s.split()
        return {tuple(t[i : i + n]) for i in range(len(t) - n + 1)}

    bset = set().union(*[grams(b) for b in bench])
    want_clean = [i for i, d in enumerate(docs) if not (grams(d) & bset)]
    t = pa.table({"doc_id": pa.array(list(range(200)), type=pa.int64()), "text": docs})
    got = (
        decontaminate(
            rd.from_arrow(t).repartition(4), "text", rd.from_arrow(pa.table({"text": bench})), n=n
        )
        .to_pandas()["doc_id"]
        .sort_values()
        .tolist()
    )
    assert got == want_clean
    assert 0 < len(got) < 200  # the test corpus genuinely splits


def test_chunk_documents_matches_python_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import chunk_documents

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=int(n))) for n in rng.integers(1, 60, 50)]
    texts += ["", None, "solo"]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts, type=pa.string())})

    def ref(text, max_tokens, overlap):
        toks = text.split() if text else []
        stride = max_tokens - overlap
        out = []
        i = 0
        while i < len(toks):
            out.append(" ".join(toks[i : i + max_tokens]))
            i += stride
        return out

    for max_tokens, overlap, parts in ((8, 0, 3), (8, 3, 1), (5, 4, 4)):
        got = (
            chunk_documents(
                rd.from_arrow(t).repartition(parts), "doc_id", "text",
                max_tokens=max_tokens, overlap=overlap,
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
        )
        for did, text in zip(ids, texts):
            want = ref(text, max_tokens, overlap)
            sub = got[got["doc_id"] == did]
            assert sub["chunk"].tolist() == want, (did, max_tokens, overlap)
            assert sub["chunk_id"].tolist() == list(range(len(want)))
            assert (sub["n_chunk_tokens"] == sub["chunk"].str.split().str.len()).all()
        # reconstruction invariant at overlap=0
        if overlap == 0:
            rec = got.groupby("doc_id")["chunk"].apply(" ".join)
            for did, text in zip(ids, texts):
                if text and text.split():
                    assert rec[did] == " ".join(text.split())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(t), "doc_id", "text", max_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(t), "doc_id", "text", max_tokens=4, overlap=4)


def test_dsir_weights_match_single_pass_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import (
        dsir_bucket_counts,
        dsir_logratio_vector,
        dsir_weights,
        hashed_ngram_buckets,
    )

    rng = np.random.default_rng(7)
    sci = ["protein", "enzyme", "genome", "catalysis", "neuron"]
    web = ["click", "buy", "sale", "free", "login", "page"]
    texts = [" ".join(rng.choice(sci if i % 3 == 0 else web, size=12)) for i in range(90)]
    texts += ["", None]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts, type=pa.string())})
    raw = rd.from_arrow(t).repartition(5)
    tgt_t = t.filter(pa.array([i % 3 == 0 for i in ids]))
    tgt = rd.from_arrow(tgt_t).repartition(3)

    n_buckets = 512
    got = (
        dsir_weights(raw, "text", tgt, n_buckets=n_buckets)
        .to_pandas()
        .sort_values("doc_id")["dsir_logratio"]
        .to_numpy()
    )

    # single-pass reference: same feature map, whole corpus in one table
    def counts(tab):
        _, b = hashed_ngram_buckets(tab["text"], (1, 2), n_buckets)
        return np.bincount(b, minlength=n_buckets).astype(np.int64)

    lr = dsir_logratio_vector(counts(tgt_t), counts(t))
    i, b = hashed_ngram_buckets(t["text"], (1, 2), n_buckets)
    want = np.bincount(i, weights=lr[b], minlength=len(ids))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)

    # distributed counts match the single-pass counts exactly
    np.testing.assert_array_equal(dsir_bucket_counts(raw, n_buckets=n_buckets), counts(t))

    # science-like docs (the target domain) must outscore web-like docs
    sci_scores = [s for did, s in zip(ids, want) if did % 3 == 0 and texts[did]]
    web_scores = [s for did, s in zip(ids, want) if did % 3 != 0 and texts[did]]
    assert min(sci_scores) > max(web_scores)
    # empty/null docs carry zero evidence
    assert got[-1] == 0.0 and got[-2] == 0.0


def test_dsir_logratio_vector_validation():
    import numpy as np
    import pytest as _pytest

    from anomalydetection_ray.functions.text import dsir_logratio_vector

    with _pytest.raises(ValueError):
        dsir_logratio_vector(np.zeros(4, dtype=np.int64), np.zeros(8, dtype=np.int64))
    with _pytest.raises(ValueError):
        dsir_logratio_vector(np.zeros(4, dtype=np.int64), np.zeros(4, dtype=np.int64), alpha=0)
    # all-empty corpora degrade to a uniform/uniform ratio: exactly zero
    lr = dsir_logratio_vector(np.zeros(4, dtype=np.int64), np.zeros(4, dtype=np.int64))
    assert (lr == 0).all()


def test_dsir_resample_proportional_and_deterministic(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import dsir_resample

    rng = np.random.default_rng(11)
    sci = ["protein", "enzyme", "genome", "catalysis", "neuron"]
    web = ["click", "buy", "sale", "free", "login", "page"]
    texts = [" ".join(rng.choice(sci if i < 40 else web, size=10)) for i in range(200)]
    ids = list(range(len(texts)))
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts, type=pa.string())})
    tgt = rd.from_arrow(t.slice(0, 40))  # pure science target

    picked = dsir_resample(
        rd.from_arrow(t).repartition(4), "doc_id", "text", tgt, n=30, n_buckets=256
    )
    picked_ids = sorted(picked["doc_id"].to_pylist())
    assert len(picked_ids) == 30 and len(set(picked_ids)) == 30
    # overwhelmingly science docs: their weights dwarf the web docs'
    assert sum(1 for d in picked_ids if d < 40) >= 25
    # deterministic across runs and block layouts
    again = dsir_resample(
        rd.from_arrow(t).repartition(9), "doc_id", "text", tgt, n=30, n_buckets=256
    )
    assert sorted(again["doc_id"].to_pylist()) == picked_ids
    assert "__dsir_w" not in picked.column_names


def test_pack_sequences_invariants(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import pack_sequences

    rng = np.random.default_rng(5)
    toks = rng.integers(1, 50, 300).astype("int64")
    t = pa.table({"doc_id": pa.array(np.arange(300), type=pa.int64()), "n_tokens": pa.array(toks)})

    for sort_flag, parts in ((False, 1), (False, 6), (True, 6)):
        got = (
            pack_sequences(
                rd.from_arrow(t).repartition(parts), "doc_id", "n_tokens", budget=100,
                sort_within_block=sort_flag,
            )
            .to_pandas()
        )
        # every input row appears exactly once
        assert sorted(got["doc_id"]) == list(range(300))
        g = got.groupby("seq_id")
        # budget respected, seq_tokens is the true fill, positions 0..k-1
        assert (g["n_tokens"].sum() <= 100).all()
        assert (g["n_tokens"].sum() == g["seq_tokens"].first()).all()
        assert (got["seq_tokens"] == got.groupby("seq_id")["seq_tokens"].transform("first")).all()
        for _, sub in g:
            assert sorted(sub["seq_pos"]) == list(range(len(sub)))
        # seq key is the first member's id (pos 0 row)
        first = got[got["seq_pos"] == 0]
        assert (first["seq_id"] == first["doc_id"]).all()
        # packing is tight: next-fit waste is < max item size per bin
        fill = g["n_tokens"].sum().mean()
        assert fill > 50  # mean item 25, so >=2 items/bin minimum

    # single-block, unsorted: sequences are contiguous runs in row order
    one = pack_sequences(rd.from_arrow(t), "doc_id", "n_tokens", budget=100).to_pandas()
    changes = (one["seq_id"] != one["seq_id"].shift()).cumsum()
    assert changes.is_monotonic_increasing
    assert one.groupby("seq_id")["doc_id"].apply(
        lambda s: (np.diff(np.sort(s)) == 1).all()
    ).all()


def test_pack_sequences_oversize_and_errors(ray_session):
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from anomalydetection_ray.functions.text import pack_sequences

    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "n_tokens": pa.array([10, 500, 10], type=pa.int64())})
    with _pytest.raises(Exception, match="budget"):
        pack_sequences(rd.from_arrow(t), "doc_id", "n_tokens", budget=100).materialize()
    got = (
        pack_sequences(rd.from_arrow(t), "doc_id", "n_tokens", budget=100, allow_oversize=True)
        .to_pandas()
        .sort_values("doc_id")
    )
    over = got[got["doc_id"] == 2]
    assert (over["seq_id"] == 2).all() and (over["seq_tokens"] == 500).all() and len(over) == 1

    bad = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                    "n_tokens": pa.array([None], type=pa.int64())})
    with _pytest.raises(Exception, match="null"):
        pack_sequences(rd.from_arrow(bad), "doc_id", "n_tokens", budget=100).materialize()
    with _pytest.raises(ValueError):
        pack_sequences(rd.from_arrow(t), "doc_id", "n_tokens", budget=0)


def test_pack_sequences_composes_with_chunking(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import chunk_documents, pack_sequences

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=int(k))) for k in rng.integers(5, 400, 40)]
    t = pa.table({"doc_id": pa.array(np.arange(40), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    chunks = chunk_documents(rd.from_arrow(t).repartition(3), "doc_id", "text", max_tokens=64)

    def key(tb):
        import pyarrow.compute as pc
        k = pc.binary_join_element_wise(
            pc.cast(tb["doc_id"], pa.string()), pc.cast(tb["chunk_id"], pa.string()), ":"
        )
        return tb.append_column("chunk_key", k)

    keyed = chunks.map_batches(key, batch_format="pyarrow", batch_size=None)
    packed = pack_sequences(keyed, "chunk_key", "n_chunk_tokens", budget=256).to_pandas()
    assert (packed.groupby("seq_id")["n_chunk_tokens"].sum() <= 256).all()
    total_chunks = chunks.count()
    assert len(packed) == total_chunks


def test_decontaminate_bloom_mode_matches_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import decontaminate

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(120)]
    corpus = pa.table({"doc_id": pa.array(np.arange(120), type=pa.int64()),
                       "text": pa.array(texts, type=pa.string())})
    # bench: 10 fresh prompts plus verbatim copies of 6 corpus docs
    bench_texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(10)]
    bench_texts += [texts[i] for i in (3, 17, 40, 77, 90, 119)]
    bench = pa.table({"text": pa.array(bench_texts, type=pa.string())})

    for parts in (1, 4):
        ds = rd.from_arrow(corpus).repartition(parts)
        bds = rd.from_arrow(bench).repartition(parts)
        exact = decontaminate(ds, "text", bds, n=8).to_pandas()["doc_id"].tolist()
        bloom = decontaminate(ds, "text", bds, n=8, mode="bloom", fp_rate=1e-9).to_pandas()[
            "doc_id"
        ].tolist()
        # no false negatives ever; at fp 1e-9 on this corpus no false
        # positives either -> identical output
        assert sorted(bloom) == sorted(exact)
        for leaked in (3, 17, 40, 77, 90, 119):
            assert leaked not in bloom
    # flag variant agrees too
    fe = decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(bench), n=8,
                       flag_col="c").to_pandas().sort_values("doc_id")["c"].tolist()
    fb = decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(bench), n=8,
                       mode="bloom", fp_rate=1e-9, flag_col="c").to_pandas().sort_values("doc_id")["c"].tolist()
    assert fe == fb
    # capacity contract still enforced loudly in bloom mode
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bench_ngrams"):
        decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(bench), n=2,
                      mode="bloom", max_bench_ngrams=1).to_pandas()
    with _pytest.raises(ValueError, match="mode"):
        decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(bench), mode="nope")
    # empty bench set: everything clean
    empty = pa.table({"text": pa.array([], type=pa.string())})
    out = decontaminate(rd.from_arrow(corpus), "text", rd.from_arrow(empty), n=8,
                        mode="bloom").to_pandas()
    assert len(out) == 120


def test_bloom_view_bytes_zero_copy_probe():
    import numpy as np

    from anomalydetection_ray.sketches.bloom import BloomFilter

    vals = np.arange(1000, dtype=np.uint64)
    bf = BloomFilter(1000, 1e-6).update(vals)
    raw = bf.to_bytes()
    view = BloomFilter.view_bytes(raw)
    assert view.contains(vals).all()
    assert not view.contains(np.arange(10_000, 11_000, dtype=np.uint64)).any()
    # the view is read-only: mutation must fail, not silently corrupt
    import pytest as _pytest

    with _pytest.raises((ValueError, TypeError)):
        view.update(np.array([7], dtype=np.uint64))


def test_normalize_and_strip_markup_and_encoding_damage():
    import pyarrow as pa

    from anomalydetection_ray.functions.text import (
        encoding_damage_batch,
        normalize_text_batch,
        strip_markup_batch,
    )

    true = "caf" + chr(0xE9) + " said " + chr(0x201C) + "hello" + chr(0x201D) + " " + chr(0x2014) + " fine"

    def damage(s, enc):
        raw = s.encode("utf-8")
        try:
            return raw.decode(enc)
        except UnicodeDecodeError:
            return raw.decode("latin-1")

    tb = pa.table({"text": [
        damage(true, "cp1252"),   # latin-1 fallback (0x9D unmapped in cp1252)
        damage("caf" + chr(0xE9) + " ok", "cp1252"),  # pure cp1252 artifact
        "<p>Hi &amp; bye</p>\n\n  spaced\tout  ",
        "e" + chr(0x301) + "tude",  # decomposed -> NFC composes
        None,
    ]})
    out = normalize_text_batch(strip_markup_batch(tb))["text"].to_pylist()
    assert out[0] == true
    assert out[1] == "caf" + chr(0xE9) + " ok"
    assert out[2] == "Hi & bye spaced out"
    assert out[3] == chr(0xE9) + "tude"
    assert out[4] == ""
    # no-mojibake-fix variant leaves artifacts; NFD form supported
    raw = normalize_text_batch(tb, fix_mojibake=False)["text"].to_pylist()
    assert raw[1] != out[1]
    nfd = normalize_text_batch(tb, form="NFD")["text"].to_pylist()
    assert nfd[3] == "e" + chr(0x301) + "tude"

    ppm = encoding_damage_batch(tb)["mojibake_ppm"].to_pylist()
    assert ppm[0] > 0 and ppm[1] > 0 and ppm[2] == 0 and ppm[4] == 0
    # replacement char counts as damage
    rep = pa.table({"text": ["ok " + chr(0xFFFD) + " bad"]})
    assert encoding_damage_batch(rep)["mojibake_ppm"].to_pylist()[0] > 0


def test_strip_markup_no_double_unescape():
    import pyarrow as pa

    from anomalydetection_ray.functions.text import strip_markup_batch

    # escaped-escaped markup (HTML tutorials / code samples) must decode
    # ONE level: '&amp;lt;' -> '&lt;', never '<'
    tb = pa.table({"text": ["&amp;lt;b&amp;gt;bold&amp;lt;/b&amp;gt;", "a &amp;&amp; b"]})
    out = strip_markup_batch(tb)["text"].to_pylist()
    assert out[0] == "&lt;b&gt;bold&lt;/b&gt;"
    assert out[1] == "a && b"


def test_trigram_window_kernel_survives_lone_surrogates():
    # Arrow string columns can never carry lone surrogates, but the
    # trigram kernel is also a direct-Python API; it must tolerate
    # damaged text like every other kernel (surrogatepass), not crash
    # on encode('utf-32-le')
    import numpy as np

    from anomalydetection_ray.functions.text import _pack_trigram_windows

    packed, doc_idx, mask = _pack_trigram_windows(["the quick", "bad \udc80\udc81 bytes", None])
    assert len(packed) == len(doc_idx) == len(mask) > 0
    assert set(np.unique(doc_idx)).issubset({0, 1, 2})


def test_normalize_text_batch_in_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import normalize_text_batch

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array(["  a  b ", None], type=pa.string())})
    got = (
        rd.from_arrow(t)
        .map_batches(normalize_text_batch, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("doc_id")["text"]
        .tolist()
    )
    assert got == ["a b", ""]


# --------------------------------------------------- lexical diversity / zipf


def _lex_docs():
    import pyarrow as pa

    return pa.table({
        "lang": pa.array(["en", "en", "de", "de", None], type=pa.string()),
        "text": pa.array(
            ["a b a c", "b b a", "x y", "y z y", "a a"], type=pa.string()
        ),
    })


def test_grouped_lexical_diversity_exact_counts(ray_session):
    import ray.data as rd

    from anomalydetection_ray.functions.text import grouped_lexical_diversity

    for blocks in (1, 3):
        out = grouped_lexical_diversity(
            rd.from_arrow(_lex_docs()).repartition(blocks), group_col="lang"
        ).set_index("lang")
        # en: tokens a b a c b b a -> 7 total, {a,b,c}=3 distinct
        # en bigrams: (a b, b a, a c) + (b b, b a) -> {a b, b a, a c, b b}=4
        assert out.loc["en", "tokens_total"] == 7
        assert out.loc["en", "distinct_tokens"] == 3
        assert out.loc["en", "distinct_bigrams"] == 4
        assert out.loc["en", "ttr"] == round(3 / 7, 6)
        # de: x y y z y -> 5 total, {x,y,z}=3; bigrams {x y, y z, z y}=3
        assert out.loc["de", "tokens_total"] == 5
        assert out.loc["de", "distinct_tokens"] == 3
        assert out.loc["de", "distinct_bigrams"] == 3
        # HLL linear counting over a tiny vocabulary is near-exact
        assert abs(out.loc["en", "hll_distinct_est"] - 3.0) < 0.05
        # null group kept as its own group (SQL GROUP BY semantics)
        assert out.loc[None, "tokens_total"] == 2


def test_grouped_lexical_diversity_global_zipf(ray_session):
    import numpy as np
    import ray.data as rd

    from anomalydetection_ray.functions.text import grouped_lexical_diversity

    out = grouped_lexical_diversity(
        rd.from_arrow(_lex_docs()).repartition(2), group_col=None, zipf_top_n=10
    )
    assert len(out) == 1 and out.loc[0, "group"] == "__all__"
    # global: a x5, b x3, y x3, c/x/z x1 -> 14 tokens, 6 distinct
    assert out.loc[0, "tokens_total"] == 14
    assert out.loc[0, "distinct_tokens"] == 6
    assert out.loc[0, "zipf_top_token"] == "a" and out.loc[0, "zipf_top_count"] == 5
    assert out.loc[0, "zipf_n_ranks"] == 6
    # closed-form regr_slope over (ln rank, ln cnt): counts desc, term asc
    cnt = np.array([5, 3, 3, 1, 1, 1], dtype=float)
    x, y = np.log(np.arange(1, 7, dtype=float)), np.log(cnt)
    dx = x - x.mean()
    want = round(float((dx * (y - y.mean())).sum() / (dx * dx).sum()), 6)
    assert out.loc[0, "zipf_slope"] == want


def test_token_zipf_slope_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.text import token_zipf_slope

    one = rd.from_arrow(pa.table({"text": pa.array(["solo solo solo"])}))
    r = token_zipf_slope(one)
    assert r["n_ranks"] == 1 and r["zipf_slope"] is None and r["top_token"] == "solo"

    empty = rd.from_arrow(pa.table({"text": pa.array([], type=pa.string())}))
    r = token_zipf_slope(empty)
    assert r["n_ranks"] == 0 and r["zipf_slope"] is None


def test_corpus_totals_degenerate_single_token_corpus(ray_session, tmp_path):
    """Round-5 review: a corpus with < 2 ranked tokens has no Zipf slope
    (SQL regr_slope is NULL on one point) — the engine row must carry a
    null, not crash on float(None)."""
    import os

    import pyarrow.parquet as pq

    from anomalydetection_ray.pipelines.queries import corpus_totals_docs

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["hello hello hello", "hello"], type=pa.string()),
        "lang": pa.array(["en", "en"], type=pa.string()),
        "source": pa.array(["s", "s"], type=pa.string()),
        "n_chars": pa.array([17, 5], type=pa.int64()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = corpus_totals_docs(str(tmp_path))
    row = out.iloc[0] if hasattr(out, "iloc") else out.to_pandas().iloc[0]
    assert row["distinct_tokens"] == 1
    assert row["zipf_slope"] is None or (
        isinstance(row["zipf_slope"], float) and np.isnan(row["zipf_slope"])
    )
    assert row["zipf_top_token"] == "hello"
    assert row["zipf_n_ranks"] == 1


def test_winnow_containment_pairs_string_ids(ray_session):
    """Round-5 review: the pair schema hardcoded int64 ids — string-id
    corpora crashed mid-shuffle and numeric-string ids silently coerced.
    The pair columns now mirror the input id type."""
    import ray.data as rd

    from anomalydetection_ray.functions.text import winnow_containment_pairs
    from anomalydetection_ray.pipelines.queries import as_table

    shared = "the quick brown fox jumps over the lazy dog again and again " * 3
    t = pa.table({
        "doc_id": pa.array(["doc-a", "doc-b", "doc-c"], type=pa.string()),
        "text": pa.array([shared + " unique one tail",
                          shared + " other distinct tail",
                          "completely different content with nothing in common here"]),
    })
    out = as_table(winnow_containment_pairs(
        rd.from_arrow(t).repartition(2), k=6, w=8, min_shared=2
    )).to_pandas()
    assert set(out.columns) == {"a", "b", "shared"}
    assert len(out) == 1
    assert (out.iloc[0]["a"], out.iloc[0]["b"]) == ("doc-a", "doc-b")
    # unsupported id types fail loudly at plan-build time
    bad = rd.from_arrow(pa.table({
        "doc_id": pa.array([1.5, 2.5]), "text": pa.array(["x", "y"])
    }))
    with pytest.raises(ValueError, match="unsupported id column type"):
        winnow_containment_pairs(bad)
