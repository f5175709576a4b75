"""BPE tokenizer training + encode: brute-force reference parity, layout
invariance, encode invariants, contract guards."""

from __future__ import annotations

import pyarrow as pa
import pytest

from anomalydetection_ray.functions.bpe import (
    _EOW,
    BpeEncoderStage,
    bpe_encode,
    bpe_train,
    word_counts,
)


def _ref_merges(word_cnt: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Brute-force Sennrich reference: recount ALL pairs every iteration,
    max count with lexicographically-smallest tie-break."""
    syms = {w: list(w[:-1]) + [w[-1] + _EOW] for w in word_cnt if w}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for p in zip(s, s[1:]):
                counts[p] = counts.get(p, 0) + word_cnt[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        j = best[0] + best[1]
        for w, s in syms.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    ns.append(j)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return merges


CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3 + ["low lower", "newest low"]
)


def test_bpe_train_matches_reference_and_layout(ray_session):
    import ray.data as rd

    docs = pa.table({"text": CORPUS + [None, ""]})
    # expected word counts from the corpus above
    want_wc = {"low": 7, "lower": 3, "newest": 7, "widest": 3}
    ref = _ref_merges(want_wc, 12)

    for parts in (1, 4):
        ds = rd.from_arrow(docs).repartition(parts)
        wc = pa.concat_tables(
            list(word_counts(ds).iter_batches(batch_format="pyarrow", batch_size=None))
        )
        got_wc = dict(zip(wc["word"].to_pylist(), wc["cnt"].to_pylist()))
        assert got_wc == want_wc
        merges = bpe_train(ds, n_merges=12)
        assert merges == ref

    # the classic first merge on this corpus: ('e', 's') inside newest/widest
    assert ref[0] == ("e", "s")
    # n_merges past convergence stops early rather than padding
    full = bpe_train(rd.from_arrow(docs), n_merges=1000)
    assert len(full) < 1000 and full[: len(ref)] == ref


def test_bpe_encode_invariants(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": CORPUS}))
    merges = bpe_train(ds, n_merges=8)
    enc = pa.concat_tables(
        list(
            bpe_encode(
                rd.from_arrow(pa.table({"text": ["low lower unseen", None, ""]})), merges
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    toks = enc["bpe_tokens"].to_pylist()
    # reconstruction: concatenating a word's tokens restores word + EOW
    flat = "".join(toks[0])
    assert flat == "low" + _EOW + "lower" + _EOW + "unseen" + _EOW
    assert enc["n_bpe_merged"].to_pylist() == [len(toks[0]), 0, 0]
    assert toks[1] == [] and toks[2] == []

    # full convergence: every trained word becomes ONE token
    full = bpe_train(ds, n_merges=1000)
    stage = BpeEncoderStage(full)
    one = stage(pa.table({"text": ["newest widest"]}))
    assert one["bpe_tokens"].to_pylist()[0] == ["newest" + _EOW, "widest" + _EOW]
    # unseen words still segment into learned subwords, never drop
    ow = stage(pa.table({"text": ["lowest"]}))["bpe_tokens"].to_pylist()[0]
    assert "".join(ow) == "lowest" + _EOW and len(ow) >= 2


def test_bpe_guards(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"text": ["a b c"]}))
    with pytest.raises(ValueError, match="positive"):
        bpe_train(ds, n_merges=0)
    with pytest.raises(ValueError, match="max_words"):
        bpe_train(ds, n_merges=2, max_words=2)


def test_bpe_reserved_marker_char_is_a_separator(ray_session):
    """Literal U+2581 in corpus text (e.g. re-processing sentencepiece
    output) must not masquerade as an end-of-word symbol: it is treated
    as a word separator in BOTH training and encode (round-5 review:
    an in-word marker conflated merge statistics)."""
    import pyarrow as pa
    import ray.data as rd

    from anomalydetection_ray.functions.bpe import word_counts

    t = pa.table({"text": pa.array(["a▁b a b", "a▁b"], type=pa.string())})
    wc = word_counts(rd.from_arrow(t)).to_pandas().set_index("word")["cnt"].to_dict()
    # "a▁b" splits into words a + b on both rows
    assert wc == {"a": 3, "b": 3}
