"""Edit-distance similarity join (dedup/fuzzy.py): Myers bit-parallel
kernel vs a DP reference, PassJoin blocking completeness vs brute force,
DuckDB levenshtein parity on real documents, and contract edges."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _dp(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_myers_kernel_matches_dp_reference():
    """Bit-parallel Levenshtein vs the classic DP over random byte pairs
    covering empty strings, the m=64 word boundary, low-alphabet strings
    (dense matches) and bounded mutations (the operator's hot regime)."""
    from anomalydetection_ray.dedup.fuzzy import levenshtein_bytes_batch

    rng = random.Random(7)
    pairs = []
    for _ in range(900):
        la, lb = rng.randint(0, 64), rng.randint(0, 64)
        alpha = rng.choice(["ab", "abc", "abcdefgh"])
        pairs.append((
            bytes(ord(rng.choice(alpha)) for _ in range(la)),
            bytes(ord(rng.choice(alpha)) for _ in range(lb)),
        ))
    for _ in range(600):
        l = rng.randint(1, 64)
        a = bytes(rng.randrange(256) for _ in range(l))
        b = bytearray(a)
        for _ in range(rng.randint(0, 3)):
            op = rng.choice("sid")
            if op == "s" and b:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op == "i" and len(b) < 64:
                b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
            elif op == "d" and b:
                del b[rng.randrange(len(b))]
        pairs.append((a, bytes(b)))
    # exact 64-byte identical + off-by-one (word-boundary carries)
    full = bytes(range(64))
    pairs += [(full, full), (full, full[:-1] + b"\xff"), (full, full[1:]), (b"", full)]

    fa = np.frombuffer(b"".join(p[0] for p in pairs), np.uint8)
    fb = np.frombuffer(b"".join(p[1] for p in pairs), np.uint8)
    la = np.array([len(p[0]) for p in pairs], np.int64)
    lb = np.array([len(p[1]) for p in pairs], np.int64)
    sa = np.concatenate(([0], np.cumsum(la)))[:-1]
    sb = np.concatenate(([0], np.cumsum(lb)))[:-1]
    got = levenshtein_bytes_batch(fa, sa, la, fb, sb, lb)
    want = np.array([_dp(a, b) for a, b in pairs])
    assert (got == want).all()


def _mutant_corpus(seed: int, n: int) -> list[str]:
    """Random strings + ≤2-edit mutants — guarantees true positives at
    every k the completeness test sweeps."""
    rng = random.Random(seed)
    strs = []
    for _ in range(n):
        l = rng.randint(0, 40)
        s = "".join(rng.choice("abcdefgh ") for _ in range(l))
        strs.append(s)
        if rng.random() < 0.6:
            b = bytearray(s.encode())
            for _ in range(rng.randint(1, 2)):
                op = rng.choice("sid")
                if op == "s" and b:
                    b[rng.randrange(len(b))] = ord(rng.choice("abcdefgh "))
                elif op == "i" and len(b) < 60:
                    b.insert(rng.randrange(len(b) + 1), ord(rng.choice("abcdefgh ")))
                elif op == "d" and b:
                    del b[rng.randrange(len(b))]
            strs.append(b.decode())
    return strs


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_blocking_completeness_vs_brute_force(ray_session, k):
    """The PassJoin pigeonhole blocking must be LOSSLESS: every pair the
    O(n²) DP finds must come out of the distributed plan, exactly once,
    with the exact distance."""
    import ray.data as rd

    from anomalydetection_ray.dedup.fuzzy import edit_distance_pairs

    strs = _mutant_corpus(42, 120)
    enc = [s.encode() for s in strs]
    n = len(strs)
    want = {
        (i, j, d)
        for i in range(n)
        for j in range(i + 1, n)
        for d in (_dp(enc[i], enc[j]),)
        if d <= k
    }
    assert want  # the mutant families guarantee true positives
    t = pa.table({"id": pa.array(range(n), pa.int64()), "key": pa.array(strs)})
    out = edit_distance_pairs(
        rd.from_arrow(t).repartition(4), "id", "key", k=k, size_hint_bytes=0
    ).to_pandas()
    got = set(zip(out.id_a, out.id_b, out.dist))
    assert got == want


def test_duckdb_levenshtein_parity_both_plans(ray_session, sf_oracle):
    """Both rungs vs DuckDB's byte-level levenshtein over 16-codepoint
    document prefixes (substr is codepoint-based on both sides; distance
    is byte-based on both sides; 16 codepoints is ≤ 64 bytes even at
    4-byte UTF-8, so the key cap can never trip on corpus changes) —
    identical pair sets, identical distances."""
    import duckdb
    import ray.data as rd

    from anomalydetection_ray.dedup.fuzzy import edit_distance_pairs
    from anomalydetection_ray.sources import read_table

    def keyed(tb: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": tb["doc_id"], "key": pc.utf8_slice_codeunits(tb["text"], 0, 16)}
        )

    ds = read_table(sf_oracle, "documents").map_batches(
        keyed, batch_format="pyarrow", batch_size=None
    )
    want = duckdb.sql(
        f"""
        WITH d AS (SELECT doc_id, substr(text, 1, 16) AS key
                   FROM read_parquet('{sf_oracle}/documents.parquet')
                   WHERE text IS NOT NULL)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.key, b.key) <= 2
        """
    ).df()
    w = set(map(tuple, want.values.tolist()))
    assert len(w) > 10  # the corpus's near-dup families share prefixes
    for hint in (1 << 20, 0):  # driver rung, then forced-distributed rung
        out = edit_distance_pairs(ds, "doc_id", "key", k=2, size_hint_bytes=hint).to_pandas()
        assert set(map(tuple, out[["id_a", "id_b", "dist"]].values.tolist())) == w


def test_contract_edges(ray_session):
    import ray.data as rd

    from anomalydetection_ray.dedup.fuzzy import MAX_KEY_BYTES, edit_distance_pairs

    # null keys never pair; exact duplicates pair at dist 0
    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "key": pa.array(["same", "same", None, None]),
        }
    )
    out = edit_distance_pairs(rd.from_arrow(t), "id", "key", k=1).to_pandas()
    assert out[["id_a", "id_b", "dist"]].values.tolist() == [[1, 2, 0]]

    # over-long keys raise loudly (no silent truncation)
    long = pa.table(
        {"id": pa.array([1], pa.int64()), "key": pa.array(["x" * (MAX_KEY_BYTES + 1)])}
    )
    with pytest.raises(Exception, match="MAX_KEY_BYTES"):
        edit_distance_pairs(rd.from_arrow(long), "id", "key").to_pandas()

    # non-integer ids raise up front
    sid = pa.table({"id": pa.array(["a"]), "key": pa.array(["x"])})
    with pytest.raises(ValueError, match="integer id"):
        edit_distance_pairs(rd.from_arrow(sid), "id", "key")

    # null ids raise loudly on both plans (exact_dedup contract)
    nid = pa.table({"id": pa.array([1, None], pa.int64()), "key": pa.array(["x", "y"])})
    with pytest.raises(Exception, match="non-null ids"):
        edit_distance_pairs(rd.from_arrow(nid), "id", "key").to_pandas()

    with pytest.raises(ValueError, match="k must be"):
        edit_distance_pairs(rd.from_arrow(t), "id", "key", k=-1)

    # empty input: zero rows, and the driver rung's Dataset still carries
    # the stable output schema (Ray's to_pandas drops columns on ANY
    # empty dataset, so assert on schema(), not the pandas conversion)
    empty = pa.table({"id": pa.array([], pa.int64()), "key": pa.array([], pa.string())})
    out = edit_distance_pairs(rd.from_arrow(empty), "id", "key", size_hint_bytes=1)
    assert [f.name for f in out.schema().base_schema] == ["id_a", "id_b", "dist"]
    assert out.count() == 0
    assert edit_distance_pairs(rd.from_arrow(empty), "id", "key", size_hint_bytes=0).count() == 0


def test_dense_bucket_guard(ray_session):
    """A hot shared segment (constant keys) must raise the documented
    max_block_pairs error, not go quietly quadratic."""
    import ray.data as rd

    from anomalydetection_ray.dedup.fuzzy import edit_distance_pairs

    t = pa.table(
        {
            "id": pa.array(range(200), pa.int64()),
            "key": pa.array(["constant-key"] * 200),
        }
    )
    with pytest.raises(Exception, match="max_block_pairs"):
        edit_distance_pairs(
            rd.from_arrow(t), "id", "key", k=1, max_block_pairs=100
        ).to_pandas()


def test_fuzzy_dedup_survivors_match_union_find_reference(ray_session, sf_oracle):
    """fuzzy_dedup = min-id survivor per edit-distance component. The
    pair graph is DuckDB-paritied separately (test above), so the
    reference closure is a python union-find over those same pairs."""
    import duckdb
    import ray.data as rd

    from anomalydetection_ray.dedup import fuzzy_dedup
    from anomalydetection_ray.sources import read_table

    def keyed(tb: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": tb["doc_id"], "key": pc.utf8_slice_codeunits(tb["text"], 0, 16)}
        )

    ds = read_table(sf_oracle, "documents").map_batches(
        keyed, batch_format="pyarrow", batch_size=None
    )
    pairs = duckdb.sql(
        f"""
        WITH d AS (SELECT doc_id, substr(text, 1, 16) AS key
                   FROM read_parquet('{sf_oracle}/documents.parquet')
                   WHERE text IS NOT NULL)
        SELECT a.doc_id AS ia, b.doc_id AS ib
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.key, b.key) <= 2
        """
    ).df()
    all_ids = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_oracle}/documents.parquet')"
    ).df()["doc_id"].tolist()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for ia, ib in pairs.values.tolist():
        ra, rb = find(ia), find(ib)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    drops = {i for i in all_ids if find(i) != i}
    want = sorted(set(all_ids) - drops)

    got = sorted(
        fuzzy_dedup(ds, "doc_id", "key", k=2).to_pandas()["doc_id"].tolist()
    )
    assert got == want
    assert len(want) < len(all_ids)  # the corpus really has fuzzy dups


def test_fuzzy_dedup_hand_case(ray_session):
    """Transitive chain a~b~c collapses to one survivor even when a and c
    are farther than k apart."""
    import ray.data as rd

    from anomalydetection_ray.dedup import fuzzy_dedup

    t = pa.table(
        {
            "id": pa.array([10, 5, 7, 99], pa.int64()),
            # 5~7 (dist 1), 7~10 (dist 1), 5 vs 10 dist 2 > k=1; 99 alone
            "key": pa.array(["abcdx", "abcde", "abcdz", "zzzzz"]),
        }
    )
    out = sorted(fuzzy_dedup(rd.from_arrow(t), "id", "key", k=1).to_pandas()["id"].tolist())
    assert out == [5, 99]
