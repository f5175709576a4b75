"""CSV / JSONL ingestion: schema enforcement, malformed-row policies,
round-trip equality vs the Parquet path (sources/ingest.py)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from anomalydetection_ray.sources.ingest import read_csv_table, read_jsonl_table

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)

CODE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)


def _as_sorted_table(ds, key: str) -> pa.Table:
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    )
    return t.sort_by(key).combine_chunks()


@pytest.fixture(scope="module")
def code_table() -> pa.Table:
    # adversarial content: embedded newlines, quotes, commas, unicode —
    # everything quoted CSV and JSON strings must round-trip
    rows = [
        ("r0", "a/b.py", "c" * 40, "python", 'x = "1,2"\nprint(x)\n'),
        ("r0", "a/c.js", "d" * 40, "javascript", "// π≈3.14159\nlet s = 'a\\nb';\n"),
        ("r1", "src/m.rs", "e" * 40, "rust", 'fn main() {\n    println!("hi, world");\n}\n'),
        ("r1", "src/n.go", "f" * 40, "go", ""),
        ("r2", "x.rb", "0" * 40, None, "puts :sym\n"),
    ]
    return pa.Table.from_pylist(
        [dict(zip([f.name for f in CODE_SCHEMA], r)) for r in rows], schema=CODE_SCHEMA
    )


def test_csv_roundtrip_documents(ray_session, sf_smoke, tmp_path):
    """Parquet → CSV → read_csv_table equals the Parquet read exactly."""
    src = pq.read_table(f"{sf_smoke}/documents.parquet").select(
        [f.name for f in DOC_SCHEMA]
    )
    csv_path = tmp_path / "documents.csv"
    pacsv.write_csv(src, csv_path)
    got = _as_sorted_table(read_csv_table(str(csv_path), DOC_SCHEMA), "doc_id")
    assert got.schema == DOC_SCHEMA
    assert got.equals(src.sort_by("doc_id").combine_chunks())


def test_csv_roundtrip_code_corpus(ray_session, tmp_path, code_table):
    """Quoted newlines / commas / unicode in content survive CSV."""
    csv_path = tmp_path / "code.csv"
    pacsv.write_csv(code_table, csv_path)
    got = _as_sorted_table(read_csv_table(str(csv_path), CODE_SCHEMA), "path")
    assert got.equals(code_table.sort_by("path").combine_chunks())


def test_csv_no_type_inference(ray_session, tmp_path):
    """A digits-only commit column must stay string (schema wins over
    inference — the reference's 'is it a label?' heuristic, inverted)."""
    p = tmp_path / "t.csv"
    p.write_text("repo,commit\nr0,0001230\nr1,0456\n")
    sch = pa.schema([("repo", pa.string()), ("commit", pa.string())])
    got = _as_sorted_table(read_csv_table(str(p), sch), "repo")
    assert got["commit"].to_pylist() == ["0001230", "0456"]


def test_csv_malformed_policies(ray_session, tmp_path):
    """Wrong-column-count rows: skip drops exactly them; error aborts."""
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,x\n2,y,EXTRA,COLS\n3,z\n")
    sch = pa.schema([("a", pa.int64()), ("b", pa.string())])
    got = _as_sorted_table(read_csv_table(str(p), sch, on_malformed="skip"), "a")
    assert got["a"].to_pylist() == [1, 3]
    with pytest.raises(Exception):
        read_csv_table(str(p), sch, on_malformed="error").materialize()


def test_csv_type_invalid_values_skip(ray_session, tmp_path):
    """A value failing TYPE conversion (not just column count) must not
    abort the scan in skip mode — only its row drops; empty fields stay
    legitimate typed nulls."""
    p = tmp_path / "badval.csv"
    p.write_text("a,b,f,when\n1,x,1.5,2021-01-02T00:00:00\nabc,y,2.5,2021-01-03T00:00:00\n"
                 "3,z,notafloat,2021-01-04T00:00:00\n4,w,4.5,notatime\n5,,5.5,2021-01-05T00:00:00\n")
    sch = pa.schema([("a", pa.int64()), ("b", pa.string()),
                     ("f", pa.float64()), ("when", pa.timestamp("us"))])
    got = _as_sorted_table(read_csv_table(str(p), sch, on_malformed="skip"), "a")
    assert got["a"].to_pylist() == [1, 5]
    assert got["b"].to_pylist() == ["x", None]  # unquoted empty -> null kept
    assert got.schema == sch
    with pytest.raises(Exception):
        read_csv_table(str(p), sch, on_malformed="error").materialize()
    # a file mixing BOTH malformation shapes survives skip mode too
    p2 = tmp_path / "both.csv"
    p2.write_text("a,b\n1,x\n2,y,EXTRA\nnotanint,z\n4,ok\n")
    sch2 = pa.schema([("a", pa.int64()), ("b", pa.string())])
    got2 = _as_sorted_table(read_csv_table(str(p2), sch2, on_malformed="skip"), "a")
    assert got2["a"].to_pylist() == [1, 4]


def test_csv_unparseable_file_skipped(ray_session, tmp_path):
    """ADVICE round 4: a file that fails even the all-string fallback
    parse (zero bytes — pyarrow raises 'Empty CSV file') must not abort
    a skip-mode scan spanning healthy siblings; it contributes no rows."""
    good = tmp_path / "good.csv"
    good.write_text("a,b\n1,x\nnotanint,y\n3,z\n")
    empty = tmp_path / "empty.csv"
    empty.write_bytes(b"")
    sch = pa.schema([("a", pa.int64()), ("b", pa.string())])
    got = _as_sorted_table(
        read_csv_table([str(good), str(empty)], sch, on_malformed="skip"), "a"
    )
    assert got["a"].to_pylist() == [1, 3]
    assert got.schema == sch


def test_csv_headerless_and_missing_column(ray_session, tmp_path):
    p = tmp_path / "nohdr.csv"
    p.write_text("r0,python\nr1,go\n")
    sch = pa.schema([("repo", pa.string()), ("lang", pa.string())])
    got = _as_sorted_table(read_csv_table(str(p), sch, header=False), "repo")
    assert got["lang"].to_pylist() == ["python", "go"]
    # header present but a schema column absent from the file → typed nulls
    p2 = tmp_path / "short.csv"
    p2.write_text("repo\nr0\n")
    sch3 = pa.schema([("repo", pa.string()), ("lang", pa.string())])
    got2 = _as_sorted_table(read_csv_table(str(p2), sch3), "repo")
    assert got2["lang"].null_count == 1


def test_jsonl_roundtrip_code_corpus(ray_session, tmp_path, code_table):
    p = tmp_path / "code.jsonl"
    with open(p, "w") as f:
        for r in code_table.to_pylist():
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    got = _as_sorted_table(read_jsonl_table(str(p), CODE_SCHEMA), "path")
    assert got.equals(code_table.sort_by("path").combine_chunks())


def test_jsonl_extra_and_missing_fields(ray_session, tmp_path):
    """Unknown keys ignored; absent keys become typed nulls."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        json.dumps({"repo": "r0", "lang": "go", "stars": 9}) + "\n"
        + json.dumps({"repo": "r1"}) + "\n"
    )
    sch = pa.schema([("repo", pa.string()), ("lang", pa.string())])
    got = _as_sorted_table(read_jsonl_table(str(p), sch), "repo")
    assert got.schema == sch
    assert got["lang"].to_pylist() == ["go", None]


def test_jsonl_malformed_policies(ray_session, tmp_path):
    """Bad syntax AND schema-type-violating lines drop under skip,
    abort under error; surviving rows are byte-identical to a clean
    parse of only the good lines."""
    p = tmp_path / "bad.jsonl"
    lines = [
        json.dumps({"repo": "r0", "n": 1}),
        '{"repo": "r1", "n": ',  # truncated syntax
        json.dumps({"repo": "r2", "n": "not-an-int"}),  # type violation
        json.dumps({"repo": "r3", "n": 3}),
    ]
    p.write_text("\n".join(lines) + "\n")
    sch = pa.schema([("repo", pa.string()), ("n", pa.int64())])
    got = _as_sorted_table(read_jsonl_table(str(p), sch, on_malformed="skip"), "repo")
    assert got["repo"].to_pylist() == ["r0", "r3"]
    assert got["n"].to_pylist() == [1, 3]
    with pytest.raises(Exception):
        read_jsonl_table(str(p), sch, on_malformed="error").materialize()


def test_jsonl_empty_and_blank_lines(ray_session, tmp_path):
    p = tmp_path / "sparse.jsonl"
    p.write_text("\n\n" + json.dumps({"repo": "r0"}) + "\n\n")
    sch = pa.schema([("repo", pa.string())])
    got = _as_sorted_table(read_jsonl_table(str(p), sch), "repo")
    assert got.num_rows == 1


def test_ingest_feeds_validation_suite(ray_session, tmp_path, code_table):
    """The ingested Dataset is a drop-in for the Parquet path: the same
    downstream stats stage runs unchanged on a CSV-ingested corpus."""
    from anomalydetection_ray.checks.stats import column_stats

    csv_path = tmp_path / "corpus.csv"
    pacsv.write_csv(code_table, csv_path)
    ds = read_csv_table(str(csv_path), CODE_SCHEMA)
    stats = column_stats(ds, columns=["repo", "lang", "content"]).to_pandas()
    by_col = stats.set_index("column")
    assert int(by_col.loc["repo", "count"]) == code_table.num_rows
    assert int(by_col.loc["lang", "nulls"]) == 1


def test_cast_block_materializes_missing_columns():
    """Round-5 review: the advertised missing-column path called
    combine_chunks on a plain Array (pa.nulls) — AttributeError the
    moment a reader stops materializing absent keys itself."""
    from anomalydetection_ray.sources.ingest import _cast_block

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    tb = pa.table({"a": pa.array([1, 2], type=pa.int64())})  # 'b' absent
    out = _cast_block(tb, schema)
    assert out.schema == schema
    assert out["b"].null_count == 2
