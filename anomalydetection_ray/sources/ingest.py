"""CSV / JSONL ingestion with explicit schemas.

The reference hands every stage off through CSV files read with bare
``pd.read_csv`` (templates CSV at ``end_to_end_prediction.py:245,295``,
results CSV at ``:529``) — schema is whatever pandas infers. A user
switching to this engine still has those files (and, at web scale, JSONL
document dumps), so the engine needs first-class readers that

- **parse vectorized** (pyarrow's C++ CSV/JSON readers, never a Python
  loop per row on the happy path),
- **enforce an explicit schema** (the engine's data model is
  schema-explicit by design — SURVEY.md §1.5; inference is what made the
  reference's "is the last column a label?" heuristic necessary), and
- **survive malformed records** without aborting a 100 TB scan
  (``on_malformed="skip"`` drops bad rows; ``"error"`` fails loudly).

Both readers return a ``ray.data.Dataset`` whose blocks already match the
requested Arrow schema, so downstream stages are identical to the Parquet
path. Files are the parallelism unit (one read task per file / file
chunk), exactly like ``read_parquet`` — shard big corpora into many files.
"""

from __future__ import annotations

import pyarrow as pa


def _cast_block(tb: pa.Table, schema: pa.Schema) -> pa.Table:
    """Reorder + cast one parsed block to the target schema; missing
    columns materialize as typed nulls (JSONL records omit absent keys)."""
    cols = []
    for f in schema:
        if f.name in tb.column_names:
            cols.append(tb[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(tb.num_rows, f.type))
    return pa.Table.from_arrays([c.combine_chunks() for c in cols], schema=schema)


def read_csv_table(
    paths,
    schema: pa.Schema,
    on_malformed: str = "error",
    delimiter: str = ",",
    header: bool = True,
    newlines_in_values: bool = True,
    **ray_args,
):
    """``ray.data.read_csv`` with the schema enforced AT THE PARSE.

    ``schema`` drives pyarrow's ``ConvertOptions.column_types`` — no type
    inference, so a commit hash column of digits stays ``string``.
    ``on_malformed="skip"`` installs pyarrow's ``invalid_row_handler`` (rows
    with the wrong column count are dropped inside the C++ parser);
    ``"error"`` keeps the default abort. ``newlines_in_values`` is on by
    default because code/document content embeds newlines (quoted CSV).
    Headerless files (``header=False``) take column names from ``schema``.
    """
    from pyarrow import csv as pacsv
    import ray.data as rd

    if on_malformed not in ("error", "skip"):
        raise ValueError("on_malformed must be 'error' or 'skip'")

    parse_options = pacsv.ParseOptions(
        delimiter=delimiter,
        newlines_in_values=newlines_in_values,
        invalid_row_handler=(lambda row: "skip") if on_malformed == "skip" else None,
    )
    read_options = pacsv.ReadOptions(
        column_names=None if header else [f.name for f in schema],
    )
    convert_options = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in schema},
        include_columns=[f.name for f in schema],
        # a fully-absent column (short header) materializes as nulls
        include_missing_columns=True,
        # unquoted empty → null, quoted "" → empty string: the only
        # lossless null/empty convention CSV offers (arrow's writer
        # emits exactly that), so parquet→csv→read round-trips
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
    )
    ds = rd.read_csv(
        paths,
        parse_options=parse_options,
        read_options=read_options,
        convert_options=convert_options,
        **ray_args,
    )
    # pyarrow already typed every column; one zero-copy pass pins the
    # column ORDER so downstream schema checks see the exact target schema
    return ds.map_batches(
        lambda tb: _cast_block(tb, schema),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def _parse_jsonl_block(lines: pa.Table, schema: pa.Schema, on_malformed: str) -> pa.Table:
    """Parse one block of raw text lines with pyarrow's C++ JSON reader.

    Happy path: the whole block is joined and parsed in ONE
    ``pa.json.read_json`` call (vectorized; unexpected keys ignored).
    Only when that parse fails AND ``on_malformed="skip"`` does a per-line
    fallback run to isolate the bad lines — malformed data is rare by
    contract, so the Python loop prices only the broken block.
    """
    from pyarrow import json as pajson

    text = lines["text"]
    blob = "\n".join(v for v in text.to_pylist() if v and not v.isspace())
    if not blob:
        return schema.empty_table()
    popts = pajson.ParseOptions(
        explicit_schema=schema, unexpected_field_behavior="ignore"
    )
    try:
        parsed = pajson.read_json(pa.py_buffer(blob.encode("utf-8")), parse_options=popts)
        return _cast_block(parsed, schema)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        if on_malformed == "error":
            raise
    good = []
    for v in text.to_pylist():
        if not v or v.isspace():
            continue
        try:
            # the SAME arrow parser per line, so surviving rows get
            # byte-identical typing/coercion to the vectorized path; a
            # line that fails json syntax OR schema typing is dropped
            one = pajson.read_json(pa.py_buffer(v.encode("utf-8")), parse_options=popts)
            good.append(_cast_block(one, schema))
        except (pa.ArrowInvalid, pa.ArrowTypeError, UnicodeEncodeError):
            continue
    if not good:
        return schema.empty_table()
    return pa.concat_tables(good)


def read_jsonl_table(
    paths,
    schema: pa.Schema,
    on_malformed: str = "error",
    **ray_args,
):
    """Newline-delimited JSON → Dataset with ``schema`` enforced.

    Built on ``read_text`` (line-splitting is the only safe distribution
    boundary for JSONL) + a vectorized arrow JSON parse per block, so a
    corrupt record can be skipped per line — ``ray.data.read_json`` would
    abort the whole file. Keys absent from ``schema`` are ignored; fields
    absent from a record become typed nulls.
    """
    import ray.data as rd

    if on_malformed not in ("error", "skip"):
        raise ValueError("on_malformed must be 'error' or 'skip'")

    return rd.read_text(paths, **ray_args).map_batches(
        lambda tb: _parse_jsonl_block(tb, schema, on_malformed),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )
