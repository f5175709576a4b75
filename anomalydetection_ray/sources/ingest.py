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
    # pa.nulls returns a plain Array (no combine_chunks); only chunked
    # columns need flattening (round-5 review — the missing-column path
    # crashed with AttributeError the moment a reader stopped
    # materializing absent keys itself)
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=schema,
    )


def _csv_options(schema: pa.Schema, on_malformed: str, delimiter: str,
                 header: bool, newlines_in_values: bool, all_string: bool):
    from pyarrow import csv as pacsv

    parse_options = pacsv.ParseOptions(
        delimiter=delimiter,
        newlines_in_values=newlines_in_values,
        invalid_row_handler=(lambda row: "skip") if on_malformed == "skip" else None,
    )
    read_options = pacsv.ReadOptions(
        column_names=None if header else [f.name for f in schema],
    )
    convert_options = pacsv.ConvertOptions(
        column_types={
            f.name: (pa.string() if all_string else f.type) for f in schema
        },
        include_columns=[f.name for f in schema],
        # a fully-absent column (short header) materializes as nulls
        include_missing_columns=True,
        # unquoted empty → null, quoted "" → empty string: the only
        # lossless null/empty convention CSV offers (arrow's writer
        # emits exactly that), so parquet→csv→read round-trips
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
    )
    return parse_options, read_options, convert_options


def _lossy_cast(col: pa.ChunkedArray, typ: pa.DataType) -> pa.Array:
    """String column → ``typ`` with null (never an exception) on values
    that don't convert. Mirrors Arrow CSV conversion conventions for the
    common types; exotic types take a per-value fallback (rare by
    contract — this only runs on files that already failed the fast
    typed parse)."""
    import polars as pl
    import pyarrow.compute as pc

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return col.cast(typ)
    if pa.types.is_boolean(typ):
        low = pc.utf8_lower(col)
        true = pc.is_in(low, value_set=pa.array(["1", "true"]))
        false = pc.is_in(low, value_set=pa.array(["0", "false"]))
        return pc.if_else(true, True, pc.if_else(false, False, pa.scalar(None, pa.bool_()))).cast(typ)
    s = pl.Series("v", col)
    try:
        if pa.types.is_timestamp(typ):
            out = s.str.to_datetime(strict=False, time_unit=typ.unit or "us")
        elif pa.types.is_date(typ):
            out = s.str.to_date(strict=False)
        else:
            # arrow type → polars dtype via an empty typed series (polars
            # has no public from_arrow dtype constructor at this version)
            out = s.cast(pl.Series(pa.array([], type=typ)).dtype, strict=False)
        return out.to_arrow().cast(typ)
    except (pl.exceptions.PolarsError, pa.ArrowInvalid, TypeError, ValueError):
        vals = []
        for v in col.to_pylist():
            if v is None:
                vals.append(None)
                continue
            try:
                vals.append(pa.scalar(v, pa.string()).cast(typ).as_py())
            except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError):
                vals.append(None)
        return pa.array(vals, type=typ)


def read_csv_table(
    paths,
    schema: pa.Schema,
    on_malformed: str = "error",
    delimiter: str = ",",
    header: bool = True,
    newlines_in_values: bool = True,
    **ray_args,
):
    """CSV → Dataset with the schema enforced AT THE PARSE.

    ``schema`` drives pyarrow's ``ConvertOptions.column_types`` — no type
    inference, so a commit hash column of digits stays ``string``.
    ``newlines_in_values`` is on by default because code/document content
    embeds newlines (quoted CSV). Headerless files (``header=False``)
    take column names from ``schema``.

    ``on_malformed="error"`` is ``ray.data.read_csv`` with the typed
    convert options — any malformed row or value aborts loudly.
    ``on_malformed="skip"`` must survive BOTH malformation shapes without
    aborting the scan: rows with the wrong column count (pyarrow's
    ``invalid_row_handler`` drops them inside the C++ parser) AND rows
    whose value fails type conversion ('abc' in an int64 column — the
    C++ parser can only abort on these). So skip mode parses each file
    with the typed fast path first, and only a file that fails
    conversion re-parses all-string + per-column lossy cast, dropping
    exactly the rows where a present value failed its cast. Files are
    the parallelism unit in both modes (CSV with quoted newlines is not
    sub-file splittable)."""
    from pyarrow import csv as pacsv
    import ray.data as rd

    if on_malformed not in ("error", "skip"):
        raise ValueError("on_malformed must be 'error' or 'skip'")

    parse_options, read_options, convert_options = _csv_options(
        schema, on_malformed, delimiter, header, newlines_in_values, all_string=False
    )
    if on_malformed == "error":
        ds = rd.read_csv(
            paths,
            parse_options=parse_options,
            read_options=read_options,
            convert_options=convert_options,
            **ray_args,
        )
        # pyarrow already typed every column; one zero-copy pass pins the
        # column ORDER so downstream schema checks see the target schema
        return ds.map_batches(
            lambda tb: _cast_block(tb, schema),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )

    _, _, convert_all_string = _csv_options(
        schema, on_malformed, delimiter, header, newlines_in_values, all_string=True
    )

    def parse_file(batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch["bytes"]:
            buf = pa.py_buffer(blob.as_py())
            try:
                tb = pacsv.read_csv(buf, read_options=read_options,
                                    parse_options=parse_options,
                                    convert_options=convert_options)
                out.append(_cast_block(tb, schema))
                continue
            except pa.ArrowInvalid:
                pass  # a value failed typed conversion: lossy re-parse
            try:
                raw = pacsv.read_csv(buf, read_options=read_options,
                                     parse_options=parse_options,
                                     convert_options=convert_all_string)
            except pa.ArrowInvalid:
                # structurally unparseable even as all-string (zero-byte
                # file, truncated quoting): skip mode skips the FILE, it
                # never aborts the scan (ADVICE round 4)
                continue
            cols, fail = [], None
            for f in schema:
                rc = raw[f.name] if f.name in raw.column_names \
                    else pa.nulls(raw.num_rows, pa.string())
                typed = _lossy_cast(rc, f.type)
                cols.append(typed)
                # failed = value present in the file but cast to null
                import pyarrow.compute as pc
                bad = pc.and_(pc.is_valid(rc), pc.is_null(typed))
                fail = bad if fail is None else pc.or_(fail, bad)
            tb = pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                                       for c in cols], schema=schema)
            out.append(tb.filter(pa.compute.invert(fail)) if fail is not None else tb)
        return pa.concat_tables(out or [schema.empty_table()], promote_options="none")

    return rd.read_binary_files(paths, **ray_args).map_batches(
        parse_file, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
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
