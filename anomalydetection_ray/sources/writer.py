"""Resumable partitioned Parquet sink.

The brief's output contract for 100 TB runs: "write partitioned Parquet
(one directory per input shard / key range) so a failed run can skip
finished partitions; never one giant file". The validation suite already
checkpoints at check×shard granularity (state/checkpoint.py, reference
analog ``end_to_end_prediction.py``'s per-step artifact dirs); this is
the GENERIC dataset-level sink any pipeline can end with.

Design:

- Hive-style layout ``out_dir/<col>=<value>/part-<hash>.parquet``.
- Shard names are DETERMINISTIC content hashes, so an at-least-once
  retried task OVERWRITES its own shard instead of duplicating rows
  (the same idempotency rule the suite's violation spill uses after the
  round-3 ADVICE fix).
- A partition is COMPLETE when its dir holds an atomic ``_DONE`` marker
  (tmp + rename) recording the row count; markers are written by the
  driver only after the full pass succeeds, so a crash mid-run leaves
  partial partitions unmarked and a resume rewrites exactly those.
- ``resume=True`` drops rows of already-done partitions BEFORE the scan
  (broadcast membership filter on the partition value — partition count
  is small by contract, it is a directory fan-out).
- No co-location shuffle: any block may hold rows of any partition;
  each batch partitions locally (one polars ``partition_by``) and
  appends its shards. Completion is tracked per partition, not per
  shard, so correctness never depends on which block wrote what.
"""

from __future__ import annotations

import hashlib
import os
import urllib.parse

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_DONE = "_DONE"


def _part_dirname(col: str, value) -> str:
    sval = "__null__" if value is None else urllib.parse.quote(str(value), safe="")
    return f"{col}={sval}"


def _decode_part_dirname(name: str, col: str):
    prefix = f"{col}="
    if not name.startswith(prefix):
        return None
    sval = name[len(prefix) :]
    return None if sval == "__null__" else urllib.parse.unquote(sval)


def list_done_partitions(out_dir: str, partition_col: str) -> list:
    """Partition VALUES (decoded) whose directory holds a ``_DONE``."""
    if not os.path.isdir(out_dir):
        return []
    done = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d) and os.path.exists(os.path.join(d, _DONE)):
            val = _decode_part_dirname(name, partition_col)
            if val is not None or name == f"{partition_col}=__null__":
                done.append(val)
    return done


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    resume: bool = True,
    max_rows_per_file: int = 1 << 20,
):
    """Write ``ds`` as Hive-partitioned Parquet under ``out_dir`` with
    per-partition ``_DONE`` completion markers. Returns a pandas
    DataFrame ``(partition value, rows, files, skipped)`` — one row per
    partition seen in this run plus previously-done ones.

    Re-running after a crash skips completed partitions at the READ
    (their rows never scan again) and rewrites incomplete ones in place
    (deterministic shard names make the rewrite idempotent). Rows with a
    null partition value go to ``<col>=__null__``."""
    import pandas as pd
    import polars as pl

    os.makedirs(out_dir, exist_ok=True)
    done_before = list_done_partitions(out_dir, partition_col) if resume else []
    skipped = {v: True for v in done_before}
    # clear STALE shards of incomplete (or, on resume=False, all)
    # partitions up front: a crashed run's partial files would otherwise
    # duplicate rows if the re-run's block layout differs
    done_dirs = {_part_dirname(partition_col, v) for v in done_before}
    for name in os.listdir(out_dir):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name in done_dirs:
            continue
        for f in os.listdir(d):
            if f.endswith(".parquet") or f.startswith(".part-") or f == _DONE:
                os.remove(os.path.join(d, f))
    if done_before:
        non_null = [v for v in done_before if v is not None]
        drop_null = any(v is None for v in done_before)

        def drop_done(tb: pa.Table) -> pa.Table:
            col = tb[partition_col]
            keep = pc.invert(pc.coalesce(pc.is_in(pc.cast(col, pa.string()),
                                                  value_set=pa.array([str(v) for v in non_null])), False))
            if drop_null:
                keep = pc.and_(keep, pc.is_valid(col))
            return tb.filter(keep)

        ds = ds.map_batches(drop_done, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    count_schema = pa.schema([("part", pa.string()), ("rows", pa.int64()), ("files", pa.int64())])

    def write_block(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return pa.Table.from_pydict({f.name: [] for f in count_schema}, schema=count_schema)
        out_rows = []
        for sub in pl.from_arrow(tb).partition_by(partition_col):
            val = sub[partition_col][0]
            d = os.path.join(out_dir, _part_dirname(partition_col, val))
            os.makedirs(d, exist_ok=True)
            t = sub.to_arrow().cast(tb.schema)
            n_files = 0
            for s in range(0, t.num_rows, max_rows_per_file):
                piece = t.slice(s, max_rows_per_file)
                # deterministic shard name: content hash of the piece's
                # IPC serialization (slices share parent buffers, so
                # hashing raw buffers would collide across pieces) — a
                # retried task overwrites, never duplicates
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, piece.schema) as w:
                    w.write_table(piece)
                h = hashlib.sha256(sink.getvalue())
                name = f"part-{h.hexdigest()[:20]}.parquet"
                tmp = os.path.join(d, f".{name}.tmp{os.getpid()}")
                pq.write_table(piece, tmp)
                os.replace(tmp, os.path.join(d, name))
                n_files += 1
            out_rows.append(
                {"part": _part_dirname(partition_col, val), "rows": t.num_rows, "files": n_files}
            )
        return pa.Table.from_pylist(out_rows, schema=count_schema)

    parts = [
        t
        for t in ds.map_batches(
            write_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if t.num_rows
    ]
    summary: dict[str, dict] = {}
    if parts:
        agg = (
            pl.from_arrow(pa.concat_tables(parts))
            .group_by("part")
            .agg(pl.col("rows").sum(), pl.col("files").sum())
        )
        for part, rows, files in agg.iter_rows():
            summary[part] = {"rows": int(rows), "files": int(files)}
    # the full pass succeeded: mark every partition written this run
    for part, info in summary.items():
        d = os.path.join(out_dir, part)
        tmp = os.path.join(d, _DONE + ".tmp")
        with open(tmp, "w") as f:
            f.write(f"{info['rows']}\n")
        os.replace(tmp, os.path.join(d, _DONE))

    import pandas as pd  # noqa: F811

    rows = [
        {
            "partition": _decode_part_dirname(part, partition_col),
            "rows": info["rows"],
            "files": info["files"],
            "skipped": False,
        }
        for part, info in sorted(summary.items())
    ]
    rows += [
        {"partition": v, "rows": None, "files": None, "skipped": True} for v in sorted(skipped, key=str)
    ]
    return pd.DataFrame(rows, columns=["partition", "rows", "files", "skipped"])
