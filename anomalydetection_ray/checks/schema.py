"""Schema validation and schema drift (north rule: "schema + constraint
checking"; the structural sibling of the distribution-drift check).

Two comparisons, both metadata-only — no data scan ever runs:

- ``schema_verdicts(actual, expected)``: the live corpus schema against a
  user-declared EXPECTED schema (a :class:`pyarrow.Schema`, a spec frame,
  or ``[(name, dtype_str), ...]`` pairs). Missing columns, added columns
  (unless allowed) and dtype changes each produce a failed verdict row;
  optionally column ORDER is enforced too.
- the suite compares the live schema against the BASELINE SNAPSHOT's
  recorded per-column dtypes (``spec_from_stats``) whenever a snapshot is
  given — a column that appeared, vanished or changed type between runs
  is an anomaly signal even when every value-level stat still passes
  (reference analog: the hard-coded 9-field structure assumption at
  ``models/drain.py:27`` — a schema change there silently shifts every
  downstream field).

Dtypes compare as Arrow type strings (``str(pa.DataType)``), the same
representation the stats table's ``dtype`` column records.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa

_SPEC_COLS = ["column", "dtype", "position"]


def schema_spec(schema: pa.Schema) -> pd.DataFrame:
    """(column, dtype, position) spec frame for an Arrow schema."""
    return pd.DataFrame(
        {
            "column": [f.name for f in schema],
            "dtype": [str(f.type) for f in schema],
            "position": list(range(len(schema))),
        }
    )


def spec_from_any(expected: Any) -> pd.DataFrame:
    """Coerce an expected-schema declaration into a spec frame.

    Accepts a ``pa.Schema``, a spec frame (``column``/``dtype`` [+
    ``position``]), or an iterable of ``(name, dtype_str)`` pairs (their
    order is the expected position)."""
    if isinstance(expected, pa.Schema):
        return schema_spec(expected)
    if isinstance(expected, pd.DataFrame):
        if not {"column", "dtype"}.issubset(expected.columns):
            raise ValueError("expected-schema frame needs 'column' and 'dtype' columns")
        out = expected.copy()
        if "position" not in out.columns:
            out["position"] = range(len(out))
        return out[_SPEC_COLS].reset_index(drop=True)
    pairs = list(expected)
    if not all(isinstance(p, (tuple, list)) and len(p) == 2 for p in pairs):
        raise ValueError(
            "expected schema must be a pyarrow.Schema, a spec frame, or (name, dtype) pairs"
        )
    return pd.DataFrame(
        {
            "column": [str(n) for n, _ in pairs],
            "dtype": [str(t) for _, t in pairs],
            "position": list(range(len(pairs))),
        }
    )


def spec_from_stats(stats_df: pd.DataFrame) -> pd.DataFrame:
    """Per-column dtype spec from a (baseline-snapshot) stats table: the
    suite's fused scan records ``dtype`` per (part, column); dtypes are
    partition-independent so the first row per column wins. Positions are
    unknown in a stats table (order never checks against a snapshot)."""
    sub = stats_df[["column", "dtype"]].drop_duplicates("column").reset_index(drop=True)
    sub["position"] = -1
    return sub[_SPEC_COLS]


def schema_verdicts(
    actual: pa.Schema | pd.DataFrame,
    expected: Any,
    allow_added: bool = False,
    check_order: bool = False,
    check: str = "schema",
) -> pd.DataFrame:
    """Suite-shaped verdict rows — one per column in the union of the two
    schemas: status ``ok`` / ``missing`` / ``added`` / ``type_changed``
    / ``moved`` (order violations only when ``check_order``), with
    ``passed`` False for every non-ok status except allowed additions.

    Columns: (check, partition, column, passed, metric, detail) — metric
    is the column's actual position (-1 when missing) so verdict tables
    stay numeric-stable."""
    # BOTH sides normalize through spec_from_any: a position-less actual
    # frame previously hit float(ar.position) with AttributeError
    act = spec_from_any(actual) if not isinstance(actual, pa.Schema) else schema_spec(actual)
    exp = spec_from_any(expected)
    dup = exp["column"][exp["column"].duplicated()]
    if len(dup):
        raise ValueError(f"expected schema lists duplicate columns: {sorted(set(dup))}")
    a = {r.column: r for r in act.itertuples()}
    e = {r.column: r for r in exp.itertuples()}
    rows = []
    for name in list(exp["column"]) + [c for c in act["column"] if c not in e]:
        ar, er = a.get(name), e.get(name)
        pos = float(ar.position) if ar is not None else -1.0
        if er is None:
            status, passed = "added", bool(allow_added)
            detail = f"unexpected column (dtype {ar.dtype})" if not passed else ""
        elif ar is None:
            status, passed, detail = "missing", False, f"expected dtype {er.dtype}"
        elif ar.dtype != er.dtype:
            status, passed = "type_changed", False
            detail = f"expected dtype {er.dtype}, found {ar.dtype}"
        elif check_order and er.position >= 0 and ar.position != er.position:
            status, passed = "moved", False
            detail = f"expected position {er.position}, found {ar.position}"
        else:
            status, passed, detail = "ok", True, ""
        rows.append(
            {
                "check": check,
                "partition": "<corpus>",
                "column": name,
                "passed": passed,
                "metric": pos,
                "detail": f"{status}: {detail}" if detail else status if status != "ok" else "",
            }
        )
    return pd.DataFrame(rows, columns=["check", "partition", "column", "passed", "metric", "detail"])
