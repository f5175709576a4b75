"""End-to-end corpus curation: the assembled training-data pipeline.

One lazy Ray Data chain — normalize → quality/PII/repetition gate →
benchmark decontamination → dedup → optional ExactSubstr span cutting →
resumable partitioned write — built
ONLY from the engine's streaming operators (each documented at its
definition site). This is the consumer-facing composition of what
`pipelines/queries.curation_pipeline_docs` oracle-checks stage by
stage, plus the round-4g normalization pre-pass and the resumable sink
(the reference's analog is the step1→7 chain of
``end_to_end_prediction.py:657-664``, recast over curation operators).

Nothing materializes corpus-sized data on the driver: normalization and
the gate are per-batch Arrow kernels, decontamination broadcasts a
bench summary (exact hash array or fixed-size Bloom), both dedup
stages run their cost-gated plan ladders, and the sink streams blocks
to per-partition shards with `_DONE` completion markers.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    table_path: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str | None = "lang",
    normalize: bool = True,
    min_tokens: int = 24,
    min_distinct_ratio_pct: int = 30,
    quality_snapshot: str | None = None,
    min_quality: float = 0.5,
    bench_path: str | None = None,
    decon_mode: str = "exact",
    decon_n: int = 13,
    dedup: str = "exact+simhash",
    strip_substr_k: int = 0,
    strip_min_remaining: int = 200,
    snapshot_path: str | None = None,
    resume: bool = True,
) -> dict:
    """Run the full curation chain over a parquet table; returns a JSON-
    able summary (input rows, surviving rows, per-partition file counts).
    ``dedup`` ∈ {"none", "exact", "exact+simhash"}; ``strip_substr_k > 0``
    adds the ExactSubstr stage after whole-document dedup (cut every
    byte span whose k-gram content recurs across documents,
    dedup/substrings.py; docs falling under ``strip_min_remaining``
    bytes are dropped); ``snapshot_path`` points at a PRIOR curated
    corpus (parquet dir) and drops any doc whose exact content that run
    already kept (dedup/exact.py:dedup_against_snapshot — the
    refresh-run primitive, applied after the gate so only candidate
    rows hash); ``partition_col=None`` writes unpartitioned parquet (no
    resume granularity); ``quality_snapshot`` points at a trained
    :class:`~..functions.quality_classifier.NumpyLogReg` snapshot and
    inserts the learned quality gate (keep ``quality_prob >=
    min_quality``) after the heuristic gate — the GPT-3/CCNet ordering:
    cheap heuristics first so the model only scores plausible docs."""
    import ray.data as rd  # noqa: F401 - lazy ray import for the chain

    from ..sources.readers import read_parquet_clean
    from ..functions.text import (
        decontaminate,
        normalize_text_batch,
        pii_pattern_counts_batch,
        repetition_batch,
        strip_markup_batch,
        token_count_batch,
    )

    if dedup not in ("none", "exact", "exact+simhash"):
        raise ValueError(f"dedup must be none|exact|exact+simhash, got {dedup!r}")

    # must precede EVERY dataset creation below: a Dataset snapshots the
    # DataContext, so shuffle knobs tuned later never reach the dedup
    # stages' hash shuffles (round-5 review — the documented small-
    # cluster aggregator deadlock hit the flagship curate path)
    from .. import tune_shuffle_to_cluster

    tune_shuffle_to_cluster()

    cols = [id_col, text_col] + ([partition_col] if partition_col else [])
    ds = read_parquet_clean(table_path, columns=sorted(set(cols)))
    n_in = ds.count()

    def norm(tb: pa.Table) -> pa.Table:
        return normalize_text_batch(strip_markup_batch(tb, text_col), text_col)

    if normalize:
        ds = ds.map_batches(norm, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    def gate(tb: pa.Table) -> pa.Table:
        b = token_count_batch(tb, text_col, out_col="__nt")
        b = repetition_batch(b, text_col)
        b = pii_pattern_counts_batch(b, text_col)
        n_pii = pc.add(pc.add(b["n_emails"], b["n_urls"]), b["n_ips"])
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(b["__nt"], min_tokens),
                pc.greater_equal(
                    pc.multiply(b["n_distinct_tokens"], 100),
                    pc.multiply(b["n_tokens_r"], min_distinct_ratio_pct),
                ),
            ),
            pc.equal(n_pii, 0),
        )
        return tb.filter(pc.coalesce(mask, False))

    ds = ds.map_batches(gate, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    if quality_snapshot is not None:
        from ..functions.quality_classifier import score_quality

        # actor-pool scorer (snapshot loads once per actor); the scratch
        # probability column never reaches the sink
        ds = score_quality(ds, quality_snapshot, text_col=text_col, out_col="__qprob")
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["__qprob"], pa.scalar(float(min_quality), pa.float64()))
            ).drop_columns(["__qprob"]),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    if bench_path is not None:
        bench = read_parquet_clean(bench_path, columns=[text_col])
        if normalize:
            # the corpus side was normalized above, so the bench text
            # must pass through the SAME rewrite — raw-vs-normalized
            # token n-grams would otherwise miss true overlaps and let
            # benchmark leakage survive (round-5 review)
            bench = bench.map_batches(
                norm, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
        ds = decontaminate(ds, text_col, bench, n=decon_n, mode=decon_mode)

    if snapshot_path is not None:
        from ..dedup import dedup_against_snapshot

        snap = read_parquet_clean(snapshot_path, columns=[text_col])
        ds = dedup_against_snapshot(ds, id_col, text_col, snap)

    if dedup in ("exact", "exact+simhash"):
        from ..dedup import exact_dedup

        ds = exact_dedup(ds, id_col, text_col)
    if dedup == "exact+simhash":
        from ..dedup import simhash_dedup

        ds = simhash_dedup(ds, id_col, text_col)

    if strip_substr_k > 0:
        from ..dedup import strip_dup_spans

        ds = strip_dup_spans(
            ds, id_col, text_col, k=strip_substr_k,
            min_remaining_bytes=strip_min_remaining,
        )
        # the cut descriptors are stage diagnostics, not output schema
        from ..dedup.substrings import STAT_COLS

        ds = ds.map_batches(
            lambda t: t.drop_columns(list(STAT_COLS)),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        )

    summary: dict = {"rows_in": int(n_in)}
    if partition_col:
        from ..sources.writer import write_partitioned

        import pandas as pd

        report = write_partitioned(ds, out_dir, partition_col, resume=resume)
        # rows_out counts EVERY surviving partition — resumed ones report
        # their marker-recorded counts (round-5 review: excluding them
        # made a fully-resumed run report rows_out=0 against the full
        # rows_in)
        summary["rows_out"] = int(report["rows"].fillna(0).sum())
        summary["partitions"] = {
            str(r["partition"]): {
                "rows": None if pd.isna(r["rows"]) else int(r["rows"]),
                "skipped": bool(r["skipped"]),
            }
            for _, r in report.iterrows()
        }
    else:
        from ..sources.writer import clean_parquet_dir

        # write_parquet APPENDS UUID-named files: a repeated run with the
        # same out_dir would silently double the curated corpus
        clean_parquet_dir(out_dir)
        # write first, then count from parquet footer metadata (the
        # predict.py scored-sink pattern): materializing just for a row
        # count would force the whole curated corpus through object-store
        # memory/spill (round-4 verdict #1)
        ds.write_parquet(out_dir)
        from ..sources.writer import count_parquet_rows

        summary["rows_out"] = count_parquet_rows(out_dir)
    summary["out"] = out_dir
    return summary
