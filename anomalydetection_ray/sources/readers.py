"""Parquet readers with column pruning.

Replaces the reference's stage-file readers (`pd.read_csv` at
`end_to_end_prediction.py:245,295`, `.npy` loads at
`models/SimCLR_utils.py:19`) with ``ray.data.read_parquet``. Always pass
``columns`` — a read that ships all columns for a 2-column transform is
wrong at 100 TB (SURVEY.md M6).
"""

from __future__ import annotations

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs):
    """Read one testdata table, pruning to `columns` at the scan."""
    from .. import tune_shuffle_to_cluster

    # must run BEFORE read_parquet: a Dataset snapshots the DataContext at
    # creation, so shuffle knobs tuned later never reach this pipeline
    tune_shuffle_to_cluster()
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns, **kwargs)
