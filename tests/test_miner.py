"""Sharded template miner tests (T1 analog, sources/miner.py): planted
templates are recovered exactly, partials merge shard- and
order-invariantly, and per-line assignment matches the mined table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from anomalydetection_ray.sources.miner import (
    assign_template_batch,
    combine_partials_batch,
    merge_partial_tables,
    mine_partial_batch,
    mine_templates,
)


def _planted_lines(seed: int = 7, n: int = 600) -> tuple[list[str], dict[str, int]]:
    """Lines drawn from known generators; returns lines + expected
    (template -> count) under the positionwise-agreement rule."""
    rng = np.random.default_rng(seed)
    lines, expect = [], {}
    # generator 1: numeric params only -> digit mask unifies the group
    k1 = 0
    for _ in range(n // 3):
        lines.append(f"core file {rng.integers(1, 9999)} saved to node{rng.integers(0, 64)}")
        k1 += 1
    expect["core file <*> saved to node<*>"] = k1
    # generator 2: a varying WORD position -> positionwise wildcard
    k2 = 0
    for _ in range(n // 3):
        state = ["up", "down", "degraded"][int(rng.integers(0, 3))]
        lines.append(f"link status {state} on port{rng.integers(0, 9)}")
        k2 += 1
    expect["link status <*> on port<*>"] = k2
    # generator 3: fixed literal line -> survives untouched
    k3 = n - k1 - k2
    lines.extend(["checkpoint complete"] * k3)
    expect["checkpoint complete"] = k3
    order = rng.permutation(len(lines))
    return [lines[i] for i in order], expect


def test_planted_templates_recovered():
    lines, expect = _planted_lines()
    final = merge_partial_tables([mine_partial_batch(pa.table({"text": lines}))])
    got = dict(zip(final["template"].to_pylist(), final["cnt"].to_pylist()))
    assert got == expect


def test_shard_and_order_invariance():
    lines, _ = _planted_lines(seed=11)
    t = pa.table({"text": lines})
    whole = merge_partial_tables([mine_partial_batch(t)])
    # arbitrary shard boundaries, merged in reversed order, with an extra
    # worker-side combine round — all must give the identical table
    cuts = [0, 7, 100, 101, 350, len(lines)]
    parts = [mine_partial_batch(t.slice(a, b - a)) for a, b in zip(cuts, cuts[1:])]
    assert merge_partial_tables(parts[::-1]).equals(whole)
    combined = combine_partials_batch(pa.concat_tables(parts))
    assert merge_partial_tables([combined]).equals(whole)


def test_empty_and_null_lines():
    t = pa.table({"text": ["", None, "   ", "x y"]})
    final = merge_partial_tables([mine_partial_batch(t)])
    got = dict(zip(final["template"].to_pylist(), final["cnt"].to_pylist()))
    assert got == {"": 3, "x y": 1}


def test_assignment_matches_mined_groups():
    lines, _ = _planted_lines(seed=3)
    t = pa.table({"text": lines})
    partial = combine_partials_batch(mine_partial_batch(t))
    assigned = assign_template_batch(t, partial)
    final = merge_partial_tables([partial])
    lut = dict(zip(final["template"].to_pylist(), final["cnt"].to_pylist()))
    # every line maps to a mined template; per-template assignment counts
    # equal the mined counts
    import collections

    c = collections.Counter(assigned["template"].to_pylist())
    assert dict(c) == lut


def test_mine_templates_distributed(ray_session):
    import ray.data as rd

    lines, expect = _planted_lines(seed=23, n=3000)
    ds = rd.from_arrow(pa.table({"text": lines})).repartition(13)
    final = mine_templates(ds)
    got = dict(zip(final["template"].to_pylist(), final["cnt"].to_pylist()))
    assert got == expect
