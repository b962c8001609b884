"""Planted-value tests for the interval analytics helpers (w18/x08):
half-open boundary semantics, multi-bin dedup, sweep-line peaks."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datalake_worker_spark.operators.wave7 import (
    interval_overlap_join,
    max_concurrent_intervals,
)


def _d(s):
    return datetime.date.fromisoformat(s)


def test_sweep_line_peak_and_half_open(spark):
    rows = [
        # key 1: [d1,d3) [d2,d5) [d3,d4) — at d3 the first interval has
        # ENDED (half-open) before the third starts: peak is 2, not 3
        (1, _d("2020-01-01"), _d("2020-01-03")),
        (1, _d("2020-01-02"), _d("2020-01-05")),
        (1, _d("2020-01-03"), _d("2020-01-04")),
        # key 2: three genuinely nested intervals — peak 3
        (2, _d("2020-01-01"), _d("2020-01-10")),
        (2, _d("2020-01-02"), _d("2020-01-09")),
        (2, _d("2020-01-03"), _d("2020-01-08")),
        # key 3: disjoint — peak 1
        (3, _d("2020-01-01"), _d("2020-01-02")),
        (3, _d("2020-01-05"), _d("2020-01-06")),
    ]
    df = spark.createDataFrame(rows, "k int, lo date, hi date")
    got = {
        r.k: r.max_concurrent
        for r in max_concurrent_intervals(df, "k", "lo", "hi").collect()
    }
    assert got == {1: 2, 2: 3, 3: 1}


def test_overlap_join_half_open_and_bin_dedup(spark):
    # bin_days=10 and epoch 2020-01-01: bins are [01-01..01-10], [01-11..01-20], ...
    left = spark.createDataFrame(
        [
            # A: spans bins 0 and 1 (Jan 5 .. Jan 14, half-open hi Jan 15)
            (10, _d("2020-01-05"), _d("2020-01-15")),
            # B: touches R1 exactly at its lo (hi == r_lo) — NOT an overlap
            (11, _d("2020-01-01"), _d("2020-01-08")),
            # C: fully inside bin 2, overlaps nothing
            (12, _d("2020-01-22"), _d("2020-01-24")),
        ],
        "lid int, lo date, hi date",
    )
    right = spark.createDataFrame(
        [
            # R1: Jan 8 .. Jan 17 — overlaps A in BOTH bins 0 and 1:
            # dedup must count the pair once
            (100, _d("2020-01-08"), _d("2020-01-18")),
            # R2: exactly A's hi onward — half-open: no overlap with A
            (101, _d("2020-01-15"), _d("2020-01-20")),
        ],
        "rid int, lo date, hi date",
    )
    out = interval_overlap_join(
        left, right, bin_days=10, epoch="2020-01-01"
    ).select("lid", "rid")
    got = sorted(map(tuple, out.collect()))
    # A-R1 once (multi-bin deduped); B-R1 NOT (touching, half-open);
    # A-R2 NOT (touching); C matches nothing
    assert got == [(10, 100)]


def test_overlap_join_matches_brute_force(spark):
    # randomized-but-seeded intervals, brute-force cross-check
    import random

    rng = random.Random(20)
    base = _d("2021-01-01")
    L = []
    for i in range(80):
        lo = base + datetime.timedelta(days=rng.randrange(0, 120))
        L.append((i, lo, lo + datetime.timedelta(days=rng.randrange(1, 25))))
    R = []
    for j in range(40):
        lo = base + datetime.timedelta(days=rng.randrange(0, 120))
        R.append((j, lo, lo + datetime.timedelta(days=rng.randrange(1, 25))))
    expect = sorted(
        (i, j)
        for i, llo, lhi in L
        for j, rlo, rhi in R
        if llo < rhi and rlo < lhi
    )
    ldf = spark.createDataFrame(L, "lid int, lo date, hi date")
    rdf = spark.createDataFrame(R, "rid int, lo date, hi date")
    out = interval_overlap_join(ldf, rdf, bin_days=32, epoch="2021-01-01")
    got = sorted(map(tuple, out.select("lid", "rid").collect()))
    assert got == expect
