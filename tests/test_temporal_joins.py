"""As-of and range join operator edge cases (exact-ts matches, no-preceding
NULLs, tolerance cutoff, interval boundary exclusivity)."""

from datetime import datetime

from pyspark.sql import Row

from aim357_2019_etl_and_ml_workshop_spark.operators.temporal_joins import (
    asof_join,
    range_join,
)


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(1), tag="before_any"),
            Row(k="a", ts=_ts(5), tag="after_first"),
            Row(k="a", ts=_ts(10), tag="exact_match"),
            Row(k="b", ts=_ts(7), tag="other_key"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(3), price=30.0),
            Row(k="a", ts=_ts(10), price=100.0),
            Row(k="b", ts=_ts(6), price=60.0),
        ]
    )
    out = {
        r.tag: r.r_price
        for r in asof_join(left, right, "k", "ts", "ts", ["price"]).collect()
    }
    assert out["before_any"] is None          # nothing precedes
    assert out["after_first"] == 30.0          # latest at-or-before 05:00
    assert out["exact_match"] == 100.0         # <= is inclusive
    assert out["other_key"] == 60.0            # keys isolated


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts(12), tag="stale")])
    right = spark.createDataFrame([Row(k="a", ts=_ts(1), price=10.0)])
    strict = asof_join(
        left, right, "k", "ts", "ts", ["price"], tolerance_seconds=3600
    ).first()
    assert strict.r_price is None              # 11h-old match beyond 1h tolerance
    loose = asof_join(
        left, right, "k", "ts", "ts", ["price"], tolerance_seconds=12 * 3600
    ).first()
    assert loose.r_price == 10.0


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            Row(pid=1, ts=_ts(0)),    # == start: included
            Row(pid=2, ts=_ts(3)),    # inside
            Row(pid=3, ts=_ts(6)),    # == end: EXCLUDED
            Row(pid=4, ts=_ts(9)),    # outside any interval
        ]
    )
    intervals = spark.createDataFrame(
        [Row(iv="morning", cstart=_ts(0), cend=_ts(6))]
    )
    got = {
        r.pid: r.iv
        for r in range_join(points, intervals, "ts", "cstart", "cend").collect()
    }
    assert got == {1: "morning", 2: "morning"}


def test_range_join_multiday_interval(spark):
    """Intervals longer than one bucket still match (explode covers every
    overlapped bucket)."""
    points = spark.createDataFrame(
        [Row(pid=1, ts=datetime(2024, 1, 3, 12))]
    )
    intervals = spark.createDataFrame(
        [Row(iv="week", cstart=datetime(2024, 1, 1), cend=datetime(2024, 1, 8))]
    )
    out = range_join(points, intervals, "ts", "cstart", "cend").collect()
    assert len(out) == 1 and out[0].iv == "week"


def test_scd2_intervals_collapse_and_close(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.temporal_joins import (
        scd2_intervals,
    )

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        Row(k=1, ts=t(0), s="a", i=1),
        Row(k=1, ts=t(1), s="a", i=2),   # same state -> collapses
        Row(k=1, ts=t(2), s="b", i=3),   # state change
        Row(k=1, ts=t(3), s="a", i=4),   # back to a -> NEW run, not merged
        Row(k=2, ts=t(0), s="x", i=5),
    ]
    out = scd2_intervals(
        spark.createDataFrame(rows), "k", "ts", "s", "i"
    ).collect()
    k1 = sorted(
        [(r.s, r.valid_from, r.valid_to, r.n_events) for r in out if r.k == 1],
        key=lambda r: r[1],
    )
    assert k1 == [
        ("a", t(0), t(2), 2),
        ("b", t(2), t(3), 1),
        ("a", t(3), None, 1),
    ]
    k2 = [(r.s, r.valid_to) for r in out if r.k == 2]
    assert k2 == [("x", None)]


def test_upsert_snapshot_latest_wins(spark):
    from pyspark.sql import Row

    from aim357_2019_etl_and_ml_workshop_spark.operators.canonicalize import (
        upsert_snapshot,
    )

    cur = spark.createDataFrame(
        [Row(k=1, v="old1"), Row(k=2, v="old2"), Row(k=3, v="old3")]
    )
    upd = spark.createDataFrame([Row(k=2, v="new2"), Row(k=4, v="new4")])
    got = {r.k: r.v for r in upsert_snapshot(cur, upd, ["k"]).collect()}
    assert got == {1: "old1", 2: "new2", 3: "old3", 4: "new4"}
