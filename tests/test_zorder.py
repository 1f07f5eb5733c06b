"""Z-order layout (r10): the Morton key must match a python reference
bit-for-bit (it is under a full DuckDB oracle too — zorder_key_probe),
and the z-ordered parquet sink must actually deliver the layout claim:
every output file covers a NARROW range of EVERY z-column, where a
plain repartitioned write leaves each file spanning ~the full range of
both — the file-level min/max selectivity that lets a 100 TB scan skip
files on any filtered combination of the z-columns.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aim357_2019_etl_and_ml_workshop_spark.sources.io import (
    with_zorder_key,
    write_parquet_zordered,
)


def _reference_zkey(rows, bits):
    """Independent python mirror: min-max scale each dim, interleave."""
    cols = list(zip(*rows))
    k = len(cols)
    top = (1 << bits) - 1
    out = []
    scaled_cols = []
    for vals in cols:
        lo, hi = min(vals), max(vals)
        span = hi - lo
        scaled_cols.append(
            [
                0
                if span <= 0
                else min(top, max(0, math.floor((v - lo) / span * top)))
                for v in vals
            ]
        )
    for idx in range(len(rows)):
        z = 0
        for j in range(k):
            c = scaled_cols[j][idx]
            for i in range(bits):
                z |= ((c >> i) & 1) << (i * k + j)
        out.append(z)
    return out


def test_zorder_key_matches_python_reference(spark):
    rows = [(float(x), float(y)) for x in range(0, 100, 7) for y in (1.5, 3.25, 99.0, 42.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = {
        (r["a"], r["b"]): r["_zkey"]
        for r in with_zorder_key(df, ["a", "b"], bits=8).collect()
    }
    want = dict(zip(rows, _reference_zkey(rows, 8)))
    assert got == want


def test_zorder_key_null_and_constant_dims(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (None, 5.0), (3.0, 5.0)], "a double, b double"
    )
    keyed = {
        r["a"]: r["_zkey"]
        for r in with_zorder_key(df, ["a", "b"], bits=8).collect()
    }
    # constant dim b contributes coordinate 0 everywhere; null a -> 0
    assert keyed[None] == 0
    assert keyed[1.0] == 0  # min of a scales to 0 too
    assert keyed[3.0] > 0


def test_zorder_validations(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    with pytest.raises(ValueError, match=">= 2 columns"):
        with_zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="signed-long budget"):
        with_zorder_key(df, ["a", "b"], bits=31)


def test_zorder_scratch_name_collisions_fail_fast(spark):
    # ADVICE r10: a pre-existing _zkey would be silently REPLACED by
    # withColumn (and then dropped by the zordered sink — user data lost
    # from the written files); pre-existing bound names would make the
    # broadcast crossJoin ambiguous. Both must raise, not corrupt.
    df = spark.createDataFrame(
        [(1.0, 2.0, 9)], "a double, b double, _zkey long"
    )
    with pytest.raises(ValueError, match="_zkey"):
        with_zorder_key(df, ["a", "b"])
    # a different key_col name sidesteps the clash
    out = with_zorder_key(df, ["a", "b"], key_col="_zk2")
    assert "_zkey" in out.columns and "_zk2" in out.columns

    df2 = spark.createDataFrame(
        [(1.0, 2.0, 0.0)], "a double, b double, _zmin_a double"
    )
    with pytest.raises(ValueError, match="_zmin_a"):
        with_zorder_key(df2, ["a", "b"])


def _per_file_span_fractions(spark, path, cols):
    """Mean over output files of (file max-min)/(global max-min) per col."""
    df = spark.read.parquet(path)
    spans = {}
    g = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    per_file = (
        df.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(
            *[F.min(c).alias(f"lo_{c}") for c in cols],
            *[F.max(c).alias(f"hi_{c}") for c in cols],
        )
        .collect()
    )
    assert len(per_file) > 4, "need multiple files for the layout claim"
    for c in cols:
        gspan = g[f"hi_{c}"] - g[f"lo_{c}"]
        fracs = [
            (r[f"hi_{c}"] - r[f"lo_{c}"]) / gspan for r in per_file
        ]
        spans[c] = sum(fracs) / len(fracs)
    return spans


def test_zordered_write_narrows_every_dimension(spark, tmp_path):
    """The load-bearing layout claim, measured on the actual files: with
    independent uniform x/y, a plain repartition leaves every file
    spanning ~the whole range of BOTH columns (span fraction ~1); the
    z-ordered write's disjoint key ranges must cut the mean per-file
    span on BOTH columns at once — the multi-dimension pruning the
    single-column clustered write cannot provide."""
    n = 40_000
    df = (
        spark.range(n)
        .select(
            (F.hash(F.col("id")) % 1000).cast("double").alias("x"),
            (F.hash(F.col("id"), F.lit(7)) % 1000).cast("double").alias("y"),
        )
    )
    base = str(tmp_path / "plain")
    df.repartition(16).write.parquet(base)
    zpath = str(tmp_path / "zordered")
    write_parquet_zordered(df, zpath, ["x", "y"], bits=10, n_files=16)

    plain = _per_file_span_fractions(spark, base, ["x", "y"])
    z = _per_file_span_fractions(spark, zpath, ["x", "y"])
    # same rows either way
    assert spark.read.parquet(zpath).count() == n
    for c in ("x", "y"):
        assert plain[c] > 0.9, f"baseline should span ~full {c} range"
        assert z[c] < 0.6, (
            f"z-order should narrow per-file {c} span, got {z[c]:.2f}"
        )


def _heavy_tailed_frame(spark):
    """Uniform (a, v) plus ONE extreme v outlier — the documented
    degradation case for linear min-max coordinates."""
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 1000).cast("double").alias("a"),
        (F.pmod(F.col("id") * 2654435761, F.lit(100000)) / 1000.0).alias("v"),
    )
    return df.union(
        spark.createDataFrame([(500.0, 1.0e12)], "a double, v double")
    )


def _files_overlapping(spark, path, col, lo, hi, exclude_above=None):
    """(n_overlapping, n_total, mean span fraction of the bulk range) per
    file for ``col`` — the file set a stats-pruning reader must open for
    ``col BETWEEN lo AND hi``. ``exclude_above`` drops outlier rows from
    the span math so the fraction reflects the bulk distribution."""
    df = spark.read.parquet(path)
    if exclude_above is not None:
        df = df.where(F.col(col) <= exclude_above)
    per_file = (
        df.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    overlap = [r for r in per_file if r["lo"] <= hi and r["hi"] >= lo]
    bulk = max(r["hi"] for r in per_file) - min(r["lo"] for r in per_file)
    frac = sum((r["hi"] - r["lo"]) / bulk for r in per_file) / len(per_file)
    return len(overlap), len(per_file), frac


def test_rank_mapping_restores_narrowing_under_heavy_tail(spark, tmp_path):
    """VERDICT r10 #4: one extreme outlier collapses linear min-max
    coordinates — every non-outlier row lands in a handful of cells, so
    the z-key carries no information about the skewed column and every
    file spans its whole bulk range. mapping='rank' (range-split ids —
    sampled boundaries put ~equal rows per cell) must restore per-file
    narrowing on the skewed column where linear degrades."""
    out = _heavy_tailed_frame(spark)
    stats = {}
    for mapping in ("linear", "rank"):
        path = str(tmp_path / mapping)
        write_parquet_zordered(
            out, path, ["a", "v"], bits=6, n_files=16, mapping=mapping
        )
        # layout rewrites never change the data
        assert spark.read.parquet(path).count() == out.count()
        stats[mapping] = _files_overlapping(
            spark, path, "v", 40.0, 60.0, exclude_above=1e11
        )
    lin_n, lin_total, lin_frac = stats["linear"]
    rk_n, rk_total, rk_frac = stats["rank"]
    # linear is fully degraded: every file must be opened for the
    # mid-range predicate, and each spans ~the whole bulk range
    assert lin_n == lin_total
    assert lin_frac > 0.9
    # rank mode prunes files and narrows spans despite the outlier
    assert rk_n < lin_n
    assert rk_frac < 0.5


def _scan_metrics(df):
    """Metrics of the (single) file scan in df's EXECUTED plan — the
    ground truth for what the parquet reader actually surfaced after
    pushed-filter row-group pruning."""
    def walk(plan):
        name = plan.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            return walk(plan.executedPlan())
        if "FileSourceScan" in name or "BatchScan" in name:
            out = {}
            it = plan.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
            return out
        it = plan.children().iterator()
        while it.hasNext():
            got = walk(it.next())
            if got:
                return got
        return None

    df.collect()
    return walk(df._jdf.queryExecution().executedPlan())


def test_zorder_read_side_pruning_is_real(spark, tmp_path):
    """VERDICT r10 #3 — the read-side proof the layout exists for: a
    selective filter on BOTH z-columns over the z-ordered table must
    surface far fewer rows from the parquet scan (pushed filters skip
    row groups via the narrow min/max stats each z-range file carries)
    than the identical filter over an unordered copy of the same rows,
    where every file/row-group's stats span everything and nothing can
    be skipped. File-level: the set of files whose stats admit the
    predicate box — what any stats-pruning reader must open — shrinks
    the same way. Results stay value-identical either way (the oracle
    rows: the layout changes IO, never answers)."""
    n = 40_000
    df = spark.range(n).select(
        (F.hash(F.col("id")) % 1000).cast("double").alias("x"),
        (F.hash(F.col("id"), F.lit(7)) % 1000).cast("double").alias("y"),
    )
    plain_path = str(tmp_path / "plain")
    df.repartition(16).write.parquet(plain_path)
    zpath = str(tmp_path / "zordered")
    write_parquet_zordered(df, zpath, ["x", "y"], bits=10, n_files=32)

    # a 10%-per-dim box INSIDE one major z-quadrant (values span
    # ~[-1000, 1000), so [200, 400) avoids straddling the curve's
    # top-level split at 0 — a box ON the split touches every quadrant's
    # boundary files, the curve's documented worst case)
    pred = (
        (F.col("x") >= 200) & (F.col("x") < 400)
        & (F.col("y") >= 200) & (F.col("y") < 400)
    )
    zq = spark.read.parquet(zpath).where(pred)
    pq = spark.read.parquet(plain_path).where(pred)
    zm, pm = _scan_metrics(zq), _scan_metrics(pq)

    # oracle rows: both layouts return exactly the source filter's rows
    want = sorted((r["x"], r["y"]) for r in df.where(pred).collect())
    assert sorted((r["x"], r["y"]) for r in zq.collect()) == want
    assert sorted((r["x"], r["y"]) for r in pq.collect()) == want
    assert len(want) > 100  # predicate is selective but non-trivial

    # both layouts list ALL their files (Spark prunes row groups through
    # pushed filters, not the listing); the z-ordered scan SURFACES a
    # small fraction of the rows — the skipped row groups are the
    # pruning the layout exists for — while the unordered scan's
    # everything-spanning stats can skip nothing
    assert zm["numFiles"] == 32 and pm["numFiles"] == 16
    assert pm["numOutputRows"] >= n * 0.9, pm
    assert zm["numOutputRows"] <= n * 0.2, zm

    # file-level: files whose stats admit the box (what ANY stats-pruning
    # reader — file-skipping or row-group-skipping — must open)
    def must_open(path):
        per_file = (
            spark.read.parquet(path)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg(
                F.min("x").alias("lx"), F.max("x").alias("hx"),
                F.min("y").alias("ly"), F.max("y").alias("hy"),
            )
            .collect()
        )
        return sum(
            1
            for r in per_file
            if r["lx"] < 400 and r["hx"] >= 200
            and r["ly"] < 400 and r["hy"] >= 200
        ), len(per_file)

    z_open, z_total = must_open(zpath)
    p_open, p_total = must_open(plain_path)
    assert p_open == p_total == 16  # unordered: every file must be read
    assert z_open <= z_total // 4, (z_open, z_total)
