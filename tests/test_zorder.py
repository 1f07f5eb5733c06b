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
