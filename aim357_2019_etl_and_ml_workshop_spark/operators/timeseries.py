"""Time-series resample kernel (SURVEY.md J1-J3, F2, F6, F10, F14, A4, A5).

Reproduces the reference's gap-free daily series construction
(GluePySparkMLFeatureEngineering.rst:157-281) as pure DataFrame ops:

1. epoch day-bucketing:  (cast(ts as bigint) div 86400) * 86400   (.rst:161-165)
2. min/max bounds pulled once to the driver                        (.rst:167)
3. generated daily spine spark.range(min, max+1, 86400)            (.rst:170-172)
4. spine LEFT JOIN facts on epoch — gap days survive as NULL rows  (.rst:174-177)
5. groupBy(ts, type).count  ->  pivot(type).sum(count)             (.rst:218,252-254)
6. fillna(0)  (the reference does this in local pandas, .rst:630-635;
   here it stays distributed)

Scale posture: the spine is tiny (1 row/day — 36,500 rows for a century), so
it is explicitly broadcast: the join against 100TB of facts is a broadcast
hash join with NO shuffle of the fact table. Pivot takes an explicit value
list to skip the distinct-values pre-scan (SURVEY.md §4.1) and to lock
deterministic column order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86_400


def epoch_day_bucket(ts: Column | str, bucket_seconds: int = SECONDS_PER_DAY) -> Column:
    """F2: floor-to-bucket epoch seconds, matching the reference's
    (cast(ts as bigint) / 86400).cast(bigint) * 86400 exactly — BIGINT
    division in Spark yields a double, and the cast back to bigint truncates,
    which for positive epochs equals floor."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (
        (c.cast("bigint") / F.lit(bucket_seconds)).cast("bigint")
        * F.lit(bucket_seconds)
    ).alias("epoch")


def with_epoch(df: DataFrame, ts_col: str, bucket_seconds: int = SECONDS_PER_DAY) -> DataFrame:
    return df.withColumn("epoch", epoch_day_bucket(ts_col, bucket_seconds))


def epoch_bounds(df: DataFrame, epoch_col: str = "epoch") -> tuple[int, int]:
    """J3: scalar min/max pulled once to the driver to parameterize the
    spine — a 2-value collect, not a driver-side loop."""
    row = df.agg(
        F.min(epoch_col).alias("lo"), F.max(epoch_col).alias("hi")
    ).first()
    if row is None or row["lo"] is None:
        raise ValueError("cannot build a date spine over an empty frame")
    return int(row["lo"]), int(row["hi"])


def date_spine(
    spark: SparkSession,
    min_epoch: int,
    max_epoch: int,
    bucket_seconds: int = SECONDS_PER_DAY,
) -> DataFrame:
    """J2: one row per day in [min_epoch, max_epoch] — generated, never
    scanned. spark.range is a leaf with no input partitions to shuffle."""
    return spark.range(min_epoch, max_epoch + 1, bucket_seconds).toDF("epoch")


def resample_daily(
    df: DataFrame,
    ts_col: str = "pickup_datetime",
    bucket_seconds: int = SECONDS_PER_DAY,
) -> DataFrame:
    """J1+J2+J3: every day in [min, max] present; days with no facts carry
    NULLs (exactly the reference's spine-LEFT-JOIN-facts 'resample',
    .rst:170-181).

    Physical strategy: Spark cannot broadcast the PRESERVED side of an outer
    join, so `broadcast(spine).join(facts, 'left')` would shuffle the fact
    table — fatal at 100TB. Equivalent decomposition that never moves facts:
      spine LEFT JOIN facts == facts (all match: spine spans their min/max)
                               UNION gap-days with NULL fact columns,
    where gap-days = spine ANTI JOIN distinct(fact epochs) — an agg over
    epochs (map-side partial, ~1 row/day) plus a tiny broadcast anti-join."""
    facts = with_epoch(df, ts_col, bucket_seconds)
    lo, hi = epoch_bounds(facts)
    spine = date_spine(df.sparkSession, lo, hi, bucket_seconds)
    observed = facts.select("epoch").distinct()
    gaps = spine.join(F.broadcast(observed), "epoch", "left_anti")
    fact_cols = [c for c in facts.columns if c != "epoch"]
    gap_rows = gaps.select(
        "epoch",
        *[
            F.lit(None).cast(facts.schema[c].dataType).alias(c)
            for c in fact_cols
        ],
    )
    return facts.select("epoch", *fact_cols).unionByName(gap_rows).withColumn(
        "ts_resampled", F.col("epoch").cast("timestamp")
    )


def counts_by_day(
    df: DataFrame,
    ts_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = SECONDS_PER_DAY,
) -> DataFrame:
    """A3/A4: (day bucket [, extra keys]) -> count. Partial aggregation
    happens map-side (HashAggregate partial -> shuffle on the small group
    key space -> final), so the shuffle moves one row per (day, key), not
    the fact table."""
    facts = with_epoch(df, ts_col, bucket_seconds)
    group_cols = [F.col("epoch").cast("timestamp").alias("ts_resampled")] + [
        F.col(k) for k in (keys or [])
    ]
    return facts.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("count"))


def pivot_by_type(
    daily_counts: DataFrame,
    type_col: str = "type",
    values: list[str] | None = None,
    ts_col: str = "ts_resampled",
    count_col: str = "count",
) -> DataFrame:
    """A5: wide table, one column per type value, cells = sum(count).

    ``values`` should be passed explicitly (sorted) — it skips Spark's
    distinct-value pre-scan job and pins deterministic column order
    (SURVEY.md §4.1 'two-phase pivot')."""
    pivoted = (
        daily_counts.groupBy(ts_col).pivot(type_col, values).sum(count_col)
        if values
        else daily_counts.groupBy(ts_col).pivot(type_col).sum(count_col)
    )
    return pivoted


def gap_fill(df: DataFrame, fill_value: float = 0, cols: list[str] | None = None) -> DataFrame:
    """F10/F14: replace the NULLs that gap days produced with 0 — the
    reference's pandas fillna(0) (.rst:631-635), kept distributed."""
    return df.na.fill(fill_value, subset=cols)


def combine_columns_sum(df: DataFrame, out_col: str, in_cols: list[str]) -> DataFrame:
    """F11+F12: row-wise sum of count columns then drop the parts — the
    reference's full_fhv = fhv + fhvhv (.rst:632-633)."""
    total = None
    for c in in_cols:
        col = F.coalesce(F.col(c), F.lit(0))
        total = col if total is None else total + col
    return df.withColumn(out_col, total).drop(*in_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: the big side spreads each hot key over
    ``n_salts`` sub-keys (deterministic hash of the whole row, no rand()),
    the small side replicates per salt — so one skewed key's rows land on
    n_salts reducers instead of one. AQE's skew-join handles moderate skew
    automatically; this is the explicit fallback for pathological keys.

    Only 'inner' and 'left' are supported: the small side is replicated once
    per salt, so a right/full outer join would emit every unmatched
    small-side row n_salts times."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(small side is salt-replicated; outer-preserving it would "
            "duplicate unmatched rows)"
        )
    big_cols = [F.col(c) for c in big.columns]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big_cols), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnostic — run BEFORE a big shuffle join to decide
    between plain, AQE-skew, and salted_join strategies: one row with the
    key cardinality, max/mean per-key row counts, their ratio (the skew
    factor — a ratio near 1 is uniform; >> partition count means one key
    will straggle), and the hottest key. One groupBy + one tiny ordered
    aggregate over per-key counts; the per-key count table is the only
    shuffle."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    # struct ordering (count dominates, key breaks ties): works for ANY
    # orderable key type — string/date/decimal join keys included — and
    # cannot overflow however hot the key. The earlier composite scalar
    # (n * 1e12 + key) silently required a numeric key and per-key counts
    # below ~9.2M rows; oracle twins may keep the scalar form where the
    # key is known numeric and small.
    top = F.max_by(F.col(key_col), F.struct(F.col("n"), F.col(key_col)))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
        top.alias("hottest_key"),
    )
